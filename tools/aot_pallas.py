#!/usr/bin/env python
"""Fresh-process AOT experiment for the Pallas dictionary kernel.

The Mosaic custom-call programs bypass JAX's persistent compilation
cache (CLAUDE.md fact 15): every fresh process pays the full remote
compile (measured 60-730 s for the flagship kernel depending on tunnel
load).  This tool measures whether PJRT executable serialization
(jax.experimental.serialize_executable) pins fresh-process latency:

    python tools/aot_pallas.py save   # compile once, serialize to disk
    python tools/aot_pallas.py load   # fresh process: load + run, timed

Run `save` and `load` in SEPARATE processes; compare the `load` wall
time against the cold `save` compile time.

RESULT (2026-08-17, recorded in docs/performance.md): NEGATIVE for
serialize_executable -- deserialization takes 0.11 s but the first
execution still pays the full remote compile (391 s at the flagship
config); on the axon backend compilation is deferred to first
execution and the serialized artifact does not embed the device
binary.  The practical fix is the persistent compile cache + calling
the SAME jitted entry point (cache keys include the jit wrapper
identity): fresh-process first call then costs ~90 s (load/link),
0.13 s after.
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

PATH = os.environ.get("AOT_PATH", "/tmp/pallas_fisp_aot.bin")
NATOMS = int(os.environ.get("BENCH_NATOMS", 102400))
NPULSE = int(os.environ.get("BENCH_NPULSE", 1000))
NSTATE = int(os.environ.get("BENCH_NSTATE", 10))


def build():
    import jax
    from bench import make_train, make_atoms, TR, TE
    from epgpy_tpu.models.pallas_fisp import fisp_dictionary_pallas

    FA = make_train(NPULSE)
    T1, T2, B1 = make_atoms(NATOMS)

    def fn(FA, T1, T2, B1):
        return fisp_dictionary_pallas(FA, 90.0, TR, TE, T1, T2, B1,
                                      nstate=NSTATE)

    args = (np.asarray(FA, np.float32), np.asarray(T1, np.float32),
            np.asarray(T2, np.float32), np.asarray(B1, np.float32))
    return jax.jit(fn), args


def main():
    import jax
    from jax.experimental import serialize_executable as se

    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    fn, args = build()

    if mode == "save":
        t0 = time.perf_counter()
        lowered = fn.lower(*args)
        compiled = lowered.compile()
        # .compile() does not block on the axon remote compile
        # (CLAUDE.md fact 13): force it with one execution + host read
        out = compiled(*args)
        _ = float(np.asarray(out[0][-1, -1]))
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        payload = se.serialize(compiled)
        with open(PATH, "wb") as fh:
            import pickle
            pickle.dump(payload, fh)
        t_ser = time.perf_counter() - t0
        print({"mode": "save", "cold_compile_plus_run_s": round(t_cold, 1),
               "serialize_s": round(t_ser, 2),
               "bytes": os.path.getsize(PATH)})
    else:
        t0 = time.perf_counter()
        import pickle
        with open(PATH, "rb") as fh:
            payload = pickle.load(fh)
        compiled = se.deserialize_and_load(*payload) if isinstance(
            payload, tuple) else se.deserialize_and_load(payload)
        t_load = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(*args)
        _ = float(np.asarray(out[0][-1, -1]))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(*args)
        _ = float(np.asarray(out[0][-1, -1]))
        t_second = time.perf_counter() - t0
        print({"mode": "load", "deserialize_s": round(t_load, 2),
               "first_run_s": round(t_first, 2),
               "second_run_s": round(t_second, 3)})


if __name__ == "__main__":
    main()
