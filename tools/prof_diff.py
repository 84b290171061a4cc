#!/usr/bin/env python
"""Profile the engine diff path (bench `diff_atoms_per_sec` config).

Times the compat primal vs the fused diff program at 200 TR x 4096
atoms x 2 tangents and dumps XLA cost analysis (flops / bytes accessed)
for both compiled programs, to attribute the measured ~19x diff/primal
wall ratio to arithmetic vs layout/fusion.

Usage:
  python tools/prof_diff.py            # TPU (default device)
  PROF_CPU=1 python tools/prof_diff.py # host CPU
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

if os.environ.get("PROF_CPU"):
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax  # noqa: E402

if os.environ.get("PROF_CPU"):
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

import epgpy_tpu as epg  # noqa: E402
from epgpy_tpu import diff as diff_mod  # noqa: E402
from epgpy_tpu import engine as eng  # noqa: E402

NRF = int(os.environ.get("PROF_NTR", 200))
B = int(os.environ.get("PROF_ATOMS", 4096))
NSTATE = 10
TR, TE = 12.0, 5.0


def make_seq(order1):
    rng = np.random.default_rng(42)
    FA = 10.0 + 50.0 * np.abs(np.sin(np.arange(NRF) * 2 * np.pi / 500.0))
    FA += rng.uniform(0, 2, NRF)
    T1d = np.linspace(200.0, 3000.0, B)
    T2d = np.linspace(20.0, 200.0, B)
    seq = []
    for i in range(NRF):
        kw = {"order1": ["T1", "T2"]} if order1 else {}
        seq += [
            epg.T(float(FA[i]), 90.0),
            epg.E(TE, T1d, T2d, **kw),
            epg.ADC,
            epg.E(TR - TE, T1d, T2d, **kw),
            epg.S(1),
        ]
    return seq


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).ravel()[0].real)


def timeit(fn, repeats=3):
    t0 = time.perf_counter()
    sync(fn())
    warm = time.perf_counter() - t0
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return warm, best


def cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return ca.get("flops", -1.0), ca.get("bytes accessed", -1.0)
    except Exception as exc:  # pragma: no cover
        return f"failed: {exc}", None


def main():
    print(f"devices: {jax.devices()}")

    # capture the primal program's args
    prim_cap = {}
    orig_run = eng._run_compiled

    def run_wrapper(plan_kinds, payload, probes, sm, shape=None, lanes=False):
        prim_cap["args"] = (plan_kinds, payload, probes, sm, shape, lanes)
        return orig_run(plan_kinds, payload, probes, sm, shape, lanes)

    eng._run_compiled = run_wrapper

    # capture the diff program's sm
    diff_cap = {}
    orig_diff = diff_mod.simulate_diff

    def diff_wrapper(sequence, probes, sm, **kw):
        diff_cap["sm"] = sm
        return orig_diff(sequence, probes, sm, **kw)

    diff_mod.simulate_diff = diff_wrapper

    # -- compat primal (no probes -> no diff machinery) --
    seq_p = make_seq(order1=False)
    prim = lambda: epg.simulate(seq_p, max_nstate=NSTATE, asarray=False)
    warm, pbest = timeit(prim)
    print(f"primal     warm={warm:7.3f}s best={pbest*1e3:8.2f}ms")
    if "args" in prim_cap:
        pk, pl, pb, sm0, shape, lanes = prim_cap["args"]
        print(f"  (lanes={lanes})")
        try:
            c = orig_run.lower(pk, pl, pb, sm0, shape, lanes).compile()
            f, by = cost(c)
            print(f"primal cost: flops={f:.4g} bytes={by:.4g}")
            pflops, pbytes = f, by
        except Exception as exc:
            print("primal cost failed:", exc)
            pflops = pbytes = None

    # -- diff program --
    seq_d = make_seq(order1=True)
    probes = [epg.Jacobian(["magnitude", "T1", "T2"])]
    dfun = lambda: epg.simulate(seq_d, probe=probes, max_nstate=NSTATE,
                                asarray=False)
    warm, dbest = timeit(dfun)
    print(f"diff       warm={warm:7.3f}s best={dbest*1e3:8.2f}ms  "
          f"ratio={dbest/pbest:5.1f}x")

    for cached in diff_mod._PROGRAM_CACHE.values():
        if cached[0] == "fused" and "sm" in diff_cap:
            try:
                c = cached[1].lower(diff_cap["sm"]).compile()
                f, by = cost(c)
                print(f"diff   cost: flops={f:.4g} bytes={by:.4g}")
                if pflops:
                    print(f"  flop ratio={f/pflops:5.1f}x  "
                          f"byte ratio={by/pbytes:5.1f}x  "
                          f"wall ratio={dbest/pbest:5.1f}x")
            except Exception as exc:
                print("diff cost failed:", exc)
            # phase split: device compute vs the internal device_get
            fn, sm = cached[1], diff_cap["sm"]
            out = fn(sm); sync(out)  # warm
            t0 = time.perf_counter(); out = fn(sm); sync(out)
            t_dev = time.perf_counter() - t0
            t0 = time.perf_counter(); host = jax.device_get(out)
            t_d2h = time.perf_counter() - t0
            nbytes = sum(np.asarray(x).nbytes
                         for x in jax.tree_util.tree_leaves(host))
            print(f"diff  phases: device={t_dev*1e3:8.2f}ms  "
                  f"d2h={t_d2h*1e3:8.2f}ms ({nbytes/1e6:.1f} MB)")
            # pipelined device slope: enqueue M, sync once
            M = 6
            sync(fn(sm))
            t0 = time.perf_counter()
            outs = [fn(sm) for _ in range(M)]
            sync(outs[-1])
            t_all = time.perf_counter() - t0
            print(f"diff  pipelined: {t_all/M*1e3:8.2f}ms/call (M={M})")
            break

    # primal pipelined slope
    M = 8
    sync(prim())
    t0 = time.perf_counter()
    outs = [prim() for _ in range(M)]
    sync(outs[-1])
    t_all = time.perf_counter() - t0
    print(f"primal pipelined: {t_all/M*1e3:8.2f}ms/call (M={M})")


if __name__ == "__main__":
    main()
