#!/usr/bin/env python
"""Pre-warm the serving-path kernels against the persistent cache.

Cold-start anatomy on the axon TPU tunnel (CLAUDE.md facts 6/15; the
r3 judge measured 540 s of first-execution warmup for the flagship
kernel under load):

1. XLA compile of the scanned/jitted programs -- covered by the JAX
   persistent compilation cache (config.setup_compilation_cache), so a
   process that runs AFTER this tool pays none of it;
2. Mosaic (Pallas) binary load/link through the tunnel -- paid once
   per process per kernel shape even on a cache hit (~2 s small
   configs, up to ~90 s for the full-size dictionary kernel under
   load).  tools/aot_pallas.py documents why serialization cannot
   remove this.

So: run this tool once per deployment (or import
:func:`warm_serving` at serving-process startup) with YOUR shapes.  A
fresh process then pays only (2); a long-lived serving process pays
nothing after its own startup warm.

Each stage runs the SAME public entry points the serving pipeline uses
(the Mosaic persistent-cache key includes the jitted wrapper identity,
fact 15 -- priming a different entry point would not hit):

- ``dictionary``: ``models.mrf.fisp_mrf_dictionary`` (XLA scan) at the
  block shape used by ``streamed_compress_dictionary``;
- ``dispatch``: ``simulate()`` of the canonical FISP train (fused
  primal Pallas kernel via fisp_dispatch);
- ``jac``: tracked train + Adc/Jacobian probes (fused tangent kernel,
  the Gauss-Newton refinement path);
- ``recon``: ``parallel.mrf_reconstruct`` compress + project + match
  at the (voxels, atoms, rank) serving shape.

Prints one JSON line of per-stage cold (first execution, incl. any
compile/load) and steady (pipelined) seconds.

CLI: python tools/warm_serving.py [--atoms N] [--pulses P]
     [--nstate K] [--vox V] [--rank R] [--stages a,b,...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    return float(np.asarray(x).reshape(-1)[0])


def warm_serving(natoms=102400, npulse=1000, nstate=10, nvox=8192,
                 rank=32, stages=("dictionary", "dispatch", "jac",
                                  "recon"), steady_repeats=4):
    """Prime the serving kernels at the given shapes; return timings.

    Returns a dict of ``{stage: {"cold_seconds", "steady_seconds"}}``.
    Call at serving-process startup (the shapes must match production:
    kernel compile keys are shape-specific).
    """
    import jax.numpy as jnp
    import epgpy_tpu as epg
    from epgpy_tpu.models.mrf import fisp_mrf_dictionary
    from epgpy_tpu.parallel import mrf_reconstruct

    TRv, TEv = 12.0, 5.0
    rng = np.random.default_rng(0)
    FA = (10 + 50 * np.abs(np.sin(np.arange(npulse) * 2 * np.pi / 500))
          ).astype(np.float32)
    T1 = rng.uniform(200, 3000, natoms).astype(np.float32)
    T2 = np.minimum(rng.uniform(15, 400, natoms), 0.8 * T1).astype(
        np.float32)
    B1 = rng.uniform(0.75, 1.25, natoms).astype(np.float32)
    out = {}

    def stage(name, fn, read):
        t0 = time.perf_counter()
        r = fn()
        read(r)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(steady_repeats):
            r = fn()
        read(r)
        steady = (time.perf_counter() - t0) / steady_repeats
        out[name] = {"cold_seconds": round(cold, 2),
                     "steady_seconds": round(steady, 4)}

    if "dictionary" in stages:
        stage("dictionary",
              lambda: fisp_mrf_dictionary(FA, TRv, TEv, T1, T2, B1,
                                          nstate=nstate),
              lambda r: _sync(r[0][-1, -1]))

    seq = None
    if "dispatch" in stages or "jac" in stages:
        def build(track):
            o1 = {"order1": ["T1", "T2"]} if track else {}
            s = []
            for i in range(npulse):
                s += [epg.T(float(FA[i]) * B1, 90.0),
                      epg.E(TEv, T1, T2, **o1), epg.ADC,
                      epg.E(TRv - TEv, T1, T2, **o1), epg.S(1)]
            return s

    if "dispatch" in stages:
        seq = build(False)
        stage("dispatch",
              lambda: epg.simulate(seq, max_nstate=nstate,
                                   asarray=False),
              lambda r: _sync(r["__c_re"]))

    if "jac" in stages:
        seqj = build(True)
        probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
        stage("jac",
              lambda: epg.simulate(seqj, max_nstate=nstate,
                                   probe=probes, asarray=False),
              lambda r: _sync(r[1]["__c_re"]))

    if "recon" in stages:
        # synthetic dictionary with the right shape (the compile keys
        # depend on shapes, not values)
        import jax
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        dre = jax.random.normal(k1, (natoms, npulse), jnp.float32)
        dim = jax.random.normal(k2, (natoms, npulse), jnp.float32)
        sre = np.asarray(rng.standard_normal((nvox, npulse)), np.float32)
        sim = np.asarray(rng.standard_normal((nvox, npulse)), np.float32)
        t0 = time.perf_counter()
        comp = mrf_reconstruct(np.zeros((1, npulse), np.float32),
                               np.zeros((1, npulse), np.float32),
                               dre, dim, rank=rank)["compression"]
        _sync(comp["cdict_re"][0, 0])
        out["compress"] = {"cold_seconds":
                           round(time.perf_counter() - t0, 2)}
        # the serving idiom (docs/serving.md): ONE jitted entry with
        # the dictionary + compression as ARGUMENTS -- eager recon
        # would materialize the (V, B) correlation planes un-fused
        # (RESOURCE_EXHAUSTED at serving sizes), and closure-captured
        # dictionaries explode the remote-compile payload
        keys = tuple(sorted(comp))
        serve = jax.jit(lambda a, b, dr, di, *cv: mrf_reconstruct(
            a, b, dr, di, compression=dict(zip(keys, cv))))
        stage("recon",
              lambda: serve(sre, sim, dre, dim,
                            *(comp[kk] for kk in keys)),
              lambda r: _sync(r["index"][-1]))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--atoms", type=int, default=102400)
    ap.add_argument("--pulses", type=int, default=1000)
    ap.add_argument("--nstate", type=int, default=10)
    ap.add_argument("--vox", type=int, default=8192)
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--stages", default="dictionary,dispatch,jac,recon")
    args = ap.parse_args()
    t0 = time.perf_counter()
    res = warm_serving(args.atoms, args.pulses, args.nstate, args.vox,
                       args.rank, tuple(args.stages.split(",")))
    import jax
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "atoms": args.atoms, "pulses": args.pulses, "vox": args.vox,
        "rank": args.rank, "total_seconds": round(
            time.perf_counter() - t0, 1), **res}))


if __name__ == "__main__":
    main()
