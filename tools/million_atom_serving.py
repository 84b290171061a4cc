#!/usr/bin/env python
"""Dictionary-scale serving demonstration: 1M atoms on one TPU chip.

A (T1 x T2 x B1 x df) grid of 2^20 = 1,048,576 atoms at 500 pulses
would be an 8.4 GB complex64 dictionary -- it never exists here:

1. `streamed_compress_dictionary` builds the rank-32 artifact from 16
   fused-kernel blocks of 65,536 atoms (Gram accumulated on device);
2. `mrf_reconstruct(dict_re=None, compression=..., atom_chunk=...)`
   matches voxel batches against the compressed (1M, 32) atoms with a
   lax.scan so the correlation plane never exceeds HBM;
3. proton density comes from the compressed space + stored norms.

Prints one JSON line with build/serve timings and recovery accuracy.
Env knobs: MEGA_ATOMS (1048576), MEGA_PULSES (500), MEGA_VOX (4096),
MEGA_RANK (32), MEGA_CHUNKS (16).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NATOMS = int(os.environ.get("MEGA_ATOMS", 1 << 20))
NPULSE = int(os.environ.get("MEGA_PULSES", 500))
NVOX = int(os.environ.get("MEGA_VOX", 4096))
RANK = int(os.environ.get("MEGA_RANK", 32))
NCHUNKS = int(os.environ.get("MEGA_CHUNKS", 16))


def main():
    import epgpy_tpu  # noqa: F401
    from epgpy_tpu.models.mrf import fisp_mrf_dictionary
    from epgpy_tpu.parallel import mrf_reconstruct, \
        streamed_compress_dictionary

    if "--warm" in sys.argv or os.environ.get("MEGA_WARM") == "1":
        # prime the block-shape kernels + compile cache first (see
        # tools/warm_serving.py): the build/serve timings below then
        # reflect a warm serving process
        from warm_serving import warm_serving
        t0 = time.perf_counter()
        block = -(-NATOMS // NCHUNKS)
        warm_serving(natoms=block, npulse=NPULSE, nvox=NVOX, rank=RANK,
                     stages=("dictionary",), steady_repeats=1)
        print(json.dumps({"warm_stage_seconds":
                          round(time.perf_counter() - t0, 1)}),
              file=sys.stderr)

    rng = np.random.default_rng(42)
    FA = (10 + 50 * np.abs(np.sin(np.arange(NPULSE) * 2 * np.pi / 500))
          + rng.uniform(0, 2, NPULSE)).astype(np.float32)

    # (T1, T2, B1) grid -- NOT df: spoiled FISP with an unknown complex
    # per-voxel scale leaves off-resonance nearly unidentifiable (it is
    # mostly a global echo phase, which |corr| matching ignores), so a
    # df axis would only create degenerate atoms.  128 x 64 x 128 = 2^20.
    n2 = max(int(round((NATOMS / 4) ** (1 / 3))), 2)
    n1 = n3 = 2 * n2
    T1g = np.geomspace(150, 3500, n1)
    T2g = np.geomspace(15, 400, n2)
    B1g = np.linspace(0.75, 1.25, n3)
    grid = np.stack(np.meshgrid(T1g, T2g, B1g, indexing="ij"),
                    -1).reshape(-1, 3)
    grid[:, 1] = np.minimum(grid[:, 1], 0.8 * grid[:, 0])   # physical T2
    B = len(grid)
    chunks = np.array_split(np.arange(B), NCHUNKS)

    def generate(i):
        g = grid[chunks[i]].astype(np.float32)
        return fisp_mrf_dictionary(FA, 12.0, 5.0, g[:, 0], g[:, 1],
                                   g[:, 2], nstate=10)

    t0 = time.perf_counter()
    comp = streamed_compress_dictionary(generate, len(chunks), RANK)
    _ = float(np.asarray(comp["cdict_re"][0, 0]))
    t_build = time.perf_counter() - t0

    # observations: on-grid atoms from the FIRST block (regenerated),
    # random complex PD, light noise
    d0re, d0im = (np.asarray(a) for a in generate(0))
    pick_local = rng.integers(0, len(d0re), NVOX)
    pick = chunks[0][pick_local]
    pd = (rng.uniform(0.5, 2.0, NVOX)
          * np.exp(2j * np.pi * rng.random(NVOX))).astype(np.complex64)
    sig = pd[:, None] * (d0re[pick_local] + 1j * d0im[pick_local])
    sig += 1e-4 * (rng.standard_normal(sig.shape)
                   + 1j * rng.standard_normal(sig.shape)).astype(np.complex64)
    sre = np.ascontiguousarray(sig.real, np.float32)
    sim = np.ascontiguousarray(sig.imag, np.float32)

    # serve: dictionary-free, atom-chunked match (the (V, B) plane at
    # 1M atoms x 4k voxels would be 2 x 16.8 GB -- past HBM unchunked)
    chunk = 1 << 17
    t0 = time.perf_counter()
    out = mrf_reconstruct(sre, sim, None, None, grid, compression=comp,
                          atom_chunk=chunk)
    idx = np.asarray(out["index"])
    t_serve_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = mrf_reconstruct(sre, sim, None, None, grid, compression=comp,
                          atom_chunk=chunk)
    idx = np.asarray(out["index"])
    t_serve = time.perf_counter() - t0

    pd_hat = np.asarray(out["pd_re"]) + 1j * np.asarray(out["pd_im"])
    exact = float(np.mean(idx == pick))
    # clamped-T2 duplicate rows share identical parameters: the matched
    # index may differ but the MAPS must agree.  Compare in f32 (maps
    # come back in the device compute dtype).
    want = grid[pick].astype(np.float32)
    got = np.asarray(out["maps"], np.float32)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-9)
    map_ok = float(np.mean(rel.max(axis=1) < 1e-5))
    pd_err = float(np.median(np.abs(pd_hat - pd) / np.abs(pd)))

    print(json.dumps({
        "atoms": B, "pulses": NPULSE, "rank": RANK, "voxels": NVOX,
        "build_seconds": round(t_build, 2),
        "serve_seconds_cold": round(t_serve_cold, 2),
        "serve_seconds": round(t_serve, 3),
        "voxels_per_sec": round(NVOX / t_serve, 1),
        "energy": round(float(comp["energy"]), 6),
        "index_exact_frac": exact, "maps_exact_frac": map_ok,
        "pd_median_rel_err": pd_err,
        "compressed_bytes": int(np.asarray(comp["cdict_re"]).nbytes * 2
                                + np.asarray(comp["norms"]).nbytes),
    }))


if __name__ == "__main__":
    main()
