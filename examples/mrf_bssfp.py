"""MR fingerprinting with balanced SSFP — the original MRF family
(Ma et al., Nature 2013): an IR-prepped, phase-alternating TrueFISP
train with pseudo-random flip angles and TRs, mapping (T1, T2, df) —
off-resonance is a MAPPED parameter in bSSFP MRF, not a nuisance.

simulate() routes the balanced train to the fused k=0 Pallas kernel
(fisp_dispatch.match_bssfp; ~5M atoms/s on one TPU v5e chip), the
dictionary is SVD-compressed (McGivney 2014, parallel.compress_
dictionary) and noisy voxel signals are matched in the compressed
space.  Reference workflow anchor: epgpy builds the same train from
T/E/Adc operators (no dedicated bSSFP model exists there).
"""

import os

import numpy as np
import jax.numpy as jnp

import epgpy_tpu as epg
from epgpy_tpu.models.ssfp import bssfp_sequence
from epgpy_tpu.parallel import (dictionary_match, compress_dictionary,
                                project_signals)


def main():
    P = int(os.environ.get("BSSFP_NPULSE", 400))
    n = int(os.environ.get("BSSFP_NGRID", 14))
    ndf = int(os.environ.get("BSSFP_NDF", 7))
    # rank 32: slightly above FISP's classic ~25 (McGivney 2014) for
    # the extra df-banding structure.  NB matching margins here are
    # small (T2 neighbors correlate at 0.998-0.9999): this example is
    # what exposed the TPU bf16-matmul default distorting
    # dictionary_match/project_signals by ~1e-3 — both now run
    # precision=HIGHEST.
    rank = int(os.environ.get("BSSFP_RANK", 32))

    # Ma 2013-style train: sinusoidal flip-angle lobes with jitter,
    # lightly varying TR, alternating RF phase, adiabatic-inversion prep
    rng = np.random.default_rng(0)
    FA = 10 + 50 * np.abs(np.sin(np.arange(P) * 2 * np.pi / 100))
    FA += rng.uniform(0, 5, P)
    TR = 12.0 + 2.0 * np.sin(np.arange(P) / 17.0)

    # (T1, T2, df) outer grid via the append-broadcast rule: the
    # dispatch flattens it to the kernel atom axis and restores the
    # (P, n, n, ndf) output shape
    T1 = np.linspace(200, 2000, n).reshape(n, 1, 1)
    T2 = np.linspace(20, 200, n).reshape(1, n, 1)
    df = np.linspace(-0.05, 0.05, ndf).reshape(1, 1, ndf)

    seq = bssfp_sequence(FA, TR, T1=T1, T2=T2, df=df, inversion=18.0)
    sig = epg.simulate(seq, asarray=False)
    re = jnp.asarray(sig["__c_re"]).reshape(P, -1).T
    im = jnp.asarray(sig["__c_im"]).reshape(P, -1).T
    nrm = jnp.sqrt(jnp.sum(re * re + im * im, -1, keepdims=True))
    re, im = re / nrm, im / nrm
    B = re.shape[0]
    print(f"dictionary: {B} atoms ({n} T1 x {n} T2 x {ndf} df) x {P} pulses")

    comp = compress_dictionary(re, im, rank)
    print(f"SVD compression {P} -> {rank} (energy {comp['energy']:.6f})")

    # noisy copies of a few atoms, matched in the compressed space.
    # Picks avoid the long-T2 grid edge: with TR ~ 12 ms, bSSFP T2
    # sensitivity saturates there and neighbor margins shrink to
    # ~9e-5 in correlation (measured in f64) — a genuine physics limit
    # of short-TR trains, independent of compression.
    i1 = rng.integers(1, n - 1, 6)
    i2 = rng.integers(1, n - 2, 6)
    i3 = rng.integers(0, ndf, 6)
    picks = i1 * n * ndf + i2 * ndf + i3
    s_re = np.asarray(re)[picks] + 1e-3 * rng.normal(size=(6, P))
    s_im = np.asarray(im)[picks] + 1e-3 * rng.normal(size=(6, P))
    cs = project_signals(comp["basis_re"], comp["basis_im"],
                         jnp.asarray(s_re), jnp.asarray(s_im))
    idx, corr = dictionary_match(comp["cdict_re"], comp["cdict_im"],
                                 cs[0], cs[1])
    idx = np.asarray(idx)
    grid = np.stack(np.broadcast_arrays(
        T1, T2, np.broadcast_to(df, (n, n, ndf))), -1).reshape(-1, 3)
    print("true atoms:   ", picks)
    print("matched atoms:", idx)
    rec = grid[idx]
    print("recovered (T1, T2, df):", rec.round(3).tolist())
    # recovery within one grid step per parameter (finite-SNR MRF
    # criterion; exact index recovery is the common case)
    ri = np.stack([idx // (n * ndf), (idx // ndf) % n, idx % ndf], -1)
    ti = np.stack([i1, i2, i3], -1)
    assert (np.abs(ri - ti) <= 1).all(), "recovery beyond one grid step"
    assert (idx == picks).mean() >= 0.5
    assert float(np.asarray(corr).min()) > 0.99


if __name__ == "__main__":
    main()
