"""MR fingerprinting with balanced SSFP — the original MRF family
(Ma et al., Nature 2013): an IR-prepped, phase-alternating TrueFISP
train with pseudo-random flip angles and TRs, mapping (T1, T2, df) —
off-resonance is a MAPPED parameter in bSSFP MRF, not a nuisance.

simulate() routes the balanced train to the fused k=0 Pallas kernel
(fisp_dispatch.match_bssfp; ~5M atoms/s on one TPU v5e chip), the
dictionary is SVD-compressed (McGivney 2014, parallel.compress_
dictionary) and noisy voxel signals are matched in the compressed
space.  A final Gauss-Newton stage refines (T1, T2, df) OFF-grid:
g-tracked balanced trains route Jacobian probes to the fused kernel's
(dT1, dT2, ddf) tangent groups, so each iteration is one VMEM pass
for all voxels.  Reference workflow anchor: epgpy builds the same
train from T/E/Adc operators (no dedicated bSSFP model exists there).
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

    # --- off-grid (T1, T2, df) Gauss-Newton refinement ---------------
    # bSSFP resolves off-resonance, so df is a REFINABLE parameter (the
    # balanced train's g-tracked Jacobian dispatch provides the dS/ddf
    # column; spoiled FISP cannot do this).  Voxels at off-grid truth
    # with an unknown complex PD scale: match for the init, then damped
    # GN with the per-voxel scale solved in closed form each iteration
    # (variable projection, solve_scale=True).  Short trains don't
    # constrain the fit — a df init one grid step off lands in a
    # different band lobe (banding period 1/TR ~ 83 Hz) — so the
    # refinement stage needs a realistic train length.
    if P < 96:
        print(f"refinement skipped: P={P} too short to condition "
              "the (T1, T2, df) fit")
        return
    from epgpy_tpu.parallel import gauss_newton_refine

    nv = int(os.environ.get("BSSFP_NVOX", 24))
    T1t = rng.uniform(300, 1800, nv)
    T2t = np.minimum(rng.uniform(30, 170, nv), 0.6 * T1t)
    dft = rng.uniform(-0.045, 0.045, nv)

    def signal_and_jac(theta):
        sq = bssfp_sequence(FA, TR, T1=theta[0], T2=theta[1],
                            df=theta[2], inversion=18.0,
                            order1=["T1", "T2", "g"])
        s, j = epg.simulate(sq, asarray=False,
                            probe=[epg.ADC,
                                   epg.Jacobian(["T1", "T2", "g"])])
        return ((s["__c_re"], s["__c_im"]), (j["__c_re"], j["__c_im"]))

    (tr_, ti_), _ = signal_and_jac(np.stack([T1t, T2t, dft]))
    pd = rng.normal(size=nv) + 1j * rng.normal(size=nv)
    meas = pd * (np.asarray(tr_) + 1j * np.asarray(ti_))
    meas += 2e-3 * np.abs(pd) * (rng.normal(size=meas.shape)
                                 + 1j * rng.normal(size=meas.shape))

    # init from the compressed-space match
    mn = np.sqrt((meas.real ** 2 + meas.imag ** 2).sum(0))
    cm = project_signals(comp["basis_re"], comp["basis_im"],
                         jnp.asarray(meas.real.T / mn[:, None]),
                         jnp.asarray(meas.imag.T / mn[:, None]))
    idx0, _ = dictionary_match(comp["cdict_re"], comp["cdict_im"],
                               cm[0], cm[1])
    theta0 = grid[np.asarray(idx0)].T.copy()       # (3, nv)
    e0 = [np.sqrt(np.mean((theta0[k] - t) ** 2))
          for k, t in enumerate((T1t, T2t, dft))]

    # multi-start GN: the |corr| match with an unknown COMPLEX PD scale
    # confuses +-df for some (T1, T2) (near-conjugate fingerprints),
    # which strands single-start GN in the wrong band lobe, and a
    # matched init sitting between df basins (> half a grid step off)
    # can stall mid-slope.  Refine from the matched init, its
    # df-negated twin, and +-half-grid-step df perturbations; keep the
    # lowest per-voxel residual.
    def residual(theta):
        sq = bssfp_sequence(FA, TR, T1=theta[0], T2=theta[1],
                            df=theta[2], inversion=18.0)
        s = epg.simulate(sq, asarray=False)
        sc = (np.asarray(s["__c_re"]) + 1j * np.asarray(s["__c_im"]))
        c = (np.conj(sc) * meas).sum(0) / np.maximum(
            (np.abs(sc) ** 2).sum(0), 1e-30)
        return (np.abs(meas - c * sc) ** 2).sum(0)

    bounds = [(150.0, 2500.0), (15.0, 250.0), (-0.06, 0.06)]
    half = 0.5 * float(df.flat[1] - df.flat[0])
    starts = []
    for ddf, neg in ((0.0, False), (0.0, True), (half, False), (-half, False)):
        t0 = theta0.copy()
        t0[2] = (-t0[2] if neg else t0[2]) + ddf
        starts.append(t0)
    cands = [gauss_newton_refine(signal_and_jac, t0, meas.real, meas.imag,
                                 iters=10, solve_scale=True, bounds=bounds)
             for t0 in starts]
    res = np.stack([residual(c) for c in cands])
    pick = res.argmin(0)
    theta = np.stack(cands, 0)[pick, :, np.arange(nv)].T
    e1 = [np.sqrt(np.mean((theta[k] - t) ** 2))
          for k, t in enumerate((T1t, T2t, dft))]
    if os.environ.get("BSSFP_DEBUG"):
        print("per-voxel df err (Hz) init:", (1e3 * (theta0[2] - dft)).round(2))
        print("per-voxel df err (Hz) refined:", (1e3 * (theta[2] - dft)).round(3))
        print("per-voxel T1 err refined:", (theta[0] - T1t).round(1))
        print("per-voxel T2 err refined:", (theta[1] - T2t).round(2))
        print("picked start index:", np.asarray(pick))
    print(f"match RMSE:  T1={e0[0]:.1f} ms  T2={e0[1]:.2f} ms  "
          f"df={1e3 * e0[2]:.2f} Hz")
    print(f"refine RMSE: T1={e1[0]:.2f} ms  T2={e1[1]:.3f} ms  "
          f"df={1e3 * e1[2]:.4f} Hz")
    assert e1[0] < 0.3 * e0[0] and e1[1] < 0.3 * e0[1] \
        and e1[2] < 0.3 * e0[2], (e0, e1)


if __name__ == "__main__":
    main()
