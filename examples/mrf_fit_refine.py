"""MRF parameter fitting: dictionary match + Gauss-Newton refinement.

The standard fingerprinting pipeline stops at the nearest dictionary
atom, so (T1, T2) accuracy is limited by grid resolution.  This example
refines the match off-grid with damped Gauss-Newton on the complex
residual, using `simulate()` Jacobian probes -- which the engine's FISP
dispatch routes to the fused primal+tangent Pallas kernel on TPU (one
VMEM-resident pass per iteration for ALL voxels; see
docs/performance.md "Jacobian dispatch").

Workflow (reference anchor: the dictionary fitting loop of
epgpy's MRF examples, /root/reference/examples/profiling/
differentiation_mrf.py signal model + epgpy/diff.py Jacobian probes):

1. simulate "acquired" fingerprints at random off-grid (T1, T2);
2. coarse dictionary match (parallel/match.py) for the initial guess;
3. per-voxel damped Gauss-Newton: J = dS/d(T1, T2) from one batched
   `simulate(..., probe=Jacobian(["T1", "T2"]))` call, 2x2 normal
   equations solved per voxel on the host;
4. report T1/T2 RMS errors: match-only vs refined.

Env knobs: FIT_NPULSE (120), FIT_NGRID (24), FIT_NVOX (64),
FIT_ITERS (6).
"""

import os
import time

import numpy as np
import jax.numpy as jnp

import epgpy_tpu as epg
from epgpy_tpu.models.mrf import fisp_mrf_dictionary
from epgpy_tpu.parallel import dictionary_match

P = int(os.environ.get("FIT_NPULSE", 120))
NGRID = int(os.environ.get("FIT_NGRID", 24))
NVOX = int(os.environ.get("FIT_NVOX", 64))
ITERS = int(os.environ.get("FIT_ITERS", 6))
TRv, TEv = 12.0, 5.0


def make_train():
    return 10 + 50 * np.abs(np.sin(np.arange(P) * 2 * np.pi / 250))


def signal_and_jacobian(FA, T1, T2):
    """Complex signal (P, B) and J = dS/d(T1, T2) (P, B, 2) via the
    operator API (TPU: fused Pallas Jacobian kernel via dispatch)."""
    seq = []
    for i in range(P):
        seq += [
            epg.T(float(FA[i]), 90.0),
            epg.E(TEv, T1, T2, order1=["T1", "T2"]),
            epg.ADC,
            epg.E(TRv - TEv, T1, T2, order1=["T1", "T2"]),
            epg.S(1),
        ]
    sig, jac = epg.simulate(seq, max_nstate=10,
                            probe=[epg.ADC, epg.Jacobian(["T1", "T2"])])
    return np.asarray(sig), np.asarray(jac)


def main():
    rng = np.random.default_rng(3)
    FA = make_train()

    # ground truth: off-grid voxels
    T1_true = rng.uniform(300, 1800, NVOX)
    T2_true = np.minimum(rng.uniform(30, 180, NVOX), 0.6 * T1_true)
    sig_true, _ = signal_and_jacobian(FA, T1_true, T2_true)
    meas = sig_true + 0.002 * (rng.normal(size=sig_true.shape)
                               + 1j * rng.normal(size=sig_true.shape))

    # coarse dictionary + match
    T1g = np.linspace(200, 2000, NGRID)
    T2g = np.linspace(20, 200, NGRID)
    grid = np.stack(np.meshgrid(T1g, T2g, indexing="ij"), -1).reshape(-1, 2)
    grid = grid[grid[:, 1] < 0.8 * grid[:, 0]]
    dre, dim = fisp_mrf_dictionary(FA, TRv, TEv, grid[:, 0], grid[:, 1],
                                   nstate=10, normalize=True)
    idx, _ = dictionary_match(dre, dim, jnp.asarray(meas.real.T),
                              jnp.asarray(meas.imag.T))
    T1_fit = grid[np.asarray(idx), 0].copy()
    T2_fit = grid[np.asarray(idx), 1].copy()
    err0 = (np.sqrt(np.mean((T1_fit - T1_true) ** 2)),
            np.sqrt(np.mean((T2_fit - T2_true) ** 2)))

    # damped Gauss-Newton on the complex residual; the magnitude scale
    # is solved in closed form each iteration (linear least squares)
    t0 = time.perf_counter()
    for it in range(ITERS):
        sig, jac = signal_and_jacobian(FA, T1_fit, T2_fit)
        # per-voxel complex scale c minimizing ||meas - c*sig||
        c = np.sum(np.conj(sig) * meas, 0) / np.maximum(
            np.sum(np.abs(sig) ** 2, 0), 1e-30)
        r = meas - c * sig                       # (P, B)
        J = jac * c[None, :, None]               # scale tangents too
        # normal equations over stacked re/im: A d = b, A = Re(J^H J)
        A = np.einsum("pbi,pbj->bij", np.conj(J), J).real
        b = np.einsum("pbi,pb->bi", np.conj(J), r).real
        A += 1e-8 * np.trace(A, axis1=1, axis2=2)[:, None, None] \
            * np.eye(2)[None]
        d = np.linalg.solve(A, b[..., None])[..., 0]   # (B, 2)
        step = np.clip(d, -200.0, 200.0)         # damping
        T1_fit = np.clip(T1_fit + step[:, 0], 100.0, 3000.0)
        T2_fit = np.clip(T2_fit + step[:, 1], 10.0, 500.0)
        T2_fit = np.minimum(T2_fit, 0.95 * T1_fit)
        rms = float(np.sqrt(np.mean(np.abs(r) ** 2)))
        print(f"({it}) residual rms={rms:.5f}")
    dur = time.perf_counter() - t0

    err1 = (np.sqrt(np.mean((T1_fit - T1_true) ** 2)),
            np.sqrt(np.mean((T2_fit - T2_true) ** 2)))
    print(f"match-only RMSE: T1={err0[0]:.1f} ms, T2={err0[1]:.1f} ms")
    print(f"refined    RMSE: T1={err1[0]:.1f} ms, T2={err1[1]:.1f} ms "
          f"({ITERS} GN iters, {dur:.1f}s)")
    assert err1[0] < err0[0] and err1[1] < err0[1], \
        "refinement must beat the grid match"
    return err0, err1


if __name__ == "__main__":
    main()
