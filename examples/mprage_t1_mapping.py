"""MPRAGE T1 mapping through the composite-GRE kernel family.

MPRAGE (Mugler & Brookeman 1990) is the workhorse 3-D T1-weighted
acquisition: per segment, an adiabatic inversion, an inversion delay
TI, a train of low-flip spoiled gradient-echo readouts, and a recovery
delay TD.  The transient signal along each readout train encodes T1;
matching measured voxel trains against a simulated dictionary gives a
quantitative T1 map (the MP2RAGE/Look-Locker family of methods).

The whole stage train is plain operators; on TPU `simulate()` folds it
into ONE fused VMEM pass via `fisp_dispatch.match_composite` (segmented
trains match no exact-pattern family: the inversion/recovery stages
break the FISP periodicity).  The reference (epgpy) can express this
sequence but runs it op-by-op in NumPy.

Physics notes demonstrated below:
- the adiabatic inversion is B1-insensitive (a scalar 180 flip — the
  composite matcher's `b1u` convention), while readout flips scale
  with B1;
- at fixed TE the T2 decay multiplies every echo equally, so the
  NORMALIZED fingerprint is T2-robust: the dictionary needs only a
  T1 axis (voxels are simulated with randomized T2 and complex proton
  density, and still match their T1).

Stage 2 refines the matched T1 off-grid with damped Gauss-Newton: the
tracked train (``order1=["T1"]``) with Adc/Jacobian probes routes to
the fused composite-GRE *Jacobian* kernel (one VMEM pass computes the
signal and its dT1 column for all voxels), and the per-voxel complex
proton density is solved in closed form each iteration
(``solve_scale=True`` variable projection), which also absorbs the
fixed-TE T2 scale.

Env knobs: MPRAGE_NT1 (96), MPRAGE_NVOX (48), MPRAGE_NSEG (6),
MPRAGE_NREAD (24), MPRAGE_ITERS (6).
"""

import os
import time

import numpy as np

import epgpy_tpu as epg
from epgpy_tpu.parallel import dictionary_match, gauss_newton_refine

NT1 = int(os.environ.get("MPRAGE_NT1", 96))
NVOX = int(os.environ.get("MPRAGE_NVOX", 48))
NSEG = int(os.environ.get("MPRAGE_NSEG", 6))
NREAD = int(os.environ.get("MPRAGE_NREAD", 24))
ITERS = int(os.environ.get("MPRAGE_ITERS", 6))

TI, TD = 650.0, 800.0            # inversion / recovery delays (ms)
TE, TRG = 3.0, 7.0               # gradient-echo timing (ms)
FA = 8.0                         # readout flip (deg)


def mprage_train(T1, T2, track=None):
    """One MPRAGE acquisition as plain operators (batched T1/T2).

    The readout is RF-spoiled (117-deg quadratic phase cycling with
    demodulated ADCs, as on real scanners) — without it, residual
    transverse coherences leak T2 shape into the train and long-T1
    matches land one grid point off; with it the T2-robustness argument
    above holds to within one grid step.  The composite matcher folds
    the per-stage phases and ADC phasors into SMEM arrays."""
    ph = np.cumsum(np.arange(NSEG * NREAD) * 117.0) % 360.0
    o1 = {"order1": track} if track else {}
    seq = []
    j = 0
    for _ in range(NSEG):
        seq += [epg.T(180.0, 0.0), epg.E(TI, T1, T2, **o1)]
        for _ in range(NREAD):
            seq += [epg.T(FA, float(ph[j])), epg.E(TE, T1, T2, **o1),
                    epg.Adc(phase=-float(ph[j])),
                    epg.E(TRG - TE, T1, T2, **o1), epg.S(1)]
            j += 1
        seq += [epg.E(TD, T1, T2, **o1)]
    return seq


def main():
    rng = np.random.default_rng(17)
    t1_grid = np.linspace(300.0, 3000.0, NT1)
    step = t1_grid[1] - t1_grid[0]

    # dictionary: T1 axis only (T2 fixed -- see module docstring)
    t0 = time.perf_counter()
    sig = np.asarray(epg.simulate(mprage_train(t1_grid, 80.0),
                                  max_nstate=8))          # (P, NT1)
    D = np.ascontiguousarray(sig.T)                       # (NT1, P)
    D /= np.linalg.norm(D, axis=1, keepdims=True)
    print(f"dictionary: {NT1} atoms x {sig.shape[0]} readouts "
          f"in {time.perf_counter() - t0:.2f} s")

    # "acquired" voxels: off-grid T1, randomized T2, complex PD, noise
    t1_true = rng.uniform(350.0, 2900.0, NVOX)
    t2_true = rng.uniform(55.0, 140.0, NVOX)
    obs = np.asarray(epg.simulate(mprage_train(t1_true, t2_true),
                                  max_nstate=8)).T        # (NVOX, P)
    pd = (rng.uniform(0.6, 1.2, NVOX)
          * np.exp(2j * np.pi * rng.uniform(size=NVOX)))
    obs = obs * pd[:, None]
    obs += rng.normal(0.0, 2e-4, obs.shape) * (1 + 1j)

    # serving-path match (|d^H s| is PD-phase/scale insensitive;
    # normalize the observations so correlations read as cos-similarity)
    obs /= np.linalg.norm(obs, axis=1, keepdims=True)
    idx, corr = dictionary_match(D.real.astype(np.float32),
                                 D.imag.astype(np.float32),
                                 obs.real.astype(np.float32),
                                 obs.imag.astype(np.float32))
    t1_hat = t1_grid[np.asarray(idx)]

    err = np.abs(t1_hat - t1_true)
    print(f"T1 recovery: max |err| = {err.max():.1f} ms, "
          f"RMS = {np.sqrt((err ** 2).mean()):.1f} ms "
          f"(grid step {step:.1f} ms), min corr = "
          f"{np.asarray(corr).min():.5f}")
    # nearest-grid-point recovery despite randomized T2 and complex PD
    assert err.max() <= step * 1.01, err.max()

    # stage 2: off-grid Gauss-Newton refinement of T1 on the fused
    # composite-Jacobian dispatch (dT1 column + closed-form complex PD)
    def signal_and_jac(theta):
        out = epg.simulate(
            mprage_train(theta[0], 80.0, track=["T1"]), max_nstate=8,
            probe=[epg.ADC, epg.Jacobian(["T1"])], asarray=False)
        sig, jac = out
        return ((sig["__c_re"], sig["__c_im"]),
                (jac["__c_re"], jac["__c_im"]))

    t0 = time.perf_counter()
    theta = gauss_newton_refine(
        signal_and_jac, t1_hat[None], obs.T.real, obs.T.imag,
        iters=ITERS, bounds=[(200.0, 3200.0)], solve_scale=True)
    t1_ref = theta[0]
    err_ref = np.abs(t1_ref - t1_true)
    print(f"GN refine ({ITERS} iters, {time.perf_counter() - t0:.2f} s): "
          f"RMS {np.sqrt((err_ref ** 2).mean()):.1f} ms "
          f"(match-only {np.sqrt((err ** 2).mean()):.1f} ms)")
    # the model fixes T2=80 while voxels have randomized T2: residual
    # T2-shape leakage (through carried coherences) floors the off-grid
    # accuracy, so require a clear-but-not-perfect improvement
    assert np.sqrt((err_ref ** 2).mean()) < 0.8 * np.sqrt((err ** 2).mean())
    print("MPRAGE T1 mapping OK")


if __name__ == "__main__":
    main()
