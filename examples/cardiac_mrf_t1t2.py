"""Cardiac MRF: joint T1/T2 mapping from prepared FISP blocks.

Cardiac MRF (Hamilton 2017) interleaves magnetization preparations --
an inversion and T2prep composites of different echo times -- with
short ECG-gated FISP readout trains, so one ~16-heartbeat scan encodes
both T1 (via the IR/recovery dynamics) and T2 (via the T2prep
attenuations).  The whole schedule is plain operators; the engine's
composite-GRE matcher folds it into ONE fused VMEM pass (the prep
stages break the exact-FISP periodicity, so this family is exactly
what `match_composite` exists for), and the tracked train with
Adc/Jacobian probes routes to the fused composite *Jacobian* kernel
for the Gauss-Newton refinement stage.

Pipeline (the standard MRF workflow):
1. simulate a (T1, T2) dictionary through `simulate()` (fused kernel);
2. match noisy off-grid voxels (complex PD) -> grid (T1, T2);
3. refine off-grid with damped GN on the fused Jacobian dispatch
   (dS/d(T1, T2) for all voxels in one device pass per iteration;
   per-voxel complex PD solved in closed form).

Reference anchor: epgpy expresses such trains op-by-op in NumPy
(reference epgpy/transition.py, evolution.py, shift.py) with no fused
path and no batched GN machinery.

Env knobs: CMRF_NBEAT (8), CMRF_NREAD (32), CMRF_NT1 (20),
CMRF_NT2 (16), CMRF_NVOX (48), CMRF_ITERS (6).
"""

import os
import time

import numpy as np

import epgpy_tpu as epg
from epgpy_tpu.parallel import dictionary_match, gauss_newton_refine

NBEAT = int(os.environ.get("CMRF_NBEAT", 8))
NREAD = int(os.environ.get("CMRF_NREAD", 32))
NT1 = int(os.environ.get("CMRF_NT1", 20))
NT2 = int(os.environ.get("CMRF_NT2", 16))
NVOX = int(os.environ.get("CMRF_NVOX", 48))
ITERS = int(os.environ.get("CMRF_ITERS", 6))

TE, TRG = 1.4, 5.1               # FISP readout timing (ms)
RR = 800.0                       # R-R interval (ms)

# per-heartbeat preparation schedule, cycled: inversion (TI 21 ms),
# none, T2prep(30), T2prep(50), none, T2prep(80), ... (Hamilton 2017)
PREPS = ["ir", None, "t2prep30", "t2prep50", None, "t2prep80"]


def cardiac_train(T1, T2, track=None):
    """NBEAT prepared FISP blocks as plain operators (batched T1/T2)."""
    o1 = {"order1": track} if track else {}
    rng = np.random.default_rng(2)
    seq = []
    used = 0.0
    for b in range(NBEAT):
        prep = PREPS[b % len(PREPS)]
        used = 0.0
        if prep == "ir":
            seq += [epg.T(180.0, 0.0), epg.E(21.0, T1, T2, **o1)]
            used += 21.0
        elif prep and prep.startswith("t2prep"):
            tep = float(prep[6:])
            # 90x - E - 180y - E - 90-x composite (crusher after)
            seq += [epg.T(90.0, 0.0), epg.E(tep / 2, T1, T2, **o1),
                    epg.T(180.0, 90.0), epg.E(tep / 2, T1, T2, **o1),
                    epg.T(90.0, 180.0), epg.S(1)]
            used += tep
        # variable-flip FISP readout (sinusoidal ramp per beat)
        fas = 4.0 + 11.0 * np.sin(np.pi * (np.arange(NREAD) + 1)
                                  / (NREAD + 1)) + rng.uniform(
                                      -0.5, 0.5, NREAD)
        for i in range(NREAD):
            seq += [epg.T(float(fas[i]), 0.0),
                    epg.E(TE, T1, T2, **o1), epg.ADC,
                    epg.E(TRG - TE, T1, T2, **o1), epg.S(1)]
        used += NREAD * TRG
        seq += [epg.E(max(RR - used, 50.0), T1, T2, **o1)]  # to next R
    return seq


def main():
    rng = np.random.default_rng(23)

    # dictionary over a (T1, T2) grid (T2 < T1 physical constraint)
    t1g = np.linspace(300.0, 2000.0, NT1)
    t2g = np.geomspace(20.0, 250.0, NT2)
    grid = np.stack(np.meshgrid(t1g, t2g, indexing="ij"), -1).reshape(-1, 2)
    grid = grid[grid[:, 1] < 0.8 * grid[:, 0]]
    t0 = time.perf_counter()
    sig = np.asarray(epg.simulate(
        cardiac_train(grid[:, 0], grid[:, 1]), max_nstate=10))
    D = np.ascontiguousarray(sig.T)                   # (atoms, P)
    D /= np.linalg.norm(D, axis=1, keepdims=True)
    print(f"dictionary: {len(grid)} atoms x {sig.shape[0]} readouts "
          f"in {time.perf_counter() - t0:.2f} s")

    # off-grid voxels with complex PD and noise
    t1_true = rng.uniform(350.0, 1900.0, NVOX)
    t2_true = np.minimum(rng.uniform(25.0, 220.0, NVOX), 0.6 * t1_true)
    obs = np.asarray(epg.simulate(
        cardiac_train(t1_true, t2_true), max_nstate=10)).T
    pd = (rng.uniform(0.6, 1.2, NVOX)
          * np.exp(2j * np.pi * rng.uniform(size=NVOX)))
    obs = obs * pd[:, None]
    obs += rng.normal(0.0, 3e-4, obs.shape) * (1 + 1j)

    nobs = obs / np.linalg.norm(obs, axis=1, keepdims=True)
    idx, corr = dictionary_match(
        D.real.astype(np.float32), D.imag.astype(np.float32),
        nobs.real.astype(np.float32), nobs.imag.astype(np.float32))
    fit = grid[np.asarray(idx)]
    err0 = (np.sqrt(np.mean((fit[:, 0] - t1_true) ** 2)),
            np.sqrt(np.mean((fit[:, 1] - t2_true) ** 2)))
    print(f"match-only RMSE: T1={err0[0]:.1f} ms, T2={err0[1]:.1f} ms "
          f"(grid steps {t1g[1]-t1g[0]:.0f} / ~{t2g[1]-t2g[0]:.0f}+ ms, "
          f"min corr {np.asarray(corr).min():.4f})")

    # GN refinement on the fused composite-Jacobian dispatch
    def signal_and_jac(theta):
        out = epg.simulate(
            cardiac_train(theta[0], theta[1], track=["T1", "T2"]),
            max_nstate=10,
            probe=[epg.ADC, epg.Jacobian(["T1", "T2"])], asarray=False)
        sig_, jac_ = out
        return ((sig_["__c_re"], sig_["__c_im"]),
                (jac_["__c_re"], jac_["__c_im"]))

    t0 = time.perf_counter()
    theta = gauss_newton_refine(
        signal_and_jac, fit.T.copy(), obs.T.real, obs.T.imag,
        iters=ITERS, bounds=[(200.0, 2500.0), (10.0, 400.0)],
        solve_scale=True)
    err1 = (np.sqrt(np.mean((theta[0] - t1_true) ** 2)),
            np.sqrt(np.mean((theta[1] - t2_true) ** 2)))
    print(f"refined    RMSE: T1={err1[0]:.1f} ms, T2={err1[1]:.1f} ms "
          f"({ITERS} GN iters, {time.perf_counter() - t0:.2f} s)")
    assert err1[0] < 0.5 * err0[0], (err1, err0)
    assert err1[1] < 0.5 * err0[1], (err1, err0)
    print("cardiac MRF T1/T2 mapping OK")


if __name__ == "__main__":
    main()
