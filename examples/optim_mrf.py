"""Constrained CRLB optimization of a 400-TR MRF sequence (800 parameters).

Mirrors reference examples/sequence/optim_mrf.py:39-156: minimize the
(magnitude, T1, T2) CRLB over per-pulse flip angles AND repetition times,
with box constraints FA in [10, 60] deg, TR in [11, 16] ms and the
|dFA| < 1 smoothness constraint (soft penalty here).

TPU-native redesign: the reference drives 800 parameters through SLSQP
with an analytically-accumulated Hessian (~800 derivative state matrices
propagated per call).  Here the loss is the sharded-atom mean CRLB and its
800-parameter gradient is ONE reverse-mode pass through the compiled scan
(epgpy_tpu/parallel/crlb.py:mrf_design_step); constraints are a projection
after each step.  Atoms shard over the ``atoms`` mesh axis.

Env knobs: MRF_NTR (400), MRF_STEPS (30), MRF_ATOMS (16).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

if os.environ.get("MRF_CPU"):
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

from epgpy_tpu.parallel import (make_mesh, mrf_design_step,  # noqa: E402
                                mrf_design_slsqp)
from epgpy_tpu.parallel.crlb import FA_BOUNDS, TR_BOUNDS  # noqa: E402

nTR = int(os.environ.get("MRF_NTR", 400))
STEPS = int(os.environ.get("MRF_STEPS", 30))
NATOMS = int(os.environ.get("MRF_ATOMS", 16))
# MRF_SOLVER=slsqp (default: the reference's exact solver, hard
# constraints) or pg (projected gradient, soft smoothness penalty)
SOLVER = os.environ.get("MRF_SOLVER", "slsqp")
MAXITER = int(os.environ.get("MRF_MAXITER", 250))
# MRF_ENGINE=fused: value + full 2P-parameter gradient from ONE fused
# per-pulse Hessian kernel launch per SLSQP iteration (~ms-scale at
# 400 TR; models/pallas_hessian) instead of the reverse-mode scan
ENGINE = os.environ.get("MRF_ENGINE", "scan")


def initial_train(n):
    """Reference-style init: sine FA ramp + smooth TR noise
    (reference optim_mrf.py:103-130)."""
    rng = np.random.RandomState(0)
    nFA = 300
    FA = []
    for _ in range(n // nFA + 1):
        ramp = np.sin(np.arange(1, 1 + nFA) * np.pi / nFA) * 50 + 10
        ramp[-10:] = 10
        FA.extend(ramp.tolist())
    FA = np.clip(FA[:n], *FA_BOUNDS)
    knots = rng.uniform(11.5, 14.5, n // 10 + 2)
    x = np.arange(n) / 10.0
    i = x.astype(int)
    s = x - i
    TR = knots[i] * (1 - (3 * s**2 - 2 * s**3)) + knots[i + 1] * (3 * s**2 - 2 * s**3)
    return np.asarray(FA), np.clip(TR, *TR_BOUNDS)


def main():
    try:
        devices = jax.devices("cpu") if os.environ.get("MRF_CPU") else jax.devices()
    except RuntimeError:
        devices = jax.devices()
    mesh = make_mesh(devices, axes=("atoms",))
    natoms = max(NATOMS // len(devices), 1) * len(devices)

    rng = np.random.default_rng(1)
    T1s = jnp.asarray(rng.uniform(400.0, 1600.0, natoms))
    T2s = jnp.asarray(rng.uniform(40.0, 120.0, natoms))

    FA0, TR0 = initial_train(nTR)
    FA, TR = jnp.asarray(FA0), jnp.asarray(TR0)

    print(f"Optimize MRF sequence: nTR={nTR}, params={2 * nTR}, "
          f"atoms={natoms} on {len(devices)} devices, solver={SOLVER}")
    tic = time.time()
    losses = []
    if SOLVER == "slsqp":
        # reference fidelity: SLSQP, hard |dFA| <= 1 + box constraints
        # (reference examples/sequence/optim_mrf.py:119-156), run to
        # convergence (ftol 1e-6 / MRF_MAXITER iterations)
        from epgpy_tpu.parallel import mrf_design_loss

        # must be jitted: eager shard_map raises UNIMPLEMENTED on the
        # axon TPU backend (the solver's own value_and_grad is jitted
        # inside mrf_design_slsqp)
        if ENGINE == "fused":
            from epgpy_tpu.parallel import mrf_design_loss_grad_fused
            loss_fn = jax.jit(lambda fa, tr: mrf_design_loss_grad_fused(
                fa, tr, T1s, T2s, mesh, nstate=10)[0])
        else:
            loss_fn = jax.jit(lambda fa, tr: mrf_design_loss(
                fa, tr, T1s, T2s, mesh, nstate=10))

        def cb(x):
            losses.append(float(loss_fn(jnp.asarray(x[:nTR]),
                                        jnp.asarray(x[nTR:]))))
            it = len(losses)
            if it % 10 == 0:
                print(f"({it}) crlb={losses[-1]:.6f} "
                      f"(elapsed {time.time() - tic:.0f}s)")

        losses.append(float(loss_fn(FA, TR)))
        FA_h, TR_h, res = mrf_design_slsqp(
            FA0, TR0, T1s, T2s, mesh, maxiter=MAXITER, nstate=10,
            engine=ENGINE, callback=cb)
        print(f"SLSQP: {res.message} after {res.nit} iterations")
        dFA = np.diff(FA_h, prepend=FA_h[0])
        if res.status == 0:
            assert np.abs(dFA).max() <= 1.0 + 1e-9, "hard |dFA|<=1 violated"
        elif np.abs(dFA).max() > 1.0 + 1e-9:
            print(f"NOTE: run truncated before feasibility "
                  f"(max|dFA|={np.abs(dFA).max():.3f}); raise MRF_MAXITER")
    else:
        step = jax.jit(lambda fa, tr: mrf_design_step(
            fa, tr, T1s, T2s, mesh, nstate=10, smooth_weight=1e-3,
            lr_fa=2.0, lr_tr=0.1))
        for it in range(STEPS):
            FA, TR, loss = step(FA, TR)
            losses.append(float(loss))
            if it % 5 == 0 or it == STEPS - 1:
                print(f"({it}) crlb={losses[-1]:.6f} "
                      f"(elapsed {time.time() - tic:.0f}s)")
        FA_h, TR_h = np.asarray(FA), np.asarray(TR)
    dur = time.time() - tic

    assert FA_h.min() >= FA_BOUNDS[0] - 1e-9 and FA_h.max() <= FA_BOUNDS[1] + 1e-9
    assert TR_h.min() >= TR_BOUNDS[0] - 1e-9 and TR_h.max() <= TR_BOUNDS[1] + 1e-9
    print(json.dumps({
        "metric": "mrf_design_crlb", "initial": round(losses[0], 4),
        "final": round(losses[-1], 4), "solver": SOLVER, "engine": ENGINE,
        "iters": len(losses), "nTR": nTR,
        "nparams": 2 * nTR, "seconds": round(dur, 1),
        "max_abs_dFA": round(float(np.abs(np.diff(FA_h)).max()), 4),
    }))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(3, 1, figsize=(8, 8))
        axes[0].plot(losses), axes[0].set_ylabel("CRLB")
        axes[1].plot(FA0, "--", label="init"), axes[1].plot(FA_h, label="opt")
        axes[1].set_ylabel("FA (deg)"), axes[1].legend()
        axes[2].plot(TR0, "--"), axes[2].plot(TR_h)
        axes[2].set_ylabel("TR (ms)")
        fig.savefig("optim_mrf.png", dpi=100)
    except ImportError:
        pass


if __name__ == "__main__":
    main()
