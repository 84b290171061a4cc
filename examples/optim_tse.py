"""SAR-constrained variable-flip TSE design via the fused CPMG kernel.

The TSE design tension (Busse 2006 variable-flip trains): T2 precision
wants large refocusing angles, SAR (~ sum of FA^2) wants small ones.
This example designs per-echo flip angles that minimize the mean
(magnitude, T1, T2)-CRLB over a tissue grid subject to a HARD SAR
budget well below the constant-180 train, with scipy SLSQP driven by
`parallel.tse_design_slsqp`: each iteration's cost AND full per-echo
gradient come from ONE `cpmg_design_pallas(second_order=True)` launch
(J = dS/d(mag, T1, T2) plus the mixed d2S/(dT_c dFA_i) terms the CRLB
gradient needs — the MSE analog of the flagship MRF design kernel).

The reference can only express this with ~3E alias-tracked derivative
state matrices propagated op-by-op per SLSQP iteration
(epgpy diff.py chain; examples/differentiation/optim_mse.py scans a
scalar ESP instead because of that cost).

Env knobs: TSE_NECHO (32), TSE_ITERS (60).
"""

import os
import time

import numpy as np

import epgpy_tpu  # noqa: F401  (config side effects)
import jax
from epgpy_tpu.parallel import mse_design_loss_grad_fused, tse_design_slsqp

NECHO = int(os.environ.get("TSE_NECHO", 32))
ITERS = int(os.environ.get("TSE_ITERS", 60))

# tissue grid (T1, T2) in ms: WM / GM / CSF-ish spread
T1s = np.asarray([800.0, 1200.0, 1600.0, 1100.0], np.float32)
T2s = np.asarray([70.0, 95.0, 140.0, 55.0], np.float32)

_DEV = jax.config.jax_default_device or jax.devices()[0]
_INTERPRET = getattr(_DEV, "platform", _DEV) == "cpu"


def main():
    ESP = np.full(NECHO, 8.0, np.float32)
    FA0 = np.full(NECHO, 120.0, np.float32)
    kw = dict(nstate=2 * NECHO, interpret=_INTERPRET)

    # SAR budget: 70% of the initial constant-120 train (infeasible to
    # just keep the start point - SLSQP must reshape the train)
    sar0 = float(np.mean((FA0 / 180.0) ** 2))
    budget = 0.7 * sar0

    # jit the standalone evaluations: eagerly, each complex op inside
    # the CRLB contraction would cross an XLA program boundary (the
    # axon backend rejects that; tse_design_slsqp jits internally)
    loss_of = jax.jit(lambda fa: mse_design_loss_grad_fused(
        fa, ESP, T1s, T2s, **kw)[0])
    v0 = float(loss_of(FA0))
    t0 = time.perf_counter()
    FA, _, res = tse_design_slsqp(
        FA0, ESP, T1s, T2s, maxiter=ITERS, fix_esp=True,
        fa_bounds=(40.0, 180.0), sar_budget=budget, dfa_max=25.0, **kw)
    dt = time.perf_counter() - t0
    v1 = float(loss_of(np.asarray(FA, np.float32)))
    sar1 = float(np.mean((FA / 180.0) ** 2))

    print(f"SLSQP: {res.message} after {res.nit} iterations ({dt:.1f} s)")
    print(f"CRLB: start {v0:.4g} (SAR {sar0:.4f}) -> designed {v1:.4g} "
          f"(SAR {sar1:.4f}, budget {budget:.4f})")
    print("flips:", np.round(FA, 1))

    # the designed train must respect the hard constraints and beat the
    # best CONSTANT train at the same SAR budget (the naive remedy:
    # FA = 120 * sqrt(0.7))
    assert sar1 <= budget * 1.001
    assert np.all(np.abs(np.diff(FA)) <= 25.0 + 1e-3)   # solver slack
    fa_flat = np.full(NECHO, float(FA0[0]) * np.sqrt(0.7), np.float32)
    v_flat = float(loss_of(fa_flat))
    print(f"constant train at the same SAR: {v_flat:.4g}")
    assert v1 < v_flat, (v1, v_flat)

    try:
        from matplotlib import pyplot as plt
    except ImportError:
        return
    fig, ax = plt.subplots(figsize=(7, 3.5), num="tse-design")
    ax.plot(np.arange(NECHO) + 1, FA, "o-", label="designed")
    ax.axhline(float(FA0[0]), ls="--", c="gray", label="start (120)")
    ax.axhline(fa_flat[0], ls=":", c="gray",
               label="constant @ SAR budget")
    ax.set(xlabel="echo", ylabel="refocusing flip (deg)",
           title="SAR-constrained variable-flip TSE (CRLB design)")
    ax.legend()
    fig.tight_layout()
    fig.savefig("tse_design.png", dpi=120)
    print("wrote tse_design.png")


if __name__ == "__main__":
    main()
