"""Joint (T2, B1) mapping through the OPERATOR-LEVEL Jacobian dispatch.

The r5 route (VERDICT r4 #5): a B1-mapping train built from plain
operators — flips ``T(FA_i * B1, phi, order1={"B1": {"alpha": FA_i}})``
(the chain-rule coefficient IS the nominal flip, matching the
reference's ``att`` attenuation semantics in
/root/reference/epgpy/functions.py:316-347) plus canonically tracked
E ops — routes ``simulate()`` Jacobian probes straight to the fused
CPMG primal+tangent Pallas kernel, dB1 column included.  No
model-level API needed: this is the same physics as
``examples/mse_t2_b1_mapping.py`` driven entirely through public
operators.

Physics reminder (same as the model-level example): a 180° train is
first-order STATIONARY in B1 (dS/dB1 = 0 at B1 = 1) and symmetric
under B1 → 2−B1, so B1 is identifiable only below nominal — fit with
B1 < 1 ground truth and init at B1 ≈ 0.8.

Env: B1MAP_NECHO / B1MAP_NVOX to shrink (tests).
"""

import os

import numpy as np

import jax

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch

# on TPU/f32 the dispatch engages by itself; on CPU "force" runs the
# same kernels in Pallas interpret mode so the route is demonstrable
# anywhere (tests run this example on the CPU backend)
_DEV = jax.config.jax_default_device or jax.devices()[0]
_KERNEL = ("force" if getattr(_DEV, "platform", _DEV) == "cpu"
           else "auto")

NECHO = int(os.environ.get("B1MAP_NECHO", 18))
NVOX = int(os.environ.get("B1MAP_NVOX", 64))
ESP, T1V, EXC = 9.5, 1400.0, 90.0


def build_train(T2, B1, track=False):
    """Variable-flip TSE train with per-voxel refocusing attenuation.

    Varying the nominal flips (120-170 deg) decorrelates the T2 decay
    from the B1-dependent stimulated-echo pathways -- a constant-flip
    CPMG leaves (T2, B1) nearly degenerate and the joint GN fit crawls
    (measured: identical slow convergence with planner and dispatch
    columns, so it is physics, not the Jacobian).  Still rank-1
    outer(FA_i, B1), so the fused-kernel matcher stays engaged."""
    fas = 145.0 + 25.0 * np.sin(2.1 * np.arange(NECHO))
    o1e = {"order1": ["T1", "T2"]} if track else {}
    seq = [epg.T(EXC, 90)]
    for i in range(NECHO):
        fa = float(fas[i])
        o1b = {"order1": {"B1": {"alpha": fa}}} if track else {}
        seq += [epg.S(1), epg.E(ESP / 2, T1V, T2, **o1e),
                epg.T(fa * B1, 0, **o1b),
                epg.S(1), epg.E(ESP / 2, T1V, T2, **o1e), epg.ADC]
    return seq


def main():
    rng = np.random.default_rng(0)
    T2_true = rng.uniform(30, 120, NVOX)
    B1_true = rng.uniform(0.65, 0.95, NVOX)

    # "acquired" echo trains (+ noise)
    meas = np.asarray(epg.simulate(build_train(T2_true, B1_true),
                                   fisp_kernel=_KERNEL))
    meas = meas + 2e-4 * (rng.standard_normal(meas.shape)
                          + 1j * rng.standard_normal(meas.shape))

    # Gauss-Newton on (T2, B1) with the Jacobian from simulate() probes
    # and the library's damped solver (per-diagonal relative damping +
    # closed-form complex PD via solve_scale -- the serving idiom)
    from epgpy_tpu.parallel import gauss_newton_refine

    probes = [epg.ADC, epg.Jacobian(["magnitude", "T2", "B1"])]
    routed = []

    def signal_and_jac(theta):
        seq = build_train(theta[0], theta[1], track=True)
        before = fisp_dispatch.DISPATCH_COUNTS.get("jac:mse", 0)
        sig, jac = epg.simulate(seq, probe=probes, asarray=False,
                                fisp_kernel=_KERNEL)
        routed.append(
            fisp_dispatch.DISPATCH_COUNTS.get("jac:mse", 0) > before)
        # dS/d(T2, B1) columns; magnitude col 0 is the signal itself
        return ((sig["__c_re"], sig["__c_im"]),
                (jac["__c_re"][..., 1:], jac["__c_im"][..., 1:]))

    # init: mono-exponential T2 from the log-magnitude echo decay
    # (biased low when B1 < 1 -- stimulated echoes flatten the decay --
    # but close enough for GN; same recipe as mse_t2_b1_mapping.py)
    tes = ESP * (1 + np.arange(NECHO))
    logs = np.log(np.maximum(np.abs(meas), 1e-12))
    slope = np.polyfit(tes, logs, 1)[0]
    t2_init = np.clip(-1.0 / np.minimum(slope, -1e-6), 20.0, 200.0)
    theta0 = np.stack([t2_init, np.full(NVOX, 0.8)])
    theta = gauss_newton_refine(
        signal_and_jac, theta0, meas.real, meas.imag, iters=22,
        bounds=[(15.0, 250.0), (0.4, 1.0)], solve_scale=True)

    t2_rms = float(np.sqrt(np.mean((theta[0] - T2_true) ** 2)))
    b1_rms = float(np.sqrt(np.mean((theta[1] - B1_true) ** 2)))
    print(f"dispatch engaged: {all(routed)}; "
          f"T2 RMSE {t2_rms:.3f} ms, B1 RMSE {b1_rms:.4f}")
    assert all(routed), "B1-tracked train fell off the fused dispatch"
    assert t2_rms < 0.5 and b1_rms < 5e-3, (t2_rms, b1_rms)


if __name__ == "__main__":
    main()
