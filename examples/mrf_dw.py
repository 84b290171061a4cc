"""Diffusion-weighted MR fingerprinting: joint (T1, T2, ADC) mapping.

A DW-FISP train (unit spoiler + Stejskal-Tanner attenuation each TR,
Jiang 2017-style) encodes diffusivity alongside relaxation.  Per-atom
D is a KERNEL-level axis (`fisp_dictionary_pallas(diffusion=...)`):
the operator API keeps the reference's D semantics (scalar or tensor
per op — per-atom isotropic batches are not expressible there either,
see epgpy/diffusion.py), so the dictionary is generated through the
model API and matched with the compressed-space pipeline.

Sequence-level dispatch of scalar-D trains is exercised in
tests/test_dwfisp_dispatch.py; this example is the dictionary-scale
use of the same kernel.
"""

import os

import numpy as np
import jax.numpy as jnp

from epgpy_tpu.models.pallas_fisp import fisp_dictionary_pallas
from epgpy_tpu.parallel import (dictionary_match, compress_dictionary,
                                project_signals)


def main():
    P = int(os.environ.get("DW_NPULSE", 300))
    n = int(os.environ.get("DW_NGRID", 12))
    nd = int(os.environ.get("DW_ND", 8))
    interpret = os.environ.get("DW_INTERPRET", "0") == "1"

    rng = np.random.default_rng(0)
    FA = 10 + 50 * np.abs(np.sin(np.arange(P) * 2 * np.pi / 120))
    TR, TE, tau = 12.0, 5.0, 7.0
    # a REAL diffusion gradient, not an imaging crusher: gamma * G * tau
    # with G = 40 mT/m over 7 ms -> k ~ 7.5e4 rad/m, i.e. b ~ 39 s/mm^2
    # at k-order 1 and k^2-scaled beyond (stimulated-echo pathways carry
    # hundreds).  An imaging-scale kvalue (2pi/mm ~ 6e3 rad/m) gives
    # b ~ 0.3 s/mm^2 -- diffusion then changes the fingerprint by ~1e-4
    # and the D axis is unencoded (measured: matches collapse to the
    # lowest-D atom under 1e-3 noise).
    kvalue = 2.675e8 * 40e-3 * tau * 1e-3   # rad/m
    bbase = tau * 1e-3 * (kvalue * 1e-3) ** 2

    # (T1, T2, D) grid, flattened to the kernel atom axis
    T1 = np.linspace(300, 1800, n)
    T2 = np.linspace(30, 150, n)
    Dv = np.linspace(0.2e-3, 2.8e-3, nd)   # mm^2/s (ADC range in vivo)
    g = np.stack(np.meshgrid(T1, T2, Dv, indexing="ij"), -1).reshape(-1, 3)
    B = len(g)
    print(f"dictionary: {B} atoms ({n} T1 x {n} T2 x {nd} D) x {P} pulses")

    re, im = fisp_dictionary_pallas(
        FA, 90.0, TR, TE, g[:, 0], g[:, 1], np.ones(B),
        nstate=10, diffusion=(bbase, bbase, g[:, 2]),
        normalize=True, interpret=interpret,
        btile=256 if interpret else 512)

    comp = compress_dictionary(re, im, int(os.environ.get("DW_RANK", 32)))
    print(f"SVD energy {comp['energy']:.6f}")

    picks = rng.integers(0, B, 6)
    s_re = np.asarray(re)[picks] + 1e-3 * rng.normal(size=(6, P))
    s_im = np.asarray(im)[picks] + 1e-3 * rng.normal(size=(6, P))
    cs = project_signals(comp["basis_re"], comp["basis_im"],
                         jnp.asarray(s_re), jnp.asarray(s_im))
    idx, corr = dictionary_match(comp["cdict_re"], comp["cdict_im"],
                                 cs[0], cs[1])
    idx = np.asarray(idx)
    print("true:     ", g[picks].round(4).tolist())
    print("recovered:", g[idx].round(4).tolist())
    # within one grid step per parameter
    ri = np.stack([idx // (n * nd), (idx // nd) % n, idx % nd], -1)
    ti = np.stack([picks // (n * nd), (picks // nd) % n, picks % nd], -1)
    assert (np.abs(ri - ti) <= 1).all(), "recovery beyond one grid step"
    assert (idx == picks).mean() >= 0.5

    # --- off-grid refinement: joint (T1, T2, D) Gauss-Newton with the
    # 4-column DW Jacobian kernel (dS/dD is a kernel tangent group; the
    # reference's D op has no derivatives at all).  The same columns
    # are reachable from the operator level (r5): a DW train whose D
    # op carries order1=["Dcoef"] routes simulate() Jacobian probes to
    # this kernel (tests/test_d_dispatch.py); the direct model call is
    # kept here because GN iterations rebuild the op list every step,
    # and the model entry skips the per-iteration host-side matching.
    from epgpy_tpu.models.pallas_fisp import fisp_jacobian_pallas

    # IR prep: constant-TR FISP without inversion encodes T1 weakly
    # (the (T1, T2, D) GN trades T1 against D on short trains); the
    # kernel seeds the prep's tangents in closed form
    nv, TI = 8, 20.0
    T1t = rng.uniform(450, 1700, nv)
    T2t = np.minimum(rng.uniform(40, 140, nv), 0.6 * T1t)
    Dt = rng.uniform(0.4e-3, 2.5e-3, nv)
    t_re, t_im = fisp_dictionary_pallas(
        FA, 90.0, TR, TE, T1t, T2t, np.ones(nv), nstate=10,
        diffusion=(bbase, bbase, Dt), inversion=TI, interpret=interpret,
        btile=256 if interpret else 512)
    meas = (np.asarray(t_re) + 1j * np.asarray(t_im)).T    # (P, nv)
    meas += 5e-4 * (rng.normal(size=meas.shape)
                    + 1j * rng.normal(size=meas.shape))

    # init from a coarse IR-dictionary match (the serving pipeline's
    # own first stage) -- a flat init stalls on short trains
    ir_re, ir_im = fisp_dictionary_pallas(
        FA, 90.0, TR, TE, g[:, 0], g[:, 1], np.ones(B), nstate=10,
        diffusion=(bbase, bbase, g[:, 2]), inversion=TI,
        normalize=True, interpret=interpret,
        btile=256 if interpret else 512)
    comp_ir = compress_dictionary(ir_re, ir_im,
                                  int(os.environ.get("DW_RANK", 32)))
    ms = project_signals(comp_ir["basis_re"], comp_ir["basis_im"],
                         jnp.asarray(np.ascontiguousarray(meas.real.T)),
                         jnp.asarray(np.ascontiguousarray(meas.imag.T)))
    idx0, _ = dictionary_match(comp_ir["cdict_re"], comp_ir["cdict_im"],
                               ms[0], ms[1])
    theta0 = np.ascontiguousarray(g[np.asarray(idx0)].T)   # (3, nv)

    def signal_and_jac(theta):
        (r0, i0), (jr, ji) = fisp_jacobian_pallas(
            FA, 90.0, TR, TE, theta[0], theta[1], np.ones(nv),
            nstate=10, diffusion=(bbase, bbase, theta[2]),
            inversion=TI, track_diffusivity=True, interpret=interpret,
            btile=256 if interpret else 512)
        # (T1, T2, D) columns in (P, nv, 3) layout for the solver
        jr = np.swapaxes(np.asarray(jr)[..., [0, 1, 3]], 0, 1)
        ji = np.swapaxes(np.asarray(ji)[..., [0, 1, 3]], 0, 1)
        return ((np.asarray(r0).T, np.asarray(i0).T), (jr, ji))

    from epgpy_tpu.parallel import gauss_newton_refine
    theta = gauss_newton_refine(
        signal_and_jac, theta0, meas.real, meas.imag, iters=10,
        bounds=[(200.0, 3000.0), (20.0, 300.0), (0.1e-3, 3.2e-3)])
    errs = (np.abs(theta[0] - T1t).max(), np.abs(theta[1] - T2t).max(),
            np.abs(theta[2] - Dt).max())
    print(f"GN refine: |dT1|<{errs[0]:.2f} ms, |dT2|<{errs[1]:.3f} ms, "
          f"|dD|<{errs[2]:.2e} mm^2/s")
    assert errs[0] < 8.0 and errs[1] < 1.5 and errs[2] < 6e-5, errs


if __name__ == "__main__":
    main()
