"""Closed-form diffusion attenuation tests (Stejskal-Tanner algebra).

The golden files pin reference parity; these tests pin the PHYSICS with
hand-computed b-values (reference test/test_diffusion.py:107-199):
b = integral k(t) k(t)^T dt with the 1/3 ramp term, attenuation
exp(-Tr(b D)), anisotropic tensors contracted elementwise.
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu.ops.diffusion import compute_bmatrix, diffusion_operator


def test_bmatrix_constant_and_ramp():
    """Constant k: b = tau k k^T.  Ramp k1 -> k2 adds the 1/3 term."""
    # constant: tau=1 ms, k = 1e3 rad/m = 1 rad/mm -> b = 1e-3 s/mm^2
    b = np.asarray(compute_bmatrix(1.0, [1e3]))
    assert np.allclose(b, 1e-3)
    # pure ramp 0 -> k: b = tau k^2 / 3
    b = np.asarray(compute_bmatrix(1.0, [0.0], [1e3]))
    assert np.allclose(b, 1e-3 / 3)
    # general ramp: tau (k1^2 + k1 dk + dk^2/3)
    b = np.asarray(compute_bmatrix(1.0, [1e3], [3e3]))
    expected = 1e-3 * (1.0 + 1.0 * 2.0 + 4.0 / 3.0)
    assert np.allclose(b, expected)
    # 2-D outer products
    b = np.asarray(compute_bmatrix(2.0, [[1e3, 2e3]]))
    assert np.allclose(b[0], 2e-3 * np.outer([1, 2], [1, 2]))


def test_diffusion_operator_tensor_contraction():
    """Tensor D contracts elementwise: exp(-sum(b * D))."""
    bL = np.asarray(compute_bmatrix(1.0, [[1e3, 1e3]]))
    bT = np.asarray(compute_bmatrix(1.0, [[1e3, 0.0]], [[1e3, 1e3]]))
    Dmat = np.diag([1.0, 2.0])
    DL, DT = diffusion_operator(bL, bT, Dmat)
    assert np.allclose(np.asarray(DL), np.exp(-np.sum(bL * Dmat, axis=(-2, -1))))
    assert np.allclose(np.asarray(DT), np.exp(-np.sum(bT * Dmat, axis=(-2, -1))))


def _f0(sm):
    return complex(np.asarray(sm.F0).ravel()[0])


def test_D_no_gradient_no_attenuation():
    """At k=0 with no gradient there is nothing to diffuse away."""
    sm = epg.StateMatrix([1, 1, 0], kvalue=1e5)
    out = epg.D(1.0, 1e-3)(sm)
    assert np.allclose(np.asarray(out.states), np.asarray(sm.states))


def test_D_instantaneous_gradient():
    """S(1); D(tau); S(-1): att = exp(-k^2 tau D) (b in s/mm^2)."""
    kval = 1e5
    sm = epg.StateMatrix([1, 1, 0], nstate=2, kvalue=kval)
    sm = epg.S(-1)(epg.D(1.0, 1e-3)(epg.S(1)(sm)))
    att = np.exp(-(kval**2) * 1.0 * 1e-3 * 1e-9)
    assert np.isclose(_f0(sm), att)


def test_D_during_gradient_one_third():
    """D(tau, k=1) right after S(1): ramp 0 -> k gives b = tau k^2 / 3."""
    kval = 1e5
    sm = epg.StateMatrix([1, 1, 0], nstate=2, kvalue=kval)
    sm = epg.S(-1)(epg.D(1.0, 1e-3, k=1)(epg.S(1)(sm)))
    att = np.exp(-(kval**2) * (1.0 / 3.0) * 1.0 * 1e-3 * 1e-9)
    assert np.isclose(_f0(sm), att)


def _spin_echo(shift_k, d_during, d_free, kvalue):
    """90 - [S, D_during, D_free] - 180 - [D_free, S, D_during] echo."""
    from epgpy_tpu.ops.shiftnd import _intdtype

    exc, ref = epg.T(90, 90), epg.T(180, 0)
    shift = epg.S(shift_k)
    sm = epg.StateMatrix(nstate=4, kvalue=kvalue)
    if not isinstance(shift_k, int):
        sm = sm.setup_coords(np.asarray(shift_k).shape[-1])
        sm = sm.update(coords=sm.coords.astype(_intdtype()))
    for op in [exc, shift, d_during, d_free, ref, d_free, shift, d_during]:
        sm = op(sm)
    return sm


def test_spin_echo_1d_closed_form():
    """Full SE: att = exp(-2/3 k^2 tau1 D) exp(-2 k^2 tau2 D)."""
    kval, Dmm = 1e4, 1e-3
    d1 = epg.D(1.0, Dmm, k=1)
    d2 = epg.D(0.2, Dmm)
    sm = _spin_echo(1, d1, d2, kval)
    Dm = Dmm * 1e-9  # mm^2/s -> m^2/ms
    att = np.exp(-2 / 3 * kval**2 * 1.0 * Dm) * np.exp(-2 * kval**2 * 0.2 * Dm)
    assert np.isclose(_f0(sm), att)


def test_spin_echo_2d_isotropic_matches_scalar():
    """2-D isotropic tensor == scalar D on the same SE experiment."""
    kval, Dmm = 1e4, 1.0
    d1 = epg.D(1.0, np.diag([Dmm, Dmm]), k=[1, 0])
    d2 = epg.D(0.2, np.diag([Dmm, Dmm]))
    sm = _spin_echo(np.array([[1, 0]]), d1, d2, kval)
    Dm = Dmm * 1e-9
    att = np.exp(-2 / 3 * kval**2 * 1.0 * Dm) * np.exp(-2 * kval**2 * 0.2 * Dm)
    assert np.isclose(_f0(sm), att)


def test_spin_echo_2d_anisotropic_bsum():
    """Anisotropic SE attenuation equals the summed b-matrix contraction."""
    kval = 1e4
    Dmat = np.diag([1.0, 2.0])
    d1 = epg.D(1.0, Dmat, k=[1, 1])
    d2 = epg.D(0.2, Dmat)
    sm = _spin_echo(np.array([[1, 1]]), d1, d2, kval)

    k = kval
    bT = (np.asarray(compute_bmatrix(1.0, [0.0, 0.0], [k, k]))
          + np.asarray(compute_bmatrix(0.2, [k, k]))
          + np.asarray(compute_bmatrix(0.2, [-k, -k]))
          + np.asarray(compute_bmatrix(1.0, [-k, -k], [0.0, 0.0])))
    att = np.exp(-np.sum(bT * Dmat, axis=(-2, -1)))
    assert np.isclose(_f0(sm), att.ravel()[0])


def test_rare_diffusion_golden():
    """RARE diffusion-trap sweep (Weigel 2010) matches the reference
    bit-near-exactly (examples/rare_diffusion.py)."""
    import os
    import runpy
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "rare_diffusion.npz"))
    ns = runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "rare_diffusion.py"))
    sig = ns["rare_signals"](g["angles"], etl=6, diffusion=True)
    sig0 = ns["rare_signals"](g["angles"], etl=6, diffusion=False)
    assert np.abs(sig - g["signal"]).max() < 1e-12
    assert np.abs(sig0 - g["signal_nodiff"]).max() < 1e-12
    # the diffusion trap: b-factor rises as the refocusing angle drops
    b = -np.log(np.abs(sig / sig0)) / 1e-3
    assert b[0] > b[-1] > 0


@pytest.mark.slow
def test_ssfp_dwi_golden():
    """Anisotropic-D SSFP with conventional vs quasi-isotropic diffusion
    lobes (Gao 2021 part 3.2) matches the reference over 30 TRs.  The
    ~5e-7 tolerance is the accumulated effect of the reference pruning
    near-zero merge cells that our fixed-capacity ladder keeps (their
    weighted-mean wavenumbers differ in the last few ulps per TR)."""
    import os
    import runpy
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "ssfp_dwi.npz"))
    ns = runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "ssfp_diffusion.py"))
    s0 = ns["ssfp_dwi_signals"](nrf=30, npos=51, scheme="conventional")
    sq = ns["ssfp_dwi_signals"](nrf=30, npos=51, scheme="quasi-isotropic")
    assert np.abs(s0 - g["conventional"]).max() < 5e-6
    assert np.abs(sq - g["quasi_isotropic"]).max() < 5e-6
    # the alternating-axis scheme weights the second principal diffusivity
    # and dephases differently: the profiles differ by design
    assert np.abs(sq[-2] - s0[-2]).max() > 0.01


def test_D_preserves_ladder_symmetry():
    """F-(k) = conj(F+(-k)) holds after anisotropic diffusion."""
    from epgpy_tpu.ops.shiftnd import _intdtype

    sm = epg.StateMatrix(nstate=3, kvalue=1e4)
    sm = sm.setup_coords(2)
    sm = sm.update(coords=sm.coords.astype(_intdtype()))
    sm = epg.T(60, 30)(sm)
    sm = epg.S(np.array([[1, 2]]))(sm)
    sm = epg.D(1.0, np.diag([1.0, 3.0]))(sm)
    states = np.asarray(sm.states)
    assert np.allclose(states, states[..., ::-1, :][..., (1, 0, 2)].conj())
