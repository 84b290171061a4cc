"""Probe behavior matrix (reference test/test_probe.py +
test/test_functions.py:43-76): eval-string locals, Adc attr/phase/weights/
reduce combinations, DFT, probe post-processing, and the hyperecho
invariant across every shift method (reference test/test_shift.py:249-323).
"""

import numpy as np
import pytest

import epgpy_tpu as epg


# -- eval-string probes --


def test_probe_locals_scalars():
    """nstate / ndim / kdim are available inside eval-strings."""
    seq = [epg.T(90, 90), epg.S(1), epg.ADC]
    n = epg.simulate(seq, probe="nstate")
    assert int(np.asarray(n).ravel()[0]) >= 1
    d = epg.simulate(seq, probe="ndim")
    assert int(np.asarray(d).ravel()[0]) == 1


def test_probe_whole_ladder_expressions():
    """Expressions over the full F/Z ladders with the jnp namespace."""
    seq = [epg.T(90, 90), epg.S(1), epg.T(120, 0), epg.S(1), epg.ADC]
    total = epg.simulate(seq, probe="sum(abs(F)**2, axis=-1) + sum(abs(Z)**2, axis=-1)")
    # norm^2 is conserved under T/S
    assert np.allclose(np.asarray(total), 1.0)


def test_probe_k_values():
    """`k` exposes physical wavenumbers (kvalue-scaled)."""
    seq = [epg.T(90, 90), epg.S(1), epg.ADC]
    kmax = epg.simulate(seq, probe="max(abs(k))", kvalue=2.5)
    assert np.allclose(np.asarray(kmax), 2.5)


def test_probe_extra_kwargs_namespace():
    """Keyword arguments extend the eval namespace."""
    seq = [epg.T(90, 90), epg.ADC]
    out = epg.simulate(seq, probe=epg.Probe("F0 * gain", gain=3.0))
    assert np.allclose(np.asarray(out), 3.0)


def test_probe_invalid_object_raises():
    with pytest.raises(TypeError):
        epg.Probe(123)


# -- Adc combinations --


def test_adc_attr_selection():
    seq = [epg.T(30, 90), epg.Adc(attr="Z0")]
    out = epg.simulate(seq)
    assert np.allclose(np.asarray(out), np.cos(np.pi / 6))


def test_adc_phase_and_weights_compose():
    """Phase compensation applies after the weighted reduction."""
    T2s = [30.0, 60.0]
    w = [0.25, 0.75]
    seq = [epg.T(90, 0), epg.E(10, 1000, T2s),
           epg.Adc(phase=90, weights=w, reduce=0)]
    out = np.asarray(epg.simulate(seq))
    decays = np.exp(-10 / np.asarray(T2s))
    expected = 1j * (-1j * np.dot(w, decays))  # F0 = -i decay; +90deg = x i
    assert np.allclose(out, expected)


def test_adc_reduce_multiple_axes():
    """reduce=(0, 1) sums the (att x T2) sweep plane to one sample."""
    T2s = np.linspace(30, 90, 3)[None, :]   # axis 1
    B1 = np.asarray([0.8, 1.0])             # axis 0
    seq = epg.modify([epg.T(90, 90), epg.Wait(10.0), epg.ADC],
                     T2=T2s, att=B1)
    full = np.asarray(epg.simulate(seq))
    assert full.shape[-2:] == (2, 3)
    seq2 = epg.modify([epg.T(90, 90), epg.Wait(10.0),
                       epg.Adc(reduce=(0, 1))], T2=T2s, att=B1)
    red = np.asarray(epg.simulate(seq2))
    assert np.allclose(red.ravel(), full.sum(axis=(-2, -1)).ravel())


# -- hyperecho invariant for every shift method --


def _hyperecho_signal(make_grad, make_grad_rev, **options):
    """alpha train - 180 - reversed negated train refocuses F0 to 1."""
    alphas = [20.0, 35.0, 50.0]
    seq = [epg.T(90, 90)]
    for a, g in zip(alphas, make_grad):
        seq += [g, epg.T(a, 0)]
    seq += [epg.T(180, 0)]
    for a, g in zip(reversed(alphas), make_grad_rev):
        seq += [epg.T(-a, 0), g]
    seq += [epg.ADC]
    return np.asarray(epg.simulate(seq, **options))


def test_hyperecho_shift1d_int():
    gs = [epg.S(1), epg.S(2), epg.S(1)]
    sig = _hyperecho_signal(gs, gs[::-1])
    assert np.allclose(np.abs(sig), 1.0, atol=1e-10)


def test_hyperecho_shiftnd_int():
    ks = [np.array([[1, 0]]), np.array([[0, 2]]), np.array([[1, -1]])]
    gs = [epg.S(k) for k in ks]
    sig = _hyperecho_signal(gs, gs[::-1], max_nstate=80)
    assert np.allclose(np.abs(sig), 1.0, atol=1e-8)


def test_hyperecho_shift_merge_float():
    """Shared float shifts (Gao-2021 gridded merge)."""
    ks = [0.31, 0.54, 0.47]
    gs = [epg.S(k) for k in ks]
    sig = _hyperecho_signal(gs, gs[::-1], max_nstate=200, kgrid=0.002)
    assert np.allclose(np.abs(sig), 1.0, atol=1e-10)


def test_hyperecho_shift_prune_batch_float():
    """Batch-varying float shifts (per-atom independent tables)."""
    ks = [np.array([[0.31], [0.62]]), np.array([[0.54], [0.27]]),
          np.array([[0.47], [0.94]])]
    gs = [epg.S(k) for k in ks]
    sig = _hyperecho_signal(gs, gs[::-1], max_nstate=120, kgrid=0.01)
    assert sig.shape[-1] == 2
    assert np.allclose(np.abs(sig), 1.0, atol=1e-8)


def test_imaging_complex_modulation_b0():
    """System(modulation = R2' + 2j*pi*B0-style) applies exp(-|t| Re) decay
    AND a B0 phase ramp exp(2j pi Im t) through the accumulated-time
    coordinate (reference epgpy/utils.py:63-74)."""
    r2p, b0 = 0.05, 0.013  # 1/ms, kHz
    seq = [epg.System(modulation=r2p + 1j * b0), epg.T(90, 90)]
    for _ in range(5):
        seq += [epg.C(2.0), epg.Imaging(np.zeros((1, 1)),
                                        voxel_shape="point")]
    sig = np.asarray(epg.simulate(seq, kgrid=0.1, max_nstate=8)).squeeze()
    t = 2.0 * np.arange(1, 6)
    # magnitude: pure T2' decay of the single k=0 state
    assert np.allclose(np.abs(sig), np.exp(-r2p * t), atol=1e-10)
    # phase: B0 ramp on top of the RF phase
    dphi = np.angle(sig[1:] / sig[:-1])
    assert np.allclose(dphi, 2 * np.pi * b0 * 2.0, atol=1e-10)
