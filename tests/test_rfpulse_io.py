"""Shaped pulses, pulse IO, imaging probes, MT helpers."""

import os

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu.ops.rfpulse import RFPulse, estimate_rf, estimate_alpha, encode_phase
from epgpy_tpu.utils import pulseio, magnettransfer as mt

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(name):
    path = os.path.join(GOLDEN, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: {name}")
    return np.load(path)


def _sinc_pulse(n=64):
    x = np.linspace(-3, 3, n)
    values = np.sinc(x) * np.hamming(n)
    return values / np.abs(values).max()


def test_rfpulse_constant_phase_rf():
    values = np.ones(16)
    pulse = RFPulse(values, 1.0, alpha=90.0)
    # closed-form rf: alpha / 180 / |sum v|
    assert np.isclose(pulse.rf, 90.0 / 180.0 / 16.0)
    # net rotation == ideal 90 pulse on equilibrium magnitude
    sm = epg.StateMatrix()
    out = pulse(sm)
    assert np.isclose(np.abs(np.asarray(out.F0))[0], 1.0, atol=1e-10)


def test_rfpulse_estimate_alpha_roundtrip():
    values = _sinc_pulse()
    rf = estimate_rf(values, 42.0)
    alpha = estimate_alpha(values, rf)
    assert np.isclose(alpha, 42.0, atol=0.5)


def test_rfpulse_profile_golden():
    g = load_golden("rfpulse_profile")
    values = g["values_re"] + 1j * g["values_im"]
    pulse = RFPulse(values, 2.0, alpha=90.0)
    assert np.isclose(pulse.rf, g["rf"], rtol=1e-6)
    seq = epg.modify([pulse], g=g["freqs"], expand=False)
    sig = np.asarray(epg.simulate(list(seq) + [epg.ADC]))
    assert np.abs(sig - g["signal"]).max() < 1e-8


def test_encode_phase():
    values = _sinc_pulse(32)
    pulse = RFPulse(values, 2.0, alpha=90.0)
    prof = encode_phase(pulse, 10.0, 30.0, npoint=11, rewind=True)
    sig = np.asarray(epg.simulate([prof, epg.ADC]))[0].squeeze()
    assert sig.shape[-1] == 11
    # center of slice: fully excited; far edge: much less
    assert np.abs(sig[5]) > 0.9
    assert np.abs(sig[0]) < np.abs(sig[5])


def test_pta_roundtrip(tmp_path):
    values = _sinc_pulse(16)
    mag, phase = np.abs(values), np.angle(values) % (2 * np.pi)
    path = tmp_path / "test.pta"
    lines = ["PULSENAME:\ttest.pta", "REFGRAD:\t10.0", ""]
    for i, (m, p) in enumerate(zip(mag, phase)):
        lines.append(f"{m:.9f}\t{p:.9f}\t; ({i})")
    path.write_text("\n".join(lines))
    header, parsed = pulseio.read_pulse(path)
    assert header["PULSENAME"] == "test.pta"
    assert np.allclose(parsed, mag * np.exp(1j * phase), atol=1e-8)
    # resampling
    small = pulseio.resample_pulse(parsed, 8)
    assert len(small) == 8


def test_imaging_probe_golden():
    g = load_golden("imaging_probe")
    seq = [
        epg.T(90, 90), epg.S(1, duration=1.0),
        epg.T(30, 0), epg.S(1, duration=1.0),
        epg.Imaging(g["positions"], reduce=False, voxel_size=2e-3),
    ]
    sig = np.asarray(epg.simulate(seq, kvalue=400.0))
    assert np.abs(sig - g["signal"]).max() < 1e-10


def test_dft_probe():
    positions = np.asarray([[0.0], [0.005]])
    seq = [epg.T(90, 90), epg.S(1, duration=1.0),
           epg.DFT(positions)]
    sig = np.asarray(epg.simulate(seq, kvalue=200.0))
    # single k=1 state: DFT = F * exp(i k x); magnitudes equal
    assert np.allclose(np.abs(sig), np.abs(sig[..., :1]))


def test_mt_rates_golden():
    g = load_golden("mt_rates")
    offres = g["offres"]
    assert np.allclose(mt.absorption_rate(12e-3, "gaussian", offres),
                       g["gaussian"], rtol=1e-10)
    assert np.allclose(mt.absorption_rate(12e-3, "lorentzian", offres),
                       g["lorentzian"], rtol=1e-10)
    assert np.allclose(mt.absorption_rate(12e-3, "super-lorentzian", offres[2:]),
                       g["super_lorentzian"], rtol=1e-6)
    W = mt.saturation_rate(5.0, 10.0, mt.absorption_rate(12e-3, "gaussian", 2.0))
    assert np.isclose(W, g["satrate"], rtol=1e-10)


def test_mt_super_lorentzian_extrapolation():
    """Extrapolated region is smooth and bounded by neighbours."""
    G = mt.absorption_rate(12e-3, "super-lorentzian", np.asarray([0.0, 0.5, 1.0]))
    assert np.all(np.isfinite(G))
    assert G[0] > G[2] > 0  # line peaks at resonance


def test_load_pta_rejects_bad_indices(tmp_path):
    """Duplicate or non-contiguous sample indices are file corruption:
    raise instead of silently loading a shorter waveform."""
    import pytest
    from epgpy_tpu.utils.pulseio import load_pta

    head = "PULSENAME:\ttest\nCOMMENT:\tsynthetic\n"
    good = head + "".join(
        f"{0.5:.6f} {0.0:.6f} ; ({i})\n" for i in range(3))
    p = tmp_path / "ok.pta"
    p.write_text(good)
    _, vals = load_pta(p)
    assert len(vals) == 3

    dup = head + "0.5 0.0 ; (0)\n0.5 0.0 ; (1)\n0.7 0.0 ; (1)\n"
    p2 = tmp_path / "dup.pta"
    p2.write_text(dup)
    with pytest.raises(IOError, match="Duplicate"):
        load_pta(p2)

    gap = head + "0.5 0.0 ; (0)\n0.5 0.0 ; (2)\n"
    p3 = tmp_path / "gap.pta"
    p3.write_text(gap)
    with pytest.raises(IOError, match="contiguous"):
        load_pta(p3)
