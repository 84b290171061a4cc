"""Slice-profile-corrected MRF dictionaries (models/slice_profile.py).

Oracle: the full shaped-pulse MRF train — each TR excites with the
slice-selective RFPulse (off-resonance sweep over z via encode_phase,
rewinder refocusing) and the voxel signal is the sum over the z grid.
The corrected dictionary must (a) equal the hand-built weighted sum of
per-scale ideal-pulse dictionaries bit-exactly, and (b) approximate
the shaped-pulse oracle far better than the uncorrected dictionary.
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu.models import (fisp_mrf_dictionary, fisp_mrf_dictionary_sliced,
                              slice_profile_scales)
from epgpy_tpu.ops.rfpulse import RFPulse, encode_phase

# windowed sinc, main lobe + first side lobes; phases are 0/180 so the
# closed-form rf calibration applies
NSAMP = 64
_x = np.linspace(-2, 2, NSAMP)
VALUES = np.sinc(_x) * np.hamming(NSAMP)
VALUES = VALUES / np.abs(VALUES).max()
DUR = 1.0        # ms
GRAD = 10.0      # mT/m
FOV = 24.0       # mm
NPOINT = 33
ALPHA0 = 30.0    # nominal flip used for profile estimation


@pytest.fixture(scope="module")
def profile():
    pulse = RFPulse(VALUES, DUR, alpha=ALPHA0)
    scales, weights = slice_profile_scales(
        pulse, gradient=GRAD, fov=FOV, npoint=NPOINT, threshold=0.02)
    return scales, weights


def test_scales_sanity(profile):
    scales, weights = profile
    assert scales.ndim == 1 and scales.shape == weights.shape
    # the center of the slice sees (about) the nominal flip
    assert abs(scales.max() - 1.0) < 0.05
    # every kept point passes the threshold; weights are the uniform dz
    assert (scales >= 0.02).all()
    np.testing.assert_allclose(weights, 1.0 / NPOINT)
    # the 12 mm FOV is wider than the slice: some points were dropped
    assert 3 <= len(scales) < NPOINT


def test_sliced_dictionary_matches_manual_sum(profile):
    scales, weights = profile
    FA = 20.0 + 25.0 * np.sin(np.arange(30) * 0.21)
    T1s, T2s = np.array([700.0, 1200.0]), np.array([60.0, 110.0])
    re, im = fisp_mrf_dictionary_sliced(
        FA, 12.0, 4.0, T1s, T2s, scales=scales, weights=weights,
        phi=0.0, nstate=6)
    acc_re = np.zeros_like(np.asarray(re))
    acc_im = np.zeros_like(acc_re)
    for s, w in zip(scales, weights):
        r1, i1 = fisp_mrf_dictionary(FA, 12.0, 4.0, T1s, T2s,
                                     np.full(2, s), phi=0.0, nstate=6)
        acc_re += w * np.asarray(r1)
        acc_im += w * np.asarray(i1)
    np.testing.assert_allclose(np.asarray(re), acc_re, atol=1e-12)
    np.testing.assert_allclose(np.asarray(im), acc_im, atol=1e-12)


def test_sliced_dictionary_weight_length_mismatch(profile):
    scales, _ = profile
    with pytest.raises(ValueError):
        fisp_mrf_dictionary_sliced(
            np.full(8, 30.0), 12.0, 4.0, np.array([800.0]),
            np.array([80.0]), scales=scales, weights=np.ones(len(scales) + 1))


def _shaped_pulse_oracle(FA, TR, TE, T1, T2, nstate):
    """Sum-over-slice signal of the train excited by the real pulse."""
    seq = []
    for fa in FA:
        pulse = RFPulse(VALUES, DUR, alpha=float(fa))
        enc = encode_phase(pulse, gradient=GRAD, fov=FOV, npoint=NPOINT,
                           rewind=True)
        seq += [enc, epg.E(TE, T1, T2), epg.ADC,
                epg.E(TR - TE, T1, T2), epg.S(1)]
    sig = np.asarray(epg.simulate(seq, max_nstate=nstate))  # (P, npoint)
    return sig.reshape(len(FA), NPOINT).sum(axis=1) / NPOINT


def _normalized_corr(a, b):
    return abs(np.vdot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b))


def test_correction_beats_uncorrected_vs_shaped_oracle(profile):
    scales, weights = profile
    rng = np.random.default_rng(7)
    P = 40
    FA = 15.0 + 35.0 * np.abs(np.sin(np.arange(P) * 0.17)) \
        + rng.uniform(0, 4, P)
    TR, TE, T1, T2 = 12.0, 4.0, 900.0, 70.0

    oracle = _shaped_pulse_oracle(FA, TR, TE, T1, T2, nstate=8)
    re_c, im_c = fisp_mrf_dictionary_sliced(
        FA, TR, TE, np.array([T1]), np.array([T2]), scales=scales,
        weights=weights, phi=0.0, nstate=8)
    corrected = (np.asarray(re_c) + 1j * np.asarray(im_c))[0]
    re_u, im_u = fisp_mrf_dictionary(FA, TR, TE, np.array([T1]),
                                     np.array([T2]), phi=0.0, nstate=8)
    uncorrected = (np.asarray(re_u) + 1j * np.asarray(im_u))[0]

    err_c = 1.0 - _normalized_corr(corrected, oracle)
    err_u = 1.0 - _normalized_corr(uncorrected, oracle)
    # fingerprint SHAPE: the correction must close most of the gap
    assert err_c < 0.3 * err_u, (err_c, err_u)
    assert err_c < 5e-3, err_c
    # amplitude: the corrected dictionary also carries the partial-volume
    # magnitude of the slice (sum w < 1), unlike the uncorrected one
    amp_c = np.linalg.norm(corrected) / np.linalg.norm(oracle)
    amp_u = np.linalg.norm(uncorrected) / np.linalg.norm(oracle)
    assert abs(amp_c - 1.0) < 0.1, amp_c
    assert amp_u > 1.5, amp_u
