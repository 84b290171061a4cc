"""Relaxation/precession operator tests (strategy: reference test/test_evolution.py)."""

import numpy as np

import epgpy_tpu as epg


def test_E_decay_and_recovery():
    sm = epg.T(90, 90)(epg.StateMatrix())
    tau, T1, T2 = 10.0, 1000.0, 35.0
    out = epg.E(tau, T1, T2)(sm)
    assert np.allclose(np.asarray(out.F0), np.exp(-tau / T2))
    assert np.allclose(np.asarray(out.Z0), 1 - np.exp(-tau / T1))


def test_E_precession_phase():
    sm = epg.T(90, 90)(epg.StateMatrix())
    tau, g = 7.0, 0.013  # ms, kHz
    out = epg.E(tau, 1e8, 1e8, g)(sm)
    # F+ accumulates exp(+2i pi g tau) (reference evolution.py:230-233)
    assert np.allclose(np.asarray(out.F0), np.exp(2j * np.pi * g * tau))


def test_P_pure_precession():
    sm = epg.T(90, 90)(epg.StateMatrix())
    out = epg.P(3.0, 0.25)(sm)
    assert np.allclose(np.asarray(out.F0), np.exp(2j * np.pi * 0.25 * 3.0))
    assert np.allclose(np.asarray(out.Z0), 0.0)


def test_R_raw_rates():
    sm = epg.T(90, 90)(epg.StateMatrix())
    out = epg.R(rT=0.3 + 0.1j, rL=0.2, r0=0.2)(sm)
    assert np.allclose(np.asarray(out.F0), np.exp(-(0.3 - 0.1j)))
    assert np.allclose(np.asarray(out.Z0), 1 - np.exp(-0.2))


def test_E_batched_T2():
    T2s = np.asarray([20.0, 40.0, 80.0])
    sm = epg.T(90, 90)(epg.StateMatrix())
    out = epg.E(5.0, 1000.0, T2s)(sm)
    assert out.shape == (3,)
    assert np.allclose(np.asarray(out.F0), np.exp(-5.0 / T2s))


def test_E_symmetry_preserved():
    sm = epg.StateMatrix([0.3 + 0.2j, 0.3 - 0.2j, 0.5], nstate=1)
    sm = epg.T(45, 30)(sm)
    out = epg.E(5.0, 500.0, 50.0, g=0.1)(sm)
    assert out.check()
