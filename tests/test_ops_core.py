"""Operator-core regressions from the round-3 adversarial review:
R order1=True without recovery, array/traced durations, RESET with a
wider equilibrium, axes= on scalar pulses, combine() overrides,
shape_with_axes validation, list-aux copy round-trips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import epgpy_tpu as epg


def test_R_order1_true_without_recovery():
    """order1=True on R(r0=None) tracks only (rT, rL) -- the absent
    recovery leaf used to crash diff.substitute."""
    out = epg.simulate(
        [epg.T(90, 90), epg.R(0.1, 0.05, order1=True), epg.ADC],
        probe=[epg.ADC, epg.Jacobian(["rT"])])
    assert np.asarray(out[1]).shape == (1, 1, 1)
    # with recovery, r0 is trackable again
    out2 = epg.simulate(
        [epg.T(90, 90), epg.R(0.1, 0.05, r0=0.05, order1=True), epg.ADC],
        probe=[epg.ADC, epg.Jacobian(["r0"])])
    assert np.isfinite(np.asarray(out2[1])).all()


def test_combine_array_duration_and_overrides():
    c = epg.E(np.array([1.0, 2.0, 3.0]), 800, 80, duration=True) \
        @ epg.E(5, 500, 50)
    assert np.asarray(c.duration).shape == (3,)
    e1 = epg.E(5, 800, 80)
    assert epg.combine(e1, name="foo").name == "foo"
    assert float(epg.combine(e1, duration=2.5).duration) == 2.5


def test_reset_grows_to_equilibrium_batch():
    """PD(batch, reset=False) then RESET: the states grow to the wider
    equilibrium shape (reference resize-on-update semantics)."""
    pd = np.array([0.5, 0.8, 1.0])
    out = np.asarray(epg.simulate(
        [epg.T(90, 90), epg.PD(pd, reset=False), epg.RESET,
         epg.E(5.0, 800.0, 80.0), epg.T(30, 0), epg.ADC]))
    assert out.shape == (1, 3)
    ratio = np.abs(out[0]) / np.abs(out[0, -1])
    assert np.allclose(ratio, pd / pd[-1], atol=1e-10)


def test_scalar_pulse_with_axes():
    sm = epg.StateMatrix([0, 0, 1], nstate=2)
    r = epg.T(90.0, 0.0, axes=1)(sm)
    assert r.shape == (1, 1)


def test_multioperator_traced_duration():
    f = jax.jit(lambda tau: (
        epg.T(90, 0) * epg.E(tau, 800, 80, duration=True)).duration)
    assert float(f(jnp.asarray(5.0))) == 5.0


def test_shape_with_axes_validates():
    with pytest.raises(ValueError, match="axes"):
        epg.T(np.array([30.0, 60.0, 90.0]), 0.0, axes=(0, 1)).shape


def test_list_aux_copy_round_trip():
    s = epg.S(np.array([[1.0]]), nmax=[1, 2])
    assert isinstance(s.copy().nmax, list)
    assert s.copy().nmax == [1, 2]
