"""StateMatrix container tests (strategy: reference test/test_statematrix.py)."""

import jax
import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu.statematrix import StateMatrix


def test_default_init():
    sm = StateMatrix()
    assert sm.nstate == 0
    assert sm.shape == (1,)
    assert np.allclose(np.asarray(sm.states), [[[0, 0, 1]]])
    assert np.allclose(np.asarray(sm.density), 1.0)


def test_init_variants():
    sm = StateMatrix([1, 1, 0.5])
    assert sm.nstate == 0
    sm = StateMatrix(np.asarray([[0, 1, 0], [0, 0, 1], [1, 0, 0]]))
    assert sm.nstate == 1
    with pytest.raises(ValueError):
        StateMatrix([1, 0, 0, 0])  # not 3 components
    with pytest.raises(ValueError):
        StateMatrix(np.zeros((2, 3)))  # even ladder
    with pytest.raises(ValueError):
        StateMatrix([1, 2, 0])  # F columns mismatch


def test_nstate_padding():
    sm = StateMatrix([1, 1, 0.3], nstate=3)
    assert sm.nstate == 3
    assert sm.states.shape == (1, 7, 3)
    assert np.allclose(np.asarray(sm.F0), 1)
    # resize crops/pads symmetrically
    sm2 = sm.resize(1)
    assert sm2.nstate == 1
    assert np.allclose(np.asarray(sm2.F0), 1)


def test_density_equilibrium():
    sm = StateMatrix(density=[0.5, 1.0])
    assert np.allclose(np.asarray(sm.density), [0.5, 1.0])
    assert np.allclose(np.asarray(sm.Z0), [0.5, 1.0])


def test_expand_broadcast():
    sm = StateMatrix()
    sm2 = sm.expand(3)
    assert sm2.shape == (1, 1, 1)
    sm3 = sm.broadcast((2, 5))
    assert sm3.shape == (2, 5)
    assert np.allclose(np.asarray(sm3.Z0), 1.0)


def test_pytree_roundtrip():
    sm = StateMatrix(nstate=2, shape=(3,), max_nstate=10)
    leaves, treedef = jax.tree_util.tree_flatten(sm)
    sm2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert sm2.nstate == sm.nstate
    assert sm2.options == sm.options
    assert np.allclose(np.asarray(sm2.states), np.asarray(sm.states))


def test_jit_through_statematrix():
    @jax.jit
    def f(sm):
        return epg.T(90, 90)(sm).F0

    out = f(StateMatrix(nstate=1))
    assert np.allclose(np.asarray(out), 1.0)


def test_stack_unstack():
    sm1 = epg.T(30, 0)(StateMatrix(nstate=1))
    sm2 = epg.T(60, 0)(StateMatrix(nstate=1))
    stacked = sm1.stack([sm2])
    assert stacked.shape == (2,) + sm1.shape
    parts = stacked.unstack()
    assert np.allclose(np.asarray(parts[0].states), np.asarray(sm1.states))
    assert np.allclose(np.asarray(parts[1].states), np.asarray(sm2.states))


def test_coords_setup():
    sm = StateMatrix(nstate=2).setup_coords(3)
    assert sm.kdim == 3
    assert sm.coords.shape == (1, 5, 3)
    assert np.allclose(np.asarray(sm.coords[..., 0]), np.arange(-2, 3))


def test_stack_recomputes_eq_center_hint():
    """Stacking with a partner whose equilibrium is NOT center-only must
    clear the _eq_center fast-path hint (the lanes relaxation recovery
    would otherwise skip the partner's off-center rows)."""
    import numpy as np
    from epgpy_tpu import StateMatrix

    sm1 = StateMatrix([0, 0, 1], nstate=2)
    assert sm1.options.get("_eq_center") is True
    eq = np.zeros((5, 3))
    eq[2, 2] = 1.0
    eq[1, 2] = eq[3, 2] = 0.25   # off-center (Z-symmetric) equilibrium
    sm2 = StateMatrix([0, 0, 1], nstate=2, equilibrium=eq)
    assert sm2.options.get("_eq_center") is False
    stacked = sm1.stack([sm2])
    assert stacked.options.get("_eq_center") is False
    # and an all-center stack keeps the fast path
    assert sm1.stack([StateMatrix([0, 0, 1], nstate=2)]).options.get(
        "_eq_center") is True
