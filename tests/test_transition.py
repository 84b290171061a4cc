"""RF transition operator tests (strategy: reference test/test_transition.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu.ops import transition


def test_rotation_matrix_values():
    # closed-form entries of the Weigel rotation (alpha about x)
    mat = np.asarray(transition.rotation_alpha(90.0))
    a = np.pi / 2
    expected = np.array([
        [np.cos(a / 2) ** 2, np.sin(a / 2) ** 2, -1j * np.sin(a)],
        [np.sin(a / 2) ** 2, np.cos(a / 2) ** 2, 1j * np.sin(a)],
        [-0.5j * np.sin(a), 0.5j * np.sin(a), np.cos(a)],
    ])
    assert np.allclose(mat, expected)


def test_rotation_symmetry():
    # ladder conjugate-symmetry: mat == conj(mat[(1,0,2),:][:,(1,0,2)])
    mat = np.asarray(transition.rotation_operator(67.0, 33.0))
    sym = np.conj(mat[..., (1, 0, 2), :][..., :, (1, 0, 2)])
    assert np.allclose(mat, sym)


def test_rotation_composition():
    # T(a,phi) then T(-a,phi) is identity
    m1 = np.asarray(transition.rotation_operator(47.0, 21.0))
    m2 = np.asarray(transition.rotation_operator(-47.0, 21.0))
    assert np.allclose(np.einsum("...ij,...jk->...ik", m2, m1), np.eye(3), atol=1e-12)


def test_T_on_equilibrium():
    # 90y pulse converts Z into pure real F+
    sm = epg.StateMatrix()
    out = epg.T(90, 90)(sm)
    assert np.allclose(np.asarray(out.F0), 1.0)
    # 90x pulse: F+ = -i Z  (phase -90)
    out = epg.T(90, 0)(sm)
    assert np.allclose(np.asarray(out.F0), -1j)


def test_T_norm_conservation():
    sm = epg.StateMatrix([1, 1, 0.5], nstate=2)
    out = epg.T(133, 77)(sm)
    assert np.allclose(np.asarray(out.norm), np.asarray(sm.norm))
    assert out.check()


def test_T_batched():
    alphas = [30.0, 60.0, 90.0]
    sm = epg.StateMatrix()
    out = epg.T(alphas, 90)(sm)
    assert out.shape == (3,)
    expected = np.sin(np.deg2rad(alphas))
    assert np.allclose(np.asarray(out.F0), expected)


def test_phi_phase():
    sm = epg.T(90, 90)(epg.StateMatrix())
    out = epg.Phi(45)(sm)
    assert np.allclose(np.asarray(out.F0), np.exp(1j * np.pi / 4))


def test_tx_ty():
    sm = epg.StateMatrix()
    assert np.allclose(np.asarray(epg.Ty(90)(sm).F0), 1.0)
    assert np.allclose(np.asarray(epg.Tx(90)(sm).F0), -1j)
