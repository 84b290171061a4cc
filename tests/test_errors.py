"""Validation / error-path parity (reference raises the same classes).

The reference validates inputs eagerly throughout (operator.py:76-84,
shift.py:26-30, diffusion/exchange/statematrix); these tests pin that
our constructors and the engine reject the same invalid inputs.
"""

import numpy as np
import pytest

import epgpy_tpu as epg


def test_shift_zero_raises():
    with pytest.raises(TypeError):
        epg.S(0)
    with pytest.raises(TypeError):
        epg.S(np.zeros((1, 2)))


def test_shift_bad_kdim_raises():
    with pytest.raises(ValueError):
        epg.S(np.ones((1, 5)))


def test_negative_time_raises():
    with pytest.raises(ValueError):
        epg.G(-1.0, 1.0)
    with pytest.raises(ValueError):
        epg.C(-1.0)


def test_diffusion_tensor_validation():
    with pytest.raises(ValueError):
        epg.D(1.0, np.array([1e-3, 2e-3]))   # 1-d D
    with pytest.raises(ValueError):
        epg.D(1.0, np.ones((2, 3)))          # non-square


def test_asymmetric_coefficients_raise():
    # default check=True enforces the ladder conjugate symmetry
    with pytest.raises(ValueError):
        epg.ScalarOp(np.array([0.5, 0.25, 1.0]))
    m = np.eye(3)
    m[0, 2] = 0.5  # breaks conj-perm symmetry
    with pytest.raises(ValueError):
        epg.MatrixOp(m)


def test_matrixop_shape_validation():
    with pytest.raises(ValueError):
        epg.MatrixOp(np.ones((2, 4)))


def test_statematrix_even_ladder_raises():
    with pytest.raises(ValueError):
        epg.StateMatrix(np.ones((4, 3)))


def test_simulate_without_probe_raises():
    with pytest.raises(ValueError):
        epg.simulate([epg.T(90, 90)])


def test_exchange_conservation_raises():
    """Non-conserving kinetic matrix with mismatched densities raises
    (reference epgpy/exchange.py:97-100)."""
    khi = np.array([[0.01, 0.0], [0.0, 0.02]])  # columns don't balance
    sm = epg.StateMatrix(shape=(2,), density=[0.5, 0.5])
    with pytest.raises(ValueError):
        epg.X(1.0, khi)(sm)


def test_sequence_invalid_operator_raises():
    from epgpy_tpu.sequence import Sequence
    with pytest.raises(ValueError):
        Sequence([42.0])


def test_constant_cannot_wrap_expression():
    from epgpy_tpu.sequence import Constant, Variable
    with pytest.raises(TypeError):
        Constant(Variable("x"))


def test_negative_exchange_rate_raises():
    with pytest.raises(ValueError):
        epg.exchange_matrix(-0.01)
