"""Generic per-state 3x3 matrix operator kernel.

A MatrixOp applies one 3x3 complex matrix to every k-state's
``(F+, F-, Z)`` vector: ``states[k] = mat @ states[k] [+ mat0 @ equilibrium]``
(reference epgpy/opmatrix.py:199-221).  The matrix must satisfy
``mat == conj(mat[(1,0,2),:][:,(1,0,2)])`` to preserve ladder symmetry.

The contraction is expressed as an einsum over the component axis with the
ladder axis batched -- XLA lowers it to a fused VPU kernel (the matrices are
3x3, far below MXU tile size; fusing with neighbours matters more than MXU
use here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import common, config
from . import base
from .scalarop import ScalarOp, align_batch

__all__ = ["MatrixOp", "matrix_combine", "matrix_combine_multi"]


def _format_matrix(mat, check=True):
    mat = jnp.asarray(mat, dtype=config.complex_dtype())
    if mat.ndim == 2:
        mat = mat[None]
    if mat.ndim < 3 or mat.shape[-2:] != (3, 3):
        raise ValueError(f"Expected (..., 3, 3) matrix, got {mat.shape}")
    if check and not isinstance(mat, jax.core.Tracer):
        sym = jnp.conj(mat[..., (1, 0, 2), :][..., :, (1, 0, 2)])
        if not jnp.allclose(mat, sym):
            raise ValueError("Matrix breaks ladder conjugate symmetry")
    return mat


@base.register_op
class MatrixOp(base.CombinableOperator):
    """3x3 per-state operator: ``states = mat @ states [+ mat0 @ equilibrium]``."""

    PARAMS = ("mat", "mat0")

    def __init__(self, mat, mat0=None, *, axes=None, name=None, duration=None,
                 check=True, **kwargs):
        mat = _format_matrix(mat, check=check)
        if mat0 is not None:
            mat0 = _format_matrix(mat0, check=check)
            mat, mat0 = jnp.broadcast_arrays(mat, mat0)
        if axes is not None:
            mat = common.set_axes(2, mat, axes)
            mat0 = None if mat0 is None else common.set_axes(2, mat0, axes)
        self.mat = mat
        self.mat0 = mat0
        super().__init__(name=name or "MatrixOp", duration=duration)

    @classmethod
    def from_scalar(cls, op: ScalarOp) -> "MatrixOp":
        eye = jnp.eye(3, dtype=op.arr.dtype)
        mat = op.arr[..., None] * eye
        mat0 = None if op.arr0 is None else op.arr0[..., None] * eye
        return cls(mat, mat0, check=False, name=op.name, duration=op.duration)

    @property
    def shape(self):
        return self.mat.shape[:-2]

    def apply(self, sm):
        mat = align_batch(self.mat, sm.ndim, 2)
        states = jnp.einsum("...ij,...kj->...ki", mat, sm.states)
        if self.mat0 is not None:
            mat0 = align_batch(self.mat0, sm.ndim, 2)
            eq = jnp.asarray(sm.equilibrium, dtype=states.dtype)
            states = states + jnp.einsum("...ij,...kj->...ki", mat0, eq)
        return sm.update(states=states)

    # -- combination (reference epgpy/opmatrix.py:173-187) --

    def combinable(self, other):
        return isinstance(other, (MatrixOp, ScalarOp))

    def combine(self, other, *, name=None, duration=None, **kwargs):
        if isinstance(other, ScalarOp):
            other = MatrixOp.from_scalar(other)
        if not isinstance(other, MatrixOp):
            raise TypeError(f"Cannot combine MatrixOp with {type(other).__name__}")
        mat, mat0 = matrix_combine(self.mat, other.mat, self.mat0, other.mat0)
        return MatrixOp(
            mat, mat0, check=False,
            name=name or f"{self.name}|{other.name}",
            duration=duration if duration is not None
            else (self.duration or 0.0) + (other.duration or 0.0),
        )


def matrix_combine(mat1, mat2, mat01=None, mat02=None):
    """Compose two matrix ops: first mat1, then mat2 -> (mat2 @ mat1, ...)."""
    mat1, mat2, mat01, mat02 = common.extend_operators(2, mat1, mat2, mat01, mat02)
    mat = jnp.einsum("...ij,...jk->...ik", mat2, mat1)
    if mat01 is None and mat02 is None:
        mat0 = None
    elif mat01 is None:
        mat0 = mat02
    else:
        mat0 = jnp.einsum("...ij,...jk->...ik", mat2, mat01)
        if mat02 is not None:
            mat0 = mat0 + mat02
    return mat, mat0


def matrix_combine_multi(mats):
    """Compose a chain of matrices applied left-to-right."""
    mat = mats[0]
    for m in mats[1:]:
        mat = jnp.einsum("...ij,...jk->...ik", m, mat)
    return mat
