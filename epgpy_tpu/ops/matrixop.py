"""Generic per-state 3x3 matrix operator kernel.

A MatrixOp applies one 3x3 complex matrix to every k-state's
``(F+, F-, Z)`` vector: ``states[k] = mat @ states[k] [+ mat0 @ equilibrium]``
(reference epgpy/opmatrix.py:199-221).  The matrix must satisfy
``mat == conj(mat[(1,0,2),:][:,(1,0,2)])`` to preserve ladder symmetry.

The contraction is expressed as an einsum over the component axis with the
ladder axis batched -- XLA lowers it to a fused VPU kernel (the matrices
are 3x3, far below MXU tile size; fusing with neighbours matters more than
MXU use here).  Storage is split re/im (real program boundaries); the
complex view assembles at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import common
from . import base
from .scalarop import align_batch, split_complex, join_complex

__all__ = ["MatrixOp", "matrix_combine", "matrix_combine_multi", "apply_matrices"]


def _format_matrix_np(mat, check=True):
    mat = np.asarray(mat)
    if mat.ndim == 2:
        mat = mat[None]
    if mat.ndim < 3 or mat.shape[-2:] != (3, 3):
        raise ValueError(f"Expected (..., 3, 3) matrix, got {mat.shape}")
    if check:
        sym = np.conj(mat[..., (1, 0, 2), :][..., :, (1, 0, 2)])
        if not np.allclose(mat, sym):
            raise ValueError("Matrix breaks ladder conjugate symmetry")
    return mat


def _matvec_states(mat, states):
    """new[..., k, i] = sum_j mat[..., i, j] states[..., k, j].

    Written as nine explicit multiply-adds: XLA lowers the equivalent
    batched einsum to per-batch-element 3x3 micro-matmuls, measured ~100x
    slower at 100k batch (see CLAUDE.md fact #4).
    """
    m = mat[..., None, :, :]  # broadcast over the ladder axis
    comps = [
        m[..., i, 0] * states[..., 0]
        + m[..., i, 1] * states[..., 1]
        + m[..., i, 2] * states[..., 2]
        for i in range(3)
    ]
    return jnp.stack(comps, axis=-1)


def apply_matrices(sm, mat, mat0):
    """states[k] = mat @ states[k] [+ mat0 @ equilibrium[k]]."""
    mat = align_batch(mat, sm.ndim, 2)
    states = _matvec_states(mat, sm.states)
    if mat0 is not None:
        mat0 = align_batch(mat0, sm.ndim, 2)
        eq = jnp.asarray(sm.equilibrium, dtype=states.dtype)
        states = states + _matvec_states(mat0, eq)
    return sm.update(states=states)


@base.register_op
class MatrixOp(base.DiffOperator, base.CombinableOperator):
    """3x3 per-state operator: ``states = mat @ states [+ mat0 @ equilibrium]``.

    `dmats`/`d2mats` supply custom first/second derivative matrices keyed
    by parameter name (reference epgpy/opmatrix.py API).
    """

    PARAMS = ("mat_re", "mat_im", "mat0_re", "mat0_im", "diff_arrays")
    diagonal = False

    def __init__(self, mat, mat0=None, *, dmats=None, d2mats=None, axes=None,
                 name=None, duration=None, check=True, **kwargs):
        from .scalarop import pack_diff_arrays
        if isinstance(mat, (jax.core.Tracer, jnp.ndarray)):
            mat = jnp.asarray(mat)
            if mat.ndim == 2:
                mat = mat[None]
            mat0 = None if mat0 is None else jnp.asarray(mat0)
            self.preserves_ladder_symmetry = False
        else:
            mat = _format_matrix_np(mat, check=check)
            if mat0 is not None:
                mat0 = _format_matrix_np(mat0, check=check)
                mat, mat0 = np.broadcast_arrays(mat, mat0)
            if not check:
                conj_perm = np.conj(mat[..., (1, 0, 2), :][..., :, (1, 0, 2)])
                sym = np.allclose(mat, conj_perm)
                if mat0 is not None:
                    conj_perm0 = np.conj(
                        mat0[..., (1, 0, 2), :][..., :, (1, 0, 2)])
                    sym = sym and np.allclose(mat0, conj_perm0)
                self.preserves_ladder_symmetry = bool(sym)
        self.mat_re, self.mat_im = split_complex(mat)
        self.mat0_re, self.mat0_im = split_complex(mat0)
        self.diff_arrays = pack_diff_arrays(dmats, d2mats)
        if dmats or d2mats:
            self.PARAMETERS_ORDER1 = frozenset(dmats or ()) | {
                p for pair in (d2mats or ()) for p in pair}
        self.axes = axes
        super().__init__(name=name or "MatrixOp", duration=duration, **kwargs)

    def apply_diff_arrays(self, lin, quad):
        from .scalarop import apply_diff_arrays_to
        return apply_diff_arrays_to(self, lin, quad, ("mat", "mat0"))

    @property
    def shape(self):
        return common.shape_with_axes(tuple(self.mat_re.shape[:-2]), self.axes)

    def matrices(self):
        """(mat, mat0) complex 3x3 matrices, trace-time."""
        mat = join_complex(self.mat_re, self.mat_im)
        mat0 = join_complex(self.mat0_re, self.mat0_im)
        if self.axes is not None:
            mat = common.set_axes(2, mat, self.axes)
            mat0 = None if mat0 is None else common.set_axes(2, mat0, self.axes)
        return mat, mat0

    def apply(self, sm):
        mat, mat0 = self.matrices()
        return apply_matrices(sm, mat, mat0)

    # -- combination (reference epgpy/opmatrix.py:173-187) --

    def combinable(self, other):
        return isinstance(other, base.CombinableOperator)

    def combine(self, other, *, name=None, duration=None, **kwargs):
        from .combined import CombinedOp
        return CombinedOp.of(self, other, name=name, duration=duration)


def matrix_combine(mat1, mat2, mat01=None, mat02=None):
    """Compose two matrix ops: first mat1, then mat2 -> (mat2 @ mat1, ...)."""
    mat1, mat2, mat01, mat02 = common.extend_operators(2, mat1, mat2, mat01, mat02)
    mat = jnp.einsum("...ij,...jk->...ik", mat2, mat1, precision="highest")
    if mat01 is None and mat02 is None:
        mat0 = None
    elif mat01 is None:
        mat0 = mat02
    else:
        mat0 = jnp.einsum("...ij,...jk->...ik", mat2, mat01, precision="highest")
        if mat02 is not None:
            mat0 = mat0 + mat02
    return mat, mat0


def matrix_combine_multi(mats):
    """Compose a chain of matrices applied left-to-right."""
    mat = mats[0]
    for m in mats[1:]:
        mat = jnp.einsum("...ij,...jk->...ik", m, mat, precision="highest")
    return mat
