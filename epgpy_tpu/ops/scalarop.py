"""Generic diagonal (per-component) operator kernel.

A ScalarOp multiplies each k-state's ``(F+, F-, Z)`` vector elementwise by a
coefficient triplet ``arr`` and adds a recovery term ``arr0 * equilibrium``
(reference epgpy/opscalar.py:213-232).  The coefficient triplet must satisfy
the ladder symmetry ``arr == arr[..., (1, 0, 2)].conj()`` so that the state
matrix's conjugate symmetry is preserved.

On TPU this is a pure VPU elementwise op; XLA fuses chains of ScalarOps and
adjacent rotations into a single kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import common, config
from . import base

__all__ = ["ScalarOp", "scalar_combine", "align_batch"]


def align_batch(arr, sm_batch_ndim: int, core_ndim: int):
    """Left-align operator batch dims with state batch dims.

    Inserts singleton axes between the operator's batch axes and its core
    axes so numpy broadcasting implements the append-broadcast rule.
    """
    nbatch = arr.ndim - core_ndim
    missing = sm_batch_ndim - nbatch
    if missing <= 0:
        return arr
    return arr.reshape(arr.shape[:nbatch] + (1,) * missing + arr.shape[nbatch:])


def _format_triplet(arr, check=True):
    arr = jnp.asarray(arr, dtype=config.complex_dtype())
    if arr.ndim == 1:
        arr = arr[None]
    if arr.ndim < 2 or arr.shape[-1] != 3:
        raise ValueError(f"Expected (..., 3) coefficient array, got {arr.shape}")
    if check and not isinstance(arr, jax.core.Tracer):
        if not jnp.allclose(arr, jnp.conj(arr[..., (1, 0, 2)])):
            raise ValueError("Coefficients break ladder conjugate symmetry")
    return arr


@base.register_op
class ScalarOp(base.CombinableOperator):
    """Diagonal operator: ``states = arr * states [+ arr0 * equilibrium]``."""

    PARAMS = ("arr", "arr0")

    def __init__(self, arr, arr0=None, *, axes=None, name=None, duration=None,
                 check=True, **kwargs):
        arr = _format_triplet(arr, check=check)
        if arr0 is not None:
            arr0 = _format_triplet(arr0, check=check)
            arr, arr0 = jnp.broadcast_arrays(arr, arr0)
        if axes is not None:
            arr = common.set_axes(1, arr, axes)
            arr0 = None if arr0 is None else common.set_axes(1, arr0, axes)
        self.arr = arr
        self.arr0 = arr0
        super().__init__(name=name or "ScalarOp", duration=duration)

    @property
    def shape(self):
        return self.arr.shape[:-1]

    def apply(self, sm):
        arr = align_batch(self.arr, sm.ndim, 1)[..., None, :]
        states = sm.states * arr
        if self.arr0 is not None:
            arr0 = align_batch(self.arr0, sm.ndim, 1)[..., None, :]
            states = states + arr0 * jnp.asarray(sm.equilibrium, dtype=states.dtype)
        return sm.update(states=states)

    # -- combination (reference epgpy/opscalar.py:101-147) --

    def combinable(self, other):
        return isinstance(other, base.CombinableOperator)

    def combine(self, other, *, name=None, duration=None, **kwargs):
        if isinstance(other, ScalarOp):
            arr, arr0 = scalar_combine(self.arr, other.arr, self.arr0, other.arr0)
            return ScalarOp(
                arr, arr0, check=False,
                name=name or f"{self.name}|{other.name}",
                duration=duration if duration is not None
                else _add_durations(self.duration, other.duration),
            )
        # promote self to a matrix op and defer
        from . import matrixop
        return matrixop.MatrixOp.from_scalar(self).combine(
            other, name=name, duration=duration, **kwargs)


def scalar_combine(arr1, arr2, arr01=None, arr02=None):
    """Compose two diagonal ops: first arr1, then arr2."""
    arr1, arr2, arr01, arr02 = common.extend_operators(1, arr1, arr2, arr01, arr02)
    arr = arr2 * arr1
    if arr01 is None and arr02 is None:
        arr0 = None
    elif arr01 is None:
        arr0 = arr02
    else:
        arr0 = arr2 * arr01
        if arr02 is not None:
            arr0 = arr0 + arr02
    return arr, arr0


def _add_durations(d1, d2):
    try:
        return (d1 or 0.0) + (d2 or 0.0)
    except TypeError:
        return 0.0
