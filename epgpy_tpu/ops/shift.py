"""Gradient shift operators.

The shift moves transverse configuration states along the k-ladder:
``F(k) -> F(k + dk)`` for every k.  In the full symmetric ladder layout
``(..., K, 3)`` with components ``(F+, F-, Z)`` this means: column 0 slides
up by ``dk`` rows, column 1 slides down by ``dk`` rows, column 2 (Z) is
unchanged (semantics: reference epgpy/shift.py:271-294).

TPU-first redesign (SURVEY.md §2.7/§7): the reference grows the ladder
dynamically on each shift and prunes/merges it on the fly -- data-dependent
shapes that XLA cannot compile.  Here the ladder has a *static* capacity
chosen by the simulation driver (total `nshift` of the sequence, or the
``max_nstate`` option); shifting is a static slice-and-pad, and states
pushed past the capacity edge are dropped -- exactly the reference's
``nmax`` truncation behaviour.

The n-dimensional / float (merge, prune) methods operate on an explicit
coordinate table with the same static capacity; they live in shiftnd.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import common
from . import base

__all__ = ["S", "G", "C", "shift1d"]


def shift1d(states, n: int):
    """Shift a (..., K, 3) ladder by integer n: F+ up, F- down, zero-fill."""
    if n == 0:
        return states
    Fp, Fm, Z = states[..., 0], states[..., 1], states[..., 2]
    zeros = jnp.zeros_like(Fp[..., :1])

    def slide(comp, up: int):
        # positive `up`: comp[i] <- comp[i - up], zero-fill at the bottom
        if up > 0:
            pad = jnp.broadcast_to(zeros, comp[..., :up].shape)
            return jnp.concatenate([pad, comp[..., :-up]], axis=-1)
        pad = jnp.broadcast_to(zeros, comp[..., :(-up)].shape)
        return jnp.concatenate([comp[..., -up:], pad], axis=-1)

    return jnp.stack([slide(Fp, n), slide(Fm, -n), Z], axis=-1)


def shift1d_lanes(planes, n: int):
    """Shift (Fp, Z) half-lanes planes of shape (K, *batch) by integer n.

    The implied F- plane (conj(flip(F+))) shifts the opposite way
    automatically under the flip -- only F+ moves."""
    Fp, Z = planes
    zrow = jnp.zeros_like(Fp[:1])

    def slide(plane, up: int):
        if up > 0:
            pad = jnp.broadcast_to(zrow, plane[:up].shape)
            return jnp.concatenate([pad, plane[:-up]], axis=0)
        pad = jnp.broadcast_to(zrow, plane[: -up].shape)
        return jnp.concatenate([plane[-up:], pad], axis=0)

    return (slide(Fp, n), Z)


@base.register_op
class S(base.DiffOperator):
    """Integer 1-D gradient shift (n-D and float handled by subpackage).

    Integer scalar shifts are STATIC (the 1-D path is a static
    slice-and-pad).  n-D / float shift vectors are traced pytree LEAVES
    (``kleaf``): a train of table shifts with the same shape/dtype
    scan-groups into one compiled body, instead of unrolling one sort +
    segment-sum program per shift (the dominant compile cost of long
    spatially-resolved sequences, e.g. examples/pssfp_offres.py).
    """

    PARAMS = ("kleaf",)

    def __init__(self, k, *, nmax=None, kgrid=None, prune=1e-8, name=None,
                 duration=None):
        if isinstance(k, (int, np.integer)):
            if k == 0:
                raise TypeError("Cannot have k == 0")
            self._kint = int(k)
            self.kleaf = None
        elif isinstance(k, jax.core.Tracer):
            # traced shift values (sequence built inside jit/shard_map):
            # value checks are skipped; the caller must pass max_nstate
            karr = jnp.atleast_2d(k)
            if karr.shape[-1] not in (1, 2, 3, 4):
                raise ValueError("k.shape[-1] must belong to [1, 2, 3, 4]")
            self._kint = None
            self.kleaf = karr
        else:
            karr = np.atleast_2d(np.asarray(k))
            if karr.shape[-1] not in (1, 2, 3, 4):
                raise ValueError("k.shape[-1] must belong to [1, 2, 3, 4]")
            if np.allclose(karr, 0):
                raise TypeError("Cannot have k == 0")
            self._kint = None
            self.kleaf = karr
        self.nmax = nmax
        self.kgrid = kgrid
        self.prune = prune
        if not name:
            if self._kint is not None:
                name = common.repr_operator("S", ["k"], [k], [""])
            elif isinstance(self.kleaf, np.ndarray):
                name = common.repr_operator("S", ["k"], [k], [".2f"])
            else:
                name = "S(traced)"
        super().__init__(name=name, duration=duration)

    @property
    def k(self):
        """Shift value: int (static 1-D) or host array (table path).

        Host-side metadata accessor (capacity planning, plotting); inside
        a compiled program use ``kleaf`` -- the traced leaf.
        """
        if self._kint is not None:
            return self._kint
        if isinstance(self.kleaf, jax.core.Tracer):
            return self.kleaf
        return np.asarray(self.kleaf)

    @property
    def nshift(self) -> int:
        if self._kint is not None:
            return abs(self._kint)
        if isinstance(self.kleaf, jax.core.Tracer):
            # traced shifts carry no host value; the table capacity comes
            # from max_nstate (engine._capacity skips the lattice bound)
            return 0
        return int(np.round(np.max(np.abs(np.asarray(self.kleaf)))))

    @property
    def shape(self):
        if self._kint is not None:
            return (1,)
        return self.kleaf.shape[:-1]

    @property
    def kdim(self) -> int:
        if self._kint is not None:
            return 1
        return self.kleaf.shape[-1]

    def apply(self, sm):
        from . import shiftnd  # deferred: heavy module
        if self._kint is not None and sm.coords is None:
            if sm.lanes:
                return sm.update(
                    states_lanes=shift1d_lanes(sm.half_planes, self._kint))
            return sm.update(states=shift1d(sm.states, self._kint))
        return shiftnd.apply_shift(self, sm)


class G(S):
    """Shift from gradient area: tau (ms) x gradient (mT/m) -> k (rad/m)."""

    # tau/gradient are leaves so G trains with varying timing scan-group
    PARAMS = ("kleaf", "tau", "gradient")

    def __init__(self, tau, gradient, *, duration=None, **kwargs):
        from ..utils import constants
        tau_a = np.asarray(tau, dtype=float)
        grad = np.asarray(gradient, dtype=float)
        if np.any(tau_a < 0):
            raise ValueError("Cannot have negative time")
        if grad.ndim > 0 and grad.shape[-1] > 3:
            raise ValueError("Only 3d gradients are allowed")
        k = 2 * np.pi * constants.gamma_1H * grad * 1e-3 * tau_a
        if duration is True:
            duration = tau
        self.tau = tau_a
        self.gradient = grad
        super().__init__(k, duration=duration, **kwargs)


class C(S):
    """Accumulate dephasing time on the 4th coordinate (T2*/B0 simulation)."""

    PARAMS = ("kleaf", "tau", "R2")

    def __init__(self, tau, R2=1, *, duration=None, **kwargs):
        tau_a = np.asarray(tau, dtype=float)
        R2_a = np.asarray(R2, dtype=float)
        if np.any(tau_a < 0):
            raise ValueError("Cannot have negative time")
        evol = tau_a * R2_a
        k = np.stack([0 * evol] * 3 + [evol], axis=-1)
        if duration is True:
            duration = tau
        self.tau = tau_a
        self.R2 = R2_a
        super().__init__(k, duration=duration, **kwargs)


# G and C build their k from numpy metadata; they are pytrees via S.
base.register_op(G)
base.register_op(C)
