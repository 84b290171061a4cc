"""Operator algebra core.

Operators are immutable pytree objects: their numeric parameters are JAX
leaves (so ``jit``/``vmap``/``grad`` trace through them without
recompilation per value) and everything else -- names, durations, shift
counts -- is static aux data.  Applying an operator is a pure function
``sm -> sm`` (contrast with the reference's mutating ``Operator.__call__``,
reference epgpy/operator.py:96-113).

Scan compilation: two operators with the same :meth:`signature` are
structurally identical (same class, same static config, same parameter
shapes), so a run of them compiles to a single ``lax.scan`` over their
stacked parameters (see engine.py).  This replaces the reference's
per-operator Python hot loop (reference epgpy/functions.py:173-192).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import common
from ..statematrix import StateMatrix

__all__ = [
    "Operator", "EmptyOperator", "MultiOperator", "CombinableOperator",
    "Wait", "Offset", "Spoiler", "Reset", "PD", "System",
    "NULL", "SPOILER", "RESET", "register_op",
]


def register_op(cls):
    """Register an Operator subclass as a pytree.

    The class must define ``PARAMS`` (tuple of leaf field names; None leaves
    allowed) -- all other instance attributes are static aux data.
    """
    params = cls.PARAMS

    def flatten(op):
        children = tuple(getattr(op, p) for p in params)
        aux_items = tuple(
            (k, common.freeze_aux(v)) for k, v in sorted(op.__dict__.items())
            if k not in params
        )
        return children, aux_items

    def flatten_with_keys(op):
        children = tuple(
            (jax.tree_util.GetAttrKey(p), getattr(op, p)) for p in params
        )
        aux_items = tuple(
            (k, common.freeze_aux(v)) for k, v in sorted(op.__dict__.items())
            if k not in params
        )
        return children, aux_items

    def unflatten(aux_items, children):
        op = object.__new__(cls)
        for (k, v) in aux_items:
            object.__setattr__(op, k, common.unfreeze_aux(v))
        for p, c in zip(params, children):
            object.__setattr__(op, p, c)
        return op

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)
    return cls


class Operator:
    """Base linear operator acting on a StateMatrix."""

    PARAMS: tuple = ()
    #: parameters with defined first/second derivatives (diff layer)
    PARAMETERS_ORDER1: frozenset = frozenset()
    #: False when the op may break F-(k) == conj(F+(-k)) (e.g. user
    #: coefficients with check=False): the engine then avoids the
    #: half-ladder lanes layout, which stores only (F+, Z)
    preserves_ladder_symmetry: bool = True

    def __init__(self, *, name: Optional[str] = None, duration=None,
                 order1=False, order2=False):
        self.name = name if name is not None else type(self).__name__
        self.duration = 0.0 if duration is None else duration
        if order1 or order2:
            from .. import diff
            # an order2-only bool/str spec implies the same order1 spec
            # (reference epgpy/diff.py:160-162)
            o1 = order1 if order1 else (
                order2 if isinstance(order2, (bool, str)) else False)
            self.order1 = diff.parse_order1(o1, self.PARAMETERS_ORDER1)
            self.order2 = diff.parse_order2(order2, self.order1,
                                            self.PARAMETERS_ORDER1)
        else:
            self.order1 = {}
            self.order2 = {}

    # -- structural metadata (all static / trace-time) --

    @property
    def shape(self) -> tuple:
        """Operator batch shape (parameter-sweep axes)."""
        return (1,)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def nshift(self) -> int:
        """Ladder growth caused by this operator (0 for non-shift ops)."""
        return 0

    @property
    def kdim(self) -> int:
        return 1

    #: aux attributes ignored for scan-grouping (cosmetic / timing metadata)
    SIGNATURE_IGNORE = frozenset({"name", "duration"})

    def strip_meta(self) -> "Operator":
        """Copy with cosmetic metadata normalized (for scan stacking).

        order1/order2 specs are also cleared: they don't affect apply()
        (the diff layer substitutes parameters before planning), but their
        per-op alias names would otherwise break scan grouping.
        """
        return self.copy(name=type(self).__name__, duration=0.0,
                         order1={}, order2={})

    def signature(self):
        """Structural identity used for scan grouping.

        Two operators share a signature iff they are the same class with the
        same static configuration and identically-shaped parameters -- i.e.
        their stripped pytrees have equal treedefs, so their parameters can
        be stacked and scanned over.
        """
        stripped = self.strip_meta()
        leaves, treedef = jax.tree_util.tree_flatten(stripped)
        shapes = tuple(
            (common.get_shape(leaf), jnp.result_type(leaf).name) for leaf in leaves
        )
        return (treedef, shapes)

    # -- application --

    def apply(self, sm: StateMatrix) -> StateMatrix:
        raise NotImplementedError

    def __call__(self, sm: StateMatrix, **_ignored) -> StateMatrix:
        sm = sm.expand(self.ndim)
        return self.apply(sm)

    def __mul__(self, other):
        ops = (self.operators if isinstance(self, MultiOperator) else [self])
        ops = ops + (other.operators if isinstance(other, MultiOperator) else [other])
        return MultiOperator(ops)

    def copy(self, **kwargs):
        leaves, treedef = jax.tree_util.tree_flatten(self)
        new = jax.tree_util.tree_unflatten(treedef, leaves)
        for k, v in kwargs.items():
            object.__setattr__(new, k, v)
        return new

    def __repr__(self):
        return self.name


@register_op
class EmptyOperator(Operator):
    """Does nothing (timing/probe placeholder)."""

    def apply(self, sm):
        return sm


@register_op
class Wait(EmptyOperator):
    def __init__(self, duration, name=None):
        super().__init__(name=name or f"Wait({duration})", duration=duration)


@register_op
class Offset(EmptyOperator):
    """Empty operator with possibly negative duration (timing bookkeeping)."""

    def __init__(self, duration, name=None):
        super().__init__(name=name or f"Offset({duration})", duration=duration)


@register_op
class MultiOperator(Operator):
    """A sequence of operators applied as one."""

    PARAMS = ("operators",)

    def __init__(self, operators: Sequence[Operator], *, name=None, duration=None):
        operators = list(operators)
        if duration is None:
            # plain additions: np.asarray would crash on traced
            # durations (sequences built under jit) and would issue one
            # d2h tunnel transfer per device-array duration
            durs = [getattr(op, "duration", None) for op in operators]
            duration = sum(d for d in durs if d is not None) \
                if any(d is not None for d in durs) else 0.0
        name = name or "*".join(op.name for op in operators)
        self.operators = operators
        self.name = name
        self.duration = duration

    @classmethod
    def from_list(cls, ops, **kwargs):
        return cls(ops, **kwargs)

    @property
    def shape(self):
        return common.broadcast_shapes(*[op.shape for op in self.operators])

    @property
    def nshift(self):
        return sum(op.nshift for op in self.operators)

    @property
    def kdim(self):
        return max(op.kdim for op in self.operators)

    def strip_meta(self):
        ops = [op.strip_meta() for op in self.operators]
        return MultiOperator(ops, name="Multi", duration=0.0)

    def apply(self, sm):
        for op in self.operators:
            sm = op(sm)
        return sm

    def __getitem__(self, i):
        return self.operators[i]

    def __len__(self):
        return len(self.operators)


class DiffOperator(Operator):
    """Marker base for operators with derivative (order1/order2) support.

    Mirrors the reference hierarchy (epgpy/diff.py:20: ScalarOp,
    MatrixOp and S -- hence every physics op -- inherit DiffOperator,
    while probes/Wait/Spoiler do not), so ported code filtering with
    ``isinstance(op, DiffOperator)`` selects the same operator set.
    The order1/order2 parsing itself lives in Operator.__init__; this
    class adds no behavior.
    """


class CombinableOperator(Operator):
    """Mixin: linear operators mergeable into one precomputed operator.

    Pipeline convention (matches reference epgpy/operator.py:206-241 and
    test/test_diff.py:504-508): ``A @ B`` applies A first, then B.
    """

    def combinable(self, other) -> bool:
        return isinstance(other, CombinableOperator)

    def combine(self, other, *, name=None, duration=None, **kwargs):
        """Return a single operator applying `self` then `other`."""
        raise NotImplementedError

    def __matmul__(self, other):
        return self.combine(other)

    def __rmatmul__(self, other):
        return other.combine(self)


# -- utility operators (reference epgpy/operator.py:248-361) --


@register_op
class Spoiler(Operator):
    """Perfect spoiler: destroys all transverse magnetization."""

    def apply(self, sm):
        if sm.lanes:
            # half-lanes storage is (Fp, Z): zero the transverse plane
            def wipe(t):
                return (jnp.zeros_like(t[0]), t[1])
            return sm.update(states_re=wipe(sm.states_re),
                             states_im=wipe(sm.states_im))
        return sm.update(
            states_re=sm.states_re.at[..., 0:2].set(0),
            states_im=sm.states_im.at[..., 0:2].set(0),
        )


@register_op
class Reset(Operator):
    """Reset magnetization to equilibrium."""

    def apply(self, sm):
        # equilibrium leaves share the state layout in both modes.  The
        # equilibrium may carry batch axes WIDER than the states (e.g.
        # PD(batch, reset=False) then RESET): grow the states to the
        # common shape, as the reference's resize-on-update does
        # (reference epgpy/statematrix.py set(..., resize=True))
        if sm.lanes:
            def fill(eq, st):
                return tuple(
                    jnp.broadcast_to(
                        jnp.asarray(e, s.dtype),
                        jnp.broadcast_shapes(e.shape, s.shape))
                    for e, s in zip(eq, st))
            return sm.update(
                states_re=fill(sm.equilibrium_re, sm.states_re),
                states_im=fill(sm.equilibrium_im, sm.states_im))
        eq_re = jnp.asarray(sm.equilibrium_re, sm.states_re.dtype)
        eq_im = jnp.asarray(sm.equilibrium_im, sm.states_im.dtype)
        shape = jnp.broadcast_shapes(eq_re.shape, sm.states_re.shape)
        return sm.update(
            states_re=jnp.broadcast_to(eq_re, shape),
            states_im=jnp.broadcast_to(eq_im, shape),
        )


@register_op
class PD(Operator):
    """Set proton density (new equilibrium), optionally resetting states."""

    PARAMS = ("pd",)

    def __init__(self, pd, *, reset=True, name=None, **kwargs):
        self.pd = jnp.asarray(pd)
        self.reset = bool(reset)
        super().__init__(name=name or common.repr_operator("PD", ["pd"], [pd], [".1f"]), **kwargs)

    @property
    def shape(self):
        return common.get_shape(self.pd) or (1,)

    def apply(self, sm):
        n = sm.nstate
        K = 2 * n + 1
        rdtype = (sm.states_re[0] if sm.lanes else sm.states_re).dtype
        pd = common.expand_dims_after(jnp.asarray(self.pd, dtype=rdtype), sm.ndim)
        eq = jnp.zeros(pd.shape + (K, 3), dtype=rdtype).at[..., n, 2].set(pd)
        # the new equilibrium is center-only by construction: assert the
        # static sparsity hint explicitly (a traced eq would otherwise
        # conservatively clear it, changing the scan-carry structure)
        sm = sm.update(equilibrium=eq,
                       options={**sm.options, "_eq_center": True})
        if self.reset:
            shape = common.broadcast_shapes(sm.shape, tuple(pd.shape)) + (K, 3)
            sm = sm.update(states=jnp.broadcast_to(eq, shape))
        return sm


@register_op
class System(Operator):
    """Write named system properties (coords, modulation, weights, ...)."""

    PARAMS = ("values",)

    def __init__(self, name=None, **properties):
        self.keys = tuple(sorted(k for k in properties if k not in ("kvalue", "tvalue")))
        self.scalars = {k: properties[k] for k in ("kvalue", "tvalue") if k in properties}
        self.values = tuple(jnp.asarray(properties[k]) for k in self.keys)
        super().__init__(name=name or "System")

    def apply(self, sm):
        system = dict(sm.system)
        system.update(dict(zip(self.keys, self.values)))
        sm = sm.update(system=system)
        for k, v in self.scalars.items():
            sm = sm.update(**{k: v})
        return sm


NULL = EmptyOperator(name="NULL")
SPOILER = Spoiler(name="Spoiler")
RESET = Reset(name="Reset")
