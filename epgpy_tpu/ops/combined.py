"""Combined (pre-merged) linear operators.

``A @ B`` produces a single operator applying A then B (pipeline order,
reference epgpy/operator.py:206-241).  The constituents' coefficient /
matrix builders run at trace time and fold into one product; when the
parameters are static XLA constant-folds the whole merge, so a combined
operator costs exactly one kernel application -- same effect as the
reference's eager precomputation (epgpy/opscalar.py:101-147,
epgpy/opmatrix.py:173-187) but compatible with traced parameters and
real program boundaries.
"""

from __future__ import annotations

from .. import common
from . import base
from .scalarop import scalar_combine, apply_coefficients
from .matrixop import matrix_combine, apply_matrices

__all__ = ["CombinedOp", "combine"]


def combine(*ops, name=None, duration=None):
    """Merge combinable operators into one (reference epgpy/operator.py:236).

    ``combine(a, b, c)`` applies a, then b, then c -- as a single operator
    (same as ``a @ b @ c``).
    """
    if not ops:
        raise ValueError("combine() requires at least one operator")
    merged = ops[0]
    for op in ops[1:]:
        merged = merged @ op
    if name or duration is not None:
        if isinstance(merged, CombinedOp):
            merged = CombinedOp(merged.ops, name=name, duration=duration)
        else:
            # single-operator result: apply the overrides on a copy
            # instead of silently dropping them
            kw = {}
            if name:
                kw["name"] = name
            if duration is not None:
                kw["duration"] = duration
            merged = merged.copy(**kw)
    return merged


@base.register_op
class CombinedOp(base.CombinableOperator):
    """Product of combinable operators, applied as one."""

    PARAMS = ("ops",)

    def __init__(self, ops, *, name=None, duration=None):
        self.ops = list(ops)
        if duration is None:
            # no truthiness on durations: array durations are ambiguous
            durs = [getattr(op, "duration", None) for op in self.ops]
            duration = sum(d for d in durs if d is not None) \
                if any(d is not None for d in durs) else 0.0
        name = name or "|".join(op.name for op in self.ops)
        base.Operator.__init__(self, name=name, duration=duration)
        # expose the union of the constituents' tracked variables so the
        # diff layer sees them (coefficients stay on the constituents;
        # diff.substitute descends into self.ops)
        merged1, merged2 = {}, {}
        for op in self.ops:
            for var in (getattr(op, "order1", {}) or {}):
                merged1.setdefault(var, {})
            for pair in (getattr(op, "order2", {}) or {}):
                merged2.setdefault(pair, {})
        self.order1 = merged1
        self.order2 = merged2
        # lanes half-ladder layout is only valid if EVERY constituent
        # preserves F-(k) == conj(F+(-k)) -- an asymmetric check=False op
        # merged via @/combine() must disable it for the whole product
        self.preserves_ladder_symmetry = all(
            getattr(op, "preserves_ladder_symmetry", True)
            for op in self.ops)

    @classmethod
    def of(cls, first, second, *, name=None, duration=None):
        if not isinstance(second, base.CombinableOperator):
            raise TypeError(f"Non-combinable operator: {second!r}")
        ops = (first.ops if isinstance(first, CombinedOp) else [first])
        ops = ops + (second.ops if isinstance(second, CombinedOp) else [second])
        if name is None:
            name = f"{first.name}|{second.name}"
        if duration is None:
            d1 = getattr(first, "duration", None)
            d2 = getattr(second, "duration", None)
            d1 = 0.0 if d1 is None else d1
            d2 = 0.0 if d2 is None else d2
            duration = d1 + d2
        return cls(ops, name=name, duration=duration)

    @property
    def diagonal(self) -> bool:
        return all(getattr(op, "diagonal", False) for op in self.ops)

    @property
    def shape(self):
        return common.broadcast_shapes(*[op.shape for op in self.ops])

    @property
    def nshift(self):
        return sum(op.nshift for op in self.ops)

    def coefficients(self):
        arr, arr0 = self.ops[0].coefficients()
        for op in self.ops[1:]:
            a2, a02 = op.coefficients()
            arr, arr0 = scalar_combine(arr, a2, arr0, a02)
        return arr, arr0

    def matrices(self):
        mat, mat0 = self.ops[0].matrices()
        for op in self.ops[1:]:
            m2, m02 = op.matrices()
            mat, mat0 = matrix_combine(mat, m2, mat0, m02)
        return mat, mat0

    def apply(self, sm):
        if self.diagonal:
            arr, arr0 = self.coefficients()
            return apply_coefficients(sm, arr, arr0)
        mat, mat0 = self.matrices()
        return apply_matrices(sm, mat, mat0)

    def combinable(self, other):
        return isinstance(other, base.CombinableOperator)

    def combine(self, other, *, name=None, duration=None, **kwargs):
        return CombinedOp.of(self, other, name=name, duration=duration)

    def strip_meta(self):
        stripped = [op.strip_meta() for op in self.ops]
        return CombinedOp(stripped, name="Combined", duration=0.0)
