"""Differentiation layer: Jacobian / Hessian probes via JAX autodiff.

The reference hand-derives per-operator derivative matrices and propagates
them through a bespoke forward chain rule (reference epgpy/diff.py:20-378).
Here the whole machinery collapses into ``jax.jacfwd`` through the compiled
sequence:

* every operator stores its physical parameters as traced leaves, so the
  analytic derivative of its matrix w.r.t. any parameter is exact autodiff;
* variable aliases and expression chain rules (reference
  epgpy/diff.py:40-79 order1/order2 coefficient dicts) become a quadratic
  epsilon-substitution: each tracked op parameter is replaced by

      p(eps) = p + sum_v c1[v] eps_v
                 + sum_{v<=w} c2[(v,w)] eps_v eps_w (1/2 if v == w)

  with c1 = dp/dv and c2 = d2p/dv dw supplied by the spec (the sequence
  DSL fills them from symbolic derivatives).  Differentiating the signal
  w.r.t. eps at 0 with jacfwd / jacfwd-of-jacfwd reproduces the
  reference's first- and second-order accumulation exactly -- including
  the curvature term order2[pair][param] * dO/dp;
* unlike the reference, derivatives flow through *all* operators (shift,
  diffusion, exchange included -- reference raises NotImplementedError
  there, epgpy/shift.py:154-158).

Outputs match the reference probes: Jacobian -> (nADC, ..., nvars),
Hessian -> (nADC, ..., n1, n2); the pseudo-variable "magnitude" maps to
the signal itself / its first derivatives (reference epgpy/diff.py:384-476).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops import base, probe as probe_mod

__all__ = ["Jacobian", "Hessian", "Pair", "PartialsPruner",
           "parse_order1", "parse_order2"]


def Pair(*args):
    """Sorted variable pair (reference epgpy/diff.py:534)."""
    if len(args) == 1:
        args = tuple(args[0])
    if len(args) != 2:
        raise ValueError(f"Expected a pair, got {args}")
    return tuple(sorted(args))


def get_combinations(items):
    return list(itertools.combinations_with_replacement(sorted(items), 2))


def parse_order1(order1, parameters):
    """Normalize an order1 spec to {var: {param: coeff}}."""
    parameters = set(parameters)
    if isinstance(order1, str):
        order1 = [order1]
    if not order1:
        return {}
    if order1 is True:
        out = {p: {p: 1.0} for p in parameters}
    elif isinstance(order1, (list, tuple, set)):
        out = {p: {p: 1.0} for p in order1}
    elif isinstance(order1, dict) and all(isinstance(v, str) for v in order1.values()):
        out = {var: {order1[var]: 1.0} for var in order1}
    elif isinstance(order1, dict) and all(isinstance(v, dict) for v in order1.values()):
        out = {var: dict(cfs) for var, cfs in order1.items()}
    else:
        raise ValueError(f"Invalid 'order1' value: {order1!r}")
    invalid = {p for var in out for p in set(out[var]) - parameters}
    if invalid:
        raise ValueError(f"Unknown parameter(s): {invalid}")
    return out


def parse_order2(order2, order1, parameters):
    """Normalize an order2 spec to {Pair: {param: coeff}} (curvature terms)."""
    if not order2:
        return {}
    if not order1:
        raise ValueError("order1 must be set.")
    parameters = set(parameters)
    if order2 is True:
        out = {Pair(p): {} for p in get_combinations(order1)}
    elif isinstance(order2, str):
        out = {(order2, order2): {}}
    elif not isinstance(order2, dict) and all(isinstance(v, str) for v in order2):
        out = {Pair(p): {} for p in get_combinations(order2)}
    elif not isinstance(order2, dict) and all(isinstance(p, tuple) for p in order2):
        out = {Pair(p): {} for p in order2}
    elif isinstance(order2, dict):
        out = {Pair(p): dict(order2[p]) for p in order2}
    else:
        raise ValueError(f"Invalid 'order2' value: {order2!r}")
    invalid = {pair for pair in out if not (set(pair) & set(order1))}
    if invalid:
        raise ValueError(f"Variable pair(s) missing from order1: {invalid}")
    invalid = {p for pair in out for p in set(out[pair]) - parameters}
    if invalid:
        raise ValueError(f"Unknown parameter(s) in order2: {invalid}")
    return out


# -- probes --


class Jacobian(probe_mod.Probe):
    """Probe returning d(signal)/d(variables) at each ADC."""

    def __init__(self, variables, *, probe="F0"):
        self.probe_attr = probe
        if not isinstance(variables, list):
            variables = [variables]
        self.variables = list(variables)
        base.Operator.__init__(self, name=f"Jacobian({probe})")

    def __repr__(self):
        return f"Jacobian({self.probe_attr})"


class Hessian(probe_mod.Probe):
    """Probe returning d2(signal)/d(vars1)d(vars2) at each ADC."""

    def __init__(self, variables1, variables2=None, *, probe="F0"):
        self.probe_attr = probe
        if not isinstance(variables1, list):
            variables1 = [variables1]
        if not variables2:
            variables2 = list(variables1)
        elif not isinstance(variables2, list):
            variables2 = [variables2]
        self.variables1 = list(variables1)
        self.variables2 = list(variables2)
        base.Operator.__init__(self, name=f"Hessian({probe})")

    def __repr__(self):
        return f"Hessian({self.probe_attr})"


base.register_op(Jacobian)
base.register_op(Hessian)


class PartialsPruner:
    """API-compat stub (reference epgpy/diff.py:479-527).

    The reference prunes small derivative state matrices to save the
    Python loop's time; with dense batched jacfwd tangents this is a no-op
    -- use ``simulate(..., jacobian_chunk=N)`` to bound tangent memory
    instead.
    """

    def __init__(self, *, condition=1e-5, variables=None):
        self.condition = condition
        self.variables = variables

    def __call__(self, sm):  # pragma: no cover - intentional no-op
        return None


# -- epsilon substitution --


def tracked_variables(sequence) -> List[str]:
    """All variables tracked by order1 specs, in first-appearance order."""
    seen, out = set(), []
    for op in sequence:
        for var in getattr(op, "order1", {}) or {}:
            if var not in seen:
                seen.add(var)
                out.append(var)
    return out


def substitute(op, eps: Dict[str, jnp.ndarray]):
    """Copy `op` with tracked parameters shifted by the eps expansion.

    Linear deltas carry sum_v c1 eps_v; the order2 curvature terms
    (d2 param / dv dw) enter as quadratic deltas.  Operators with
    user-supplied derivative *arrays* (ScalarOp darrs / MatrixOp dmats,
    reference epgpy/opscalar.py:101-147) get first-order array shifts from
    the linear deltas and second-order shifts from their pairwise products.
    """
    order1 = getattr(op, "order1", {}) or {}
    order2 = getattr(op, "order2", {}) or {}
    if not order1:
        return op
    lin: Dict[str, object] = {}
    quad: Dict[str, object] = {}
    for var, coeffs in order1.items():
        if var not in eps:
            continue
        for param, c in coeffs.items():
            lin[param] = lin.get(param, 0.0) + jnp.asarray(c) * eps[var]
    for (v1, v2), coeffs in order2.items():
        if v1 not in eps or v2 not in eps:
            continue
        scale = 0.5 if v1 == v2 else 1.0
        for param, c in coeffs.items():
            quad[param] = (quad.get(param, 0.0)
                           + scale * jnp.asarray(c) * eps[v1] * eps[v2])
    if not lin and not quad:
        return op.copy(order1={}, order2={})
    new = op.copy(order1={}, order2={})

    darrs = getattr(op, "diff_arrays", None)
    handled = set()
    if darrs is not None:
        handled = new.apply_diff_arrays(lin, quad)

    for param in set(lin) | set(quad):
        if param in handled:
            continue
        delta = lin.get(param, 0.0) + quad.get(param, 0.0)
        if param in type(new).PARAMS:
            old = getattr(new, param)
            object.__setattr__(new, param, jnp.asarray(old) + delta)
        elif (param + "_re") in type(new).PARAMS:
            # split-complex parameter (e.g. R's rates)
            d = jnp.asarray(delta)
            object.__setattr__(new, param + "_re",
                               jnp.asarray(getattr(new, param + "_re")) + d.real)
            if jnp.iscomplexobj(d):
                object.__setattr__(new, param + "_im",
                                   jnp.asarray(getattr(new, param + "_im")) + d.imag)
        else:
            raise ValueError(
                f"Cannot substitute parameter {param!r} on {type(op).__name__}")
    return new


# -- diff simulation path --

#: compiled diff programs keyed on (op ids, probe ids, variable sets, state
#: structure); values hold strong refs to ops/probes so the ids stay valid
_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_MAX = 8


def simulate_diff(sequence, probes, sm, *, plan_builder, executor,
                  jacobian_chunk: Optional[int] = None):
    """Run simulate with Jacobian/Hessian probes via (nested) jacfwd.

    Args:
        sequence: flattened op list (with order1/order2 specs attached).
        probes: tuple of probe objects (mix of regular and diff probes).
        sm: initial StateMatrix.
        plan_builder(seq) -> (plan_kinds, payload): engine's planner.
        executor(plan_kinds, payload, probes, sm) -> (sm, chunks): engine's
            trace-time plan executor (called inside jit here).

    Returns: tuple over probes of host numpy arrays (ADC axis leading).
    """
    from .ops.probe import Adc

    variables = tracked_variables(sequence)

    # Hessians differentiate a *restricted* pair of tangent sets
    # (vars1 x vars2), not all-pairs -- this is what keeps the
    # 800-variable MRF Hessian (reference profiling example) tractable.
    hess_probes = [pb for pb in probes if isinstance(pb, Hessian)]
    need_hessian = bool(hess_probes)
    vars1 = [v for pb in hess_probes for v in pb.variables1
             if v != "magnitude" and v in variables]
    vars2 = [v for pb in hess_probes for v in pb.variables2
             if v != "magnitude" and v in variables]
    vars1 = list(dict.fromkeys(vars1))
    vars2 = list(dict.fromkeys(vars2))

    # which state attributes the diff probes read
    attrs = []
    for pb in probes:
        attr = getattr(pb, "probe_attr", None)
        if attr and attr not in attrs:
            attrs.append(attr)

    regular = [pb for pb in probes
               if not isinstance(pb, (Jacobian, Hessian))]
    eval_probes = tuple(regular) + tuple(Adc(attr=a, name=f"_d_{a}") for a in attrs)

    def run(eps):
        seq2 = [substitute(op, eps) for op in sequence]
        plan_kinds, payload = plan_builder(seq2)
        _, chunks = executor(plan_kinds, payload, eval_probes, sm)
        # chunks -> per-probe stacked outputs, complex split for autodiff
        merged = chunks[0] if len(chunks) == 1 else jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *chunks)
        out = []
        for v in merged:
            v = jnp.asarray(v)
            if jnp.iscomplexobj(v):
                out.append((v.real, v.imag))
            else:
                out.append((v, jnp.zeros_like(v)))
        return tuple(out)

    zero = jnp.zeros((), sm.states_re.dtype)
    eps0 = {var: zero for var in variables}
    eps1_0 = {var: zero for var in vars1}
    eps2_0 = {var: zero for var in vars2}

    def f(eps):
        return run(eps)

    def f2(eps1, eps2):
        # independent tangent sets; shared variables get both shifts
        eps = dict(eps0)
        for v, e in eps1.items():
            eps[v] = eps[v] + e
        for v, e in eps2.items():
            eps[v] = eps[v] + e
        return run(eps)

    # cache the compiled program across calls on the same operator objects
    # (jax.jit of a fresh closure would otherwise recompile every call)
    cache_key = (
        tuple(id(op) for op in sequence),
        tuple(id(pb) for pb in probes),
        tuple(variables), tuple(vars1), tuple(vars2), need_hessian,
        jax.tree.structure(sm),
        tuple((jnp.shape(l), jnp.result_type(l).name) for l in jax.tree.leaves(sm)),
    )
    cached = _PROGRAM_CACHE.get(cache_key)
    if cached is None:
        def program(eps, eps1, eps2, sm_in):
            nonlocal sm
            sm, sm_prev = sm_in, sm
            try:
                value = f(eps)
                jac = jax.jacfwd(f)(eps)
                hess = (jax.jacfwd(jax.jacfwd(f2, argnums=0), argnums=1)(
                    eps1, eps2) if need_hessian else None)
            finally:
                sm = sm_prev
            return value, jac, hess

        cached = (jax.jit(program), list(sequence), tuple(probes))
        if len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
        _PROGRAM_CACHE[cache_key] = cached

    value, jac, hess = cached[0](eps0, eps1_0, eps2_0, sm)
    # single batched host fetch: device_get prefetches every leaf's d2h
    # copy asynchronously before blocking, so the (possibly hundreds of)
    # per-variable arrays cost one round-trip latency instead of one each
    value, jac, hess = jax.device_get((value, jac, hess))

    def _c(pair):
        return np.asarray(pair[0]) + 1j * np.asarray(pair[1])

    def _cd(pair_of_dicts, var):
        re, im = pair_of_dicts
        return np.asarray(re[var]) + 1j * np.asarray(im[var])

    def _cdd(pair, v1, v2):
        re, im = pair
        return np.asarray(re[v1][v2]) + 1j * np.asarray(im[v1][v2])

    # assemble outputs per probe, in order
    values_np = [_c(v) for v in value]
    sig_by_attr = {a: values_np[len(regular) + i] for i, a in enumerate(attrs)}
    jac_by_attr = {a: jac[len(regular) + i] for i, a in enumerate(attrs)}
    hess_by_attr = {a: (hess[len(regular) + i] if hess else None)
                    for i, a in enumerate(attrs)}

    out = []
    for ip, pb in enumerate(probes):
        if isinstance(pb, Jacobian):
            sig = sig_by_attr[pb.probe_attr]
            zeros = np.zeros_like(sig)
            cols = []
            for var in pb.variables:
                if var == "magnitude":
                    cols.append(sig)
                elif var in variables:
                    cols.append(_cd(jac_by_attr[pb.probe_attr], var))
                else:
                    cols.append(zeros)
            out.append(np.stack(cols, axis=-1))
        elif isinstance(pb, Hessian):
            sig = sig_by_attr[pb.probe_attr]
            zeros = np.zeros_like(sig)
            rows = []
            for v1 in pb.variables1:
                row = []
                for v2 in pb.variables2:
                    if v1 == "magnitude" and v2 == "magnitude":
                        row.append(zeros)
                    elif v1 == "magnitude":
                        row.append(_cd(jac_by_attr[pb.probe_attr], v2)
                                   if v2 in variables else zeros)
                    elif v2 == "magnitude":
                        row.append(_cd(jac_by_attr[pb.probe_attr], v1)
                                   if v1 in variables else zeros)
                    elif v1 in variables and v2 in variables:
                        row.append(_cdd(hess_by_attr[pb.probe_attr], v1, v2))
                    else:
                        row.append(zeros)
                rows.append(np.stack(row, axis=-1))
            out.append(np.stack(rows, axis=-2))
        else:
            out.append(values_np[regular.index(pb)])
    return tuple(out)
