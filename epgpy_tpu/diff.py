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
import logging
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
        if isinstance(variables, tuple):
            variables = list(variables)
        elif not isinstance(variables, list):
            variables = [variables]
        self.variables = list(variables)
        base.Operator.__init__(self, name=f"Jacobian({probe})")

    def __repr__(self):
        return f"Jacobian({self.probe_attr})"


class Hessian(probe_mod.Probe):
    """Probe returning d2(signal)/d(vars1)d(vars2) at each ADC."""

    def __init__(self, variables1, variables2=None, *, probe="F0"):
        self.probe_attr = probe
        if isinstance(variables1, tuple):
            variables1 = list(variables1)
        elif not isinstance(variables1, list):
            variables1 = [variables1]
        if isinstance(variables2, tuple):
            variables2 = list(variables2)
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
    """API-compat no-op (reference epgpy/diff.py:479-527).

    The reference prunes small derivative state matrices to bound the
    memory/time of its Python-loop forward accumulation.  Here derivatives
    are dense jacfwd tangents inside one compiled program, so there is
    nothing to prune; the equivalent memory-control knob is
    ``simulate(..., jacobian_chunk=N)``, which processes the tangent basis
    (and Hessian blocks) N columns at a time (see ``simulate_diff``).

    Because the reference documents a real accuracy-vs-cost trade here,
    instantiation emits a one-time warning so users relying on that
    behavior are not silently surprised.
    """

    _warned = False

    def __init__(self, *, condition=1e-5, variables=None):
        if not PartialsPruner._warned:
            PartialsPruner._warned = True
            logging.getLogger(__name__).warning(
                "PartialsPruner is an API-compat no-op in epgpy_tpu: "
                "derivatives are dense jacfwd tangents in one compiled "
                "program (nothing to prune, no accuracy trade).  Use "
                "simulate(..., jacobian_chunk=N) to bound derivative "
                "memory instead.")
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


def _subst_key(op):
    """Hashable value-signature of an op for substitution memoization.

    Repeated sequences build a fresh-but-identical operator per TR
    (e.g. 400 equal E ops); substituting each separately yields
    *distinct* traced leaves, which defeats the planner's scan-constant
    hoisting (engine._slot_invariant compares tracers by identity
    only).  Memoizing on the host-value signature returns THE SAME
    substituted object for value-identical ops, so invariant slots stay
    hoisted in diff programs.  Returns None (no memoization) when any
    leaf is non-host or the signature is unhashable.
    """
    try:
        leaves, treedef = jax.tree.flatten(op)
        sig = []
        for leaf in leaves:
            if isinstance(leaf, (jax.core.Tracer, jax.Array)):
                return None
            arr = np.asarray(leaf)
            sig.append((arr.tobytes(), arr.shape, str(arr.dtype)))
        # order1/order2 specs live in the op's aux data (common.freeze_aux
        # byte-encodes them), so the treedef (hashable, compares aux)
        # already covers them
        return (type(op), treedef, tuple(sig))
    except (TypeError, ValueError):
        return None


def substitute(op, eps: Dict[str, jnp.ndarray]):
    """Copy `op` with tracked parameters shifted by the eps expansion.

    Linear deltas carry sum_v c1 eps_v; the order2 curvature terms
    (d2 param / dv dw) enter as quadratic deltas.  Operators with
    user-supplied derivative *arrays* (ScalarOp darrs / MatrixOp dmats,
    reference epgpy/opscalar.py:101-147) get first-order array shifts from
    the linear deltas and second-order shifts from their pairwise products.
    """
    from .ops.combined import CombinedOp

    if isinstance(op, CombinedOp):
        # tracked parameters live on the constituents: substitute each
        subs = [substitute(sub, eps) for sub in op.ops]
        if all(s is o for s, o in zip(subs, op.ops)):
            return op
        return CombinedOp(subs, name=op.name, duration=op.duration)

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

#: compiled diff programs keyed on (op ids, probe ids, variable sets, chunk
#: sizes, state structure); values hold strong refs to ops/probes so the
#: ids stay valid
_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_MAX = 8


def _pad_index(positions, chunk):
    """Pad an index list to a multiple of `chunk` with the dummy slot.

    The dummy slot is one past the last real variable: tangents seeded
    there shift nothing, so the padded jacobian columns are exact zeros
    and are cropped after assembly.
    """
    n = len(positions)
    nchunks = max(-(-n // chunk), 1)
    dummy = -1  # filled by caller with the dummy slot index
    return np.asarray(list(positions) + [dummy] * (nchunks * chunk - n),
                      dtype=np.int32), nchunks


def simulate_diff(sequence, probes, sm, *, plan_builder, executor,
                  jacobian_chunk: Optional[int] = None,
                  asarray: bool = True):
    """Run simulate with Jacobian/Hessian probes via (nested) jacfwd.

    Tangents are seeded on an epsilon *vector* with one slot per tracked
    variable.  ``jacobian_chunk=N`` bounds tangent memory: the jacfwd basis
    is processed N columns at a time (and the Hessian in N x N blocks),
    each chunk a call of ONE compiled program with a traced offset -- so
    chunking does not multiply compile time.  This replaces the
    reference's PartialsPruner as the memory-control knob for very wide
    MRF problems (~800 per-pulse variables,
    reference examples/profiling/differentiation_mrf.py:54-67).

    Args:
        sequence: flattened op list (with order1/order2 specs attached).
        probes: tuple of probe objects (mix of regular and diff probes).
        sm: initial StateMatrix.
        plan_builder(seq) -> (plan_kinds, payload): engine's planner.
        executor(plan_kinds, payload, probes, sm) -> (sm, chunks): engine's
            trace-time plan executor (called inside jit here).
        jacobian_chunk: max tangent columns processed at once (None = all).
        asarray: convert outputs to host numpy (default).  With False the
            outputs stay on device as ``{"__c_re", "__c_im"}`` dicts of
            real arrays (complex cannot cross the program boundary on
            TPU) -- this skips the device->host copy of the full
            Jacobian/Hessian, which through a slow host link can cost
            several times the device compute itself (measured: 660 ms
            d2h for 19.7 MB vs 36 ms device compute at 200 TR x 4096
            atoms x 2 tangents).

    Returns: tuple over probes of host numpy arrays (ADC axis leading),
    or encoded device arrays when ``asarray=False``.
    """
    from .ops.probe import Adc

    variables = tracked_variables(sequence)
    nvars = len(variables)
    var_idx = {v: i for i, v in enumerate(variables)}

    # Hessians differentiate a *restricted* pair of tangent sets
    # (vars1 x vars2), not all-pairs -- this is what keeps the
    # 800-variable MRF Hessian (reference profiling example) tractable.
    hess_probes = [pb for pb in probes if isinstance(pb, Hessian)]
    vars1 = [v for pb in hess_probes for v in pb.variables1
             if v != "magnitude" and v in var_idx]
    vars2 = [v for pb in hess_probes for v in pb.variables2
             if v != "magnitude" and v in var_idx]
    vars1 = list(dict.fromkeys(vars1))
    vars2 = list(dict.fromkeys(vars2))
    n1, n2 = len(vars1), len(vars2)
    need_hessian = bool(hess_probes) and n1 > 0 and n2 > 0

    # which state attributes the diff probes read
    attrs = []
    for pb in probes:
        attr = getattr(pb, "probe_attr", None)
        if attr and attr not in attrs:
            attrs.append(attr)

    regular = [pb for pb in probes
               if not isinstance(pb, (Jacobian, Hessian))]
    eval_probes = tuple(regular) + tuple(Adc(attr=a, name=f"_d_{a}") for a in attrs)

    dtype = jnp.result_type(jax.tree.leaves(sm)[0])
    dummy = nvars  # extra eps slot absorbing padded tangent columns

    # device-array op leaves must be ARGUMENTS of the compiled programs,
    # not closure constants: a jit-captured constant loses its sharding
    # (GSPMD replicates it), so a user who shards op parameters over an
    # atom mesh would silently get a replicated Jacobian.  Host leaves
    # stay closed over -- that keeps the value-signature substitution
    # memoization (scan-constant hoisting) intact for the common case.
    _seq_leaves, _seq_treedef = jax.tree.flatten(list(sequence))
    _dev_pos = tuple(i for i, l in enumerate(_seq_leaves)
                     if isinstance(l, jax.Array))

    def _rebuild(dev_vals):
        """Sequence with device leaves replaced by traced `dev_vals`."""
        if not _dev_pos:
            return sequence
        ls = list(_seq_leaves)
        for p, v in zip(_dev_pos, dev_vals):
            ls[p] = v
        return jax.tree.unflatten(_seq_treedef, ls)

    def run_vec(eps_vec, sm_in, dev_vals):
        eps = {var: eps_vec[i] for i, var in enumerate(variables)}
        # memoize substitution by op value-signature: value-identical
        # ops (one fresh-but-equal op per TR) must map to ONE
        # substituted object so scan-constant hoisting survives
        memo = {}
        seq2 = []
        for op in _rebuild(dev_vals):
            key = _subst_key(op)
            sub = memo.get(key) if key is not None else None
            if sub is None:
                sub = substitute(op, eps)
                if key is not None:
                    memo[key] = sub
            seq2.append(sub)
        plan_kinds, payload = plan_builder(seq2)
        _, chunks = executor(plan_kinds, payload, eval_probes, sm_in)
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

    # chunk sizes (tangent columns per compiled call)
    cj = nvars if not jacobian_chunk else min(int(jacobian_chunk), nvars)
    c1 = n1 if not jacobian_chunk else min(int(jacobian_chunk), n1)
    c2 = n2 if not jacobian_chunk else min(int(jacobian_chunk), n2)

    idx_j, nchunks_j = _pad_index(range(nvars), cj) if nvars else (None, 0)
    idx_1, nchunks_1 = _pad_index([var_idx[v] for v in vars1], c1) \
        if need_hessian else (None, 0)
    idx_2, nchunks_2 = _pad_index([var_idx[v] for v in vars2], c2) \
        if need_hessian else (None, 0)
    for idx in (idx_j, idx_1, idx_2):
        if idx is not None:
            idx[idx < 0] = dummy

    # cache the compiled programs across calls on the same operator objects
    # (jax.jit of a fresh closure would otherwise recompile every call)
    cache_key = (
        tuple(id(op) for op in sequence),
        tuple(id(pb) for pb in probes),
        tuple(variables), tuple(vars1), tuple(vars2), need_hessian,
        cj, c1, c2,
        jax.tree.structure(sm),
        tuple((jnp.shape(l), jnp.result_type(l).name) for l in jax.tree.leaves(sm)),
    )
    cached = _PROGRAM_CACHE.get(cache_key)
    if cached is None:
        zero_vec = jnp.zeros((nvars + 1,), dtype)
        idx_j_arr = None if idx_j is None else jnp.asarray(idx_j)
        idx_1_arr = None if idx_1 is None else jnp.asarray(idx_1)
        idx_2_arr = None if idx_2 is None else jnp.asarray(idx_2)

        def value_prog(sm_in, dev_vals):
            return run_vec(zero_vec, sm_in, dev_vals)

        def jac_prog(offset, sm_in, dev_vals):
            pos = jax.lax.dynamic_slice(idx_j_arr, (offset,), (cj,))

            def g(chunk):
                return run_vec(zero_vec.at[pos].add(chunk), sm_in, dev_vals)

            return jax.jacfwd(g)(jnp.zeros((cj,), dtype))

        def hess_prog(off1, off2, sm_in, dev_vals):
            pos1 = jax.lax.dynamic_slice(idx_1_arr, (off1,), (c1,))
            pos2 = jax.lax.dynamic_slice(idx_2_arr, (off2,), (c2,))

            def g2(e1, e2):
                # independent tangent sets; shared variables get both
                return run_vec(zero_vec.at[pos1].add(e1).at[pos2].add(e2),
                               sm_in, dev_vals)

            # inner jacfwd appends the vars1 axis, outer the vars2 axis:
            # block leaves are (..., c1, c2)
            return jax.jacfwd(jax.jacfwd(g2, argnums=0), argnums=1)(
                jnp.zeros((c1,), dtype), jnp.zeros((c2,), dtype))

        if not jacobian_chunk:
            # single fused program: one dispatch per call
            def fused(sm_in, dev_vals):
                value = value_prog(sm_in, dev_vals)
                jac = jac_prog(0, sm_in, dev_vals) if nvars else None
                hess = (hess_prog(0, 0, sm_in, dev_vals)
                        if need_hessian else None)
                return value, jac, hess

            cached = ("fused", jax.jit(fused), list(sequence), tuple(probes))
        else:
            cached = ("chunked", jax.jit(value_prog), jax.jit(jac_prog),
                      jax.jit(hess_prog) if need_hessian else None,
                      list(sequence), tuple(probes))
        if len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
        _PROGRAM_CACHE[cache_key] = cached

    xp = np if asarray else jnp
    fetch = jax.device_get if asarray else (lambda t: t)

    def _cat(parts, axis):
        """Concatenate pytrees of chunk results along a tangent axis."""
        if len(parts) == 1:
            return parts[0]
        return jax.tree.map(
            lambda *xs: xp.concatenate(xs, axis=axis), *parts)

    dev_vals = [_seq_leaves[p] for p in _dev_pos]

    if cached[0] == "fused":
        value, jac, hess = fetch(cached[1](sm, dev_vals))
    else:
        _, value_fn, jac_fn, hess_fn = cached[:4]
        # asarray mode: one batched host fetch per chunk call: device_get
        # prefetches all leaves' d2h copies before blocking (one
        # round-trip, not one per variable -- critical through a slow
        # host link)
        value = fetch(value_fn(sm, dev_vals))
        jac = None
        if nvars:
            jac = _cat([fetch(jac_fn(k * cj, sm, dev_vals))
                        for k in range(nchunks_j)], axis=-1)
        hess = None
        if need_hessian:
            rows = []
            for a in range(nchunks_1):
                row = [fetch(hess_fn(a * c1, b * c2, sm, dev_vals))
                       for b in range(nchunks_2)]
                rows.append(_cat(row, axis=-1))
            hess = _cat(rows, axis=-2)

    # assemble outputs per probe, per re/im channel (device mode cannot
    # form complex arrays eagerly: complex must not cross the program
    # boundary on TPU -- the channels are combined at the very end, on
    # the host (complex) or as {"__c_re","__c_im"} dicts (device)
    def _assemble(ch):
        values_ch = [xp.asarray(v[ch]) for v in value]
        sig_by_attr = {a: values_ch[len(regular) + i]
                       for i, a in enumerate(attrs)}
        jac_by_attr, hess_by_attr = {}, {}
        for i, a in enumerate(attrs):
            jac_by_attr[a] = (xp.asarray(jac[len(regular) + i][ch])
                              if jac is not None else None)
            hess_by_attr[a] = (xp.asarray(hess[len(regular) + i][ch])
                               if hess is not None else None)

        row1 = {v: k for k, v in enumerate(vars1)}
        col2 = {v: k for k, v in enumerate(vars2)}

        out = []
        for pb in probes:
            if isinstance(pb, Jacobian):
                sig = sig_by_attr[pb.probe_attr]
                zeros = xp.zeros_like(sig)
                jarr = jac_by_attr[pb.probe_attr]
                cols = []
                for var in pb.variables:
                    if var == "magnitude":
                        cols.append(sig)
                    elif var in var_idx:
                        cols.append(jarr[..., var_idx[var]])
                    else:
                        # a zero column here would silently poison
                        # downstream CRLB / Gauss-Newton fits (the
                        # reference raises KeyError on sm.order1[var])
                        raise ValueError(
                            f"Jacobian probe variable {var!r} is not "
                            f"tracked by any operator (tracked: "
                            f"{sorted(var_idx)})")
                out.append(xp.stack(cols, axis=-1))
            elif isinstance(pb, Hessian):
                sig = sig_by_attr[pb.probe_attr]
                zeros = xp.zeros_like(sig)
                jarr = jac_by_attr[pb.probe_attr]
                harr = hess_by_attr[pb.probe_attr]
                rows = []
                for v1 in pb.variables1:
                    row = []
                    for v2 in pb.variables2:
                        for v in (v1, v2):
                            if v != "magnitude" and v not in var_idx:
                                # silent zeros would poison CRLB fits;
                                # the reference raises on sm.order2[..]
                                raise ValueError(
                                    f"Hessian probe variable {v!r} is "
                                    f"not tracked by any operator "
                                    f"(tracked: {sorted(var_idx)})")
                        if v1 == "magnitude" and v2 == "magnitude":
                            row.append(zeros)
                        elif v1 == "magnitude":
                            row.append(jarr[..., var_idx[v2]])
                        elif v2 == "magnitude":
                            row.append(jarr[..., var_idx[v1]])
                        elif v1 in row1 and v2 in col2:
                            row.append(harr[..., row1[v1], col2[v2]])
                        else:
                            raise ValueError(
                                f"Hessian pair ({v1!r}, {v2!r}) is "
                                f"outside the computed block "
                                f"({sorted(row1)} x {sorted(col2)})")
                    rows.append(xp.stack(row, axis=-1))
                out.append(xp.stack(rows, axis=-2))
            else:
                out.append(values_ch[regular.index(pb)])
        return out

    out_re, out_im = _assemble(0), _assemble(1)
    if asarray:
        return tuple(re + 1j * im for re, im in zip(out_re, out_im))
    return tuple({"__c_re": re, "__c_im": im}
                 for re, im in zip(out_re, out_im))
