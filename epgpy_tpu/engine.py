"""Simulation engine: compile an operator sequence to an XLA program.

The reference applies operators in a Python hot loop, one NumPy kernel
dispatch per operator (reference epgpy/functions.py:173-192).  Here the
whole sequence compiles to a single XLA program:

* the sequence is *planned*: runs of structurally-identical operator blocks
  (same classes, static configs and parameter shapes -- detected via
  ``Operator.signature``) are converted into one ``lax.scan`` over their
  stacked parameters.  A 1000-TR MRF train [T, E, S, ADC] x 1000 traces as
  ONE scan step, not 4000 ops;
* remaining operators are unrolled inline (they still fuse under jit);
* probe outputs become scan outputs / jit results -- no per-ADC host copy
  (the reference copies device->host at every ADC, epgpy/probe.py:63-66).

The ladder capacity is fixed up-front from the sequence's total shift count
(``getnshift``) or the ``max_nstate`` option, making every shape static.
"""

from __future__ import annotations

import logging
import math
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import common
from .statematrix import StateMatrix
from .ops import base, probe as probe_mod

LOGGER = logging.getLogger(__name__)

__all__ = [
    "simulate", "simulate_simple", "modify", "flatten_sequence",
    "squeeze_sequence", "getshape", "getnshift", "getkdim",
    "get_adc_times",
]


# -- sequence introspection (host-side) --


def flatten_sequence(seq, flatten_multi: bool = True) -> List[base.Operator]:
    """Flatten nested lists / MultiOperators into a flat operator list."""
    seq = [seq] if isinstance(seq, base.Operator) else seq
    out = []
    for item in seq:
        if isinstance(item, (list, tuple)):
            out.extend(flatten_sequence(item, flatten_multi))
        elif flatten_multi and isinstance(item, base.MultiOperator):
            out.extend(flatten_sequence(item.operators, flatten_multi))
        elif isinstance(item, base.Operator):
            out.append(item)
        else:
            raise ValueError(f"Invalid operator: {item!r}")
    return out


def getshape(sequence) -> tuple:
    """Broadcast batch shape of the whole sequence (append rule)."""
    ops = flatten_sequence(sequence)
    return common.broadcast_shapes(*[op.shape for op in ops])


def getnshift(sequence) -> int:
    """Total ladder growth over the sequence."""
    return sum(op.nshift for op in flatten_sequence(sequence))


def getkdim(sequence) -> int:
    """Number of gradient axes used by the sequence."""
    return max([getattr(op, "kdim", 1) for op in flatten_sequence(sequence)], default=1)


def get_adc_times(sequence):
    """ADC opening times from operator durations (host-side metadata)."""
    tic, times = 0, []
    for op in flatten_sequence(sequence):
        tic = tic + np.asarray(op.duration)
        if isinstance(op, probe_mod.Probe):
            times.append(tic)
    return times


def simulate_simple(sm, sequence, probes=None, callback=None, disp=False):
    """Plain eager sequence loop (reference functions.py:173-192).

    Applies each operator to `sm` in Python (no jit/scan planning) and
    acquires `probes` (or the sequence's own probe ops) at every Probe.
    Returns ``(values, times)`` with ``values[i] = [probe values at the
    i-th probe op]`` -- the reference's nested-list contract.  Useful
    for debugging and as an oracle for the planned engine; for
    performance use :func:`simulate`.

    The ladder is pre-sized to the sequence's shift count (the reference
    resizes dynamically inside each shift; our StateMatrix is static).
    """
    from .ops import probe as _probe

    seq = flatten_sequence(sequence)
    opts = getattr(sm, "options", None) or {}
    ncap = _capacity(seq, getnshift(seq), opts.get("max_nstate"),
                     opts.get("kgrid"), getattr(sm, "kvalue", 1.0),
                     getattr(sm, "tvalue", 1.0))
    if sm.nstate < ncap:
        sm = sm.resize(ncap)
    if disp:
        from .utils.helpers import progressbar
        seq = progressbar(seq, "Simulating: ")
    tic = 0
    times, values = [], []
    for op in seq:
        sm = op(sm)
        tic = tic + np.asarray(op.duration)
        if isinstance(op, _probe.Probe):
            values.append([(pb if pb is not None else op).acquire(
                sm, post=op.post) for pb in (probes or [op])])
            times.append(tic)
        elif callback is not None:
            callback(sm)
    return values, times


#: default half-capacity for n-D / float coordinate tables (the reference
#: grows tables dynamically; a static framework needs a default cap)
DEFAULT_TABLE_NSTATE = 255

#: simulate() **options consumed by StateMatrix / shift ops (reference
#: epgpy reads sm.options in shift.py:86-89,130); anything else is warned
_KNOWN_OPTIONS = frozenset({
    "max_nstate", "kgrid", "prune", "kvalue", "tvalue", "density",
    "equilibrium", "coords", "nstate", "shape", "check", "system",
    "fisp_kernel",
})


def _capacity(sequence, nshift: int, max_nstate, kgrid=None,
              kvalue=1.0, tvalue=1.0) -> int:
    """Static ladder half-capacity for the sequence.

    1-D integer sequences are exact with ``nshift``.  Coordinate-table
    sequences (n-D / float shifts) can populate up to the lattice box
    ``prod_d (2 sum|k_d| + 1)`` -- counted in merge-grid cells when the
    table is float-valued (physical wavenumbers are ``k * kvalue``, so
    a 0.31 shift with kvalue=1 on a 0.01 grid spans 31 cells, not 1) --
    or 3^m splitting paths if smaller; cap at ``max_nstate`` or
    DEFAULT_TABLE_NSTATE.
    """
    from .ops.shift import S

    shift_ops = [op for op in sequence if isinstance(op, S)]
    table = any(not isinstance(op.k, int) or op.kdim > 1 for op in shift_ops)
    if not table:
        ncap = int(nshift)
        return min(ncap, int(max_nstate)) if max_nstate else ncap

    # lattice-box bound per dimension.  Traced shift values (sequence
    # built inside jit/shard_map) have no host values: skip the bound
    # and use the cap directly.
    if any(isinstance(getattr(op, "kleaf", None), jax.core.Tracer)
           for op in shift_ops):
        return int(max_nstate) if max_nstate else DEFAULT_TABLE_NSTATE
    kdim = max(op.kdim for op in shift_ops)
    sums = np.zeros(kdim)
    any_float = False
    for op in shift_ops:
        if isinstance(op.k, int):
            sums[0] += abs(op.k)
            continue
        karr = np.atleast_2d(np.asarray(op.k, dtype=float))
        if not np.issubdtype(np.asarray(op.k).dtype, np.integer):
            any_float = True
        mags = np.max(np.abs(karr.reshape(-1, karr.shape[-1])), axis=0)
        sums[:len(mags)] += mags
    if any_float and kgrid:
        # grid cells = |physical wavenumber| / kgrid; the per-axis
        # physical scale is [kvalue...(<=3), tvalue (4th/time axis)]
        # (statematrix.ktvalue semantics; signs never widen the box).
        # Device/traced scales have no host value: leave them at 1.
        if isinstance(kvalue, (jax.Array, jax.core.Tracer)):
            kvalue = None
        if isinstance(tvalue, (jax.Array, jax.core.Tracer)):
            tvalue = None
        if kvalue is not None and common.get_shape(kvalue):
            kscales = np.abs(np.asarray(kvalue, dtype=float).ravel())[:3]
        else:
            kscales = np.full(min(kdim, 3),
                              abs(1.0 if kvalue is None else float(kvalue)))
        scales = np.ones(kdim)
        scales[:len(kscales)] = kscales[:kdim]
        if kdim == 4:
            scales[3] = abs(float(tvalue)) if tvalue is not None else 1.0
        sums = sums * scales / float(kgrid)
    from . import config
    if kdim > 1 and not config.x64_enabled():
        # int32 merge-key capacity (f32 mode): shiftnd._encode_keys
        # packs the kdim-D cell coords into one integer key; past 2^31
        # the antisymmetric keys wrap and distinct cells can collide.
        # The device-side runtime check only runs on CPU (host
        # callbacks are unsupported through the tunneled TPU backend),
        # so warn here from the host-known lattice bound.
        key_space = float(np.prod(2.0 * np.ceil(sums) + 1.0))
        if key_space > 2.0 ** 31:
            LOGGER.warning(
                "Sequence lattice bound %.3g exceeds the int32 merge key "
                "space: multi-dim table merges may be UNRELIABLE at this "
                "extent; use a coarser kgrid/tvalue or run in x64.",
                key_space)
    box = int(np.prod(np.minimum(2 * np.ceil(sums) + 1, 2**20)))
    paths = 3 ** min(len(shift_ops), 16)
    bound = (min(box, paths) - 1) // 2 + 1
    cap = int(max_nstate) if max_nstate else DEFAULT_TABLE_NSTATE
    if bound > cap:
        LOGGER.warning(
            "State-table capacity %d is below the sequence's lattice bound "
            "%d: magnitude-ranked truncation pruning is active and results "
            "may lose accuracy (raise max_nstate to silence).", cap, bound)
    return max(min(bound, cap), 1)


# dense-grid merge: memory bound on the ladder half-capacity (rows =
# 2*bound+1 must cover the train's full wavenumber range)
_DENSE_MAX_NSTATE = 8192


def _dense_analysis(sequence, kgrid, max_nstate, kvalue):
    """Shared dense-engine eligibility sweep.

    The dense engines (ops/shiftdense.py) put grid cell q at ladder row
    q + K//2 and apply the Gao merge as masked rolls/gathers.  They are
    exact only when (a) every shift is 1-D with host-known values, and
    (b) the ladder covers the train's full wavenumber range
    sum|k|*kvalue/kgrid, so the capacity trim of the table engines can
    never trigger.  Returns (bound, window, any_varying) when eligible
    -- bound is the half-capacity the ladder must be sized to, window
    the per-step shift half-window -- else None.  ONE sweep serves both
    the shared and the batch-varying gate so eligibility rules cannot
    drift apart.
    """
    from .ops.shift import S
    from .ops.base import System

    if not kgrid or common.get_shape(kvalue):
        return None
    shift_ops = [op for op in sequence if isinstance(op, S)]
    if not shift_ops:
        return None
    if any(getattr(op, "scalars", None) for op in sequence
           if isinstance(op, System)):
        return None  # kvalue/tvalue may change mid-train
    total = 0.0
    step_max = 0.0
    any_float = False
    any_varying = False
    for op in shift_ops:
        if op.kleaf is None:
            total += abs(op._kint)
            step_max = max(step_max, abs(op._kint))
            continue
        if isinstance(op.kleaf, jax.core.Tracer):
            return None
        karr = np.atleast_2d(np.asarray(op.kleaf))
        if karr.shape[-1] != 1:
            return None
        if math.prod(op.shape) > 1:
            any_varying = True
        if not np.issubdtype(karr.dtype, np.integer):
            any_float = True
        m = float(np.max(np.abs(karr)))
        total += m
        step_max = max(step_max, m)
    if not any_float:
        return None
    kv = abs(float(kvalue))  # sign only flips roll direction, not range
    bound = int(math.floor(total * kv / float(kgrid) + 0.5)) + 1
    window = int(math.ceil(step_max * kv / float(kgrid))) + 1
    cap = int(max_nstate) if max_nstate else DEFAULT_TABLE_NSTATE
    if bound > cap or bound > _DENSE_MAX_NSTATE:
        return None
    return bound, window, any_varying


def _dense_bound(sequence, kgrid, max_nstate, kvalue) -> Optional[int]:
    """Half-capacity for the SHARED dense 1-D merge, or None."""
    a = _dense_analysis(sequence, kgrid, max_nstate, kvalue)
    return None if a is None or a[2] else a[0]


_PREAMBLE_CACHE: "dict[tuple, tuple]" = {}
_PREAMBLE_CACHE_MAX = 32


def clear_caches():
    """Drop the per-sequence preamble and plan caches.

    Needed after anything that changes analysis results for the SAME
    operator objects: monkeypatching _dense_bound/_capacity (tests), or
    mutating an op's arrays in place (don't).  Keyed caching is on
    operator identity -- see _sequence_preamble."""
    _PREAMBLE_CACHE.clear()
    _PLAN_CACHE.clear()


def _sequence_preamble(sequence, max_nstate, kgrid, kvalue, tvalue=1.0):
    """Cached per-sequence host analysis: (nshift, shape, ncap, dense).

    Repeat simulate() calls on the same operator list (dictionary
    services, optimization loops) would otherwise re-run the O(n_ops)
    nshift/shape/capacity sweeps every call -- several ms of host time
    per dispatch.  Keyed on operator identities; the cached entry pins
    the operator list so ids cannot be reused while cached.
    """
    if not common.get_shape(kvalue):
        kv = float(kvalue)
    elif isinstance(kvalue, (jax.Array, jax.core.Tracer)):
        kv = id(kvalue)  # no host read; identity is the best we can do
    else:
        kv = tuple(np.ravel(np.asarray(kvalue, dtype=float)))
    tv = None if common.get_shape(tvalue) else float(tvalue)
    key = (tuple(id(op) for op in sequence), max_nstate, kgrid, kv, tv)
    hit = _PREAMBLE_CACHE.get(key)
    if hit is not None:
        return hit[:5]
    nshift = getnshift(sequence)
    shape = getshape(sequence)
    ncap = _capacity(sequence, nshift, max_nstate, kgrid, kvalue, tvalue)
    dense = _dense_bound(sequence, kgrid, max_nstate, kvalue)
    varying = (None if dense is not None
               else _dense_varying_bound(sequence, kgrid, max_nstate, kvalue))
    while len(_PREAMBLE_CACHE) >= _PREAMBLE_CACHE_MAX:
        _PREAMBLE_CACHE.pop(next(iter(_PREAMBLE_CACHE)))
    _PREAMBLE_CACHE[key] = (nshift, shape, ncap, dense, varying,
                            list(sequence))
    return nshift, shape, ncap, dense, varying


def _dense_varying_bound(sequence, kgrid, max_nstate, kvalue):
    """(half-capacity, shift half-window) for the batch-varying dense
    merge (ops/shiftdense.shiftmerge_dense_varying_lanes), or None.
    The window only selects the kernel (masked rolls vs gathers)."""
    a = _dense_analysis(sequence, kgrid, max_nstate, kvalue)
    return None if a is None or not a[2] else (a[0], a[1])


def _center_only_init(sm: StateMatrix) -> bool:
    """True if the (host-side) initial states are confined to k=0."""
    sre, sim = sm.states_re, sm.states_im
    if sm.lanes or sm.coords is not None:
        return False
    if not isinstance(sre, np.ndarray) or not isinstance(sim, np.ndarray):
        return False
    c = sre.shape[-2] // 2
    off = float(np.abs(sre).sum() - np.abs(sre[..., c, :]).sum())
    offi = float(np.abs(sim).sum() - np.abs(sim[..., c, :]).sum())
    return off == 0.0 and offi == 0.0


def squeeze_sequence(sequence):
    """Merge runs of adjacent combinable linear operators into single ops.

    The reference declares this NotImplemented (epgpy/functions.py:350-352);
    here adjacent ScalarOp/MatrixOp-family operators fold into a CombinedOp
    whose product evaluates at trace time (constant-folded by XLA when the
    parameters are static).
    """
    from .ops.combined import CombinedOp

    out, run = [], []

    def flush():
        if len(run) == 1:
            out.append(run[0])
        elif run:
            op = run[0]
            for nxt in run[1:]:
                op = op.combine(nxt)
            out.append(op)
        run.clear()

    for op in flatten_sequence(sequence):
        if (isinstance(op, base.CombinableOperator)
                and not isinstance(op, probe_mod.Probe)
                and not op.order1):  # never merge away derivative tracking
            run.append(op)
        else:
            flush()
            out.append(op)
    flush()
    return out


def _setup_table(sm: StateMatrix, sequence, shape=None,
                 dense: bool = False, varying_window=None) -> StateMatrix:
    """Attach the coordinate table up-front for table-shift sequences.

    Scan carries need a structure-invariant StateMatrix: the coords leaf
    (and its dtype) must exist before the first shift runs.  Integer-only
    shift sets get an integer table; any float shift (incl. C's time
    coordinate) forces a float table from the start.

    If any shift is batch-varying (the shift-prune path), the first such
    application turns the shared table into per-batch tables -- a carry
    SHAPE change that would break a scanned block.  Pre-expand the table
    to the full broadcast batch shape so the carry is invariant from op 0.
    """
    from .ops.shift import S

    shift_ops = [op for op in sequence if isinstance(op, S)]
    table = any(not isinstance(op.k, int) or op.kdim > 1 for op in shift_ops)
    if not table or sm.coords is not None:
        return sm
    kdim = max(op.kdim for op in shift_ops)
    sm = sm.setup_coords(kdim)
    all_int = all(
        isinstance(op.k, int)
        or np.issubdtype(op.k.dtype, np.integer)
        for op in shift_ops
    )
    # batch-varying shifts (leading batch axes on k) run the vmapped
    # float-merge path whose output coords are float: an int carry
    # would flip dtype mid-scan and break the scan carry structure
    varying_batch = any(
        not isinstance(op.k, int) and np.ndim(op.k) > 1
        for op in shift_ops
    )
    if all_int and not varying_batch:
        from .ops.shiftnd import _intdtype
        sm = sm.update(coords=sm.coords.astype(_intdtype()))
    elif all_int:
        # float-stored table whose values stay integers: merges quantize
        # exactly on the unit grid, no user kgrid needed
        sm = sm.update(options={**sm.options, "_int_grid": True})
    if dense and not all_int:
        # static hint for ops/shiftnd.apply_shift: rows ARE grid cells,
        # merges run as masked rolls (ops/shiftdense.py)
        sm = sm.update(options={**sm.options, "_dense_grid": True})
        LOGGER.info("table merges: dense-grid engine (rows are cells)")
    elif varying_window and not all_int:
        sm = sm.update(options={**sm.options,
                                "_dense_grid_varying": int(varying_window)})
        LOGGER.info("table merges: batch-varying dense engine (window=%d)",
                    int(varying_window))
    elif not all_int:
        LOGGER.info("table merges: general table engine (matmul/sort)")
    batch_varying = any(
        math.prod(op.shape) > 1 for op in shift_ops
    )
    if batch_varying and shape is not None:
        # full state batch = broadcast of the init state and the sequence
        # shape (append rule: new axes pad on the RIGHT)
        coords = sm.coords
        bshape = common.broadcast_shapes(sm.shape, tuple(shape))
        pad = len(bshape) - (coords.ndim - 2)
        if pad > 0:
            coords = coords.reshape(
                coords.shape[:-2] + (1,) * pad + coords.shape[-2:])
        target = common.broadcast_shapes(coords.shape[:-2], bshape)
        sm = sm.update(
            coords=jnp.broadcast_to(coords, target + coords.shape[-2:]))
    return sm


# -- plan construction --


class _ScanBlock:
    """`reps` repetitions of a `period`-operator block, scanned."""

    __slots__ = ("ops", "period", "reps")

    def __init__(self, ops, period, reps):
        self.ops = ops
        self.period = period
        self.reps = reps


def _build_plan(ops, *, min_reps=3, min_ops=6, max_period=64, scan=True):
    """Split the op list into unrolled runs and scannable blocks."""
    if not scan:
        return [list(ops)]
    sigs = [op.signature() for op in ops]
    plan, buf, i, n = [], [], 0, len(ops)
    while i < n:
        best = None
        limit = min(max_period, (n - i) // 2)
        for p in range(1, limit + 1):
            if sigs[i:i + p] != sigs[i + p:i + 2 * p]:
                continue
            r = 2
            while i + (r + 1) * p <= n and sigs[i + r * p:i + (r + 1) * p] == sigs[i:i + p]:
                r += 1
            if r >= min_reps and r * p >= min_ops:
                best = (p, r)
                break  # smallest period wins
        if best:
            if buf:
                plan.append(buf)
                buf = []
            p, r = best
            plan.append(_ScanBlock(ops[i:i + p * r], p, r))
            i += p * r
        else:
            buf.append(ops[i])
            i += 1
    if buf:
        plan.append(buf)
    return plan


def _stack_ops(ops):
    """Stack structurally-identical ops' parameters along a new leading axis."""
    stripped = [op.strip_meta() for op in ops]
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *stripped)


@jax.tree_util.register_pytree_node_class
class _Const:
    """Scan-constant slot: the same op applied at every repetition.

    Hoisting rep-invariant slots out of the scanned pytree avoids stacking
    `reps` copies of identical parameter arrays (a 1000-TR dictionary train
    would otherwise pin reps x batch coefficient planes in HBM and re-read
    them every step).
    """

    __slots__ = ("op",)

    def __init__(self, op):
        self.op = op

    def tree_flatten(self):
        return (self.op,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def _slot_invariant(ops) -> bool:
    """True when every repetition of this slot is parameter-identical.

    Device arrays are compared by identity only (an equality check would
    pull them device->host); host values compare by np.array_equal.
    """
    op0 = ops[0]
    if all(op is op0 for op in ops[1:]):
        return True
    flats = [jax.tree.flatten(op.strip_meta()) for op in ops]
    leaves0, treedef0 = flats[0]
    for leaves, treedef in flats[1:]:
        if treedef != treedef0:
            return False
        for a, b in zip(leaves0, leaves):
            if a is b:
                continue
            if isinstance(a, jax.core.Tracer) or isinstance(b, jax.core.Tracer):
                return False
            if isinstance(a, jax.Array) or isinstance(b, jax.Array):
                return False
            a_np, b_np = np.asarray(a), np.asarray(b)
            if (a_np.shape != b_np.shape or a_np.dtype != b_np.dtype
                    or not np.array_equal(a_np, b_np)):
                return False
    return True


def _stack_block(block: _ScanBlock):
    """Stack a scan block: list over period slots of stacked op pytrees.

    Rep-invariant slots become ``_Const`` (applied unchanged every step);
    concrete relaxation/precession slots are converted to precomputed
    element coefficients (over the whole repetition axis when they vary):
    the compiled scan body then reads coefficients instead of re-evaluating
    exp() every step (the hand-fused models/ kernels hoist the same way).
    """
    from .ops.evolution import E, P, R
    from .ops.exchange import X, precompute_exchange
    from .ops.scalarop import precompute_diagonal

    p, r = block.period, block.reps
    slots = []
    for j in range(p):
        ops_j = [block.ops[j + k * p] for k in range(r)]
        if _slot_invariant(ops_j):
            op = ops_j[0].strip_meta()
            if isinstance(op, (E, P, R)):
                pre = precompute_diagonal(op, scan=False)
                if pre is not None:
                    op = pre
            elif isinstance(op, X):
                pre = precompute_exchange(op)
                if pre is not None:
                    op = pre
            slots.append(_Const(op))
            continue
        stacked = _stack_ops(ops_j)
        if isinstance(stacked, (E, P, R)):
            pre = precompute_diagonal(stacked)
            if pre is not None:
                stacked = pre
        slots.append(stacked)
    return slots


#: plan cache: repeated simulate() calls on the same operator objects skip
#: signature computation, period detection and parameter stacking entirely.
#: Values hold strong references to the ops, so cached ids stay valid.
_PLAN_CACHE: "dict[tuple, tuple]" = {}
_PLAN_CACHE_MAX = 16
_PLAN_CACHE_MAX_BYTES = 6 * 1024**3  # device bytes pinned by cached payloads


def _plan_and_payload(sequence, *, scan=True, cache=True):
    """Build (plan_kinds, payload) for _execute_plan / _run_compiled.

    `cache=False` for traced sequences (diff path): tracer leaves must
    never outlive their trace.
    """
    if cache:
        key = (tuple(id(op) for op in sequence), scan)
        cached = _PLAN_CACHE.get(key)
        if cached is not None:
            _, kinds, payload, _ = cached
            return kinds, payload
    plan = _build_plan(sequence, scan=scan)
    kinds = tuple(
        ("unroll",) if isinstance(p, list) else ("scan", p.reps) for p in plan)
    payload = [
        p if isinstance(p, list) else (p.ops[:p.period], _stack_block(p))
        for p in plan
    ]
    if cache:
        # bytes-aware FIFO eviction: payloads pin stacked parameter /
        # precomputed-coefficient arrays in device memory
        def _bytes(pl):
            total = 0
            for l in jax.tree_util.tree_leaves(pl):
                try:
                    itemsize = np.dtype(jnp.result_type(l)).itemsize
                except TypeError:
                    itemsize = 8
                total += int(np.prod(common.get_shape(l))) * itemsize
            return total

        new_bytes = _bytes(payload)
        while _PLAN_CACHE and (
                len(_PLAN_CACHE) >= _PLAN_CACHE_MAX
                or sum(b for (_, _, _, b) in _PLAN_CACHE.values())
                + new_bytes > _PLAN_CACHE_MAX_BYTES):
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
        _PLAN_CACHE[key] = (list(sequence), kinds, payload, new_bytes)
    return kinds, payload


# -- execution --
# Probe outputs are handled as pytrees with a leading ADC axis ("chunks"):
# each chunk is a tuple over probes; final outputs concatenate all chunks.


def _acquire(op, probes, sm):
    """Acquire all probe outputs at a probe position (tuple over probes)."""
    return tuple((pb if pb is not None else op).acquire(sm, post=op.post)
                 for pb in (probes if probes is not None else [None]))


def _add_adc_axis(vals):
    return jax.tree.map(lambda a: jnp.asarray(a)[None], vals)


def _execute_plan(plan_kinds, plan_payload, probes, sm, callback=None,
                  disp=False):
    """Run the planned program; returns (sm, chunks)."""
    from .utils.helpers import progressbar
    chunks = []
    for kind, payload in zip(plan_kinds, plan_payload):
        if kind[0] == "unroll":
            ops_iter = progressbar(payload, "Simulating: ") if disp else payload
            for op in ops_iter:
                sm = op(sm)
                if isinstance(op, probe_mod.Probe):
                    chunks.append(_add_adc_axis(_acquire(op, probes, sm)))
                elif callback is not None:
                    callback(sm)
        else:  # scan block: payload = (template, per-slot stacked/_Const)
            template, slots = payload
            reps = kind[1]
            probe_slots = [j for j, op in enumerate(template)
                           if isinstance(op, probe_mod.Probe)]
            consts = [s.op if isinstance(s, _Const) else None for s in slots]
            xs = [None if isinstance(s, _Const) else s for s in slots]

            def body(carry, step_ops, consts=consts, probe_slots=probe_slots):
                outs = []
                for j, op_step in enumerate(step_ops):
                    # const slots ride the closure; varying slots arrive as
                    # per-step ops sliced from the stacked pytrees
                    op = consts[j] if op_step is None else op_step
                    carry = op(carry)
                    if j in probe_slots:
                        # acquire with the per-step op: probe leaves (e.g.
                        # Adc phase) vary across repetitions
                        outs.append(_acquire(op, probes, carry))
                return carry, tuple(outs)

            sm, ys = jax.lax.scan(body, sm, xs, length=reps)
            if len(ys) == 1:
                chunks.append(ys[0])
            elif len(ys) > 1:
                # interleave probe slots rep-major along the ADC axis
                merged = jax.tree.map(
                    lambda *slots: jnp.stack(slots, axis=1).reshape(
                        (-1,) + slots[0].shape[1:]),
                    *ys,
                )
                chunks.append(merged)
    return sm, chunks


def _concat_chunks(chunks):
    """Concatenate chunk pytrees along the leading ADC axis."""
    if len(chunks) == 1:
        return chunks[0]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)


# -- real program boundaries --
# The TPU backend only supports complex values strictly inside a compiled
# program (see statematrix.py).  Compiled outputs therefore encode complex
# leaves as {"__c_re", "__c_im"} dicts of real arrays; the host decodes.


def _encode_complex(tree):
    return jax.tree.map(
        lambda x: {"__c_re": x.real, "__c_im": x.imag}
        if jnp.iscomplexobj(x) else x,
        tree,
    )


def _is_cnode(n):
    return isinstance(n, dict) and "__c_re" in n


def _decode_complex_np(tree):
    """Decode to host numpy (complex where encoded).

    ONE batched jax.device_get for the whole tree first: per-leaf
    np.asarray pays ~25 ms tunnel latency per transfer with no overlap
    (never fetch device leaves in a loop -- CLAUDE.md)."""
    host = jax.device_get(tree)
    return jax.tree.map(
        lambda n: np.asarray(n["__c_re"]) + 1j * np.asarray(n["__c_im"])
        if _is_cnode(n) else np.asarray(n),
        host, is_leaf=_is_cnode,
    )


@partial(jax.jit, static_argnums=(0, 4, 5))
def _run_compiled(plan_kinds, plan_payload, probes, sm, shape=None,
                  lanes=False):
    if shape is not None:
        # broadcast the (compact) initial state on device -- avoids
        # materializing + transferring the full batch from the host
        sm = sm.broadcast(shape)
    if lanes:
        # TPU-friendly internal layout: batch dims on the minor (lane)
        # axes; ops without a lanes fast path fall back through the
        # canonical view (XLA fuses the transposes)
        sm = sm.to_lanes()
    sm, chunks = _execute_plan(plan_kinds, plan_payload, probes, sm)
    return sm, _encode_complex(_concat_chunks(chunks))


def simulate(
    sequence,
    *,
    adc_time: bool = False,
    init=None,
    squeeze: bool = False,
    probe=None,
    callback=None,
    asarray: bool = True,
    disp: bool = False,
    jit: bool = True,
    scan: bool = True,
    jacobian_chunk=None,
    **options,
):
    """Simulate an operator sequence; returns probe values at each ADC.

    API parity with reference epgpy/functions.py:50-170.  Extra controls:
    ``jit=False`` runs eagerly (required for `callback`), ``scan=False``
    disables scan compilation (full unroll under jit), ``jacobian_chunk=N``
    bounds Jacobian/Hessian tangent memory (N columns per compiled call).
    """
    unknown = set(options) - _KNOWN_OPTIONS
    if unknown:
        LOGGER.warning("simulate: unrecognized option(s) %s (forwarded to "
                       "StateMatrix.options)", sorted(unknown))
    sequence = flatten_sequence(sequence)
    if squeeze:
        sequence = squeeze_sequence(sequence)

    if not any(isinstance(op, probe_mod.Probe) for op in sequence):
        raise ValueError("Cannot simulate sequence without at least one Probe/ADC")

    # custom probes
    probes = None
    if probe is not None:
        probe_list = probe if isinstance(probe, (tuple, list)) else [probe]
        probes = tuple(
            pb if isinstance(pb, (probe_mod.Probe, type(None))) else probe_mod.Probe(pb)
            for pb in probe_list
        )

    # ladder capacity: static, from sequence analysis + user cap; an init
    # StateMatrix's own max_nstate option counts too (the reference reads
    # sm.options during shifts, epgpy/shift.py:86-89)
    max_nstate = options.get("max_nstate")
    kgrid = options.get("kgrid")
    if isinstance(init, StateMatrix):
        if max_nstate is None:
            max_nstate = init.options.get("max_nstate")
        if kgrid is None:
            kgrid = init.options.get("kgrid")
    kvalue = options.get("kvalue")
    if kvalue is None:
        kvalue = init.kvalue if isinstance(init, StateMatrix) else 1.0
    tvalue = options.get("tvalue")
    if tvalue is None:
        tvalue = getattr(init, "tvalue", 1.0) if isinstance(
            init, StateMatrix) else 1.0
    # nshift/shape/capacity + dense-grid eligibility (see _dense_bound)
    nshift, shape, ncap, dense, varying = _sequence_preamble(
        sequence, max_nstate, kgrid, kvalue, tvalue)
    LOGGER.info("simulate: %d ops, nshift=%d, shape=%s",
                len(sequence), nshift, shape)

    # whole-sequence kernel dispatch: an exact FISP train with plain
    # ADCs, equilibrium init and default options routes to the fused
    # VMEM-resident Pallas kernel (see fisp_dispatch).  "auto" engages
    # on TPU in f32 mode only (the kernel is f32; x64 runs keep the
    # general planner's precision); fisp_kernel=False opts out;
    # "force" engages anywhere via the interpret-mode kernel (tests).
    fisp_opt = options.pop("fisp_kernel", "auto")
    _fisp_force = fisp_opt == "force"
    _fisp_tpu = False
    _dens_opt = options.get("density")
    # kvalue may be any host scalar: the matched patterns are
    # kvalue-independent (T/E/S(int)/Adc(F0) never read physical
    # wavenumbers) except the DW-FISP D op, whose matcher consumes it
    _fisp_on = (fisp_opt not in (False, None) and callback is None
                and init is None and jit and kgrid is None
                and isinstance(kvalue, (int, float))
                and not (set(options) - {"max_nstate", "density",
                                         "kvalue"}))
    if _fisp_on:
        from . import config
        # jax_default_device may be a Device or a platform string; the
        # fused kernels are Mosaic (TPU-only) programs -- any other
        # accelerator backend must use the general planner
        _dev = jax.config.jax_default_device or jax.devices()[0]
        _fisp_tpu = getattr(_dev, "platform", _dev) == "tpu"
        _fisp_on = _fisp_force or (_fisp_tpu and not config.x64_enabled())
    if _fisp_on and probe is None and probes is None:
        from . import fisp_dispatch as _fd
        # matcher priority table: first match wins.  FISP/MSE/bSSFP/
        # DESS/DW matchers only engage without the density option
        # (their kernels assume unit equilibrium); EPG-X consumes it.
        families = [] if _dens_opt is not None else [
            (_fd.match_fisp, _fd.run_fisp_kernel, "FISP", "fisp"),
            (lambda seq: _fd.match_mse(seq, kvalue),
             _fd.run_mse_kernel, "CPMG", "mse"),
            (_fd.match_bssfp, _fd.run_bssfp_kernel, "bSSFP", "bssfp"),
            (_fd.match_dess, _fd.run_dess_kernel, "DESS", "dess"),
            (_fd.match_megre, _fd.run_megre_kernel, "ME-GRE", "megre"),
            (lambda seq: _fd.match_dwfisp(seq, kvalue),
             _fd.run_dwfisp_kernel, "DW-FISP", "dw"),
        ]
        families.append((lambda seq: _fd.match_xgre(seq, shape, _dens_opt),
                         _fd.run_xgre_kernel, "EPG-X GRE", "xgre"))
        # composite EPG-X stage trains (MT-prepped/segmented; r4):
        # after the exact-pattern xgre family, before the 1-pool
        # composite (which rejects X ops anyway)
        families.append((lambda seq: _fd.match_xcomposite(seq, shape,
                                                          _dens_opt),
                         _fd.run_xcomposite_kernel, "EPG-X composite",
                         "xcomp"))
        if _dens_opt is None:
            # generic stage trains (MPRAGE/T2prep/sat-recovery): LAST --
            # the exact-pattern families above stay on their (faster,
            # diff-capable) kernels
            families.append((lambda seq: _fd.match_composite(seq, kvalue),
                             _fd.run_composite_kernel,
                             "composite GRE", "comp"))
        enc = None
        for matcher, runner, family, tag in families:
            fparams = matcher(sequence)
            if fparams is None:
                continue
            # capacity gate: oversized ladders cannot keep their planes
            # VMEM-resident -- stay on the scan planner (bSSFP is k=0
            # only and always fits)
            nplanes = {"fisp": 6, "dw": 9, "mse": 6, "dess": 6,
                       "megre": 6,
                       "xgre": 6 * len(fparams["dens"])
                       if tag == "xgre" else 6}.get(tag, 6)
            if tag == "mse" and fparams.get("diffusion") is not None:
                nplanes = 12        # + 6 loop-invariant attenuation planes
            if tag == "xcomp":
                # 6 planes per compartment + the un-chunked output
                # windows (2C arrays, double-buffered) + the stage-
                # matrix table block (MB-padded rows per mat for the
                # aligned dynamic-slice loads), as plane-equivalents
                _C = int(fparams["C"])
                _mb = -(-3 * _C * _C // 8) * 8
                _nm = len(fparams["taus"])
                nplanes = 6 * _C + -(
                    -(4 * _C * fparams["nadc"] + 2 * _nm * _mb)
                    // (ncap + 1))
            if tag == "comp":
                # the composite kernel's un-chunked (nadc, btile) output
                # windows live in VMEM too: fold them into the gate as
                # plane-equivalents (4 bytes x 2 arrays x 2 buffers)
                nplanes = 6 + -(-4 * fparams["nadc"] // (ncap + 1))
            if tag != "bssfp" and not _fd.kernel_fits_vmem(nplanes, ncap):
                continue
            if disp:
                LOGGER.info(
                    "simulate: %s train -> fused Pallas kernel "
                    "(%s-kernel engine, %d TR, nstate=%d)", family, tag,
                    len(fparams.get("FA", fparams.get("alpha", ()))), ncap)
            _fd.count_dispatch(tag)
            enc = runner(fparams, ncap,
                         interpret=_fisp_force and not _fisp_tpu)
            break
        if enc is not None:
            values = (enc,)
            if asarray:
                values = _decode_complex_np(values)
                values = tuple(_to_numpy_probe(v) for v in values)
            values = values[0]
            if adc_time:
                t = get_adc_times(sequence)
                return (np.asarray(t) if asarray else t), values
            return values
    _preamble_ncap = ncap
    # `nstate` is a capacity FLOOR for the initial ladder (reference
    # StateMatrix kwarg); pop it so it cannot collide with the computed
    # capacity below.  Dense engines size capacity exactly from the
    # lattice, so the floor only applies on the table/sort paths.
    user_nstate = options.pop("nstate", None)
    if dense is not None:
        ncap = dense
    elif varying is not None:
        ncap = varying[0]
    elif user_nstate is not None:
        ncap = max(ncap, int(user_nstate))

    if not isinstance(init, StateMatrix):
        sm = StateMatrix(
            [0, 0, 1] if init is None else init,
            nstate=ncap, **options,
        )
    else:
        sm = init.update(options={**init.options, **options})
        sm = sm.resize(max(ncap, sm.nstate))

    # the dense engines additionally require exact ladder symmetry
    # throughout: their roll windows assume antisymmetric mean
    # wavenumbers, which an unverified asymmetric init or a
    # symmetry-breaking op would violate (the table engines re-sort
    # globally and handle those fine)
    if (dense is not None or varying is not None) and not (
            _center_only_init(sm)
            and sm.options.get("_sym_verified", False)
            and all(getattr(op, "preserves_ladder_symmetry", True)
                    for op in sequence)):
        dense = None
        varying = None

    # pre-attach the coordinate table when the sequence needs one, so the
    # state's pytree structure (and coord dtype) is invariant across ops
    # (scan carries require a fixed structure)
    sm = _setup_table(sm, sequence, shape, dense=dense is not None,
                      varying_window=None if varying is None else varying[1])

    # differentiation path: Jacobian/Hessian probes -> (nested) jacfwd
    from . import diff as diff_mod
    if probes is not None and any(
            isinstance(pb, (diff_mod.Jacobian, diff_mod.Hessian)) for pb in probes):
        if any(pb is None for pb in probes):
            raise ValueError("None probes are not supported with Jacobian/Hessian")
        # Jacobian dispatch: a FISP train with canonical T1/T2 tracking
        # and Adc/Jacobian(F0) probes routes to the fused primal+tangent
        # Pallas kernel (one VMEM-resident pass instead of jacfwd over
        # the scanned planner program)
        if _fisp_on and _dens_opt is None:
            from . import fisp_dispatch
            # per-pulse (alias-variable) trains -> the fused Hessian
            # kernel: the flagship 3 x 2N Hessian and per-pulse
            # Jacobians run as ONE VMEM-resident pass (tangent index on
            # the lane axis) instead of chunked nested jacfwd
            hparams = fisp_dispatch.match_fisp_hessian(sequence)
            if hparams is not None:
                hmatch = fisp_dispatch.match_hessian_probes(
                    probes, hparams)
                if hmatch is not None:
                    # VMEM gate: 6*ngroups scratch planes with the
                    # lane-padded pulse count on the lane axis
                    _N = len(hparams["FA"])
                    _Na = max(-(-_N // 128) * 128, 128)
                    _ng = 9 if hmatch[1] else 5
                    if not fisp_dispatch.kernel_fits_vmem(
                            6 * _ng, _preamble_ncap, lanes=_Na):
                        hmatch = None
                if hmatch is not None:
                    hspecs, second = hmatch
                    if disp:
                        LOGGER.info(
                            "simulate: per-pulse diff train -> fused "
                            "Pallas Hessian kernel (%d TR, nstate=%d, "
                            "order=%d)", len(hparams["FA"]),
                            _preamble_ncap, 2 if second else 1)
                    fisp_dispatch.count_dispatch("hessian")
                    values = fisp_dispatch.run_fisp_hessian(
                        hparams, _preamble_ncap, hspecs, second,
                        interpret=_fisp_force and not _fisp_tpu)
                    if asarray:
                        values = _decode_complex_np(values)
                        values = tuple(_to_numpy_probe(v) for v in values)
                    if len(values) == 1:
                        values = values[0]
                    if adc_time:
                        t = get_adc_times(sequence)
                        return (np.asarray(t) if asarray else t), values
                    return values
            # cheap probe-shape pre-check against the maximal var set:
            # eval-string probes reject in O(#probes) without
            # paying the host-side train factorization (r5: "B1"
            # chain-rule-tracked flip trains and "D"/"Dcoef"
            # diffusivity-tracked DW trains route fused too)
            specs = fisp_dispatch.match_jacobian_probes(
                probes, ("T1", "T2", "g", "B1", "D", "Dcoef"))
            runner = None
            if specs is not None:
                fparams = fisp_dispatch.match_fisp(sequence)
                runner = fisp_dispatch.run_fisp_jacobian
                if fparams is None:
                    fparams = fisp_dispatch.match_mse(sequence, kvalue)
                    runner = fisp_dispatch.run_mse_jacobian
                if fparams is None:
                    fparams = fisp_dispatch.match_bssfp(sequence)
                    runner = fisp_dispatch.run_bssfp_jacobian
                if fparams is None:
                    fparams = fisp_dispatch.match_dess(sequence)
                    runner = fisp_dispatch.run_dess_jacobian
                if fparams is None:
                    fparams = fisp_dispatch.match_megre(sequence)
                    runner = fisp_dispatch.run_megre_jacobian
                if fparams is None and isinstance(kvalue, (int, float)):
                    fparams = fisp_dispatch.match_dwfisp(sequence, kvalue)
                    runner = fisp_dispatch.run_dwfisp_jacobian
                if fparams is None and isinstance(kvalue, (int, float)):
                    # generic stage trains (MPRAGE/T2prep/sat-recovery,
                    # incl. D stages) with canonical (T1, T2[, g])
                    # tracking: LAST, like the primal dispatch table
                    fparams = fisp_dispatch.match_composite(sequence,
                                                            kvalue)
                    runner = fisp_dispatch.run_composite_jacobian
                specs = None if fparams is None else \
                    fisp_dispatch.match_jacobian_probes(
                        probes, fparams.get("vars"))
                # VMEM gate: the fused Jacobian kernels keep 24 folded
                # planes resident (30 for ME-GRE and composite: they add
                # a df tangent group; bSSFP is k=0 only and always fits)
                if specs is not None and runner is not \
                        fisp_dispatch.run_bssfp_jacobian:
                    _njp = 24
                    if runner is fisp_dispatch.run_megre_jacobian:
                        _njp = 30          # + df tangent group
                    elif runner is fisp_dispatch.run_composite_jacobian:
                        # only the requested tangent groups cost
                        # planes; the un-chunked (nadc, btile) output
                        # windows (2 + 2*ng arrays, double-buffered)
                        # fold in as plane-equivalents
                        _ng = len(fisp_dispatch.composite_jac_groups(
                            specs))
                        _njp = 6 * (1 + _ng) + -(
                            -2 * (2 + 2 * _ng) * fparams["nadc"]
                            // (_preamble_ncap + 1))
                    elif fparams.get("diffusion") is not None:
                        _njp = 30          # + 6 attenuation planes
                        if fparams.get("d_var"):
                            _njp = 36      # + dD tangent group (r5)
                    if not fisp_dispatch.kernel_fits_vmem(
                            _njp, _preamble_ncap):
                        specs = None
            if specs is not None:
                if disp:
                    _fam = {fisp_dispatch.run_mse_jacobian: "CPMG",
                            fisp_dispatch.run_bssfp_jacobian: "bSSFP",
                            fisp_dispatch.run_dess_jacobian: "DESS",
                            fisp_dispatch.run_megre_jacobian: "ME-GRE",
                            fisp_dispatch.run_dwfisp_jacobian: "DW-FISP",
                            fisp_dispatch.run_composite_jacobian:
                                "composite GRE"}
                    LOGGER.info(
                        "simulate: %s diff train -> fused Pallas "
                        "Jacobian kernel (%d pulses, nstate=%d)",
                        _fam.get(runner, "FISP"), len(fparams["FA"]),
                        _preamble_ncap)
                fisp_dispatch.count_dispatch("jac:" + {
                    fisp_dispatch.run_mse_jacobian: "mse",
                    fisp_dispatch.run_bssfp_jacobian: "bssfp",
                    fisp_dispatch.run_dess_jacobian: "dess",
                    fisp_dispatch.run_megre_jacobian: "megre",
                    fisp_dispatch.run_dwfisp_jacobian: "dw",
                    fisp_dispatch.run_composite_jacobian: "comp",
                }.get(runner, "fisp"))
                values = runner(
                    fparams, _preamble_ncap, specs,
                    interpret=_fisp_force and not _fisp_tpu)
                if asarray:
                    values = _decode_complex_np(values)
                    values = tuple(_to_numpy_probe(v) for v in values)
                if len(values) == 1:
                    values = values[0]
                if adc_time:
                    t = get_adc_times(sequence)
                    return (np.asarray(t) if asarray else t), values
                return values
        # NOTE (r3, measured): the diff programs deliberately run in the
        # compat (*batch, K, 3) layout.  Converting to the half-ladder
        # lanes layout -- a big win for the primal (6 vs 20 ms at 200 TR
        # x 4096 atoms) -- makes the jacfwd programs 3x SLOWER (1276 vs
        # 389 ms); the tangent rules interact badly with the per-op
        # plane reconstruction.  See docs/performance.md.
        values = diff_mod.simulate_diff(
            sequence, probes, sm.broadcast(shape),
            plan_builder=lambda seq: _plan_and_payload(seq, scan=scan,
                                                        cache=False),
            executor=_execute_plan,
            jacobian_chunk=jacobian_chunk,
            asarray=asarray,
        )
        if len(values) == 1:
            values = values[0]
        if adc_time:
            t = get_adc_times(sequence)
            return (np.asarray(t) if asarray else t), values
        return values

    use_jit = jit and callback is None
    plan_kinds, payload = _plan_and_payload(
        sequence, scan=scan and callback is None)

    if disp:
        LOGGER.info("simulate: %d-op program compiled as %s",
                    len(sequence), "/".join(k[0] for k in plan_kinds))
    # coordinate tables keep batch-major; ops that may break the ladder
    # symmetry (unverified user coefficients) disable the half-ladder
    # lanes layout, which stores only the (F+, Z) planes
    use_lanes = (
        # dense-grid tables run the merge on the lanes planes natively;
        # other coordinate tables keep batch-major
        (sm.coords is None or bool(sm.options.get("_dense_grid"))
         or bool(sm.options.get("_dense_grid_varying")))
        # init must have been verified symmetric (check=False / device
        # inits skip the F-/Z symmetry checks -- ADVICE r2)
        and sm.options.get("_sym_verified", False)
        and all(getattr(op, "preserves_ladder_symmetry", True)
                for op in sequence))
    if use_jit:
        sm, values = _run_compiled(plan_kinds, payload, probes, sm, shape,
                                   use_lanes)
        if asarray:
            values = _decode_complex_np(values)
        # else: leave encoded ({"__c_re","__c_im"} real device arrays) --
        # complex cannot cross the program boundary on TPU
    else:
        sm = sm.broadcast(shape)
        if use_lanes:
            sm = sm.to_lanes()
        sm, chunks = _execute_plan(plan_kinds, payload, probes, sm,
                                   callback=callback, disp=disp)
        values = _concat_chunks(chunks)

    if asarray:
        values = tuple(_to_numpy_probe(v) for v in values)
    if len(values) == 1:
        values = values[0]

    if adc_time:
        times = get_adc_times(sequence)
        return np.asarray(times) if asarray else times, values
    return values


def _to_numpy_probe(v):
    """Convert one probe's output pytree to a host numpy array.

    Tuple-valued probes (e.g. ``Probe("(real(F0), imag(F0))")``) stack their
    components on axis 1, matching the reference's per-ADC tuple layout.
    """
    if isinstance(v, (tuple, list)):
        return np.stack([np.asarray(x) for x in v], axis=1)
    return np.asarray(v)


# -- modify (reference epgpy/functions.py:251-347) --


def modify(sequence, modifier=None, *, expand: bool = True, **params):
    """Rewrite a sequence, combining ops with duration-matched E/P."""
    shape = getshape(sequence)
    values = common.expand_arrays(*params.values(), append=True)
    if expand and (len(shape) > 1 or shape[0] > 1):
        dims = len(shape)
        values = tuple(
            None if v is None else
            (jnp.reshape(jnp.asarray(v), (1,) * dims + common.get_shape(v))
             if common.get_shape(v) else v)
            for v in values
        )
    params = dict(zip(params, values))

    if modifier is None:
        modifier = default_modifier
        if not params:
            return sequence
    elif not callable(modifier):
        raise TypeError("`modifier` must be a callable")

    newseq, opdict = [], {}
    for op in flatten_sequence(sequence):
        if id(op) in opdict:
            newseq.append(opdict[id(op)])
            continue
        newop = modifier(op, **params)
        opdict[id(op)] = newop
        newseq.append(newop)
    if isinstance(sequence, base.MultiOperator):
        return base.MultiOperator(newseq, name=sequence.name)
    return newseq


def default_modifier(op, **kwargs):
    """Default modifier: B1 attenuation of T, relaxation over durations."""
    from .ops import transition, evolution

    if isinstance(op, transition.T):
        att = kwargs.get("att")
        if att is not None and not (
            common.get_shape(att) == () and np.allclose(np.asarray(att), 1)
        ):
            op = transition.T(op.alpha * jnp.asarray(att), op.phi,
                              name=op.name + "#", duration=op.duration)

    if np.any(np.asarray(op.duration) > 0):
        T1, T2, g = kwargs.get("T1"), kwargs.get("T2"), kwargs.get("g")
        if T1 is None and T2 is None and g is None:
            pass
        elif T1 is None and T2 is None:
            op = op * evolution.P(op.duration, g, duration=0)
            op.name = op[0].name + "*"
        else:
            T1 = 1e10 if T1 is None else T1
            T2 = 1e10 if T2 is None else T2
            g = 0 if g is None else g
            op = op * evolution.E(op.duration, T1, T2, g, duration=0)
            op.name = op[0].name + "*"
    return op
