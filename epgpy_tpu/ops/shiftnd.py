"""n-dimensional / float-wavenumber shifts with static capacity.

Reimplements the reference's shift-nd / shift-merge / shift-prune methods
(reference epgpy/shift.py:297-542, Gao 2021 three-dimensional spatially
resolved phase graph) for XLA: the coordinate table has a *fixed* number of
rows C; each shift produces 3C candidate rows (Z stays, F+ moves +delta,
F- moves -delta), merges duplicates with a sort + segment-sum, and keeps
the C most energetic rows symmetrically around k=0.

Key properties:

* all shapes static: sort(3C) -> segment_sum(3C) -> top-(C+1)/2 -> C rows;
* the kept set is exactly symmetric: selection ranks only rows with
  key >= 0 (key(-q) == -key(q) by construction) and mirrors them, so the
  conjugate ladder symmetry survives bit-exactly;
* padding rows carry zero states and coords 0: they merge into the k=0
  cell as exact no-ops -- no validity mask anywhere;
* matches the reference's nmax/trim semantics when capacity is exceeded
  (magnitude-ranked, center always kept, reference epgpy/shift.py:558-573).

The merge (float) variant additionally tracks magnitude-weighted mean
wavenumbers per cell (reference epgpy/shift.py:419-438).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import config

__all__ = ["apply_shift", "shiftnd_table", "shiftmerge_table"]

# The shared-table merge has two interchangeable engines:
#
# * "sort"   -- argsort + segment-sum (original; the only choice under
#               vmap, where per-element compare matrices would blow up);
# * "matmul" -- sort/scatter/gather-free: all-pairs key comparisons give
#               segment ids, and all data movement (duplicate-cell sums,
#               symmetric top-k selection) is expressed as one-hot
#               matmuls on the MXU.  On TPU the bitonic sort and any
#               computed-index scatter/gather of the payload rows cost
#               ~1.7 ms at 3C=3072 rows (see docs/performance.md
#               negative results); the compare matrices + two one-hot
#               matmuls replace all of it with dense MXU/VPU work.
#
# "matmul" is quadratic in the row count (all-pairs) and linear in the
# batch width (matmul columns), so it is gated on both:
_MATMUL_MERGE_MAX_ROWS = int(os.environ.get(
    "EPGPY_TPU_MATMUL_MERGE_MAX_ROWS", 12288))
_MATMUL_MERGE_MAX_COLS = int(os.environ.get(
    "EPGPY_TPU_MATMUL_MERGE_MAX_COLS", 4096))


def _intdtype():
    return jnp.int64 if config.x64_enabled() else jnp.int32


def _callbacks_ok():
    """Whether in-program host callbacks (jax.debug.print) are safe on
    the execution device.  CPU only: the tunneled TPU backend rejects
    any program containing callback custom-calls at execution
    (UNIMPLEMENTED) even when the emitting branch is never taken.
    Checks jax_default_device first -- jax.default_backend() reflects
    plugin registration priority, not where programs run: with the
    axon plugin installed it says "tpu" even after steering to CPU
    (the conftest / CLAUDE.md fact-7 idiom), which would silently
    disable the check in the repo's own CPU mode."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", dev) == "cpu"
    return jax.default_backend() == "cpu"


def _encode_keys(q):
    """Antisymmetric lexicographic key: key(-q) == -key(q), no collisions.

    q: (R, d) integer coords.  Strides come from the data's actual extent
    (same trick as reference epgpy/shift.py:600-607).
    """
    idt = _intdtype()
    q = q.astype(idt)
    span = 2 * jnp.max(jnp.abs(q), axis=tuple(range(q.ndim - 1))) + 1  # (d,)
    strides = jnp.cumprod(
        jnp.concatenate([jnp.ones((1,), idt), span[:-1].astype(idt)])
    )
    if q.shape[-1] > 1 and not config.x64_enabled() and _callbacks_ok():
        # int32 capacity check (f32 mode; 1-D keys are the coords
        # themselves and cannot wrap).  The stride product is the total
        # lattice extent: past 2^31 keys wrap, the antisymmetry the
        # merge relies on breaks, and distinct cells can collide --
        # detectable only at run time (spans are data-dependent), so
        # warn loudly instead of corrupting silently.  CPU-only: the
        # debug.print lowers to a host callback custom-call, which the
        # tunneled TPU backend rejects at execution (UNIMPLEMENTED) --
        # the whole program would crash even when the predicate is
        # false.  On TPU the equivalent guard runs host-side at plan
        # time from the sequence's lattice bound (engine._capacity).
        total = jnp.cumprod(span.astype(jnp.float32))[-1]
        jax.lax.cond(
            total > 2.0 ** 31,
            lambda: jax.debug.print(
                "epgpy_tpu shiftnd: merge key space {t:.3g} exceeds int32 "
                "-- multi-dim table merges are UNRELIABLE at this extent; "
                "use a coarser kgrid/tvalue or run in x64 (CPU)", t=total),
            lambda: None)
    return jnp.sum(q * strides, axis=-1)


def _merge_rows(keys, payloads, R):
    """Sort rows by key, segment-sum payload columns of equal keys.

    keys: (R,) int; payloads: dict name -> (R, ...cols) arrays sharing the
    leading row axis.  Returns (sorted unique keys (R2,), merged payloads,
    seg, nseg) where R2 = next power of two >= R, rows >= nseg are
    undefined-but-zero, and nseg counts only REAL key cells.

    The pow2 padding is a TPU compile-time fix: XLA:TPU's sort lowering
    compiles in O(seconds) for power-of-two row counts but O(minutes) for
    others (measured 0.5 s at R=512 vs 264 s at R=387 through the axon
    service).  Pad rows carry a max-int sentinel key and zero payloads:
    they sort to the end, form their own cell past `nseg`, and never
    affect the merge.
    """
    R2 = 1 << (R - 1).bit_length()
    npad = R2 - R
    sentinel = jnp.iinfo(keys.dtype).max
    if npad:
        keys = jnp.concatenate([keys, jnp.full((npad,), sentinel, keys.dtype)])
    order = jnp.argsort(keys)
    keys_s = keys[order]
    head = jnp.concatenate([
        jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1]])
    seg = jnp.cumsum(head) - 1                      # (R2,)
    merged = {}
    for name, arr in payloads.items():
        if npad:
            pad = jnp.zeros((npad,) + arr.shape[1:], arr.dtype)
            arr = jnp.concatenate([arr, pad], axis=0)
        arr_s = jnp.take(arr, order, axis=0)
        merged[name] = jax.ops.segment_sum(arr_s, seg, num_segments=R2)
    ukeys = jax.ops.segment_max(keys_s, seg, num_segments=R2)
    # real keys are < sentinel, so they occupy the first R sorted rows:
    # the last real row's segment id counts the real unique cells
    nseg = seg[R - 1] + 1
    return ukeys, merged, seg, nseg


def _select_symmetric(ukeys, mag, nseg, C):
    """Row indices (C,) of the kept table, mirror-symmetric around k=0.

    Ranks only strictly-positive keys by magnitude (mag is exactly
    symmetric under k -> -k, see module docstring), keeps the top
    (C-1)//2 of them, and emits

        out[h-1-i] = mirror(top[i]),  out[h] = center,  out[h+1+i] = top[i]

    with h = (C-1)//2.  Mirror rows sit at ``nseg-1-i`` because the unique
    keys are sorted ascending and the key set is symmetric.  Unused slots
    point at an empty segment row (all-zero payload, coords 0).
    """
    R = ukeys.shape[0]
    idx = jnp.arange(R)
    valid = idx < nseg
    h = (C - 1) // 2

    score = jnp.where(valid & (ukeys > 0), mag, -jnp.inf)
    # descending-magnitude selection via a stable ascending argsort of
    # -score (R is a power of two after _merge_rows padding; lax.top_k
    # compiles ~20x slower than a pow2 sort on TPU and ties break the
    # same way: lowest index first)
    top = jnp.argsort(-score)[:h]
    topscore = jnp.take(score, top)
    has = jnp.isfinite(topscore) & (topscore > -jnp.inf)

    # an all-zero filler row: index >= nseg (empty segment). nseg == R only
    # when every candidate row is a distinct key, in which case the table
    # was full and `has` is all-True, so the filler is never used.
    filler = jnp.minimum(nseg, R - 1)
    top = jnp.where(has, top, filler)
    mirror_top = jnp.where(has, nseg - 1 - top, filler)

    # center: position of key 0 among the valid sorted keys
    search_keys = jnp.where(valid, ukeys, jnp.iinfo(ukeys.dtype).max)
    center = jnp.searchsorted(search_keys, 0)

    out = jnp.full((C,), filler, dtype=idx.dtype)
    out = out.at[h].set(center)
    out = out.at[h + 1 + jnp.arange(h)].set(top)
    out = out.at[h - 1 - jnp.arange(h)].set(mirror_top)
    return out


def _component_payloads(states):
    """Candidate-row payloads for the (Z stays / F+ moves / F- moves)
    scatter, with complex states SPLIT into re/im real channels.

    XLA:TPU compiles the sort/segment/gather pipeline ~20x slower per
    complex payload than per real payload (measured 19 s vs 0.9 s for one
    channel at R=512 through the axon service): keeping the merge
    all-real is a pure compile-time optimization -- numerics unchanged.
    """
    Z = jnp.moveaxis(states[..., 2], -1, 0)
    Fp = jnp.moveaxis(states[..., 0], -1, 0)
    Fm = jnp.moveaxis(states[..., 1], -1, 0)
    zeros = jnp.zeros_like(jnp.real(Z))
    out = {}
    for name, arr, slot in (("Z", Z, 0), ("Fp", Fp, 1), ("Fm", Fm, 2)):
        for part, fn in (("re", jnp.real), ("im", jnp.imag)):
            cells = [zeros, zeros, zeros]
            cells[slot] = fn(arr)
            out[f"{name}_{part}"] = jnp.concatenate(cells, axis=0)
    return out


def _abs2_rows(merged, bdims):
    """Per-row |state|^2 summed over batch dims, from split channels."""
    return sum(
        jnp.sum(merged[f"{ch}_{p}"] ** 2, axis=bdims)
        for ch in ("Z", "Fp", "Fm") for p in ("re", "im")
    )


def _take_states(merged, kept):
    """Gather kept rows of the split channels back into (..., C, 3)."""
    comps = []
    for ch in ("Fp", "Fm", "Z"):
        re = jnp.take(merged[f"{ch}_re"], kept, axis=0)
        im = jnp.take(merged[f"{ch}_im"], kept, axis=0)
        comps.append(jnp.moveaxis(jax.lax.complex(re, im), 0, -1))
    return jnp.stack(comps, axis=-1)


# -- matmul merge engine (sort/scatter/gather-free) --


def _mm(a, b):
    """One-hot matmul on the physics path: full-precision passes (TPU
    matmul defaults to bf16 passes -- CLAUDE.md fact 5)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _allpairs_cells(keys):
    """Segment ids via all-pairs key comparisons (no sort).

    Returns (seg, nseg, center, has_zero):
      seg[i]  = number of DISTINCT key values < keys[i] -- i.e. the index
                of candidate i's cell in the ascending-key cell ordering
                (exactly the segment id the sorted merge derives);
      nseg    = number of distinct cells;
      center  = index of the key==0 cell (== #distinct negative keys;
                first nonnegative cell when no zero key exists, matching
                the sorted engine's searchsorted(ukeys, 0));
      has_zero= whether a key==0 cell exists.
    """
    R = keys.shape[0]
    i = jnp.arange(R)
    key_i = keys[:, None]          # (R, 1)
    key_j = keys[None, :]          # (1, R)
    eq = key_j == key_i
    # head: candidate is the first occurrence of its key (lowest index)
    head = jnp.sum(eq & (i[None, :] < i[:, None]), axis=1) == 0
    seg = jnp.sum((key_j < key_i) & head[None, :], axis=1)
    nseg = jnp.sum(head)
    center = jnp.sum(head & (keys < 0))
    has_zero = jnp.any(keys == 0)
    return seg, nseg, center, has_zero


def _select_matrix(mag, nseg, center, has_zero, C, dtype):
    """(C, R) one-hot selection matrix: symmetric magnitude top-k.

    Row c of the result picks the merged cell landing in output slot c:
    slot h=(C-1)//2 is the center (k=0) cell, slots h+1+r the kept
    positive-key cells in ascending key order, slots h-1-r their mirror
    cells (mirror of cell s is cell nseg-1-s: the cell key multiset is
    symmetric).  Selection set is identical to the sorted engine's
    stable argsort(-score)[:h] (ties broken by lowest cell index);
    unused slots have all-zero rows (zero states, coords 0).
    """
    R = mag.shape[0]
    s = jnp.arange(R)
    h = (C - 1) // 2
    valid = s < nseg
    pos = (s > center) | ((s == center) & ~has_zero)
    neginf = jnp.array(-jnp.inf, mag.dtype)
    score = jnp.where(valid & pos, mag, neginf)
    # stable top-h via all-pairs rank (beats = strictly greater, or
    # equal with lower index)
    beats = (score[None, :] > score[:, None]) | (
        (score[None, :] == score[:, None]) & (s[None, :] < s[:, None]))
    rank = jnp.sum(beats, axis=1)
    keep = (rank < h) & (score > neginf)
    ppos = jnp.cumsum(keep) - 1                     # rank among kept, by key
    # mirror views: mk[t] = keep[nseg-1-t] etc. (flip + dynamic roll;
    # out-of-range wraps hit keep==False rows, so no spurious picks)
    mk = jnp.roll(keep[::-1], nseg - R)
    mp = jnp.roll(ppos[::-1], nseg - R)
    c = jnp.arange(C)[:, None]
    G = ((keep[None, :] & (c == h + 1 + ppos[None, :]))
         | (mk[None, :] & (c == h - 1 - mp[None, :]))
         | ((c == h) & (s[None, :] == center)))
    return G.astype(dtype)


def _state_cols(states):
    """Per-component (C, 2*Bflat) real matrices [re || im] and the
    batch-shape restorer.  states: (*batch, C, 3) complex."""
    bshape = states.shape[:-2]
    Ccap = states.shape[-2]
    cols = []
    for j in range(3):
        comp = jnp.moveaxis(states[..., j], -1, 0).reshape(Ccap, -1)
        cols.append(jnp.concatenate([comp.real, comp.imag], axis=1))

    def restore(mats):
        B = max(1, math.prod(bshape))
        comps = []
        for m in mats:
            cm = jax.lax.complex(m[:, :B], m[:, B:])
            comps.append(jnp.moveaxis(cm.reshape((Ccap,) + bshape), 0, -1)
                         if bshape else cm.reshape(Ccap))
        return jnp.stack(comps, axis=-1)

    return cols, restore


def _merge_matmul(states, keys, extra, C_cap):
    """Shared matmul-merge core.

    states: (*batch, C, 3); keys: (3C,) candidate keys in [qL|qL+d|qL-d]
    block order; extra: (3C, k) small per-candidate payload columns
    (coords / weights).  Returns (new_states, extra_out (C, k)).
    """
    R = keys.shape[0]
    dt = config.real_dtype()
    seg, nseg, center, has_zero = _allpairs_cells(keys)
    # one-hot cell matrix, split by candidate block: cell s sums the Z
    # payload of its L-block member, F+ of its +delta member, F- of its
    # -delta member (each block contributes at most one candidate)
    M1 = (seg[None, :] == jnp.arange(R)[:, None]).astype(dt)   # (R, R)
    (Fp, Fm, Z), restore = _state_cols(states)
    mZ = _mm(M1[:, :C_cap], Z)
    mFp = _mm(M1[:, C_cap:2 * C_cap], Fp)
    mFm = _mm(M1[:, 2 * C_cap:], Fm)
    mX = _mm(M1, extra.astype(dt))                             # (R, k)
    mag = (jnp.sum(mZ * mZ, axis=1) + jnp.sum(mFp * mFp, axis=1)
           + jnp.sum(mFm * mFm, axis=1))
    G = _select_matrix(mag, nseg, center, has_zero, C_cap, dt)
    new_states = restore((_mm(G, mFp), _mm(G, mFm), _mm(G, mZ)))
    return new_states, _mm(G, mX)


def _use_matmul(states, C_cap):
    bflat = max(1, math.prod(states.shape[:-2]))
    return (3 * C_cap <= _MATMUL_MERGE_MAX_ROWS
            and 2 * bflat <= _MATMUL_MERGE_MAX_COLS)


def shiftnd_table(states, coords, delta, C=None, method="auto"):
    """Integer n-D shift on a shared coordinate table.

    states: (..., C, 3) complex; coords: (C, d) int (shared across batch);
    delta: (d,) int.  Returns (states', coords') with the same shapes.
    ``method``: "auto" (size-gated matmul engine with sort fallback),
    "matmul", or "sort".  Both engines merge identical cell sets; the
    matmul engine returns rows in ascending key order, the sort engine
    in magnitude order (row order is internal state -- the center k=0
    row sits at (C-1)//2 in both).
    """
    C_cap = states.shape[-2] if C is None else C
    d = coords.shape[-1]
    idt = _intdtype()
    coords = coords.astype(idt)
    delta = jnp.asarray(delta, idt)

    qL = coords
    q1 = coords + delta
    q2 = coords - delta
    cand_q = jnp.concatenate([qL, q1, q2], axis=0)          # (3C, d)
    keys = _encode_keys(cand_q)

    if method == "matmul" or (method == "auto" and _use_matmul(states, C_cap)):
        rdt = config.real_dtype()
        extra = jnp.concatenate(
            [cand_q.astype(rdt), jnp.ones((3 * C_cap, 1), rdt)], axis=1)
        new_states, ex = _merge_matmul(states, keys, extra, C_cap)
        cnt = jnp.maximum(ex[:, -1], 1.0)
        new_coords = jnp.round(ex[:, :-1] / cnt[:, None]).astype(idt)
        return new_states, new_coords

    payloads = dict(
        _component_payloads(states),
        q=cand_q.astype(config.real_dtype()),
        cnt=jnp.ones((3 * C_cap,), config.real_dtype()),
    )
    ukeys, merged, seg, nseg = _merge_rows(keys, payloads, 3 * C_cap)

    # magnitude per row, summed over batch dims (shared selection)
    bdims = tuple(range(1, merged["Z_re"].ndim))
    mag = _abs2_rows(merged, bdims)
    kept = _select_symmetric(ukeys, mag, nseg, C_cap)

    new_states = _take_states(merged, kept)
    cnt = jnp.maximum(jnp.take(merged["cnt"], kept, axis=0), 1.0)
    new_coords = (jnp.take(merged["q"], kept, axis=0) / cnt[:, None])
    new_coords = jnp.round(new_coords).astype(idt)
    return new_states, new_coords


def shiftmerge_table(states, wavenums, delta, grid, C=None, tol=1e-8,
                     method="auto"):
    """Float wavenumber shift with gridded merging (Gao 2021).

    states: (..., C, 3); wavenums: (C, d) float shared; delta: (d,) float;
    grid: (d,) or scalar cell size.  Returns (states', wavenums').
    ``method`` as in :func:`shiftnd_table`.
    """
    C_cap = states.shape[-2] if C is None else C
    rdt = config.real_dtype()
    idt = _intdtype()
    wavenums = jnp.asarray(wavenums, rdt)
    delta = jnp.asarray(delta, rdt)
    grid = jnp.broadcast_to(jnp.asarray(grid, rdt), (wavenums.shape[-1],))

    kL = jnp.round(wavenums, 8)
    k1 = kL + delta
    k2 = kL - delta
    # quantize; qL symmetrized like the reference (epgpy/shift.py:404-406)
    qL = jnp.round(0.5 * (kL - kL[::-1]) / grid).astype(idt)
    q1 = jnp.round(k1 / grid).astype(idt)
    q2 = -q1[::-1]
    cand_q = jnp.concatenate([qL, q1, q2], axis=0)
    keys = _encode_keys(cand_q)

    Z = jnp.moveaxis(states[..., 2], -1, 0)
    Fp = jnp.moveaxis(states[..., 0], -1, 0)
    Fm = jnp.moveaxis(states[..., 1], -1, 0)

    # weights: state magnitudes summed over batch (reference shift.py:420)
    bdims = tuple(range(1, Z.ndim))
    wZ = jnp.sum(jnp.abs(Z), axis=bdims)
    wFp = jnp.sum(jnp.abs(Fp), axis=bdims)
    wFm = jnp.sum(jnp.abs(Fm), axis=bdims)
    w = jnp.concatenate([wZ, wFp, wFm], axis=0)             # (3C,)
    kcand = jnp.concatenate([kL, k1, k2], axis=0)           # (3C, d)

    if method == "matmul" or (method == "auto" and _use_matmul(states, C_cap)):
        extra = jnp.concatenate([kcand * w[:, None], w[:, None]], axis=1)
        new_states, ex = _merge_matmul(states, keys, extra, C_cap)
        wk = ex[:, -1]
        new_k = ex[:, :-1] / jnp.where(wk > tol, wk, 1.0)[:, None]
        return new_states, new_k

    payloads = dict(
        _component_payloads(states),
        kw=kcand * w[:, None],
        w=w,
    )
    ukeys, merged, seg, nseg = _merge_rows(keys, payloads, 3 * C_cap)

    mag = _abs2_rows(merged, bdims)
    kept = _select_symmetric(ukeys, mag, nseg, C_cap)

    new_states = _take_states(merged, kept)
    wk = jnp.take(merged["w"], kept, axis=0)
    new_k = jnp.take(merged["kw"], kept, axis=0) / jnp.where(
        wk > tol, wk, 1.0)[:, None]
    return new_states, new_k


def apply_shift(op, sm):
    """Dispatch S.apply for coordinate-table shifts (non-1D-integer paths).

    Method selection mirrors reference epgpy/shift.py:213-254:
      * int shift + int coords, shared table        -> shiftnd_table
      * float shift (or float coords), shared table -> shiftmerge_table
      * batch-varying shift or per-batch coords     -> vmapped merge
        (the reference's shift-prune)
    """
    # static int scalar (self._kint) stays host-side numpy; table shift
    # vectors come from the traced leaf `kleaf` so shift trains
    # scan-group (values may be tracers here -- only shape/dtype are
    # inspected, numeric work is jnp)
    kint = getattr(op, "_kint", None)
    if kint is None and op.kleaf is None:  # pragma: no cover - legacy
        kint = op.k
    if kint is not None:
        karr = np.zeros((1, max(sm.kdim, 1)), dtype=int)
        karr[0, 0] = kint
        is_int = True
    else:
        karr = jnp.atleast_2d(op.kleaf)
        is_int = jnp.issubdtype(karr.dtype, jnp.integer)

    # widen the coordinate table to the shift's dimensionality
    kdim = max(karr.shape[-1], sm.kdim if sm.coords is not None else 1)
    if sm.coords is None:
        sm = sm.setup_coords(kdim)
        if is_int:
            sm = sm.update(coords=sm.coords.astype(_intdtype()))
    elif sm.kdim < kdim:
        sm = sm.setup_coords(kdim)
    if karr.shape[-1] < sm.kdim:
        karr = jnp.pad(karr, [(0, 0)] * (karr.ndim - 1)
                       + [(0, sm.kdim - karr.shape[-1])])

    coords = sm.coords
    batch_varying = math.prod(karr.shape[:-1]) > 1
    shared_coords = coords.ndim == 2 or all(s == 1 for s in coords.shape[:-2])
    coords_shape = coords.shape
    if coords.ndim > 2 and shared_coords:
        coords = coords.reshape(coords.shape[-2:])
    int_path = is_int and jnp.issubdtype(coords.dtype, jnp.integer)

    def _restore(c):
        # keep the coords leaf shape invariant (scan carries require it)
        return c.reshape(coords_shape[:-2] + c.shape)

    dense = (not batch_varying and shared_coords and not int_path
             and sm.options.get("_dense_grid") and sm.kdim == 1
             and karr.size == 1)
    if dense and sm.lanes:
        # lanes-native dense merge: (Fp, Z) planes move directly, no
        # canonical-view transposes (the engine keeps the half-ladder
        # lanes layout alive for dense tables)
        from .shiftdense import shiftmerge_dense_lanes
        kgrid = sm.options.get("kgrid") or op.kgrid
        ktvalue = sm.ktvalue
        wav = (coords * ktvalue).reshape(-1)
        dscal = (jnp.asarray(karr, config.real_dtype()) * ktvalue).reshape(())
        planes, new_k = shiftmerge_dense_lanes(
            sm.half_planes, wav, dscal, kgrid)
        return sm.update(states_lanes=planes,
                         coords=_restore(new_k / ktvalue))

    states = sm.states

    if int_path and not batch_varying and shared_coords:
        new_states, new_coords = shiftnd_table(states, coords, karr.reshape(-1))
        return sm.update(states=new_states, coords=_restore(new_coords))

    kgrid = sm.options.get("kgrid") or op.kgrid
    if int_path or sm.options.get("_int_grid"):
        # integer data (int dtype, or a float-stored table that only
        # ever receives integer shifts -- engine._setup_table's
        # batch-varying case) quantizes exactly on the unit grid
        kgrid = 1.0
    elif kgrid is None:
        raise AttributeError("kgrid not set")

    ktvalue = sm.ktvalue
    if not batch_varying and shared_coords:
        if dense:
            # dense-grid rows-are-cells fast path (engine-gated: 1-D,
            # shared, no-trim -- see engine._dense_bound)
            from .shiftdense import shiftmerge_dense
            wav = (coords * ktvalue).reshape(-1)
            dscal = (jnp.asarray(karr, config.real_dtype())
                     * ktvalue).reshape(())
            new_states, new_k = shiftmerge_dense(states, wav, dscal, kgrid)
            return sm.update(states=new_states,
                             coords=_restore(new_k / ktvalue))
        wavenums = coords * ktvalue
        delta = jnp.asarray(karr.reshape(-1), config.real_dtype()) * ktvalue
        new_states, new_k = shiftmerge_table(states, wavenums, delta, kgrid)
        return sm.update(states=new_states, coords=_restore(new_k / ktvalue))

    # per-batch variant (shift-prune): batch-varying dense rolls when
    # engine-gated (lanes planes, host-bounded shift window), else the
    # vmapped sort merge
    win = sm.options.get("_dense_grid_varying")
    if (win and sm.lanes and sm.kdim == 1 and karr.shape[-1] == 1
            and not int_path):
        from .shiftdense import shiftmerge_dense_varying_lanes
        Fp, Z = sm.half_planes
        bshape = Fp.shape[1:]
        wav = jnp.moveaxis((coords * ktvalue)[..., 0], -1, 0)  # (D, *batch)
        wav = jnp.broadcast_to(wav, Fp.shape)
        dl = jnp.asarray(karr[..., 0], config.real_dtype()) * ktvalue[0]
        dshape = dl.shape
        if len(dshape) < len(bshape):   # append-broadcast shift batch dims
            dl = dl.reshape(dshape + (1,) * (len(bshape) - len(dshape)))
        dl = jnp.broadcast_to(dl, bshape)
        planes, new_k = shiftmerge_dense_varying_lanes(
            (Fp, Z), wav, dl, kgrid, int(win))
        coords_out = jnp.moveaxis(new_k, 0, -1)[..., None] / ktvalue
        return sm.update(states_lanes=planes, coords=coords_out)

    bshape = states.shape[:-2]
    delta = jnp.asarray(karr, config.real_dtype()) * ktvalue
    dshape = delta.shape[:-1]
    if len(dshape) < len(bshape):  # append-broadcast the shift batch dims
        delta = delta.reshape(
            dshape + (1,) * (len(bshape) - len(dshape)) + delta.shape[-1:])
    delta_full = jnp.broadcast_to(delta, bshape + delta.shape[-1:])
    coords_full = jnp.broadcast_to(coords * ktvalue, bshape + coords.shape[-2:])
    st = states.reshape((-1,) + states.shape[-2:])
    co = coords_full.reshape((-1,) + coords_full.shape[-2:])
    dl = delta_full.reshape((-1, delta_full.shape[-1]))
    # per-element compare matrices would cost B*(3C)^2: keep the sort
    # engine under vmap
    out_s, out_k = jax.vmap(
        lambda s, c, d: shiftmerge_table(s, c, d, kgrid, method="sort"))(
            st, co, dl)
    return sm.update(
        states=out_s.reshape(bshape + out_s.shape[-2:]),
        coords=out_k.reshape(bshape + out_k.shape[-2:]) / ktvalue,
    )
