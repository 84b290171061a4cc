"""Dense-grid float-shift merge: the Gao merge as masked rolls.

The general coordinate-table merge (shiftnd.py) pays for data-dependent
row movement -- on TPU, sorts, computed-index scatters and one-hot
matmuls all cost ~1 ms per merge at 3C~3000 candidate rows (see
docs/performance.md).  For the most common configuration -- 1-D float
shifts, shared across the batch, with host-known shift values -- the
movement is nearly static and none of that machinery is needed:

* put grid cell q at ladder row q + D//2 (rows ARE cells);
* a shift by delta moves F+ rows by ``round(delta/grid)`` plus a
  per-row correction in {-1, 0, +1} (the stored wavenumber is the
  magnitude-weighted cell mean, which lives within grid/2 of its cell
  center, so re-quantizing ``mean + delta`` lands within one cell of
  the uniform target) -- i.e. THREE zero-filled dynamic rolls per
  component, with elementwise masks;
* cell merging is automatic: contributions landing on the same row add;
* the weighted-mean wavenumber bookkeeping (reference
  epgpy/shift.py:419-438) rides along as two extra columns (w, w*k)
  through the same rolls.

Exact-parity conditions (checked by the engine before enabling this
path, engine._dense_bound):

* kdim == 1, shifts shared across the batch, values known on the host;
* the ladder capacity covers the full wavenumber range of the train
  (sum |delta|/grid), so the reference's magnitude-ranked capacity trim
  can never trigger -- under that condition the table engines keep
  every cell and the dense grid computes the identical cell contents;
* initial magnetization confined to the k=0 row (fresh equilibrium
  inits), so the row->cell invariant holds from step 0;
* exact ladder symmetry throughout (verified-symmetric init, every op
  preserves F-(k)=conj(F+(-k))): the +-1 roll windows assume the mean
  wavenumbers are exactly antisymmetric, which holds inductively for
  symmetric states but not for check=False asymmetric data (the table
  engines re-sort globally and handle those).

Semantics: reference epgpy/shift.py:367-449 (shift-merge, Gao 2021
three-dimensional spatially resolved phase graph, restricted to 1-D).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from .. import config
from .shiftnd import _intdtype

__all__ = ["shiftmerge_dense", "shiftmerge_dense_lanes",
           "shiftmerge_dense_varying_lanes"]

# masked-roll kernel vs gather kernel dispatch for batch-varying merges
# (measured, 30-TR x 64-atom train, window 31, TPU v5e):
#   rolls:  7.1 ms/train runtime, ~19 min one-time remote compile
#   gather: 292 ms/train runtime, ~7 min compile
#   vmapped sort: 705 ms/train, ~10+ min compile
# the compile is paid once per program shape (persistent cache), so
# rolls win for production shift windows; gathers beyond the threshold
_VARYING_ROLL_MAX_WINDOW = int(os.environ.get(
    "EPGPY_TPU_VARYING_ROLL_MAX_WINDOW", 32))


def _shift_rows(x, s):
    """Zero-filled row shift by a traced amount: out[t] = x[t - s]."""
    D = x.shape[0]
    pad = jnp.zeros_like(x)
    xpad = jnp.concatenate([pad, x, pad], axis=0)
    return jax.lax.dynamic_slice_in_dim(xpad, D - s, D, axis=0)


def _targets(kL, delta, grid, D):
    """Per-row roll corrections: (eZ, e1, m0) with targets
    Z -> row + eZ, F+ -> row + m0 + e1, F- -> row - m0 - e1[::-1]."""
    idt = _intdtype()
    h = D // 2
    cells = jnp.arange(D, dtype=idt) - h
    qL = jnp.round(0.5 * (kL - kL[::-1]) / grid).astype(idt)
    m0 = jnp.round(delta / grid).astype(idt)
    q1 = jnp.round((kL + delta) / grid).astype(idt)
    return qL - cells, q1 - cells - m0, m0


def _move(arrs, extra, base):
    """Masked-roll merge: each row r of every array moves to row
    r + base + extra[r], extra in {-1, 0, 1}; collisions add."""
    outs = [jnp.zeros_like(a) for a in arrs]
    for e in (-1, 0, 1):
        m = extra == e
        for i, a in enumerate(arrs):
            mask = m.reshape((m.shape[0],) + (1,) * (a.ndim - 1))
            outs[i] = outs[i] + _shift_rows(
                a * mask.astype(a.real.dtype), base + e)
    return outs


def shiftmerge_dense(states, wavenums, delta, grid, tol=1e-8):
    """1-D gridded float-shift merge on a dense cell ladder.

    states: (*batch, D, 3) complex, row r holding grid cell ``r - D//2``;
    wavenums: (D,) float weighted-mean wavenumbers (cell-resident);
    delta: scalar float shift; grid: scalar cell size.

    Returns (states', wavenums' (D, 1)) -- same cell contents as
    :func:`shiftnd.shiftmerge_table` under the no-trim condition, with
    rows positioned by cell instead of compacted.
    """
    D = states.shape[-2]
    h = D // 2
    rdt = config.real_dtype()
    idt = _intdtype()
    bshape = states.shape[:-2]
    B = max(1, math.prod(bshape))

    kL = jnp.round(jnp.asarray(wavenums, rdt).reshape(D), 8)
    g = jnp.asarray(grid, rdt).reshape(())
    delta = jnp.asarray(delta, rdt).reshape(())

    # target cells, exactly as the table merge quantizes them
    # (epgpy_tpu/ops/shiftnd.py shiftmerge_table): Z keeps its
    # symmetrized cell, F+ moves to round((k+delta)/grid), F- mirrors
    eZ, e1, m0 = _targets(kL, delta, g, D)
    e2 = -e1[::-1]                   # F- correction (q2 = -q1[::-1])
    zero = jnp.zeros((), idt)

    def bundle(j, val):
        """(D, 2B+2) columns: [re | im | w | w*k] for component j."""
        comp = jnp.moveaxis(states[..., j], -1, 0).reshape(D, -1)
        w = jnp.sum(jnp.abs(comp), axis=1)
        return jnp.concatenate(
            [comp.real, comp.imag, w[:, None], (w * val)[:, None]], axis=1)

    (mZ,) = _move([bundle(2, kL)], eZ, zero)
    (mFp,) = _move([bundle(0, kL + delta)], e1, m0)
    (mFm,) = _move([bundle(1, kL - delta)], e2, -m0)

    w_out = mZ[:, -2] + mFp[:, -2] + mFm[:, -2]
    kw_out = mZ[:, -1] + mFp[:, -1] + mFm[:, -1]
    new_k = kw_out / jnp.where(w_out > tol, w_out, 1.0)

    def restore(m):
        c = jax.lax.complex(m[:, :B], m[:, B:2 * B])
        if bshape:
            return jnp.moveaxis(c.reshape((D,) + bshape), 0, -1)
        return c[:, 0]

    new_states = jnp.stack([restore(mFp), restore(mFm), restore(mZ)],
                           axis=-1)
    return new_states, new_k[:, None]


def _roll_static(x, s):
    """Zero-filled row shift by a STATIC amount (concat of slices)."""
    if s == 0:
        return x
    D = x.shape[0]
    if abs(s) >= D:
        return jnp.zeros_like(x)
    pad = jnp.zeros((abs(s),) + x.shape[1:], x.dtype)
    if s > 0:
        return jnp.concatenate([pad, x[:-s]], axis=0)
    return jnp.concatenate([x[-s:], pad], axis=0)


def shiftmerge_dense_varying_lanes(half_planes, wavenums, delta, grid,
                                   window, tol=1e-8):
    """Batch-varying dense merge (the reference's shift-prune,
    epgpy/shift.py:478-542) on the lanes planes.

    Each atom has its own shift ``delta_b`` and its own per-row mean
    wavenumbers: the per-(row, atom) target shift
    ``t = round((k + delta_b)/grid) - cell`` is bounded by the
    host-known window, so the move is a sum of ``2*window+1`` STATIC
    zero-filled rolls with elementwise masks -- exact (pure data
    movement and adds), no sort / scatter / gather / vmap, and
    compiles in seconds where the vmapped sort merge took >10 min.

    Per-element (not batch-summed) weights, matching the reference's
    prune-path mean bookkeeping; the implied F- contributes per-atom
    mirror flips exactly as in :func:`shiftmerge_dense_lanes` (the
    reference's own prune path assumes the ladder symmetry:
    ``sm2[..., 1] = sm2[..., ::-1, 0].conj()``).

    half_planes: (Fp, Z) each (D, *batch); wavenums: (D, *batch) float;
    delta: (*batch,) float; window: static int >= max |round(d/grid)|+1.
    Returns ((Fp', Z'), wavenums' (D, *batch)).
    """
    Fp, Z = half_planes
    D = Fp.shape[0]
    h = D // 2
    rdt = config.real_dtype()
    idt = _intdtype()

    kL = jnp.round(jnp.asarray(wavenums, rdt), 8)          # (D, *batch)
    g = jnp.asarray(grid, rdt).reshape(())
    delta = jnp.asarray(delta, rdt)
    cells = (jnp.arange(D, dtype=idt) - h).reshape(
        (D,) + (1,) * (Fp.ndim - 1))

    kLs = 0.5 * (kL - kL[::-1])
    qL = jnp.round(kLs / g).astype(idt)
    eZ = qL - cells                                        # in {-1, 0, 1}
    k1 = kL + delta[None]
    t1 = jnp.round(k1 / g).astype(idt) - cells             # |t1| <= window

    def move(arrs, shifts, smin, smax):
        outs = [jnp.zeros_like(a) for a in arrs]
        for s in range(smin, smax + 1):
            m = shifts == s
            for i, a in enumerate(arrs):
                outs[i] = outs[i] + _roll_static(
                    a * m.astype(a.real.dtype), s)
        return outs

    def move_gather(arrs, shifts, base):
        """Same merge via 3 row-gathers from per-atom base offsets.

        The per-(row, atom) shift is base_b + e with e in {-1, 0, 1}
        (the mean stays within grid/2 of its cell center), so target
        row r at atom b receives from sources r - base_b - e.  O(1)
        gathers regardless of the shift window -- the masked-roll form
        costs 2*window+1 rolls and its COMPILE time scales with the
        window (measured 19 min at window=31 through the remote-compile
        tunnel); runtime favors rolls (7 vs ~15 ms/train at window 31),
        so apply_shift picks rolls for small windows, gathers beyond.
        """
        rows = jnp.arange(D, dtype=idt).reshape(
            (D,) + (1,) * (base.ndim))
        outs = [jnp.zeros_like(a) for a in arrs]
        # complex channels split re/im: complex gather payloads compile
        # ~20x slower on TPU (CLAUDE.md fact 12)
        flat = []
        rebuild = []
        for a in arrs:
            if jnp.iscomplexobj(a):
                flat += [a.real, a.imag]
                rebuild.append(2)
            else:
                flat.append(a)
                rebuild.append(1)
        acc = [jnp.zeros_like(f) for f in flat]
        for e in (-1, 0, 1):
            src = rows - base[None] - e
            valid = (src >= 0) & (src < D)
            srcc = jnp.clip(src, 0, D - 1)
            srcb = jnp.broadcast_to(srcc, shifts.shape)
            tsrc = jnp.take_along_axis(shifts, srcb, axis=0)
            sel = (valid & (tsrc == base[None] + e))
            for i, f in enumerate(flat):
                selb = sel.astype(f.dtype)
                acc[i] = acc[i] + jnp.take_along_axis(
                    f, jnp.broadcast_to(srcc, f.shape), axis=0) * selb
        i = 0
        for j, n in enumerate(rebuild):
            if n == 2:
                outs[j] = jax.lax.complex(acc[i], acc[i + 1])
                i += 2
            else:
                outs[j] = acc[i]
                i += 1
        return outs

    wZ = jnp.abs(Z)
    Z2, wZ2, kwZ2 = move([Z, wZ, wZ * kL], eZ, -1, 1)
    wFp = jnp.abs(Fp)
    if window <= _VARYING_ROLL_MAX_WINDOW:
        Fp2, wFp2, kwFp2 = move([Fp, wFp, wFp * k1], t1, -window, window)
    else:
        m0 = jnp.round(delta / g).astype(idt)
        Fp2, wFp2, kwFp2 = move_gather([Fp, wFp, wFp * k1], t1, m0)

    w_out = wZ2 + wFp2 + wFp2[::-1]
    kw_out = kwZ2 + kwFp2 - kwFp2[::-1]
    new_k = kw_out / jnp.where(w_out > tol, w_out, 1.0)
    return (Fp2, Z2), new_k


def shiftmerge_dense_lanes(half_planes, wavenums, delta, grid, tol=1e-8):
    """Dense merge on the half-ladder lanes layout: (Fp, Z) planes of
    shape (D, *batch), batch-minor -- no transposes anywhere.

    The F- plane is implied by the conjugate ladder symmetry and never
    materialized; its weight/mean-wavenumber contributions are the
    mirror of F+'s:  w_Fm_out = flip(w_Fp_out),
    kw_Fm_out = -flip(kw_Fp_out)  (source weights |F-(r)| = |F+(-r)|,
    values kL(r) - delta = -(kL(-r) + delta), targets mirrored).

    Returns ((Fp', Z'), wavenums' (D, 1)).
    """
    Fp, Z = half_planes
    D = Fp.shape[0]
    rdt = config.real_dtype()
    idt = _intdtype()

    kL = jnp.round(jnp.asarray(wavenums, rdt).reshape(D), 8)
    g = jnp.asarray(grid, rdt).reshape(())
    delta = jnp.asarray(delta, rdt).reshape(())
    eZ, e1, m0 = _targets(kL, delta, g, D)
    bdims = tuple(range(1, Fp.ndim))

    def wk(plane, val):
        w = jnp.sum(jnp.abs(plane), axis=bdims)
        return jnp.stack([w, w * val], axis=1)        # (D, 2)

    Z2, wkZ = _move([Z, wk(Z, kL)], eZ, jnp.zeros((), idt))
    Fp2, wkFp = _move([Fp, wk(Fp, kL + delta)], e1, m0)

    w_out = wkZ[:, 0] + wkFp[:, 0] + wkFp[::-1, 0]
    kw_out = wkZ[:, 1] + wkFp[:, 1] - wkFp[::-1, 1]
    new_k = kw_out / jnp.where(w_out > tol, w_out, 1.0)
    return (Fp2, Z2), new_k[:, None]
