"""Whole-sequence kernel dispatch: FISP trains -> the fused Pallas kernel.

The general engine compiles any operator list into scanned XLA programs
(engine._build_plan).  For the most common MRF workload -- a FISP train
``[T(fa_i, phi_i), E(TE, T1, T2), ADC, E(TR_i - TE, T1, T2), S(1)] * N``
-- a far better TPU program exists: the VMEM-resident folded half-ladder
kernel (models/pallas_fisp), which holds the whole state ladder in VMEM
across the train instead of round-tripping it through HBM every TR
(~2.8x the scan-planned engine at dictionary scale, ~7000x the reference
NumPy loop).  This module recognizes that shape at the raw-operator
level and routes ``simulate()`` to the kernel -- the TPU analog of
library-level pattern fusion (users keep the fully general operator API
and get the hand-fused kernel when their sequence has the fused form).

Matching is strict: exact op types, integer unit shift, equilibrium
init, no coordinate grid.  Within that, the matcher covers the real MRF
pattern space: per-pulse TR *and* TE (canonical MRF-FISP, Jiang 2015),
rank-1 ``outer(FA, B1)`` flip batches, ``[T(180-family),
E(TI)]`` inversion preps, demodulated readouts (``Adc(phase=-phi_i)``),
and canonical ``order1=["T1","T2"]`` differentiation (Jacobian probes
route to the fused primal+tangent kernel, ``fisp_jacobian_pallas``).
Anything else falls through to the general planner.  Observability:
simulate() logs ``fisp-kernel`` at INFO when the dispatch engages (like
the table-merge engine logs); opt out per call with
``simulate(..., fisp_kernel=False)``.

Reference anchor: the workload of epgpy's MRF examples
(/root/reference/examples/sequence/optim_mrf.py:62-90); the reference
has no analogous fusion -- every op is a NumPy matmul.
"""

from __future__ import annotations

import functools
import logging

import numpy as np

import jax
import jax.numpy as jnp

from . import common

LOGGER = logging.getLogger(__name__)

__all__ = ["match_fisp", "run_fisp_kernel", "match_jacobian_probes",
           "run_fisp_jacobian", "match_mse", "run_mse_kernel",
           "run_mse_jacobian", "match_bssfp", "run_bssfp_kernel",
           "run_bssfp_jacobian", "match_dess", "run_dess_kernel",
           "run_dess_jacobian", "match_megre", "run_megre_kernel",
           "run_megre_jacobian",
           "match_dwfisp", "run_dwfisp_kernel", "run_dwfisp_jacobian",
           "match_composite", "run_composite_kernel",
           "run_composite_jacobian",
           "match_xcomposite", "run_xcomposite_kernel",
           "clear_cache"]

#: per-sequence match memo, keyed on operator identities (same pattern
#: as engine._sequence_preamble): dictionary services call simulate()
#: repeatedly on one op list, and the rank-1 flip factorization is
#: O(N_pulses x N_atoms) of host work.  Entries pin the operator list
#: so ids cannot be reused while cached.
_MATCH_CACHE: dict = {}
_MATCH_CACHE_MAX = 64


def clear_cache():
    _MATCH_CACHE.clear()


#: Kernel-dispatch engagement counter (r5): the engine increments the
#: matched family's tag ("fisp", "mse", ..., "hessian") each time a
#: simulate() call actually routes to a fused kernel.  bench.py's
#: per-family parity probes and the warm-path regression test read it
#: to PROVE a measurement exercised the kernel rather than a silent
#: planner fall-through.  Diagnostics only -- never branch on it.
DISPATCH_COUNTS: dict = {}


def count_dispatch(tag):
    DISPATCH_COUNTS[tag] = DISPATCH_COUNTS.get(tag, 0) + 1


_KERNEL_VMEM_BUDGET = 80 * 1024 * 1024


def kernel_fits_vmem(nplanes, nstate, lanes=512):
    """Conservative VMEM-fit gate for the fused kernels.

    The persistent f32 scratch planes (nplanes x (nstate+1) x lanes)
    must leave headroom for the double-buffered in/out windows under
    the kernels' 100 MB vmem limit.  Oversized un-capped or tracked
    trains (e.g. a 3000-TR train without max_nstate) fall through to
    the scan planner instead of failing Mosaic compilation."""
    return 4 * nplanes * (int(nstate) + 1) * int(lanes) \
        <= _KERNEL_VMEM_BUDGET


def _memoized(key, sequence, compute):
    """Memoize a matcher result (including non-matches) on `key`.

    The cached entry pins the op list so id() reuse after GC cannot
    alias a fresh sequence onto a stale key; oldest entries evict
    first."""
    hit = _MATCH_CACHE.get(key)
    if hit is not None:
        return hit[0]
    result = compute()
    while len(_MATCH_CACHE) >= _MATCH_CACHE_MAX:
        _MATCH_CACHE.pop(next(iter(_MATCH_CACHE)))
    _MATCH_CACHE[key] = (result, list(sequence))
    return result


def _is_device(x):
    """Device/traced leaves disqualify the op: np.asarray on them is a
    d2h tunnel transfer (~25 ms each; never in a loop — CLAUDE.md), and
    traced values can't be matched host-side at all.  Such trains fall
    through to the scan planner, which handles traced leaves natively."""
    return isinstance(x, (jax.Array, jax.core.Tracer))


def _scalar(x):
    """Return float(x) if x is a host scalar (0-d/()/(1,)), else None."""
    if x is None:
        return None
    if isinstance(x, (int, float)):
        return float(x)
    if _is_device(x):
        return None
    arr = np.asarray(x)
    if arr.ndim == 0 or arr.size == 1:
        return float(arr.reshape(()))
    return None


def _vec_or_scalar(x):
    """Host value as a 1-D float array, or None if traced/ndim>1."""
    if _is_device(x):
        return None
    try:
        arr = np.asarray(x, dtype=np.float64)
    except (TypeError, ValueError):
        return None
    if arr.ndim > 1:
        return None
    return np.atleast_1d(arr)


def _host_nd(x):
    """Host value as a float array of any rank, or None if traced."""
    if _is_device(x):
        return None
    try:
        return np.atleast_1d(np.asarray(x, dtype=np.float64))
    except (TypeError, ValueError):
        return None


def _no_diff(op):
    return not getattr(op, "order1", None) and not getattr(op, "order2", None)


def _canonical_order1(op, allowed=("T1", "T2")):
    """E-op order1 as a sorted tuple of tracked names, or None.

    The fused Jacobian kernels propagate dS/d(param) for GLOBAL atom
    parameters, which corresponds to order1 specs where the variable
    IS the parameter with unit coefficient (the common
    ``order1=["T1", "T2"]`` form).  Aliased variables, chain-rule
    coefficients, parameters outside `allowed` (ME-GRE also admits
    "g": its kernel carries a df tangent group) and order2 disqualify
    the train (fall through to the general jacfwd path)."""
    if getattr(op, "order2", None):
        return None
    o1 = getattr(op, "order1", None)
    if not o1:
        return ()
    names = []
    for var, cfs in o1.items():
        if var not in allowed or set(cfs) != {var}:
            return None
        c = cfs[var]
        # coefficient must be the host scalar 1.0 (array/device/traced
        # chain-rule coefficients disqualify -- never raise here: the
        # matcher must FALL THROUGH on exotic specs, not crash)
        if _is_device(c) or np.ndim(c) != 0:
            return None
        try:
            if float(c) != 1.0:
                return None
        except (TypeError, ValueError):
            return None
        names.append(var)
    return tuple(sorted(names))


def _t_b1_order1(op):
    """T-op order1 for B1 tracking (r5, VERDICT #5): no spec -> ``()``
    (untracked); exactly ``order1={"B1": {"alpha": c}}`` with a host
    scalar chain-rule coefficient c = d(alpha)/dB1 -> ``float(c)``;
    anything else (other variables, order2, device/traced or
    non-scalar coefficients) -> None (fall through to the planner).

    Reference semantics: B1 enters only as the flip attenuation
    (``att`` in /root/reference/epgpy/functions.py:316-347, applied as
    ``T(alpha*att, phi)``), so dS/dB1 = sum_i c_i dS/dalpha_i with
    c_i the nominal flip -- the chain-rule-coefficient order1 form."""
    if getattr(op, "order2", None):
        return None
    o1 = getattr(op, "order1", None)
    if not o1:
        return ()
    if set(o1) != {"B1"}:
        return None
    cfs = o1["B1"]
    if not isinstance(cfs, dict) or set(cfs) != {"alpha"}:
        return None
    c = cfs["alpha"]
    if _is_device(c) or np.ndim(c) != 0:
        return None
    try:
        return float(c)
    except (TypeError, ValueError):
        return None


def _b1_scale_from_coeffs(FA, coeffs, sens=None):
    """Shared-ratio validation for B1-tracked trains.

    The kernels' dB1 column is w.r.t. their internally factored B1
    (``_rank1_factor`` absorbs the physical scale into FA), with
    per-stage coefficient d(a_i)/dB1_kernel = FA_i.  The user's spec
    says d(alpha_i)/dB1_phys = c_i, so consistency requires ONE shared
    ratio s = FA_i / c_i across every B1-sensitive stage -- then
    dS/dB1_phys = dS/dB1_kernel / s.  ``sens`` optionally marks which
    stages the kernel's dB1 group actually sums (default: all);
    sensitive stages must be tracked and insensitive ones untracked,
    else the kernel's summed column is not the requested derivative.
    Returns s (nonzero float) or None.
    """
    n = len(coeffs)
    if sens is None:
        sens = [abs(float(f)) > 1e-12 for f in FA[:n]]
    s = None
    for i in range(n):
        c = coeffs[i]
        if sens[i]:
            if c == () or c == 0.0:
                return None
            r = float(FA[i]) / c
            if s is None:
                s = r
            elif abs(r - s) > 1e-5 * max(abs(s), 1e-30):
                return None
        elif c != () and c != 0.0:
            return None
    return s


def _d_order1(op):
    """D-op order1 for diffusivity tracking (r5, VERDICT #6): no spec
    -> ``()`` (untracked); canonical ``order1=["Dcoef"]`` or the alias
    ``order1={"D": "Dcoef"}`` (unit coefficient) -> the tracked var
    name; anything else -> None (planner).  Beyond reference: epgpy's
    D op has no derivatives at all."""
    if getattr(op, "order2", None):
        return None
    o1 = getattr(op, "order1", None)
    if not o1:
        return ()
    if len(o1) != 1:
        return None
    (var, cfs), = o1.items()
    if var not in ("D", "Dcoef") or not isinstance(cfs, dict) \
            or set(cfs) != {"Dcoef"}:
        return None
    c = cfs["Dcoef"]
    if _is_device(c) or np.ndim(c) != 0:
        return None
    try:
        if float(c) != 1.0:
            return None
    except (TypeError, ValueError):
        return None
    return var


def _append_rows(arrs, bshape):
    """Right-pad (append-broadcast rule) and broadcast each array to
    `bshape`, flattened -- views, no copies."""
    nd = len(bshape)
    return [np.broadcast_to(a.reshape(a.shape + (1,) * (nd - a.ndim)),
                            bshape).reshape(-1) for a in arrs]


def _rank1_factor(alphas):
    """Factor a list of batch-or-scalar flip rows into rank-1
    ``outer(FA, B1)``; returns (FA, B1) host arrays or None.  B1 keeps
    the rows' (append-rule) broadcast batch shape.

    Scalar-only rows get B1 = [1].  Otherwise a streaming rank-1 check:
    per-row least-squares coefficient against the largest row, O(B)
    temporaries only (a stacked (N, B) f64 matrix is ~1 GB at
    dictionary scale and costs tens of seconds of host time).
    Tolerance 1e-6 (~8 f32 ulps): user trains are often built as
    float32 products fl(FA_i * B1_b), which rounds each entry
    independently (~1.2e-7 relative), so exact rank-1 never holds --
    but genuine per-atom structure (slice-profile / calibration
    corrections) must NOT be silently approximated away, so the margin
    stays within one decade of the rounding floor.
    """
    N = len(alphas)
    if all(a.size == 1 for a in alphas):
        return (np.asarray([float(a.reshape(-1)[0]) for a in alphas]),
                np.ones(1))
    bshape = common.broadcast_shapes(*(x.shape for x in alphas))
    rows = _append_rows(alphas, bshape)                     # views
    mags = [float(np.abs(r).max()) for r in rows]
    ref = rows[int(np.argmax(mags))].astype(np.float64)
    nref2 = float(ref @ ref)
    refmax = np.abs(ref).max()
    if nref2 == 0.0:
        return None
    FA = np.empty(N)
    for i, r in enumerate(rows):
        c = float(r @ ref) / nref2
        if np.abs(r - c * ref).max() > 1e-6 * max(abs(c) * refmax, 1e-30):
            return None
        FA[i] = c
    scale = refmax
    # only FA*B1 enters the kernel
    return FA * scale, (ref / scale).reshape(bshape)


def match_fisp(sequence):
    """Match ``[T, E, ADC, E, S(1)] * N`` and extract kernel parameters.

    Returns ``dict(FA, phi, TR, TE, T1, T2, B1)`` (host arrays; FA/phi/TR
    of length N; TE a scalar for constant-TE trains, else length N) or
    ``None``.  Handles per-atom flip scaling when every T's alpha is a
    common (B,) vector scaled per pulse (a rank-1 ``outer(FA, B1)``
    train, the B1-dictionary pattern).  Results (including non-matches)
    are memoized on operator identities.
    """
    if len(sequence) < 10 or len(sequence) % 5 not in (0, 2):
        return None
    key = tuple(id(op) for op in sequence)
    return _memoized(key, sequence,
                     lambda: _match_fisp_impl(sequence))


def _match_fisp_impl(sequence, spoiled=True, dw=False, kvalue=1.0):
    from .ops.transition import T
    from .ops.evolution import E
    from .ops.shift import S
    from .ops.probe import Adc
    from .ops.diffusion import D as Dop

    group = 6 if dw else (5 if spoiled else 4)
    # balanced trains admit off-resonance tracking (bSSFP resolves df,
    # so dS/dg is a fitted column in MRF-bSSFP; the kernel carries a
    # ddf tangent group).  Spoiled FISP leaves g untracked here: the
    # spoiler makes df nearly unidentifiable (global echo phase) and
    # the FISP kernels have no df tangent group.
    allowed = ("T1", "T2") if spoiled else ("T1", "T2", "g")
    # optional inversion prep: [T(180-family, phi), E(TI)] prefix (the
    # reference MRF pattern, e.g. examples/sequence/optim_mrf.py:28-29).
    # The kernel's prep is a 180*B1 pulse about phi=0 + TI relaxation;
    # validated against the extracted train B1 below.  FISP preps must
    # have g=0; balanced (bSSFP) preps may carry the train's per-atom
    # off-resonance (validated against DF after the loop — the kernel
    # applies the TI phase to the prepped F+).
    prep = None
    if len(sequence) % group == 2:
        t0, e0 = sequence[0], sequence[1]
        if type(t0) is not T or type(e0) is not E:
            return None
        if _t_b1_order1(t0) is None \
                or _canonical_order1(e0, allowed) is None:
            return None
        if t0.axes is not None or e0.axes is not None:
            return None
        TI = _scalar(e0.tau)
        if TI is None:
            return None
        prep = (t0, e0, TI)
        sequence = sequence[2:]

    N = len(sequence) // group

    alphas, phis, te_taus, tr_taus, adc_phases = [], [], [], [], []
    b1_coeffs = []
    d_ops = []
    d_var = ()
    T1 = T2 = DF = None
    tracked = None
    for i in range(N):
        if dw:
            t_op, e1, adc, e2, s, d = sequence[6 * i:6 * i + 6]
            if (type(e2) is not E or type(s) is not S
                    or type(d) is not Dop):
                return None
            # D ops may carry canonical diffusivity tracking (r5); all
            # instances are the same op (enforced by _dw_bvalue), so
            # the spec is shared by construction
            dvar = _d_order1(d)
            if not _no_diff(s) or dvar is None:
                return None
            if getattr(d, "axes", None) is not None:
                return None
            d_var = dvar or d_var
            d_ops.append(d)
        elif spoiled:
            t_op, e1, adc, e2, s = sequence[5 * i:5 * i + 5]
            if type(e2) is not E or type(s) is not S:
                return None
            if not _no_diff(s):
                return None
        else:
            t_op, e1, adc, e2 = sequence[4 * i:4 * i + 4]
            if type(e2) is not E:
                return None
        if (type(t_op) is not T or type(e1) is not E
                or type(adc) is not Adc):
            return None
        # T ops may carry the B1-tracking chain-rule spec (r5); any
        # other differentiation spec falls through
        b1c = _t_b1_order1(t_op)
        if b1c is None or not _no_diff(adc):
            return None
        b1_coeffs.append(b1c)
        # E ops may carry canonical T1/T2 order1 tracking (the Jacobian
        # dispatch consumes it; it is value-neutral for the primal) --
        # but the spec must be IDENTICAL on every E, incl. the prep
        c1, c2 = (_canonical_order1(e1, allowed),
                  _canonical_order1(e2, allowed))
        if c1 is None or c1 != c2:
            return None
        if tracked is None:
            tracked = c1
        elif tracked != c1:
            return None
        if t_op.axes is not None or e1.axes is not None or e2.axes is not None:
            return None
        # ADC: F0, no weights/reduce; phase must be absent or a host
        # scalar (checked against -phi below: receiver demodulation)
        ph_adc = None if adc.phase is None else _scalar(adc.phase)
        if (adc.attr != "F0" or (adc.phase is not None and ph_adc is None)
                or adc.weights is not None
                or adc.reduce not in (None, False)):
            return None
        adc_phases.append(ph_adc)
        # unit integer shift
        if spoiled and getattr(s, "_kint", None) != 1:
            return None
        ph = _scalar(t_op.phi)
        tte = _scalar(e1.tau)
        ttr = _scalar(e2.tau)
        if ph is None or tte is None or ttr is None:
            return None
        # off-resonance: a constant per-atom (or scalar) g on both E ops
        # maps onto the kernel's dfs axis (E.g == model dfs, pinned by
        # tests/test_mrf.py:test_fisp_off_resonance_matches_engine)
        g1, g2 = _host_nd(e1.g), _host_nd(e2.g)
        if g1 is None or g2 is None or not np.array_equal(g1, g2):
            return None
        if DF is None:
            DF = g1
        elif not np.array_equal(DF, g1):
            return None
        for e in (e1, e2):
            t1v, t2v = _host_nd(e.T1), _host_nd(e.T2)
            if t1v is None or t2v is None:
                return None
            if T1 is None:
                T1, T2 = t1v, t2v
            elif not (np.array_equal(T1, t1v) and np.array_equal(T2, t2v)):
                return None
        a = _host_nd(t_op.alpha)
        if a is None:
            return None
        alphas.append(a)
        phis.append(ph)
        te_taus.append(tte)
        tr_taus.append(ttr)

    te_arr = np.asarray(te_taus)
    # constant TE keeps the kernels' hoisted TE-decay factors (and a
    # stable jit cache key); per-pulse TE (canonical MRF-FISP, Jiang
    # 2015: TR and TE both vary) maps onto the kernels' var_te path
    TE = float(te_arr[0]) if (te_arr == te_arr[0]).all() else te_arr
    TR = np.asarray(tr_taus) + te_arr

    # ADC phases: all absent -> plain readout; all equal to -phi_i
    # (mod 360) -> the kernel's receiver demodulation (e^{-i phi_p});
    # anything else is off-pattern
    if all(p is None for p in adc_phases):
        demod = False
    elif any(p is None for p in adc_phases):
        return None
    else:
        d = (np.asarray(adc_phases) + np.asarray(phis)) % 360.0
        if (np.minimum(d, 360.0 - d) > 1e-6).any():
            return None
        demod = True

    # factor the flip train into rank-1 outer(FA, B1)
    fab = _rank1_factor(alphas)
    if fab is None:
        return None
    FA, B1 = fab

    TI = None
    inv_df = False
    if prep is not None:
        # the kernel's prep is a 180*B1 pulse about phi=0: accept a
        # scalar exact-180 prep (phi-free -- sin(pi)=0 -- but only when
        # the train B1 is trivially 1), or a vector prep proportional
        # to the train's B1 direction with phi=0, renormalizing the
        # (FA, B1) factorization so B1 = prep_alpha/180 exactly.
        t0, e0, TI = prep
        t1v, t2v = _host_nd(e0.T1), _host_nd(e0.T2)
        if (t1v is None or t2v is None or not np.array_equal(T1, t1v)
                or not np.array_equal(T2, t2v)):
            return None
        g0 = _host_nd(e0.g)
        if not spoiled:
            # balanced prep must precess with the train's off-resonance
            if g0 is None or not np.array_equal(g0, DF):
                return None
        elif g0 is None:
            return None
        elif np.any(np.asarray(g0) != 0.0):
            # a precessing FISP prep is supported when (and only when)
            # it carries the train's off-resonance exactly: the kernel
            # then applies the TI phase to the prepped F+
            # (inversion_df=True; the pSSFP-with-inversion idiom)
            if DF is None or not np.array_equal(g0, DF):
                return None
            inv_df = True
        if _canonical_order1(e0, allowed) != tracked:
            # the kernel seeds prep tangents in closed form, i.e. the
            # prep relaxation IS differentiated: tracking must agree
            return None
        a0 = _host_nd(t0.alpha)
        ph0 = _scalar(t0.phi)
        if a0 is None or ph0 is None:
            return None
        if a0.size == 1 and float(a0.reshape(-1)[0]) == 180.0 \
                and np.all(B1 == 1.0):
            pass
        elif ph0 % 360.0 == 0.0:
            if not common.broadcastable(a0.shape, B1.shape):
                return None
            bs0 = common.broadcast_shapes(a0.shape, B1.shape)
            a0b, B1b = _append_rows((a0, B1), bs0)
            den = 180.0 * float(B1b.mean())
            if den == 0.0:
                return None
            c = float(a0b.mean()) / den
            if c <= 0 or np.abs(a0b - 180.0 * c * B1b).max() > 1e-6 * 180.0:
                return None
            B1 = (c * B1b).reshape(bs0)
            FA = FA / c
        else:
            return None

    # B1-tracked trains (r5): every pulse must carry a consistent
    # d(alpha)/dB1 coefficient (one shared ratio s = FA_kernel/c
    # against the FINAL post-prep-renormalization factorization).  The
    # kernel's fused dB1 column covers the train pulses AND the
    # inversion prep's 180*B1, so a prep'd train routes only when the
    # prep pulse is tracked too -- as a pseudo-stage with kernel
    # coefficient 180 (d(180*B1n)/dB1n).
    b1_scale = None
    prep_b1c = () if prep is None else _t_b1_order1(prep[0])
    if any(c != () for c in b1_coeffs) or prep_b1c != ():
        fa_ext, cf_ext = list(FA), list(b1_coeffs)
        if prep is not None:
            if prep_b1c == ():
                return None      # untracked prep: kernel dB1 mismatch
            fa_ext.append(180.0)
            cf_ext.append(prep_b1c)
        b1_scale = _b1_scale_from_coeffs(np.asarray(fa_ext), cf_ext)
        if b1_scale is None:
            return None

    diffusion = None
    if dw:
        if not isinstance(kvalue, (int, float)):
            return None
        f = _dw_bvalue(d_ops, kvalue, allow_diff=bool(d_var))
        if f is None:
            return None
        bbase, ramp, dcoef = f
        if d_var and getattr(dcoef, "ndim", 0) != 0:
            # tracked diffusivity: the kernel's dD column is the
            # SCALAR-diffusivity tangent; tensor-D tracking -> planner
            return None
        diffusion = {"bT": bbase, "bL": bbase, "Dcoef": dcoef,
                     "ramp": ramp}

    # n-D batch grids (the [T2] / outer-grid dictionary idiom) flatten
    # to the kernel's atom axis under the append-broadcast rule; the
    # runners restore the batch shape on the outputs (as in match_mse)
    if not common.broadcastable(T1.shape, T2.shape, B1.shape, DF.shape):
        return None
    bshape = common.broadcast_shapes(T1.shape, T2.shape, B1.shape, DF.shape)
    T1f, T2f, B1f, DFf = _append_rows((T1, T2, B1, DF), bshape)
    out_vars = tuple(tracked)
    if b1_scale is not None:
        out_vars = out_vars + ("B1",)
    if d_var:
        out_vars = out_vars + (d_var,)
    return {
        "FA": FA, "phi": np.asarray(phis), "TR": TR, "TE": TE,
        "T1": T1f, "T2": T2f,
        "B1": B1f, "TI": TI, "inv_df": inv_df,
        "vars": tuple(sorted(out_vars)),
        "b1_scale": b1_scale, "d_var": d_var or None,
        "demod": demod, "shape": bshape,
        "df": DFf if DFf.any() else None,
        "diffusion": diffusion,
    }


def _dw_bvalue(dops, kvalue, allow_diff=False):
    """Shared D-op validation + b-value base for the DW matchers
    (DW-FISP per-TR list / DW-TSE per-half list).

    One D op instance reused across the train (the same-op idiom
    match_xgre uses): its Dcoef stays on device — value checks would
    cost a d2h tunnel round-trip per leaf.  tau must be a host scalar;
    kshift (if set) must be the unit shift, verified with ONE 8-byte
    transfer memoized by the match cache.  Concrete device leaves are
    fine (one-time d2h / passed through); a Tracer would crash
    np.asarray and leak through the match cache — the planner handles
    traced leaves natively.

    Returns ``(b_base, ramp, Dcoef)`` — b-value base per squared state
    index, ``tau[s] * k[rad/mm]^2`` — or the zero stage when the list
    is all-None, or None to fall through.
    """
    d0 = dops[0]
    if any(d is not d0 for d in dops):
        return None
    if d0 is None:
        return 0.0, True, np.float32(0.0)
    if not isinstance(d0.tau, float):
        return None
    if (not allow_diff and not _no_diff(d0)) \
            or getattr(d0, "axes", None) is not None:
        return None
    if isinstance(d0.Dcoef, jax.core.Tracer) or isinstance(
            d0.kshift, jax.core.Tracer):
        return None
    ramp = d0.kshift is not None
    if ramp:
        ks = np.asarray(d0.kshift)
        if ks.shape != (1, 1) or float(ks[0, 0]) != 1.0:
            return None
    if getattr(d0.Dcoef, "ndim", 0) not in (0, 2):
        # batched tensors need per-atom broadcast plumbing: planner
        return None
    return d0.tau * 1e-3 * (float(kvalue) * 1e-3) ** 2, ramp, d0.Dcoef


def match_dwfisp(sequence, kvalue=1.0):
    """Match diffusion-weighted FISP trains
    ``[T, E, ADC, E, S(1), D] * N`` (optional ``[T, E(TI)]`` prep).

    The DW-FISP idiom: one isotropic-or-tensor ``D`` op right after
    each unit spoiler (``k=1`` gradient-ramp attenuation, or ``k=None``
    constant-k), the SAME op instance every TR (its device-resident
    Dcoef never transfers host-side).  ``kvalue`` (rad/m per state
    index) sets the physical b-values.  Returns the `match_fisp` param
    dict with a ``diffusion`` entry, or None.
    """
    if len(sequence) < 12 or len(sequence) % 6 not in (0, 2):
        return None
    key = ("dw", float(kvalue)) + tuple(id(op) for op in sequence)
    return _memoized(key, sequence,
                     lambda: _match_fisp_impl(sequence, dw=True, kvalue=kvalue))


@functools.partial(jax.jit, static_argnames=("nstate", "interpret",
                                             "use_inv", "demod", "use_df",
                                             "bshape", "ramp", "inv_df"))
def _run_dw_jit(FA, phi, TR, TE, T1, T2, B1, TI, DF, bT, bL, Dco, *,
                nstate, interpret, use_inv, demod=False, use_df=False,
                bshape=None, ramp=True, inv_df=False):
    from .models.pallas_fisp import fisp_dictionary_pallas

    # tensor D with 1-D wavenumbers reduces to b00 * sum(D) (reference
    # epgpy/diffusion.py broadcast semantics)
    # inv_df: True only when the matched prep E carries the train's
    # off-resonance (then the planner applies the TI phase and the
    # kernel must agree); a g=0 prep keeps the phase-free convention
    Dc = Dco if Dco.ndim == 0 else jnp.sum(Dco, axis=(-2, -1))
    Dc = jnp.broadcast_to(Dc, T1.shape)
    re, im = fisp_dictionary_pallas(FA, phi, TR, TE, T1, T2, B1,
                                    DF if use_df else None,
                                    nstate=nstate, interpret=interpret,
                                    demodulate=demod,
                                    inversion=TI if use_inv else None,
                                    inversion_df=inv_df,
                                    diffusion=(bT, bL, Dc), diff_ramp=ramp)
    P = re.shape[1]
    bshape = (re.shape[0],) if bshape is None else bshape
    return re.T.reshape((P,) + bshape), im.T.reshape((P,) + bshape)


@functools.partial(jax.jit, static_argnames=("nstate", "interpret",
                                             "use_inv", "specs", "demod",
                                             "use_df", "bshape", "ramp",
                                             "inv_df", "use_b1",
                                             "d_name"))
def _run_dw_jac_jit(FA, phi, TR, TE, T1, T2, B1, TI, DF, bT, bL, Dco,
                    B1S, *, nstate, interpret, use_inv, specs,
                    demod=False, use_df=False, bshape=None, ramp=True,
                    inv_df=False, use_b1=False, d_name=None):
    from .models.pallas_fisp import fisp_jacobian_pallas

    Dc = Dco if Dco.ndim == 0 else jnp.sum(Dco, axis=(-2, -1))
    Dc = jnp.broadcast_to(Dc, T1.shape)
    (re, im), (dre, dim) = fisp_jacobian_pallas(
        FA, phi, TR, TE, T1, T2, B1, DF if use_df else None,
        nstate=nstate, interpret=interpret, demodulate=demod,
        inversion=TI if use_inv else None, inversion_df=inv_df,
        diffusion=(bT, bL, Dc), diff_ramp=ramp,
        track_diffusivity=d_name is not None)
    bshape = (re.shape[0],) if bshape is None else bshape
    cols = None
    if use_b1 or d_name is not None:
        nv = dre.shape[-1]
        cols = {"T1": 0, "T2": 1}
        scale = [jnp.float32(1.0)] * nv
        if use_b1:
            # attenuation is B1-independent, so the dB1 column rides
            # through it; rescale to physical-B1 units (_run_jac_jit)
            scale[2] = 1.0 / B1S
            cols["B1"] = 2
        if d_name is not None:
            cols[d_name] = 3       # kernel column order (T1,T2,B1,D)
        dre = dre * jnp.stack(scale)
        dim = dim * jnp.stack(scale)
    return _assemble_jac_outputs(re, im, dre, dim, specs, bshape,
                                 cols=cols)


def run_dwfisp_jacobian(params, nstate, specs, *, interpret=False):
    """Fused DW-FISP primal+tangent kernel for matched diff probes
    (tracked T1/T2/B1/D; the diffusion attenuation is parameter-
    independent for T1/T2/B1, so those tangent groups ride through it;
    a canonically tracked D op adds the kernel's dD column — beyond
    reference, r5)."""
    dev = _device_params(params)
    diff = params["diffusion"]
    b1s = params.get("b1_scale")
    return _run_dw_jac_jit(*dev, np.float32(diff["bT"]),
                           np.float32(diff["bL"]),
                           jnp.asarray(diff["Dcoef"], jnp.float32),
                           np.float32(1.0 if b1s is None else b1s),
                           nstate=max(int(nstate), 1), interpret=interpret,
                           use_inv=params.get("TI") is not None,
                           specs=specs, demod=bool(params.get("demod")),
                           use_df=params.get("df") is not None,
                           bshape=tuple(params["shape"]),
                           ramp=diff["ramp"],
                           inv_df=bool(params.get("inv_df")),
                           use_b1=b1s is not None,
                           d_name=params.get("d_var"))


def run_dwfisp_kernel(params, nstate, *, interpret=False):
    """Run the fused DW-FISP kernel; engine-layout output."""
    dev = _device_params(params)
    diff = params["diffusion"]
    re, im = _run_dw_jit(*dev, np.float32(diff["bT"]),
                         np.float32(diff["bL"]),
                         jnp.asarray(diff["Dcoef"], jnp.float32),
                         nstate=max(int(nstate), 1), interpret=interpret,
                         use_inv=params.get("TI") is not None,
                         demod=bool(params.get("demod")),
                         use_df=params.get("df") is not None,
                         bshape=tuple(params["shape"]),
                         ramp=diff["ramp"],
                         inv_df=bool(params.get("inv_df")))
    return {"__c_re": re, "__c_im": im}


def match_bssfp(sequence):
    """Match balanced SSFP (TrueFISP) trains ``[T, E, ADC, E] * N``.

    The spoiler-free sibling of `match_fisp` (same checks minus the S
    op; the EPG ladder never leaves k=0): per-TR flip/phase/TR/TE
    variation, rank-1 ``outer(FA, B1)`` flip batches, per-atom
    off-resonance (``E.g`` — a mapped parameter in bSSFP MRF, Ma 2013),
    receiver demodulation ``Adc(phase=-phi_i)``, and an optional
    ``[T(180-family), E(TI)]`` inversion prep whose E may carry the
    train's off-resonance.  Returns the `match_fisp` param dict or
    None; memoized on operator identities.
    """
    if len(sequence) < 8 or len(sequence) % 4 not in (0, 2):
        return None
    key = ("bssfp",) + tuple(id(op) for op in sequence)
    return _memoized(key, sequence,
                     lambda: _match_fisp_impl(sequence, spoiled=False))


@functools.partial(jax.jit, static_argnames=("interpret", "use_inv",
                                             "demod", "use_df", "bshape"))
def _run_bssfp_jit(FA, phi, TR, TE, T1, T2, B1, TI, DF, *, interpret,
                   use_inv, demod=False, use_df=False, bshape=None):
    from .models.pallas_bssfp import bssfp_dictionary_pallas

    re, im = bssfp_dictionary_pallas(FA, phi, TR, TE, T1, T2, B1,
                                     DF if use_df else None,
                                     interpret=interpret, demodulate=demod,
                                     inversion=TI if use_inv else None)
    P = re.shape[1]
    bshape = (re.shape[0],) if bshape is None else bshape
    return re.T.reshape((P,) + bshape), im.T.reshape((P,) + bshape)


def run_bssfp_kernel(params, nstate=None, *, interpret=False):
    """Run the fused bSSFP kernel; engine-layout output (`nstate` is
    accepted for call-site uniformity and ignored: no ladder)."""
    dev = _device_params(params)
    re, im = _run_bssfp_jit(*dev, interpret=interpret,
                            use_inv=params.get("TI") is not None,
                            demod=bool(params.get("demod")),
                            use_df=params.get("df") is not None,
                            bshape=tuple(params["shape"]))
    return {"__c_re": re, "__c_im": im}


@functools.partial(jax.jit, static_argnames=("interpret", "use_inv",
                                             "specs", "demod", "use_df",
                                             "bshape", "track_df",
                                             "use_b1"))
def _run_bssfp_jac_jit(FA, phi, TR, TE, T1, T2, B1, TI, DF, B1S, *,
                       interpret, use_inv, specs, demod=False,
                       use_df=False, bshape=None, track_df=False,
                       use_b1=False):
    from .models.pallas_bssfp import bssfp_jacobian_pallas

    (re, im), (dre, dim) = bssfp_jacobian_pallas(
        FA, phi, TR, TE, T1, T2, B1, DF if use_df else None,
        interpret=interpret, demodulate=demod,
        inversion=TI if use_inv else None, track_df=track_df)
    bshape = (re.shape[0],) if bshape is None else bshape
    # cols is EXCLUSIVE when given (see _assemble_jac_outputs): name
    # every column
    cols = {"T1": 0, "T2": 1, "g": 3} if track_df else None
    if use_b1:
        # rescale the kernel's (normalized-B1) column to the user's
        # physical B1 units (matcher ratio s; see _run_jac_jit)
        nv = 4 if track_df else 3
        scale = jnp.stack([1.0 / B1S if j == 2 else jnp.float32(1.0)
                           for j in range(nv)])
        dre = dre * scale
        dim = dim * scale
        cols = dict(cols or {"T1": 0, "T2": 1})
        cols["B1"] = 2
    return _assemble_jac_outputs(re, im, dre, dim, specs, bshape,
                                 cols=cols)


def run_bssfp_jacobian(params, nstate, specs, *, interpret=False):
    """Fused bSSFP Jacobian runner (simulate_diff output format;
    `nstate` ignored — no ladder).  A tracked ``g`` variable turns on
    the kernel's ddf tangent group (bSSFP resolves off-resonance);
    B1-tracked flip trains (r5) expose the dB1 column in physical
    units."""
    dev = _device_params(params)
    b1s = params.get("b1_scale")
    return _run_bssfp_jac_jit(*dev,
                              np.float32(1.0 if b1s is None else b1s),
                              interpret=interpret,
                              use_inv=params.get("TI") is not None,
                              specs=specs, demod=bool(params.get("demod")),
                              use_df=params.get("df") is not None,
                              bshape=tuple(params["shape"]),
                              track_df="g" in (params.get("vars") or ()),
                              use_b1=b1s is not None)


def match_dess(sequence):
    """Match DESS trains ``[T, E, ADC, E, S(1), E, ADC] * N``.

    The double-echo steady-state family (reference
    examples/basics/dess.py): one FISP echo at TE after each pulse and
    one PSIF echo after the gradient.  Per-TR flip/phase/timing
    variation, rank-1 ``outer(FA, B1)`` flips, per-atom off-resonance
    and ``Adc(phase=-phi)`` demodulation (both echoes) are accepted.
    The PSIF echo depends only on the full TR = tau1+tau2+tau3, never
    on the mid/TE2 split.  Returns a param dict or None; memoized on
    operator identities.
    """
    if len(sequence) < 14 or len(sequence) % 7 != 0:
        return None
    key = ("dess",) + tuple(id(op) for op in sequence)
    return _memoized(key, sequence,
                     lambda: _match_dess_impl(sequence))


def _match_dess_impl(sequence):
    from .ops.transition import T
    from .ops.evolution import E
    from .ops.shift import S
    from .ops.probe import Adc

    N = len(sequence) // 7
    alphas, phis, te_taus, tr_taus, adc_phases = [], [], [], [], []
    b1_coeffs = []
    T1 = T2 = DF = None
    tracked = None
    for i in range(N):
        t_op, e1, a1, e2, s, e3, a2 = sequence[7 * i:7 * i + 7]
        if (type(t_op) is not T or type(e1) is not E or type(a1) is not Adc
                or type(e2) is not E or type(s) is not S
                or type(e3) is not E or type(a2) is not Adc):
            return None
        b1c = _t_b1_order1(t_op)        # B1-tracked flips route (r5)
        if b1c is None or not all(map(_no_diff, (a1, a2, s))):
            return None
        b1_coeffs.append(b1c)
        if getattr(s, "_kint", None) != 1:
            return None
        cs = [_canonical_order1(e) for e in (e1, e2, e3)]
        if cs[0] is None or cs[0] != cs[1] or cs[0] != cs[2]:
            return None
        if tracked is None:
            tracked = cs[0]
        elif tracked != cs[0]:
            return None
        if any(op.axes is not None for op in (t_op, e1, e2, e3)):
            return None
        ph = _scalar(t_op.phi)
        taus = [_scalar(e.tau) for e in (e1, e2, e3)]
        if ph is None or any(t is None for t in taus):
            return None
        # both ADCs: F0, no weights/reduce, phase absent or host scalar
        for adc in (a1, a2):
            ph_adc = None if adc.phase is None else _scalar(adc.phase)
            if (adc.attr != "F0" or (adc.phase is not None
                                     and ph_adc is None)
                    or adc.weights is not None
                    or adc.reduce not in (None, False)):
                return None
            adc_phases.append(ph_adc)
        g1, g2, g3 = (_host_nd(e.g) for e in (e1, e2, e3))
        if (g1 is None or g2 is None or g3 is None
                or not np.array_equal(g1, g2)
                or not np.array_equal(g1, g3)):
            return None
        if DF is None:
            DF = g1
        elif not np.array_equal(DF, g1):
            return None
        for e in (e1, e2, e3):
            t1v, t2v = _host_nd(e.T1), _host_nd(e.T2)
            if t1v is None or t2v is None:
                return None
            if T1 is None:
                T1, T2 = t1v, t2v
            elif not (np.array_equal(T1, t1v) and np.array_equal(T2, t2v)):
                return None
        a = _host_nd(t_op.alpha)
        if a is None:
            return None
        alphas.append(a)
        phis.append(ph)
        te_taus.append(taus[0])
        tr_taus.append(taus[0] + taus[1] + taus[2])

    te_arr = np.asarray(te_taus)
    TE = float(te_arr[0]) if (te_arr == te_arr[0]).all() else te_arr
    TR = np.asarray(tr_taus)

    # ADC phases: all absent -> plain; all equal to -phi_i -> receiver
    # demodulation on both echoes; anything else off-pattern
    if all(p is None for p in adc_phases):
        demod = False
    elif any(p is None for p in adc_phases):
        return None
    else:
        d = (np.asarray(adc_phases)
             + np.repeat(np.asarray(phis), 2)) % 360.0
        if (np.minimum(d, 360.0 - d) > 1e-6).any():
            return None
        demod = True

    fab = _rank1_factor(alphas)
    if fab is None:
        return None
    FA, B1 = fab

    b1_scale = None
    if any(c != () for c in b1_coeffs):
        b1_scale = _b1_scale_from_coeffs(FA, b1_coeffs)
        if b1_scale is None:
            return None

    if not common.broadcastable(T1.shape, T2.shape, B1.shape, DF.shape):
        return None
    bshape = common.broadcast_shapes(T1.shape, T2.shape, B1.shape, DF.shape)
    T1f, T2f, B1f, DFf = _append_rows((T1, T2, B1, DF), bshape)
    return {
        "FA": FA, "phi": np.asarray(phis), "TR": TR, "TE": TE,
        "T1": T1f, "T2": T2f, "B1": B1f, "TI": None,
        "vars": tracked if b1_scale is None
        else tuple(sorted(tracked + ("B1",))),
        "b1_scale": b1_scale,
        "demod": demod, "shape": bshape,
        "df": DFf if DFf.any() else None,
    }


@functools.partial(jax.jit, static_argnames=("nstate", "interpret",
                                             "demod", "use_df", "bshape"))
def _run_dess_jit(FA, phi, TR, TE, T1, T2, B1, TI, DF, *, nstate,
                  interpret, demod=False, use_df=False, bshape=None):
    from .models.pallas_dess import dess_dictionary_pallas

    (r1, i1), (r2, i2) = dess_dictionary_pallas(
        FA, phi, TR, TE, T1, T2, B1, DF if use_df else None,
        nstate=nstate, interpret=interpret, demodulate=demod)
    # interleave the two echo trains in sequence-ADC order:
    # (echo1_0, echo2_0, echo1_1, ...) -> (2P,) + batch
    P = r1.shape[1]
    bshape = (r1.shape[0],) if bshape is None else bshape
    re = jnp.stack((r1.T, r2.T), axis=1).reshape((2 * P,) + bshape)
    im = jnp.stack((i1.T, i2.T), axis=1).reshape((2 * P,) + bshape)
    return re, im


def run_dess_kernel(params, nstate, *, interpret=False):
    """Run the fused DESS kernel; engine-layout (2N, batch) output."""
    dev = _device_params(params)
    re, im = _run_dess_jit(*dev, nstate=max(int(nstate), 1),
                           interpret=interpret,
                           demod=bool(params.get("demod")),
                           use_df=params.get("df") is not None,
                           bshape=tuple(params["shape"]))
    return {"__c_re": re, "__c_im": im}


@functools.partial(jax.jit, static_argnames=("nstate", "interpret",
                                             "specs", "demod", "use_df",
                                             "bshape", "use_b1"))
def _run_dess_jac_jit(FA, phi, TR, TE, T1, T2, B1, TI, DF, B1S, *,
                      nstate, interpret, specs, demod=False,
                      use_df=False, bshape=None, use_b1=False):
    from .models.pallas_dess import dess_jacobian_pallas

    ((r1, i1), (r2, i2)), ((j1r, j1i), (j2r, j2i)) = dess_jacobian_pallas(
        FA, phi, TR, TE, T1, T2, B1, DF if use_df else None,
        nstate=nstate, interpret=interpret, demodulate=demod)
    P = r1.shape[1]
    bshape = (r1.shape[0],) if bshape is None else bshape

    def inter(e1, e2, k=0):
        """Interleave the two echo trains in sequence-ADC order:
        (B, P[, k]) pair -> (2P,) + bshape (+ (k,))."""
        x = jnp.stack((e1, e2), axis=2)                    # (B, P, 2[, k])
        x = x.reshape((e1.shape[0], 2 * P) + e1.shape[2:])
        x = jnp.moveaxis(x, 0, 1)                          # (2P, B[, k])
        return x.reshape((2 * P,) + bshape + ((k,) if k else ()))

    col = {"magnitude": (r1, i1, r2, i2),
           "T1": (j1r[..., 0], j1i[..., 0], j2r[..., 0], j2i[..., 0]),
           "T2": (j1r[..., 1], j1i[..., 1], j2r[..., 1], j2i[..., 1])}
    if use_b1:
        # physical-B1 rescale of the kernels' normalized-B1 column
        col["B1"] = tuple(x / B1S for x in
                          (j1r[..., 2], j1i[..., 2],
                           j2r[..., 2], j2i[..., 2]))
    outs = []
    for spec in specs:
        if spec[0] == "sig":
            outs.append({"__c_re": inter(r1, r2),
                         "__c_im": inter(i1, i2)})
        else:
            k = len(spec[1])
            rs1 = jnp.stack([col[n][0] for n in spec[1]], axis=-1)
            is1 = jnp.stack([col[n][1] for n in spec[1]], axis=-1)
            rs2 = jnp.stack([col[n][2] for n in spec[1]], axis=-1)
            is2 = jnp.stack([col[n][3] for n in spec[1]], axis=-1)
            outs.append({"__c_re": inter(rs1, rs2, k),
                         "__c_im": inter(is1, is2, k)})
    return tuple(outs)


def run_dess_jacobian(params, nstate, specs, *, interpret=False):
    """Fused DESS primal+tangent kernel for matched diff probes: both
    echoes' signal/Jacobian rows interleaved on the ADC axis.
    B1-tracked trains (r5) expose the dB1 columns of BOTH echoes."""
    dev = _device_params(params)
    b1s = params.get("b1_scale")
    return _run_dess_jac_jit(*dev,
                             np.float32(1.0 if b1s is None else b1s),
                             nstate=max(int(nstate), 1),
                             interpret=interpret, specs=specs,
                             demod=bool(params.get("demod")),
                             use_df=params.get("df") is not None,
                             bshape=tuple(params["shape"]),
                             use_b1=b1s is not None)


def match_megre(sequence):
    """Match multi-echo spoiled GRE trains
    ``[T, (E, Adc) * m, E?, S(1)] * N`` with m >= 2 echoes per TR.

    The T2*/B0-mapping acquisition: m echoes at increasing cumulative
    TEs before the spoiler (single-echo trains belong to match_fisp;
    the DESS pattern reads its second echo AFTER the shift and is
    disjoint).  Per-TR flip/phase/timing variation, rank-1
    ``outer(FA, B1)`` flips, per-atom off-resonance and
    ``Adc(phase=-phi)`` demodulation are accepted; the echo count and
    the presence of the trailing E must be uniform across TRs.
    Returns a param dict or None; memoized on operator identities.
    """
    if len(sequence) < 12:
        return None
    key = ("megre",) + tuple(id(op) for op in sequence)
    return _memoized(key, sequence,
                     lambda: _match_megre_impl(sequence))


def _match_megre_impl(sequence):
    from .ops.transition import T
    from .ops.evolution import E
    from .ops.shift import S
    from .ops.probe import Adc

    # echo count + block shape from the first TR
    if type(sequence[0]) is not T:
        return None
    m = 0
    i = 1
    while (i + 1 < len(sequence) and type(sequence[i]) is E
           and type(sequence[i + 1]) is Adc):
        m += 1
        i += 2
    if m < 2 or i >= len(sequence):
        return None
    has_rest = type(sequence[i]) is E
    L = 1 + 2 * m + (1 if has_rest else 0) + 1
    if len(sequence) % L != 0 or len(sequence) // L < 2:
        return None

    N = len(sequence) // L
    alphas, phis, adc_phases, te_rows, tr_taus = [], [], [], [], []
    b1_coeffs = []
    T1 = T2 = DF = None
    tracked = None
    for b in range(N):
        blk = sequence[L * b:L * (b + 1)]
        t_op, s_op = blk[0], blk[-1]
        e_ops = blk[1:1 + 2 * m:2] + (list(blk[-2:-1]) if has_rest else [])
        adcs = blk[2:2 + 2 * m:2]
        if (type(t_op) is not T or type(s_op) is not S
                or any(type(e) is not E for e in e_ops)
                or any(type(a) is not Adc for a in adcs)):
            return None
        b1c = _t_b1_order1(t_op)        # B1-tracked flips route (r5)
        if b1c is None or not all(map(_no_diff, [s_op] + adcs)):
            return None
        b1_coeffs.append(b1c)
        if getattr(s_op, "_kint", None) != 1:
            return None
        cs = [_canonical_order1(e, allowed=("T1", "T2", "g"))
              for e in e_ops]
        if cs[0] is None or any(c != cs[0] for c in cs):
            return None
        if tracked is None:
            tracked = cs[0]
        elif tracked != cs[0]:
            return None
        if any(op.axes is not None for op in [t_op] + e_ops):
            return None
        ph = _scalar(t_op.phi)
        taus = [_scalar(e.tau) for e in e_ops]
        if ph is None or any(t is None for t in taus):
            return None
        for adc in adcs:
            ph_adc = None if adc.phase is None else _scalar(adc.phase)
            if (adc.attr != "F0" or (adc.phase is not None
                                     and ph_adc is None)
                    or adc.weights is not None
                    or adc.reduce not in (None, False)):
                return None
            adc_phases.append(ph_adc)
        gs = [_host_nd(e.g) for e in e_ops]
        if any(g is None for g in gs) \
                or any(not np.array_equal(gs[0], g) for g in gs[1:]):
            return None
        if DF is None:
            DF = gs[0]
        elif not np.array_equal(DF, gs[0]):
            return None
        for e in e_ops:
            t1v, t2v = _host_nd(e.T1), _host_nd(e.T2)
            if t1v is None or t2v is None:
                return None
            if T1 is None:
                T1, T2 = t1v, t2v
            elif not (np.array_equal(T1, t1v) and np.array_equal(T2, t2v)):
                return None
        a = _host_nd(t_op.alpha)
        if a is None:
            return None
        alphas.append(a)
        phis.append(ph)
        te_rows.append(np.cumsum(taus[:m]))
        tr_taus.append(float(np.sum(taus)))

    TE = np.asarray(te_rows).T                       # (m, N)
    TR = np.asarray(tr_taus)

    if all(p is None for p in adc_phases):
        demod = False
    elif any(p is None for p in adc_phases):
        return None
    else:
        d = (np.asarray(adc_phases)
             + np.repeat(np.asarray(phis), m)) % 360.0
        if (np.minimum(d, 360.0 - d) > 1e-6).any():
            return None
        demod = True

    fab = _rank1_factor(alphas)
    if fab is None:
        return None
    FA, B1 = fab

    b1_scale = None
    if any(c != () for c in b1_coeffs):
        b1_scale = _b1_scale_from_coeffs(FA, b1_coeffs)
        if b1_scale is None:
            return None

    if not common.broadcastable(T1.shape, T2.shape, B1.shape, DF.shape):
        return None
    bshape = common.broadcast_shapes(T1.shape, T2.shape, B1.shape, DF.shape)
    T1f, T2f, B1f, DFf = _append_rows((T1, T2, B1, DF), bshape)
    return {
        "FA": FA, "phi": np.asarray(phis), "TR": TR, "TE": TE,
        "T1": T1f, "T2": T2f, "B1": B1f, "TI": None,
        "vars": tracked if b1_scale is None
        else tuple(sorted(tracked + ("B1",))),
        "b1_scale": b1_scale,
        "demod": demod, "shape": bshape, "nechoes": m,
        "df": DFf if DFf.any() else None,
    }


@functools.partial(jax.jit, static_argnames=("nstate", "interpret",
                                             "demod", "use_df", "bshape"))
def _run_megre_jit(FA, phi, TR, TE, T1, T2, B1, TI, DF, *, nstate,
                   interpret, demod=False, use_df=False, bshape=None):
    from .models.pallas_megre import megre_dictionary_pallas

    re, im = megre_dictionary_pallas(
        FA, phi, TR, TE, T1, T2, B1, DF if use_df else None,
        nstate=nstate, interpret=interpret, demodulate=demod)
    # (B, P, m) -> sequence-ADC order (echo-major within TR)
    B, P, m = re.shape
    bshape = (B,) if bshape is None else bshape
    re = jnp.moveaxis(re.reshape(B, P * m), 0, 1).reshape((P * m,) + bshape)
    im = jnp.moveaxis(im.reshape(B, P * m), 0, 1).reshape((P * m,) + bshape)
    return re, im


def run_megre_kernel(params, nstate, *, interpret=False):
    """Run the fused ME-GRE kernel; engine-layout (m*N, batch) output."""
    dev = _device_params(params)
    re, im = _run_megre_jit(*dev, nstate=max(int(nstate), 1),
                            interpret=interpret,
                            demod=bool(params.get("demod")),
                            use_df=params.get("df") is not None,
                            bshape=tuple(params["shape"]))
    return {"__c_re": re, "__c_im": im}


@functools.partial(jax.jit, static_argnames=("nstate", "interpret",
                                             "specs", "demod", "use_df",
                                             "bshape", "use_b1"))
def _run_megre_jac_jit(FA, phi, TR, TE, T1, T2, B1, TI, DF, B1S, *,
                       nstate, interpret, specs, demod=False,
                       use_df=False, bshape=None, use_b1=False):
    from .models.pallas_megre import megre_jacobian_pallas

    (re, im), (jre, jim) = megre_jacobian_pallas(
        FA, phi, TR, TE, T1, T2, B1, DF if use_df else None,
        nstate=nstate, interpret=interpret, demodulate=demod)
    if use_b1:
        # physical-B1 rescale of the kernel's normalized-B1 column
        scale = jnp.stack([1.0 / B1S if j == 2 else jnp.float32(1.0)
                           for j in range(jre.shape[-1])])
        jre = jre * scale
        jim = jim * scale
    B, P, m = re.shape
    bshape = (B,) if bshape is None else bshape

    def flat(x):
        """(B, P, m[, k]) -> (P*m,) + bshape (+ (k,)) in ADC order."""
        x = x.reshape((B, P * m) + x.shape[3:])
        x = jnp.moveaxis(x, 0, 1)
        return x.reshape((P * m,) + bshape + x.shape[2:])

    sre, sim_ = flat(re), flat(im)
    jre_f, jim_f = flat(jre), flat(jim)            # (Pm,)+bshape+(4,)
    cols = {"T1": 0, "T2": 1, "B1": 2, "g": 3}
    outs = []
    for spec in specs:
        if spec[0] == "sig":
            outs.append({"__c_re": sre, "__c_im": sim_})
        else:
            rs = jnp.stack(
                [sre if n == "magnitude" else jre_f[..., cols[n]]
                 for n in spec[1]], axis=-1)
            ims = jnp.stack(
                [sim_ if n == "magnitude" else jim_f[..., cols[n]]
                 for n in spec[1]], axis=-1)
            outs.append({"__c_re": rs, "__c_im": ims})
    return tuple(outs)


def run_megre_jacobian(params, nstate, specs, *, interpret=False):
    """Fused ME-GRE primal+tangent kernel for matched diff probes
    (tracked vars from {T1, T2, g, B1}; "g" is the df/B0 column, "B1"
    requires the matcher-validated B1-tracked train, r5)."""
    dev = _device_params(params)
    b1s = params.get("b1_scale")
    return _run_megre_jac_jit(*dev,
                              np.float32(1.0 if b1s is None else b1s),
                              nstate=max(int(nstate), 1),
                              interpret=interpret, specs=specs,
                              demod=bool(params.get("demod")),
                              use_df=params.get("df") is not None,
                              bshape=tuple(params["shape"]),
                              use_b1=b1s is not None)


def match_mse(sequence, kvalue=1.0):
    """Match CPMG / multi-spin-echo trains and extract kernel params.

    Pattern: ``[T(exc)] + [E, S(1), D?, T(ref_i), E, S(1), D?, ADC] * E``
    with the E and S ops in either order within each half (they commute
    exactly: the shift moves only F states, relaxation decay is
    k-independent and recovery always lands at k=0).  This is the
    reference's published benchmark family (reference
    docs/basics.md:250-267, sequence built in examples/basics/mse.py):
    echo spacings may vary per echo, refocusing angles may be a rank-1
    ``outer(FA, B1)`` batch (the ``T(180*att, 0)`` attenuation sweep).
    Scalar excitation only; g must be 0 on every E.  E ops may carry
    canonical ``order1=["T1","T2"]`` tracking (identical on every E):
    Jacobian probes then route to the fused primal+tangent kernel
    (``run_mse_jacobian``).

    The optional ``D`` ops make it a DW-TSE train (Weigel 2010
    diffusion-trap physics): one D op instance per half position,
    reused across echoes (the same-op idiom -- its Dcoef stays on
    device), placed after the half's shift (D with k=1 ramps, k=None
    constant-k); ``kvalue`` sets the physical b-values.  Returns a
    param dict or None; results memoized on operator identities
    alongside the FISP matches.
    """
    if len(sequence) < 13 or not isinstance(kvalue, (int, float)):
        return None
    key = ("mse", float(kvalue)) + tuple(id(op) for op in sequence)
    return _memoized(key, sequence,
                     lambda: _match_mse_impl(sequence, kvalue))


def _match_mse_impl(sequence, kvalue=1.0):
    from .ops.transition import T
    from .ops.evolution import E
    from .ops.shift import S
    from .ops.diffusion import D as Dop
    from .ops.probe import Adc

    exc = sequence[0]
    if type(exc) is not T or not _no_diff(exc) or exc.axes is not None:
        return None
    exc_a, exc_p = _scalar(exc.alpha), _scalar(exc.phi)
    if exc_a is None or exc_p is None:
        return None

    def half(ops_):
        """One echo half: exactly one E and one S(1) in either order,
        optionally one D placed after the S (E commutes with both, but
        a D before the shift would see pre-shift wavenumbers).

        The E op may carry canonical T1/T2 order1 tracking (consumed by
        the Jacobian dispatch, value-neutral for the primal) -- the spec
        must be IDENTICAL on every E, enforced in the loop below."""
        e = s = d = None
        for op in ops_:
            if type(op) is E and e is None:
                e = op
            elif type(op) is S and s is None:
                s = op
            elif type(op) is Dop and d is None and s is not None:
                d = op
            else:
                return None
        if e is None or s is None:
            return None
        if (_canonical_order1(e) is None or not _no_diff(s)
                or e.axes is not None):
            return None
        if getattr(s, "_kint", None) != 1:
            return None
        if _scalar(e.g) != 0.0:
            return None
        return e, d

    n = len(sequence)
    alphas, phis, tau1s, tau2s = [], [], [], []
    b1_coeffs = []
    d1_ops, d2_ops = [], []
    T1 = T2 = None
    tracked = None
    i = 1
    while i < n:
        # half1 up to the refocusing T, half2 up to the Adc
        j = i
        while j < n and type(sequence[j]) is not T:
            j += 1
        if j >= n or not 2 <= j - i <= 3:
            return None
        k = j + 1
        while k < n and type(sequence[k]) is not Adc:
            k += 1
        if k >= n or not 2 <= k - j - 1 <= 3:
            return None
        h1, h2 = half(sequence[i:j]), half(sequence[j + 1:k])
        t_op, adc = sequence[j], sequence[k]
        i = k + 1
        if h1 is None or h2 is None:
            return None
        e1, d1 = h1
        e2, d2 = h2
        d1_ops.append(d1)
        d2_ops.append(d2)
        c1, c2 = _canonical_order1(e1), _canonical_order1(e2)
        if c1 != c2:
            return None
        if tracked is None:
            tracked = c1
        elif tracked != c1:
            return None
        if (type(adc) is not Adc or adc.attr != "F0"
                or adc.phase is not None or adc.weights is not None
                or adc.reduce not in (None, False) or not _no_diff(adc)):
            return None
        # refocusing pulses may carry the B1-tracking chain-rule spec
        # (r5); the kernel's dB1 covers exactly the refocusing flips
        # (the scalar excitation is B1-exact, tangents start at zero)
        b1c = _t_b1_order1(t_op)
        if b1c is None or t_op.axes is not None:
            return None
        b1_coeffs.append(b1c)
        ph = _scalar(t_op.phi)
        t1v1, t2v1 = _scalar(e1.tau), _scalar(e2.tau)
        if ph is None or t1v1 is None or t2v1 is None:
            return None
        for e in (e1, e2):
            t1v, t2v = _host_nd(e.T1), _host_nd(e.T2)
            if t1v is None or t2v is None:
                return None
            if T1 is None:
                T1, T2 = t1v, t2v
            elif not (np.array_equal(T1, t1v) and np.array_equal(T2, t2v)):
                return None
        a = _host_nd(t_op.alpha)
        if a is None:
            return None
        alphas.append(a)
        phis.append(ph)
        tau1s.append(t1v1)
        tau2s.append(t2v1)

    if len(alphas) < 2:
        return None
    fab = _rank1_factor(alphas)
    if fab is None:
        return None
    FA, B1 = fab

    b1_scale = None
    if any(c != () for c in b1_coeffs):
        b1_scale = _b1_scale_from_coeffs(FA, b1_coeffs)
        if b1_scale is None:
            return None

    # DW-TSE: per-half D validation shared with match_dwfisp
    # (_dw_bvalue: same-op idiom, host-scalar tau, unit-ramp or
    # constant-k, scalar/tensor Dcoef)
    diffusion = None
    if any(d is not None for d in d1_ops) or any(d is not None
                                                 for d in d2_ops):
        f1, f2 = _dw_bvalue(d1_ops, kvalue), _dw_bvalue(d2_ops, kvalue)
        if f1 is None or f2 is None:
            return None
        diffusion = {"b1": f1[0], "ramp1": f1[1], "D1": f1[2],
                     "b2": f2[0], "ramp2": f2[1], "D2": f2[2]}

    # n-D batch grids (the reference's published config is a 2-D
    # T2 x attenuation sweep) flatten to the kernel's atom axis; the
    # runner restores the append-broadcast shape on the outputs
    if not common.broadcastable(T1.shape, T2.shape, B1.shape):
        return None
    bshape = common.broadcast_shapes(T1.shape, T2.shape, B1.shape)
    T1f, T2f, B1f = _append_rows((T1, T2, B1), bshape)
    return {
        "exc": (exc_a, exc_p), "FA": FA, "phi": np.asarray(phis),
        "tau1": np.asarray(tau1s), "tau2": np.asarray(tau2s),
        "T1": T1f, "T2": T2f, "B1": B1f, "shape": bshape,
        "vars": tracked if b1_scale is None
        else tuple(sorted(tracked + ("B1",))),
        "b1_scale": b1_scale,
        "diffusion": diffusion,
    }


def _mse_diff_planes(diffusion, T1):
    """Kernel-layout diffusion stages from the matched tuple: tensor D
    with 1-D wavenumbers reduces to b00 * sum(D) (reference
    epgpy/diffusion.py broadcast semantics); scalars broadcast to the
    atom axis."""
    bT1, bL1, bT2, bL2, D1, D2 = diffusion

    def dcoef(Dc):
        Dc = jnp.asarray(Dc, jnp.float32)
        Dc = Dc if Dc.ndim == 0 else jnp.sum(Dc, axis=(-2, -1))
        return jnp.broadcast_to(Dc, T1.shape)

    return bT1, bL1, bT2, bL2, dcoef(D1), dcoef(D2)


@functools.partial(jax.jit, static_argnames=("nstate", "bshape",
                                             "interpret", "ramps"))
def _run_mse_jit(exc_a, exc_p, FA, phi, tau1, tau2, T1, T2, B1, *,
                 nstate, bshape, interpret, diffusion=None,
                 ramps=(True, True)):
    from .models.pallas_mse import cpmg_dictionary_pallas

    diff = None if diffusion is None else _mse_diff_planes(diffusion, T1)
    re, im = cpmg_dictionary_pallas((exc_a, exc_p), FA, phi, tau1, tau2,
                                    T1, T2, B1, nstate=nstate,
                                    interpret=interpret, diffusion=diff,
                                    diff_ramp=ramps)
    E = re.shape[1]
    # ADC axis first; restore the append-broadcast batch shape
    return (re.T.reshape((E,) + bshape), im.T.reshape((E,) + bshape))


def _cached_device(params, build):
    """``jax.device_put(build())`` cached on the (match-cache-pinned)
    params dict: repeated simulate() calls on one train must not re-pay
    the h2d tunnel transfer (~25 MB/s, ~25 ms latency)."""
    dev = params.get("_dev")
    if dev is None:
        dev = jax.device_put(build())
        params["_dev"] = dev
    return dev


def _mse_device_params(params):
    f32 = np.float32
    return _cached_device(params, lambda: tuple(
        np.asarray(x, f32) for x in params["exc"]) + tuple(
        np.asarray(params[k], f32)
        for k in ("FA", "phi", "tau1", "tau2", "T1", "T2", "B1")))


def _mse_diffusion_args(params):
    """(diffusion tuple or None, static ramp flags) for the run jits."""
    diff = params.get("diffusion")
    if diff is None:
        return None, (True, True)
    dtup = (np.float32(diff["b1"]), np.float32(diff["b1"]),
            np.float32(diff["b2"]), np.float32(diff["b2"]),
            jnp.asarray(diff["D1"], jnp.float32),
            jnp.asarray(diff["D2"], jnp.float32))
    return dtup, (bool(diff["ramp1"]), bool(diff["ramp2"]))


def run_mse_kernel(params, nstate, *, interpret=False):
    """Run the fused CPMG kernel; return the echo train in engine layout
    (``{"__c_re": (E, *batch), "__c_im": (E, *batch)}`` device arrays)."""
    dev = _mse_device_params(params)
    diff, ramps = _mse_diffusion_args(params)
    re, im = _run_mse_jit(*dev, nstate=max(int(nstate), 1),
                          bshape=tuple(params["shape"]),
                          interpret=interpret, diffusion=diff, ramps=ramps)
    return {"__c_re": re, "__c_im": im}


@functools.partial(jax.jit, static_argnames=("nstate", "bshape", "specs",
                                             "interpret", "ramps",
                                             "use_b1"))
def _run_mse_jac_jit(exc_a, exc_p, FA, phi, tau1, tau2, T1, T2, B1, B1S,
                     *, nstate, bshape, specs, interpret, diffusion=None,
                     ramps=(True, True), use_b1=False):
    from .models.pallas_mse import cpmg_jacobian_pallas

    diff = None if diffusion is None else _mse_diff_planes(diffusion, T1)
    (re, im), (dre, dim) = cpmg_jacobian_pallas(
        (exc_a, exc_p), FA, phi, tau1, tau2, T1, T2, B1,
        nstate=nstate, interpret=interpret, diffusion=diff,
        diff_ramp=ramps)
    # re/im: (B, E); dre/dim: (B, E, 3) ordered (T1, T2, B1); outputs
    # carry the ADC axis first with the append-broadcast batch restored
    cols = None
    if use_b1:
        scale = jnp.stack([jnp.float32(1.0), jnp.float32(1.0),
                           1.0 / B1S])
        dre = dre * scale
        dim = dim * scale
        cols = {"T1": 0, "T2": 1, "B1": 2}
    return _assemble_jac_outputs(re, im, dre, dim, specs, bshape,
                                 cols=cols)


def run_mse_jacobian(params, nstate, specs, *, interpret=False):
    """Run the fused CPMG Jacobian kernel for matched diff probes.

    DW-TSE trains ride through: the attenuation is parameter-
    independent for (T1, T2, B1), so it multiplies primal and tangent
    planes identically.  B1-tracked refocusing trains (r5) expose the
    kernel's dB1 column rescaled to the user's physical B1 units.
    Returns the simulate_diff-format tuple over probes of
    ``{"__c_re", "__c_im"}`` device dicts (signal: (E, *batch);
    Jacobian: (E, *batch, nvars) in probe-variable order)."""
    dev = _mse_device_params(params)
    diff, ramps = _mse_diffusion_args(params)
    b1s = params.get("b1_scale")
    return _run_mse_jac_jit(*dev,
                            np.float32(1.0 if b1s is None else b1s),
                            nstate=max(int(nstate), 1),
                            bshape=tuple(params["shape"]), specs=specs,
                            interpret=interpret, diffusion=diff,
                            ramps=ramps, use_b1=b1s is not None)


def match_fisp_hessian(sequence):
    """Match the flagship per-pulse differentiation train.

    Two train shapes (the reference's largest published diff workload,
    examples/profiling/differentiation_mrf.py:18-67, and the CRLB
    sequence-design pattern, examples/sequence/optim_mrf.py):

      ``[T(a_i, order1={alias_i: "alpha"}), E(tau_i, T1, T2,
      order1={"T1", "T2", alias'_i: "tau"}), Adc, S(1)] * N``
      (echo read at tau_i), or the 5-op form with a constant-TE echo
      ``[T, E(TE, {"T1","T2"}), Adc, E(tau_i, ...), S(1)] * N``,
      optionally prefixed by a ``[T(180), E(TI, {"T1","T2"})]``
      inversion prep (perfect inversion: scalar exact-180 pulse).

    Every T must track a distinct alpha alias; every tracked E must
    carry T1 and T2 with unit coefficients and (all-or-none) a distinct
    tau alias on the tail E.  Scalar per-pulse alpha/phi/tau; T1/T2
    host scalars or 1-D atom vectors.  Returns a param dict (incl.
    ``amap``: variable name -> column token) or None; memoized on
    operator identities.
    """
    if len(sequence) < 8:
        return None
    key = ("hess",) + tuple(id(op) for op in sequence)

    def compute():
        n = len(sequence)
        for group in (4, 5):
            for prep in (0, 2):
                if n - prep >= 2 * group and (n - prep) % group == 0:
                    params = _match_fisp_hessian_impl(
                        sequence[prep:], group=group,
                        prep=sequence[:prep] if prep else None)
                    if params is not None:
                        return params
        return None

    return _memoized(key, sequence, compute)


def _alias_order1(op, param, extra=()):
    """Parse ``op.order1`` as {extra params tracked as themselves} +
    exactly one alias variable of `param` (or zero).  Returns
    (alias_name_or_None) or False when off-pattern.  All coefficients
    must be the host scalar 1.0."""
    o1 = getattr(op, "order1", None) or {}
    if getattr(op, "order2", None):
        return False
    alias = None
    seen = set()
    for var, cfs in o1.items():
        if len(cfs) != 1:
            return False
        (p, c), = cfs.items()
        if _is_device(c) or np.ndim(c) != 0:
            return False
        try:
            if float(c) != 1.0:
                return False
        except (TypeError, ValueError):
            return False
        if var in extra and p == var:
            seen.add(var)
        elif p == param and var not in extra and alias is None:
            alias = var
        else:
            return False
    if seen != set(extra):
        return False
    return (alias,)


def _match_fisp_hessian_impl(sequence, group=4, prep=None):
    from .ops.transition import T
    from .ops.evolution import E
    from .ops.shift import S
    from .ops.probe import Adc

    N = len(sequence) // group
    FA, PHI, TAU = [], [], []
    avars, tvars = [], []
    T1 = T2 = None
    TE = None

    def check_e(e_op, want_alias):
        """Shared E validation; returns (tau, alias) or None."""
        nonlocal T1, T2
        if type(e_op) is not E or e_op.axes is not None:
            return None
        tv = _alias_order1(e_op, "tau", extra=("T1", "T2"))
        if tv is False or (tv[0] is not None and not want_alias):
            return None
        tau = _scalar(e_op.tau)
        if tau is None or _scalar(e_op.g) != 0.0:
            return None
        t1v, t2v = _host_nd(e_op.T1), _host_nd(e_op.T2)
        if t1v is None or t2v is None or t1v.ndim > 1 or t2v.ndim > 1:
            return None
        if T1 is None:
            T1, T2 = t1v, t2v
        elif not (np.array_equal(T1, t1v) and np.array_equal(T2, t2v)):
            return None
        return tau, tv[0]

    for i in range(N):
        blk = sequence[group * i:group * i + group]
        if group == 4:
            t_op, e_op, adc, s = blk
            e_te = None
        else:
            t_op, e_te, adc, e_op, s = blk
        if (type(t_op) is not T or type(adc) is not Adc
                or type(s) is not S):
            return None
        if not _no_diff(adc) or not _no_diff(s):
            return None
        if getattr(s, "_kint", None) != 1:
            return None
        if (adc.attr != "F0" or adc.phase is not None
                or adc.weights is not None
                or adc.reduce not in (None, False)):
            return None
        if t_op.axes is not None:
            return None
        av = _alias_order1(t_op, "alpha")
        if av is False or av[0] is None:
            return None
        ev = check_e(e_op, want_alias=True)
        if ev is None:
            return None
        if e_te is not None:
            # 5-op form: constant echo time, T1/T2 tracking only
            et = check_e(e_te, want_alias=False)
            if et is None:
                return None
            if TE is None:
                TE = et[0]
            elif et[0] != TE:
                return None
        avars.append(av[0])
        tvars.append(ev[1])
        a = _scalar(t_op.alpha)
        ph = _scalar(t_op.phi)
        if a is None or ph is None:
            return None
        FA.append(a)
        PHI.append(ph)
        TAU.append(ev[0])

    TI = None
    if prep is not None:
        t0, e0 = prep
        if (type(t0) is not T or not _no_diff(t0) or t0.axes is not None
                or _scalar(t0.alpha) != 180.0 or _scalar(t0.phi) is None):
            return None
        ep = check_e(e0, want_alias=False)
        if ep is None:
            return None
        TI = ep[0]

    # distinct aliases; tau tracking all-or-none
    if len(set(avars)) != N or None in avars:
        return None
    have_tau = [v is not None for v in tvars]
    if any(have_tau) != all(have_tau):
        return None
    if all(have_tau) and len(set(tvars)) != N:
        return None
    reserved = {"magnitude", "T1", "T2"}
    if reserved & set(avars) or reserved & set(v for v in tvars if v):
        return None

    if not common.broadcastable(T1.shape, T2.shape):
        return None
    bshape = common.broadcast_shapes(T1.shape, T2.shape)
    B = int(np.prod(bshape))
    if B * N * N > (1 << 26):
        return None  # per-pulse Hessian outputs would not fit sanely
    amap = {v: ("a", i) for i, v in enumerate(avars)}
    if all(have_tau):
        amap.update({v: ("t", i) for i, v in enumerate(tvars)})
    T1f, T2f = _append_rows((T1, T2), bshape)
    return {"FA": np.asarray(FA), "phi": np.asarray(PHI),
            "TAU": np.asarray(TAU), "T1": T1f, "T2": T2f,
            "TE": TE, "TI": TI, "amap": amap, "shape": bshape}


def match_hessian_probes(probes, params):
    """Map a probe tuple onto fused per-pulse Hessian kernel outputs.

    Accepts plain Adc(F0), ``Jacobian`` over {magnitude, T1, T2} and/or
    the train's alias variables, and ``Hessian(vars1, vars2)`` with
    vars1 in {magnitude, T1, T2} and vars2 among the alias variables.
    Returns (specs, second_order) or None.  Column tokens index the
    concatenated [sig, dT1, dT2, dalpha(N), dtau(N)] bank.
    """
    from . import diff
    from .ops.probe import Adc

    amap = params["amap"]
    N = len(params["FA"])
    glob = {"magnitude": 0, "T1": 1, "T2": 2}

    def col(v):
        if v in glob:
            return glob[v]
        tok = amap.get(v)
        if tok is None:
            return None
        return 3 + tok[1] + (N if tok[0] == "t" else 0)

    specs = []
    second = False
    have_diff = False
    for pb in probes:
        if isinstance(pb, diff.Hessian):
            if getattr(pb, "probe_attr", None) != "F0":
                return None
            rows = tuple(pb.variables1)
            if any(v not in glob for v in rows):
                return None
            cols = tuple(col(v) for v in pb.variables2)
            if any(c is None or c < 3 for c in cols):
                return None
            specs.append(("hess", rows, cols))
            second = second or any(v != "magnitude" for v in rows)
            have_diff = True
        elif isinstance(pb, diff.Jacobian):
            if getattr(pb, "probe_attr", None) != "F0":
                return None
            cols = tuple(col(v) for v in pb.variables)
            if any(c is None for c in cols):
                return None
            specs.append(("jac", cols))
            have_diff = True
        elif (type(pb) is Adc and pb.attr == "F0" and pb.phase is None
                and pb.weights is None and pb.reduce in (None, False)):
            specs.append(("sig",))
        else:
            return None
    return (tuple(specs), second) if have_diff else None


@functools.partial(jax.jit, static_argnames=("nstate", "specs",
                                             "second_order", "bshape",
                                             "use_te", "use_inv",
                                             "interpret"))
def _run_hess_jit(FA, phi, TAU, T1, T2, TE, TI, *, nstate, specs,
                  second_order, bshape, use_te, use_inv, interpret):
    from .models.pallas_hessian import fisp_hessian_pallas

    out = fisp_hessian_pallas(FA, phi, TAU, T1, T2,
                              te=TE if use_te else None,
                              inversion=TI if use_inv else None,
                              nstate=nstate, second_order=second_order,
                              interpret=interpret)
    N = out["sig"][0].shape[1]

    def bank(parts):
        # (B, N_echo, ncols) column bank from (B, N) scalars and
        # (B, N, N) per-pulse blocks
        cs = [p[..., None] if p.ndim == 2 else p for p in parts]
        return jnp.concatenate(cs, axis=-1)

    def fmt(x):
        # ADC axis first, append-broadcast batch restored
        x = jnp.moveaxis(x, 0, 1)          # (N_echo, B, ...)
        return x.reshape((N,) + bshape + x.shape[2:])

    banks = {}

    def colbank(ri):
        # row banks: 0 = magnitude (first order), 1 = dT1 rows, 2 = dT2
        if ri not in banks:
            # entries 1-2 (the global-var columns of the T1/T2 rows)
            # are placeholders: Hessian specs only select cols >= 3
            if ri == 0:
                parts = (out["sig"], out["dT1"], out["dT2"],
                         out["dalpha"], out["dtau"])
            else:
                z = jnp.zeros_like(out["sig"][0])
                key = "dT1" if ri == 1 else "dT2"
                parts = (out[key], (z, z), (z, z),
                         out[key + "dalpha"], out[key + "dtau"])
            banks[ri] = (bank([p[0] for p in parts]),
                         bank([p[1] for p in parts]))
        return banks[ri]

    glob = {"magnitude": 0, "T1": 1, "T2": 2}
    outs = []
    for spec in specs:
        if spec[0] == "sig":
            outs.append({"__c_re": fmt(out["sig"][0]),
                         "__c_im": fmt(out["sig"][1])})
        elif spec[0] == "jac":
            br, bi = colbank(0)
            idx = jnp.asarray(spec[1], jnp.int32)
            outs.append({"__c_re": fmt(jnp.take(br, idx, axis=-1)),
                         "__c_im": fmt(jnp.take(bi, idx, axis=-1))})
        else:
            _, rows, cols = spec
            idx = jnp.asarray(cols, jnp.int32)
            rsel_r, rsel_i = [], []
            for v in rows:
                br, bi = colbank(glob[v])
                rsel_r.append(jnp.take(br, idx, axis=-1))
                rsel_i.append(jnp.take(bi, idx, axis=-1))
            outs.append(
                {"__c_re": fmt(jnp.stack(rsel_r, axis=-2)),
                 "__c_im": fmt(jnp.stack(rsel_i, axis=-2))})
    return tuple(outs)


def run_fisp_hessian(params, nstate, specs, second_order, *,
                     interpret=False):
    """Run the fused per-pulse Hessian kernel for matched diff probes.

    Returns the simulate_diff-format tuple over probes of
    ``{"__c_re", "__c_im"}`` device dicts: signal (N, *batch); Jacobian
    (N, *batch, nvars); Hessian (N, *batch, n1, n2)."""
    f32 = np.float32
    dev = _cached_device(params, lambda: tuple(
        np.asarray(params[k], f32)
        for k in ("FA", "phi", "TAU", "T1", "T2")) + (
        np.asarray(params.get("TE") or 0.0, f32),
        np.asarray(params.get("TI") or 0.0, f32)))
    return _run_hess_jit(*dev, nstate=max(int(nstate), 1), specs=specs,
                         second_order=second_order,
                         bshape=tuple(params["shape"]),
                         use_te=params.get("TE") is not None,
                         use_inv=params.get("TI") is not None,
                         interpret=interpret)


def _assemble_jac_outputs(re, im, dre, dim, specs, bshape, cols=None):
    """Per-probe output dicts from a fused Jacobian kernel's results.

    ``re/im``: (B, P) signal; ``dre/dim``: (B, P, >=2) tangent columns
    ordered (T1, T2, ...).  ``cols`` maps extra tracked names to column
    indices (e.g. ``{"g": 3}`` for bSSFP's ddf group).  Every fused
    Jacobian runner shares this layout; keeping the spec loop here
    means a column addition or an output-layout change lands in all
    families at once.
    """
    P = re.shape[1]
    col = {"magnitude": (re, im)}
    if cols is not None:
        # group-selectable callers name EVERY column explicitly --
        # the fixed T1/T2 defaults below would mislabel reordered
        # subsets (e.g. groups=("T2","df"))
        for name, j in cols.items():
            col[name] = (dre[..., j], dim[..., j])
    else:
        for j, name in enumerate(("T1", "T2")):
            if dre.shape[-1] > j:
                col[name] = (dre[..., j], dim[..., j])
    outs = []
    for spec in specs:
        if spec[0] == "sig":
            outs.append({"__c_re": re.T.reshape((P,) + bshape),
                         "__c_im": im.T.reshape((P,) + bshape)})
        else:
            k = len(spec[1])
            rs = jnp.stack([col[n][0] for n in spec[1]], axis=-1)
            ims = jnp.stack([col[n][1] for n in spec[1]], axis=-1)
            outs.append(
                {"__c_re": jnp.swapaxes(rs, 0, 1).reshape(
                     (P,) + bshape + (k,)),
                 "__c_im": jnp.swapaxes(ims, 0, 1).reshape(
                     (P,) + bshape + (k,))})
    return tuple(outs)


def match_jacobian_probes(probes, tracked):
    """Map a simulate() probe tuple onto fused-Jacobian kernel outputs.

    Accepts only plain Adc probes and ``Jacobian`` probes over
    ``{"magnitude"} | tracked`` (probe="F0").  Returns a tuple of
    per-probe specs -- ``("sig",)`` or ``("jac", names)`` -- or None.
    ``"magnitude"`` maps to the signal itself (dS/d|M0| = S: the probes'
    pseudo-variable, diff.py).  Hessians and eval-string probes fall
    through to the general jacfwd path.
    """
    from . import diff
    from .ops.probe import Adc

    tracked = set(tracked or ())
    specs = []
    have_jac = False
    for pb in probes:
        if isinstance(pb, diff.Hessian):
            return None
        if isinstance(pb, diff.Jacobian):
            if getattr(pb, "probe_attr", None) != "F0":
                return None
            names = tuple(pb.variables)
            if any(v != "magnitude" and v not in tracked for v in names):
                return None
            specs.append(("jac", names))
            have_jac = True
        elif (type(pb) is Adc and pb.attr == "F0" and pb.phase is None
                and pb.weights is None and pb.reduce in (None, False)):
            specs.append(("sig",))
        else:
            return None
    return tuple(specs) if have_jac else None


@functools.partial(jax.jit, static_argnames=("nstate", "interpret",
                                             "use_inv", "specs", "demod",
                                             "use_df", "bshape", "inv_df",
                                             "use_b1"))
def _run_jac_jit(FA, phi, TR, TE, T1, T2, B1, TI, DF, B1S, *, nstate,
                 interpret, use_inv, specs, demod=False, use_df=False,
                 bshape=None, inv_df=False, use_b1=False):
    from .models.pallas_fisp import fisp_jacobian_pallas

    (re, im), (dre, dim) = fisp_jacobian_pallas(
        FA, phi, TR, TE, T1, T2, B1, DF if use_df else None,
        nstate=nstate, interpret=interpret, demodulate=demod,
        inversion=TI if use_inv else None, inversion_df=inv_df)
    # re/im: (B, P); dre/dim: (B, P, 3) ordered (T1, T2, B1); outputs
    # carry the ADC axis first with the append-broadcast batch restored
    bshape = (re.shape[0],) if bshape is None else bshape
    cols = None
    if use_b1:
        # kernel dB1 is w.r.t. its internally factored (scale-absorbed)
        # B1; divide by the matcher's shared ratio s = FA_kernel / c to
        # express it in the user's physical B1 units
        scale = jnp.stack([jnp.float32(1.0), jnp.float32(1.0),
                           1.0 / B1S])
        dre = dre * scale
        dim = dim * scale
        cols = {"T1": 0, "T2": 1, "B1": 2}
    return _assemble_jac_outputs(re, im, dre, dim, specs, bshape,
                                 cols=cols)


def _device_params(params):
    f32 = np.float32

    def build():
        TI = params.get("TI")
        df = params.get("df")
        return tuple(
            np.asarray(params[k], f32)
            for k in ("FA", "phi", "TR", "TE", "T1", "T2", "B1")) + (
            np.asarray(0.0 if TI is None else TI, f32),
            np.zeros_like(params["T1"], f32) if df is None
            else np.asarray(df, f32))

    return _cached_device(params, build)


def run_fisp_jacobian(params, nstate, specs, *, interpret=False):
    """Run the fused Jacobian kernel for matched diff probes.

    Returns the simulate_diff-format tuple over probes of
    ``{"__c_re", "__c_im"}`` device dicts (signal: (N, B); Jacobian:
    (N, B, nvars) with columns in probe-variable order)."""
    dev = _device_params(params)
    b1s = params.get("b1_scale")
    return _run_jac_jit(*dev, np.float32(1.0 if b1s is None else b1s),
                        nstate=max(int(nstate), 1),
                        interpret=interpret,
                        use_inv=params.get("TI") is not None, specs=specs,
                        demod=bool(params.get("demod")),
                        use_df=params.get("df") is not None,
                        bshape=tuple(params["shape"]),
                        inv_df=bool(params.get("inv_df")),
                        use_b1=b1s is not None)


@functools.partial(jax.jit,
                   static_argnames=("nstate", "interpret", "use_inv",
                                    "demod", "use_df", "bshape", "inv_df"))
def _run_jit(FA, phi, TR, TE, T1, T2, B1, TI, DF, *, nstate, interpret,
             use_inv, demod=False, use_df=False, bshape=None,
             inv_df=False):
    from .models.pallas_fisp import fisp_dictionary_pallas

    re, im = fisp_dictionary_pallas(FA, phi, TR, TE, T1, T2, B1,
                                    DF if use_df else None,
                                    nstate=nstate, interpret=interpret,
                                    demodulate=demod,
                                    inversion=TI if use_inv else None,
                                    inversion_df=inv_df)
    # ADC axis first; restore the append-broadcast batch shape
    P = re.shape[1]
    bshape = (re.shape[0],) if bshape is None else bshape
    return re.T.reshape((P,) + bshape), im.T.reshape((P,) + bshape)


def run_fisp_kernel(params, nstate, *, interpret=False):
    """Run the fused kernel; return the echo train in engine layout.

    Output matches the general engine's single-ADC probe encoding:
    ``{"__c_re": (N, B), "__c_im": (N, B)}`` device arrays (complex
    never crosses the program boundary on the axon backend).  The
    device copies of the host param arrays are cached (_device_params),
    and one jitted entry point keeps the Pallas persistent-cache key
    stable and folds the crop/transpose into the program.
    """
    dev = _device_params(params)
    re, im = _run_jit(*dev, nstate=max(int(nstate), 1), interpret=interpret,
                      use_inv=params.get("TI") is not None,
                      demod=bool(params.get("demod")),
                      use_df=params.get("df") is not None,
                      bshape=tuple(params["shape"]),
                      inv_df=bool(params.get("inv_df")))
    return {"__c_re": re, "__c_im": im}


# ---------------------------------------------------------------------------
# EPG-X GRE dispatch: two-pool exchange / MT trains -> models/pallas_xgre
# ---------------------------------------------------------------------------

def match_xgre(sequence, shape, density=None):
    """Match EPG-X GRE trains and extract fused-kernel parameters.

    Pattern (per TR, consistent across the train):

        [ R(sat)? , T , X? , Adc , X? , S(1)? ]       (>= one X stage)

    The trailing S(1) must be present in EVERY block (spoiled GRE) or
    in NONE (the balanced family: bSSFP-MT / exchange-bSSFP, Gloor
    2008 — the ladder stays at k=0 and the kernel runs shiftless at
    nstate=0; alternating RF phase rides the per-TR phi train).

    -- the canonical EPG-X spoiled-GRE family (reference
    epgpy/exchange.py:89-120 applied per TR, MT saturation via a raw-rate
    ``R`` with no recovery; Malik 2018).  ``T`` carries per-compartment
    flip angles on the leading (axis-0) compartment batch -- scalars per
    (TR, compartment), or a rank-1 ``outer(alpha_ic, B1)`` per-atom
    batch (the MT-MRF / B1-dictionary idiom); the X stages must be the
    SAME op instance every TR (the one-op-reused idiom; the mixing
    matrices are computed once per atom).  X parameter arrays may
    live on device -- only khi/tau are read host-side (tiny, memoized);
    T1/T2/g pass through to the jitted runner untouched.

    `shape` is the engine's broadcast batch shape (compartments lead);
    `density` the simulate() option (equilibrium densities).  Returns a
    param dict or None; memoized on operator identities.
    """
    if len(sequence) < 8:
        return None
    if _is_device(density):
        return None
    try:
        dkey = None if density is None else tuple(
            np.ravel(np.asarray(density)).tolist())
    except (TypeError, ValueError):
        return None
    key = ("xgre", tuple(shape), dkey) + tuple(id(op) for op in sequence)
    return _memoized(key, sequence,
                     lambda: _match_xgre_impl(sequence, tuple(shape), density))


def _comp_vec(x, C):
    """Host per-compartment (C,) float vector from scalar/(C,)/(C,1...)
    input (append-rule: the compartment axis LEADS), else None."""
    v = _host_nd(x)
    if v is None:
        return None
    if any(d != 1 for d in v.shape[1:]):
        return None
    v = v.reshape(-1)
    if v.shape[0] == 1:
        return np.broadcast_to(v, (C,)).copy()
    if v.shape[0] == C:
        return v
    return None


def _comp_cvec(re_leaf, im_leaf, C):
    """Host complex (C,) vector from split re/im leaves (None = 0)."""
    if re_leaf is None:
        return np.zeros(C, complex)
    if _is_device(re_leaf) or _is_device(im_leaf):
        return None
    re = _comp_vec(np.asarray(re_leaf, float), C)
    im = _comp_vec(np.asarray(im_leaf, float), C) \
        if im_leaf is not None else np.zeros(C)
    if re is None or im is None:
        return None
    return re + 1j * im


def _xgre_stage_ok(x, C):
    """Validate one X stage op: axis-0 compartments, scalar tau, static
    (C, C) khi, parameter shapes (device allowed) compatible with a
    leading-C batch."""
    if getattr(x, "axis", None) != 0 or not _no_diff(x):
        return False
    # concrete device arrays are allowed (tiny one-time d2h, memoized by
    # the match cache) but TRACED leaves are not: np.asarray on a Tracer
    # raises, and caching one would leak it across traces -- fall
    # through to the planner, which handles traced leaves natively.
    # (khi is converted host-side in X.__init__, so it cannot be traced.)
    if any(isinstance(leaf, jax.core.Tracer)
           for leaf in (x.tau, x.T1, x.T2, x.g)
           if leaf is not None):
        return False
    if np.ndim(x.tau) != 0 and np.size(x.tau) != 1:
        return False
    if tuple(x.khi.shape) != (C, C):
        return False
    for leaf in (x.T1, x.T2, x.g):
        if leaf is None:
            continue
        s = tuple(np.shape(leaf))
        if s and s[0] not in (1, C):
            return False
    return True


def _match_xgre_impl(sequence, shape, density):
    from .ops.transition import T
    from .ops.evolution import R
    from .ops.exchange import X
    from .ops.shift import S
    from .ops.probe import Adc

    n = len(sequence)

    def parse_block(i):
        sat = x1 = x2 = None
        j = i
        if j < n and type(sequence[j]) is R:
            sat = sequence[j]
            j += 1
        if j >= n or type(sequence[j]) is not T:
            return None
        t = sequence[j]
        j += 1
        if j < n and type(sequence[j]) is X:
            x1 = sequence[j]
            j += 1
        if j >= n or type(sequence[j]) is not Adc:
            return None
        adc = sequence[j]
        j += 1
        if j < n and type(sequence[j]) is X:
            x2 = sequence[j]
            j += 1
        # trailing unit shift: present (spoiled GRE) or absent (balanced)
        s = None
        if j < n and type(sequence[j]) is S:
            s = sequence[j]
            j += 1
        return sat, t, x1, adc, x2, s, j

    blocks = []
    i = 0
    while i < n:
        blk = parse_block(i)
        if blk is None:
            return None
        blocks.append(blk[:-1])
        i = blk[-1]
    if len(blocks) < 2:
        return None

    # consistent block signature; shared X instances across TRs; the
    # unit shift is all-or-none (spoiled vs balanced family)
    sat0, _, x1_0, _, x2_0, s0 = blocks[0]
    xop = x1_0 if x1_0 is not None else x2_0
    if xop is None:
        return None
    for sat, _, x1, adc, x2, s in blocks:
        if ((sat is None) != (sat0 is None) or (x1 is not x1_0)
                or (x2 is not x2_0) or (s is None) != (s0 is None)):
            return None
        if (type(adc) is not Adc or adc.attr != "F0"
                or adc.phase is not None or adc.weights is not None
                or adc.reduce not in (None, False) or not _no_diff(adc)):
            return None
        if s is not None and (getattr(s, "_kint", None) != 1
                              or not _no_diff(s)):
            return None

    C = int(xop.khi.shape[-1])
    if len(shape) < 1 or shape[0] != C:
        return None
    for x in (x1_0, x2_0):
        if x is not None and not _xgre_stage_ok(x, C):
            return None

    # densities: real host vector; each stage's kinetic matrix must
    # conserve the density-weighted equilibrium (mirrors X.apply's
    # eager-mode check: accepting a non-conserving pair here would
    # silently skip the engine's RuntimeError)
    if density is None:
        dens = np.ones(C)
    else:
        d = np.asarray(density)
        if np.iscomplexobj(d):
            if not np.allclose(d.imag, 0):
                return None
            d = d.real
        dens = _comp_vec(d.astype(float), C)
        if dens is None:
            return None
    khis = {}
    for tag, x in (("A", x1_0), ("B", x2_0)):
        if x is None:
            khis[tag] = np.zeros((C, C))
            continue
        khis[tag] = np.asarray(x.khi, dtype=float)   # tiny one-time d2h
        if not np.allclose(khis[tag] @ dens, 0, atol=1e-8):
            return None

    ahs, phis, satf, satz = [], [], [], []
    for sat, t, _, _, _, _ in blocks:
        if type(t) is not T or not _no_diff(t) or t.axes is not None:
            return None
        p = _comp_vec(t.phi, C)
        ah = _host_nd(t.alpha)
        if ah is None or p is None:
            return None
        # normalize to (C, *rest): the compartment axis LEADS (append
        # rule); a scalar / size-1 leading axis broadcasts over pools
        if ah.ndim == 0 or ah.size == 1:
            ah = np.full((C,), float(ah.reshape(-1)[0]))
        if ah.shape[0] == 1:
            ah = np.broadcast_to(ah, (C,) + ah.shape[1:])
        if ah.shape[0] != C:
            return None
        ahs.append(ah)
        phis.append(p)
        if sat is None:
            satf.append(np.ones(C, complex))
            satz.append(np.ones(C, complex))
        else:
            if (not _no_diff(sat) or sat.axes is not None
                    or sat.r0_re is not None):
                return None
            rT = _comp_cvec(sat.rT_re, sat.rT_im, C)
            rL = _comp_cvec(sat.rL_re, sat.rL_im, C)
            if rT is None or rL is None:
                return None
            # evolution_operator diag: F+ states scale by conj(e^{-rT}),
            # Z by e^{-rL} (no recovery: r0 is None)
            satf.append(np.conj(np.exp(-rT)))
            satz.append(np.exp(-rL))

    # flip angles: scalar per (TR, compartment), or a rank-1
    # ``outer(alpha_ic, B1)`` per-atom batch (the MT-MRF / B1-dictionary
    # idiom -- same factorization as the FISP/CPMG matchers)
    if all(all(d == 1 for d in a.shape[1:]) for a in ahs):
        alphas = np.stack([a.reshape(C) for a in ahs])
        B1 = None
    else:
        rows = [np.atleast_1d(a[c]) for a in ahs for c in range(C)]
        fab = _rank1_factor(rows)
        if fab is None:
            return None
        coefs, B1 = fab
        alphas = coefs.reshape(len(ahs), C)
        # B1's grid must broadcast (append rule) into the sim's atom dims
        if not common.broadcastable(B1.shape, tuple(shape[1:])):
            return None

    satf = np.asarray(satf)
    satz = np.asarray(satz)
    return {
        "alpha": np.asarray(alphas), "phi": np.asarray(phis), "B1": B1,
        "satf_re": satf.real, "satf_im": satf.imag,
        "satz_re": satz.real, "satz_im": satz.imag,
        "dens": dens, "khiA": khis["A"], "khiB": khis["B"],
        "T1A": None if x1_0 is None else x1_0.T1,
        "T2A": None if x1_0 is None else x1_0.T2,
        "gA": None if x1_0 is None else x1_0.g,
        "tauA": 0.0 if x1_0 is None else x1_0.tau,
        "T1B": None if x2_0 is None else x2_0.T1,
        "T2B": None if x2_0 is None else x2_0.T2,
        "gB": None if x2_0 is None else x2_0.g,
        "tauB": 0.0 if x2_0 is None else x2_0.tau,
        "shape": tuple(shape), "C": C, "balanced": s0 is None,
    }


def _prep_comp_atoms(x, bshape, default):
    """(C, B) float32 device array from a per-compartment parameter:
    append-rule right-pad to the batch shape, broadcast, flatten atoms."""
    x = jnp.asarray(default if x is None else x, jnp.float32)
    if x.ndim == 0:
        x = x.reshape(1)
    x = x.reshape(x.shape + (1,) * (len(bshape) - x.ndim))
    return jnp.broadcast_to(x, bshape).reshape(bshape[0], -1)


@functools.partial(jax.jit, static_argnames=("nstate", "bshape",
                                             "interpret", "shift"))
def _run_xgre_jit(alpha, phi, sfr, sfi, szr, szi, dens, b1, stageA, stageB,
                  *, nstate, bshape, interpret, shift=True):
    from .models.pallas_xgre import xgre_dictionary_pallas

    # an absent stage (tau = 0, khi = 0) yields identity matrices
    # regardless of its (default) T1/T2/g
    def prep(stage):
        khi, T1, T2, g, tau = stage
        return (khi, _prep_comp_atoms(T1, bshape, np.inf),
                _prep_comp_atoms(T2, bshape, np.inf),
                _prep_comp_atoms(g, bshape, 0.0), tau)

    if b1 is not None:
        rest = bshape[1:]
        b1 = jnp.asarray(b1, jnp.float32)
        b1 = b1.reshape(b1.shape + (1,) * (len(rest) - b1.ndim))
        b1 = jnp.broadcast_to(b1, rest).reshape(-1)
    re, im = xgre_dictionary_pallas(
        alpha, phi, sfr, sfi, szr, szi, dens, prep(stageA), prep(stageB),
        b1, nstate=nstate, interpret=interpret, shift=shift)
    N = re.shape[0]
    return re.reshape((N,) + bshape), im.reshape((N,) + bshape)


def _xgre_device_params(params):
    """X-stage T1/T2/g may already be device arrays: pass through."""
    f32 = np.float32

    def build():
        host = tuple(np.asarray(params[k], f32) for k in
                     ("alpha", "phi", "satf_re", "satf_im",
                      "satz_re", "satz_im", "dens"))
        b1 = params.get("B1")
        host += (None if b1 is None else np.asarray(b1, f32),)
        stages = tuple(
            (np.asarray(params["khi" + s], f32), params["T1" + s],
             params["T2" + s], params["g" + s],
             np.asarray(params["tau" + s], f32).reshape(()))
            for s in ("A", "B"))
        return (host, stages)

    return _cached_device(params, build)


def run_xgre_kernel(params, nstate, *, interpret=False):
    """Run the fused EPG-X kernel; engine-layout output
    ``{"__c_re": (N, C, *rest), "__c_im": ...}`` device arrays."""
    host, stages = _xgre_device_params(params)
    balanced = bool(params.get("balanced", False))
    re, im = _run_xgre_jit(*host, *stages,
                           nstate=0 if balanced else max(int(nstate), 1),
                           bshape=tuple(params["shape"]),
                           interpret=interpret, shift=not balanced)
    return {"__c_re": re, "__c_im": im}


# ---------------------------------------------------------------------------
# Composite EPG-X dispatch: MT-/exchange-prepared stage trains
# ---------------------------------------------------------------------------

def match_xcomposite(sequence, shape, density=None):
    """Match composite EPG-X stage trains (r4, VERDICT #5):

        stage = [R(sat)?, T(alpha_c, phi_c)?, X(tau)*, Adc?, X(tau)*,
                 S(+-1)?]

    -- arbitrary prepared/segmented multi-compartment schedules the
    exact-pattern ``match_xgre`` rejects (MT-prepped GRE with
    saturation blocks + recovery delays, IR-MT, sat-recovery MT).
    Consecutive X ops accumulate their taus (one shared generator:
    every X must carry the SAME khi/T1/T2/g leaf objects, so
    X(t1) X(t2) = X(t1+t2) exactly); the distinct accumulated taus
    become a small stage-matrix table indexed per stage.  Flips must
    be host per-compartment scalars (leading C axis); saturation via
    raw-rate ``R`` with no recovery.  Returns a param dict or None.

    Reference anchor: /root/reference/epgpy/exchange.py:89-120,
    evolution.py R -- applied op-by-op; no fused path exists there.

    Per-stage B1 sensitivity (r5, closing ADVICE r4): scalar-flip
    stages (adiabatic 180s) bypass the per-atom B1 scale via b1u=0 --
    the composite-GRE convention -- so MT trains mixing an adiabatic
    inversion with B1-batched readouts stay on the fused kernel.
    """
    if len(sequence) < 6:
        return None
    if _is_device(density):
        return None
    try:
        dkey = None if density is None else tuple(
            np.ravel(np.asarray(density)).tolist())
    except (TypeError, ValueError):
        return None
    key = ("xcomp", tuple(shape), dkey) + tuple(id(op) for op in sequence)
    return _memoized(
        key, sequence,
        lambda: _match_xcomposite_impl(sequence, tuple(shape), density))


def _match_xcomposite_impl(sequence, shape, density):
    from .ops.transition import T
    from .ops.evolution import R
    from .ops.exchange import X
    from .ops.shift import S
    from .ops.probe import Adc, Probe
    from .ops import base as _base

    # one shared generator: every X op must be the same instance or
    # carry identity-same khi/T1/T2/g leaves
    xops = [op for op in sequence if type(op) is X]
    if not xops:
        return None
    x0 = xops[0]
    if not _xgre_stage_ok(x0, int(x0.khi.shape[-1])):
        return None
    if len({id(x) for x in xops}) > 64:
        # tau reads on device leaves are one-time d2h round-trips
        # (memoized); bound them -- reuse X instances (the same-op
        # idiom) for long trains
        return None
    # one shared generator: the X op stores fresh jnp leaves per
    # instance (ops/exchange.py), so group instances by leaf ids and
    # value-compare only the (few) distinct group representatives --
    # the (C, B) parameter transfers are one-time, memoized by the
    # match cache, and bounded by the group cap
    groups = {}
    for x in xops:
        if not _no_diff(x) or isinstance(x.tau, jax.core.Tracer):
            return None
        if np.ndim(x.tau) != 0 and np.size(x.tau) != 1:
            return None
        if any(isinstance(leaf, jax.core.Tracer)
               for leaf in (x.tau, x.T1, x.T2, x.g) if leaf is not None):
            return None
        groups.setdefault((id(x.khi), id(x.T1), id(x.T2), id(x.g)), x)
    if len(groups) > 8:
        return None
    for x in list(groups.values())[1:]:
        for a, b in ((x.khi, x0.khi), (x.T1, x0.T1),
                     (x.T2, x0.T2), (x.g, x0.g)):
            if (a is None) != (b is None):
                return None
            if a is not None and not np.array_equal(np.asarray(a),
                                                    np.asarray(b)):
                return None
    C = int(x0.khi.shape[-1])
    if len(shape) < 1 or shape[0] != C:
        return None

    stages = []
    cur = None

    def new_stage():
        return {"sat": None, "alpha": np.zeros(C), "phi": np.zeros(C),
                "ta": 0.0, "tb": 0.0, "adc": False, "aph": 0.0,
                "shift": 0}

    def close():
        nonlocal cur
        if cur is not None:
            stages.append(cur)
            cur = None

    # prefetch every distinct instance's tau with ONE batched d2h
    # (ADVICE r4: per-op np.asarray reads are ~25 ms tunnel round-trips
    # each -- a 64-instance train paid them serially before the
    # distinct-tau table cap below could reject it; one jax.device_get
    # of the whole leaf list costs a single round-trip)
    _distinct = {}
    for x in xops:
        _distinct.setdefault(id(x), x)
    _tau_vals = jax.device_get([x.tau for x in _distinct.values()])
    _tau_cache = {xid: float(np.asarray(t).reshape(()))
                  for xid, t in zip(_distinct, _tau_vals)}

    def _xtau(op):
        return _tau_cache[id(op)]

    have_pulse = False
    for op in sequence:
        if type(op) is R:
            close()
            cur = new_stage()
            cur["sat"] = op
            have_pulse = False
        elif type(op) is T:
            if not _no_diff(op) or getattr(op, "axes", None) is not None:
                return None
            # flips: host per-compartment scalars (C,) or a rank-1
            # ``outer(alpha_c, B1)`` per-atom batch (the B1-corrected
            # MT-MRF idiom; factored once below, like match_xgre) --
            # the compartment axis LEADS (append rule)
            a = _host_nd(op.alpha)
            p = _comp_vec(op.phi, C)
            if a is None or p is None:
                return None
            if a.ndim == 0 or a.size == 1:
                a = np.full((C,), float(a.reshape(-1)[0]))
            if a.shape[0] == 1:
                a = np.broadcast_to(a, (C,) + a.shape[1:])
            if a.shape[0] != C:
                return None
            if cur is None or have_pulse or cur["ta"] or cur["tb"] \
                    or cur["adc"] or cur["shift"]:
                close()
                cur = new_stage()
            cur["alpha"] = a
            cur["phi"] = p
            have_pulse = True
        elif type(op) is X:
            # accumulated tau (host scalar; tiny one-time d2h memoized)
            tau = _xtau(op)
            if tau < 0:
                return None
            if cur is None or cur["shift"]:
                close()
                cur = new_stage()
                have_pulse = False
            cur["tb" if cur["adc"] else "ta"] += tau
        elif type(op) is Adc:
            ph_adc = None if op.phase is None else _scalar(op.phase)
            if (op.attr != "F0" or (op.phase is not None
                                    and ph_adc is None)
                    or op.weights is not None
                    or op.reduce not in (None, False)
                    or not _no_diff(op)):
                return None
            if cur is None or cur["adc"] or cur["shift"]:
                close()
                cur = new_stage()
                have_pulse = False
            cur["adc"] = True
            cur["aph"] = (0.0 if ph_adc is None
                          else float(ph_adc) * np.pi / 180.0)
        elif type(op) is S:
            k = getattr(op, "_kint", None)
            if k is None or not _no_diff(op) or abs(k) > 8:
                return None
            sgn = 1 if k > 0 else -1
            if cur is None:
                cur = new_stage()
                have_pulse = False
            for _ in range(abs(k)):
                if cur["shift"]:
                    close()
                    cur = new_stage()
                    have_pulse = False
                cur["shift"] = sgn
        elif isinstance(op, Probe):
            return None
        elif isinstance(op, _base.EmptyOperator):
            continue
        else:
            return None
    close()

    N = len(stages)
    nadc = sum(1 for s in stages if s["adc"])
    if N < 2 or nadc < 1 or N > 8192:
        return None

    # densities + conservation (mirrors match_xgre)
    if density is None:
        dens = np.ones(C)
    else:
        d = np.asarray(density)
        if np.iscomplexobj(d):
            if not np.allclose(d.imag, 0):
                return None
            d = d.real
        dens = _comp_vec(d.astype(float), C)
        if dens is None:
            return None
    khi_h = np.asarray(x0.khi, dtype=float)       # tiny one-time d2h
    if not np.allclose(khi_h @ dens, 0, atol=1e-8):
        return None

    # saturation factors
    satf = np.ones((N, C), complex)
    satz = np.ones((N, C), complex)
    for i, s in enumerate(stages):
        sat = s["sat"]
        if sat is None:
            continue
        if (not _no_diff(sat) or sat.axes is not None
                or sat.r0_re is not None):
            return None
        rT = _comp_cvec(sat.rT_re, sat.rT_im, C)
        rL = _comp_cvec(sat.rL_re, sat.rL_im, C)
        if rT is None or rL is None:
            return None
        satf[i] = np.conj(np.exp(-rT))
        satz[i] = np.exp(-rL)

    # distinct-tau stage-matrix table; entry 0 is the identity
    taus = [0.0]
    mia = np.zeros(N, np.int64)
    mib = np.zeros(N, np.int64)

    def tau_idx(t):
        for j, tv in enumerate(taus):
            if t == tv:
                return j
        taus.append(t)
        return len(taus) - 1

    for i, s in enumerate(stages):
        mia[i] = tau_idx(float(s["ta"]))
        mib[i] = tau_idx(float(s["tb"]))
    if len(taus) > 16:
        return None      # unbounded tables: planner

    adci = np.full(N, -1, np.int64)
    aph = np.zeros(N)
    shift = np.zeros(N, np.int64)
    j = 0
    for i, s in enumerate(stages):
        if s["adc"]:
            adci[i] = j
            j += 1
            aph[i] = s["aph"]
        shift[i] = s["shift"]

    # rank-1 flip factorization over the VECTOR (stage, compartment)
    # rows only (r5, ADVICE r4 closed): scalar-flip stages -- adiabatic
    # preps/inversions -- bypass the per-atom B1 scale via a per-stage
    # b1u flag (the composite-GRE convention), so MT trains mixing an
    # adiabatic 180 with B1-batched readouts stay on the fused kernel
    ahs = [s["alpha"] for s in stages]
    b1u = np.ones(N)
    vec = [i for i, a in enumerate(ahs)
           if not all(d == 1 for d in a.shape[1:])]
    if not vec:
        alphas = np.stack([np.asarray(a).reshape(C) for a in ahs])
        B1 = None
    else:
        rows = [np.atleast_1d(ahs[i][c]) for i in vec for c in range(C)]
        fab = _rank1_factor(rows)
        if fab is None:
            return None
        coefs, B1 = fab
        alphas = np.zeros((N, C))
        vset = set(vec)
        k = 0
        for i in range(N):
            if i in vset:
                alphas[i] = coefs[k:k + C]
                k += C
            else:
                alphas[i] = np.asarray(ahs[i]).reshape(C)
                b1u[i] = 0.0
        if np.all(B1 == 1.0):
            b1u[:] = 1.0
        if not common.broadcastable(B1.shape, tuple(shape[1:])):
            return None

    return {
        "alpha": alphas, "B1": B1,
        "phi": np.stack([s["phi"] for s in stages]),
        "satf_re": satf.real, "satf_im": satf.imag,
        "satz_re": satz.real, "satz_im": satz.imag,
        "adci": adci, "shift": shift, "aph": aph, "b1u": b1u,
        "mia": mia, "mib": mib, "taus": np.asarray(taus),
        "dens": dens, "khi": khi_h,
        "T1": x0.T1, "T2": x0.T2, "g": x0.g,
        "nadc": int(nadc), "shape": tuple(shape), "C": C,
        "has_sat": bool(np.any(satf != 1.0) or np.any(satz != 1.0)),
    }


@functools.partial(jax.jit, static_argnames=(
    "nadc", "nstate", "bshape", "interpret", "has_up", "has_down",
    "has_adcph", "has_sat", "has_b1u"))
def _run_xcomp_jit(alpha, phi, sfr, sfi, szr, szi, adci, shift, aph,
                   b1u, mia, mib, dens, taus, khi, T1, T2, g, b1, *,
                   nadc, nstate, bshape, interpret, has_up, has_down,
                   has_adcph, has_sat, has_b1u=False):
    from .models.pallas_xcomposite import xcomposite_pallas

    if b1 is not None:
        rest = bshape[1:]
        b1 = jnp.asarray(b1, jnp.float32)
        b1 = b1.reshape(b1.shape + (1,) * (len(rest) - b1.ndim))
        b1 = jnp.broadcast_to(b1, rest).reshape(-1)
    re, im = xcomposite_pallas(
        alpha, phi, sfr, sfi, szr, szi, adci, shift, aph, mia, mib,
        dens, taus, khi,
        _prep_comp_atoms(T1, bshape, np.inf),
        _prep_comp_atoms(T2, bshape, np.inf),
        _prep_comp_atoms(g, bshape, 0.0), b1, b1u,
        nadc=nadc, nstate=nstate, interpret=interpret, has_up=has_up,
        has_down=has_down, has_adcph=has_adcph, has_sat=has_sat,
        has_b1u=has_b1u)
    return (re.reshape((nadc,) + bshape), im.reshape((nadc,) + bshape))


def _xcomp_device_params(params):
    f32 = np.float32

    def build():
        host = tuple(np.asarray(params[k], f32) for k in (
            "alpha", "phi", "satf_re", "satf_im", "satz_re", "satz_im"))
        host += (np.asarray(params["adci"], np.int32),
                 np.asarray(params["shift"], np.int32),
                 np.asarray(params["aph"], f32),
                 np.asarray(params.get("b1u", np.ones_like(
                     params["aph"])), f32),
                 np.asarray(params["mia"], np.int32),
                 np.asarray(params["mib"], np.int32),
                 np.asarray(params["dens"], f32),
                 np.asarray(params["taus"], f32),
                 np.asarray(params["khi"], f32),
                 params["T1"], params["T2"], params["g"],
                 None if params.get("B1") is None
                 else np.asarray(params["B1"], f32))
        return host

    return _cached_device(params, build)


def run_xcomposite_kernel(params, nstate, *, interpret=False):
    """Run the composite EPG-X kernel; engine-layout output
    ``{"__c_re": (nadc, C, *rest), "__c_im": ...}`` device arrays."""
    dev = _xcomp_device_params(params)
    shift = np.asarray(params["shift"])
    has_up = bool((shift == 1).any())
    has_down = bool((shift == -1).any())
    ns = int(nstate)
    if (has_up or has_down) and ns < 1:
        ns = 1
    b1u = np.asarray(params.get("b1u", np.ones(1)))
    re, im = _run_xcomp_jit(
        *dev, nadc=int(params["nadc"]), nstate=ns,
        bshape=tuple(params["shape"]), interpret=interpret,
        has_up=has_up, has_down=has_down,
        has_adcph=bool(np.asarray(params["aph"]).any()),
        has_sat=bool(params.get("has_sat")),
        has_b1u=not bool(b1u.all()))
    return {"__c_re": re, "__c_im": im}


# ---------------------------------------------------------------------------
# Composite-GRE dispatch: segmented/prepared stage trains -> pallas_composite
# ---------------------------------------------------------------------------

def match_composite(sequence, kvalue=1.0):
    """Match arbitrary gradient-echo *stage* trains for the composite
    kernel (models/pallas_composite).

    A stage is ``[T?, E*, Adc?, E*, S(+-k)?, D?]`` with every element
    optional: the matcher greedily folds the op list into stages
    (consecutive E taus accumulate; a shift, a second Adc, or a D
    closes the stage; ``S(+-k)`` expands into |k| unit-shift stages;
    Wait/Offset/NULL are state no-ops and are skipped).  This covers
    the segmented and prepared GRE families the specialized matchers
    reject -- MPRAGE/MP2RAGE (per-segment ``[T(180), E(TI)]``
    inversions + recovery delays), cardiac MRF T2prep composites
    (back-to-back pulses with no gradient), saturation-recovery GRE,
    and (r4) diffusion-weighted variants (DW-MPRAGE, crushed preps):
    a ``D`` op closes its stage with a per-stage attenuation
    (constant-k for ``k=None``, Stejskal-Tanner ramp when ``D(k=s)``
    matches the stage's shift direction ``s``) -- while the
    exact-pattern families (FISP/MSE/bSSFP/DESS/ME-GRE/EPG-X) keep
    priority in the engine's dispatch table.

    Requirements: host-known scalar taus/phases, one shared
    (T1, T2, g) across all E ops, Adc(F0) with optional host-scalar
    phase, a rank-1 ``outer(FA, B1)`` factorization of the
    *vector* flip stages (scalar-flip stages -- adiabatic preps --
    bypass B1, the MPRAGE inversion convention), and scalar-Dcoef D
    ops sharing one coefficient (same instance, or equal host
    scalars; tensors/batched D fall through).  Returns the kernel
    params dict or None.

    Reference anchor: epgpy composes these trains op-by-op
    (/root/reference/epgpy/transition.py, evolution.py, shift.py,
    diffusion.py:126-171); the reference has no fused path for them
    at all.
    """
    if len(sequence) < 8 or not isinstance(kvalue, (int, float)):
        return None
    key = ("comp", float(kvalue)) + tuple(id(op) for op in sequence)
    return _memoized(key, sequence,
                     lambda: _match_composite_impl(sequence, kvalue))


def _match_composite_impl(sequence, kvalue=1.0):
    from .ops.transition import T
    from .ops.evolution import E
    from .ops.shift import S
    from .ops.diffusion import D as Dop
    from .ops.probe import Adc, Probe
    from .ops import base as _base

    stages = []
    cur = None

    def new_stage(fa, ph, b1c=()):
        return {"fa": fa, "phi": ph, "ta": 0.0, "tb": 0.0,
                "adc": False, "aph": 0.0, "shift": 0, "d": None,
                "b1c": b1c}

    def neutral():
        return new_stage(np.zeros(1), 0.0)

    def close():
        nonlocal cur
        if cur is not None:
            stages.append(cur)
            cur = None

    T1 = T2 = DF = None
    tracked = None
    for op in sequence:
        if type(op) is T:
            # T ops may carry the B1-tracking chain-rule spec (r5);
            # validated against the per-stage b1u sensitivity below
            b1c = _t_b1_order1(op)
            if b1c is None or getattr(op, "axes", None) is not None:
                return None
            a = _host_nd(op.alpha)
            ph = _scalar(op.phi)
            if a is None or ph is None:
                return None
            close()
            cur = new_stage(a, ph, b1c)
        elif type(op) is E:
            # composite E ops may carry canonical (T1, T2, g) tracking:
            # the fused Jacobian kernel propagates a df tangent group
            # (exact at df=0), so off-resonance-resolved trains (IR with
            # precessing TI) are fittable through the fused path too
            c = _canonical_order1(op, ("T1", "T2", "g"))
            if c is None or getattr(op, "axes", None) is not None:
                return None
            if tracked is None:
                tracked = c
            elif tracked != c:
                return None
            tau = _scalar(op.tau)
            if tau is None or tau < 0:
                return None
            t1v, t2v = _host_nd(op.T1), _host_nd(op.T2)
            gv = _host_nd(op.g)
            if t1v is None or t2v is None or gv is None:
                return None
            if T1 is None:
                T1, T2, DF = t1v, t2v, gv
            elif not (np.array_equal(T1, t1v) and np.array_equal(T2, t2v)
                      and np.array_equal(DF, gv)):
                return None
            if cur is None or cur["shift"]:
                close()
                cur = neutral()
            cur["tb" if cur["adc"] else "ta"] += tau
        elif type(op) is Adc:
            ph_adc = None if op.phase is None else _scalar(op.phase)
            if (op.attr != "F0" or (op.phase is not None and ph_adc is None)
                    or op.weights is not None
                    or op.reduce not in (None, False)):
                return None
            if cur is None or cur["adc"] or cur["shift"]:
                close()
                cur = neutral()
            cur["adc"] = True
            cur["aph"] = 0.0 if ph_adc is None else float(ph_adc)
        elif type(op) is S:
            k = op._kint
            if k is None or not _no_diff(op) or abs(k) > 8:
                return None
            sgn = 1 if k > 0 else -1
            if cur is None:
                cur = neutral()
            for _ in range(abs(k)):
                if cur["shift"]:
                    close()
                    cur = neutral()
                cur["shift"] = sgn
        elif type(op) is Dop:
            # a D op closes its stage: attenuation applies after the
            # stage's shift (reference op order [... S, D]); detailed
            # validation happens once below over the collected list
            if cur is None:
                cur = neutral()
            cur["d"] = op
            close()
        elif isinstance(op, Probe):
            return None              # non-Adc probes: planner
        elif isinstance(op, _base.EmptyOperator):
            continue                 # Wait/Offset/NULL: no state effect
        else:
            return None
    close()

    N = len(stages)
    nadc = sum(1 for s in stages if s["adc"])
    if N < 3 or nadc < 1 or N > 8192 or T1 is None:
        return None

    # rank-1 flip factorization; scalar-flip stages (adiabatic preps)
    # bypass the per-atom B1 scale (b1u = 0)
    FA = np.zeros(N)
    b1u = np.ones(N)
    vec = [i for i, s in enumerate(stages) if s["fa"].size > 1]
    if vec:
        fab = _rank1_factor([stages[i]["fa"] for i in vec])
        if fab is None:
            return None
        FAv, B1 = fab
        for j, i in enumerate(vec):
            FA[i] = FAv[j]
        for i, s in enumerate(stages):
            if s["fa"].size == 1:
                FA[i] = float(s["fa"].reshape(-1)[0])
                b1u[i] = 0.0
        if np.all(B1 == 1.0):
            b1u[:] = 1.0
    else:
        B1 = np.ones(1)
        for i, s in enumerate(stages):
            FA[i] = float(s["fa"].reshape(-1)[0])

    # B1-tracked stages (r5): the kernel's dB1 group sums d(a)/dB1 =
    # FA_i over the B1-sensitive stages (b1u=1; b1u=0 adiabatic preps
    # contribute zero) -- the user's tracked set must match exactly
    b1_coeffs = [s["b1c"] for s in stages]
    b1_scale = None
    if any(c != () for c in b1_coeffs):
        sens = [(b1u[i] != 0.0) and abs(FA[i]) > 1e-12
                for i in range(N)]
        b1_scale = _b1_scale_from_coeffs(FA, b1_coeffs, sens)
        if b1_scale is None:
            return None

    adci = np.full(N, -1, np.int64)
    aph = np.zeros(N)
    shift = np.zeros(N, np.int64)
    j = 0
    for i, s in enumerate(stages):
        if s["adc"]:
            adci[i] = j
            j += 1
            aph[i] = s["aph"] * np.pi / 180.0
        shift[i] = s["shift"]

    # diffusion stages (r4): per-stage b-value base + ramp direction
    # (fisp_dispatch._dw_bvalue conventions); scalar Dcoef only, one
    # shared coefficient.  Dcoef leaves are device scalars (the D op
    # stores jnp) -- equality checks are d2h round-trips, so compare
    # only DISTINCT coefficient objects and cap their count.
    diffusion = None
    d_list = [(i, s["d"]) for i, s in enumerate(stages)
              if s["d"] is not None]
    if d_list:
        btd = np.zeros(N)
        rdir = np.zeros(N)
        dc0 = None
        seen_dc = {}
        for i, d in d_list:
            if not _no_diff(d) or getattr(d, "axes", None) is not None:
                return None
            if not isinstance(d.tau, float):
                return None
            if isinstance(d.Dcoef, jax.core.Tracer) or isinstance(
                    d.kshift, jax.core.Tracer):
                return None
            if getattr(d.Dcoef, "ndim", 0) != 0:
                return None      # tensor / batched Dcoef: planner
            if d.kshift is None:
                rd = 0.0
            else:
                ks = np.asarray(d.kshift)
                if ks.shape != (1, 1):
                    return None
                rd = float(ks[0, 0])
                if rd not in (-1.0, 1.0) \
                        or rd != float(stages[i]["shift"]):
                    return None
            if dc0 is None:
                dc0 = d.Dcoef
                seen_dc[id(dc0)] = True
            elif id(d.Dcoef) not in seen_dc:
                if len(seen_dc) >= 16:
                    # bound the one-time d2h comparisons (~25 ms each
                    # through the tunnel; memoized by the match cache)
                    return None
                if not np.array_equal(np.asarray(dc0),
                                      np.asarray(d.Dcoef)):
                    return None
                seen_dc[id(d.Dcoef)] = True
            btd[i] = d.tau * 1e-3 * (float(kvalue) * 1e-3) ** 2
            rdir[i] = rd
        diffusion = {"btd": btd, "rdir": rdir, "Dc": dc0}

    if not common.broadcastable(T1.shape, T2.shape, B1.shape, DF.shape):
        return None
    bshape = common.broadcast_shapes(T1.shape, T2.shape, B1.shape, DF.shape)
    T1f, T2f, B1f, DFf = _append_rows((T1, T2, B1, DF), bshape)
    return {
        "FA": FA, "phi": np.asarray([s["phi"] for s in stages]),
        "ta": np.asarray([s["ta"] for s in stages]),
        "tb": np.asarray([s["tb"] for s in stages]),
        "adci": adci, "shift": shift, "aph": aph, "b1u": b1u,
        "T1": T1f, "T2": T2f, "B1": B1f,
        "df": DFf if DFf.any() else None,
        "nadc": int(nadc), "shape": bshape,
        "vars": (tracked or ()) if b1_scale is None
        else tuple(sorted((tracked or ()) + ("B1",))),
        "b1_scale": b1_scale,
        "diffusion": diffusion,
    }


@functools.partial(jax.jit, static_argnames=(
    "nstate", "nadc", "interpret", "use_df", "bshape", "has_up",
    "has_down", "has_adcph", "has_b1u", "has_d"))
def _run_comp_jit(FA, phi, ta, tb, adci, shift, aph, b1u, btd, rdir,
                  T1, T2, B1, DF, DC, *, nstate, nadc, interpret,
                  use_df, bshape, has_up, has_down, has_adcph, has_b1u,
                  has_d):
    from .models.pallas_composite import composite_pallas

    re, im = composite_pallas(
        FA, phi, ta, tb, adci, shift, aph, b1u, T1, T2, B1,
        DF if use_df else None, nadc=nadc, nstate=nstate,
        diffusion=(btd, rdir, DC) if has_d else None,
        has_up=has_up, has_down=has_down, has_adcph=has_adcph,
        has_b1u=has_b1u, interpret=interpret)
    return (re.reshape((nadc,) + bshape), im.reshape((nadc,) + bshape))


def _comp_device_params(params):
    f32 = np.float32

    def build():
        diff = params.get("diffusion")
        if diff is None:
            btd = rdir = np.zeros_like(params["FA"], f32)
            dc = np.float32(0.0)
        else:
            btd = np.asarray(diff["btd"], f32)
            rdir = np.asarray(diff["rdir"], f32)
            dc = diff["Dc"]          # device scalar: keep on device
        return tuple(np.asarray(params[k], f32)
                     for k in ("FA", "phi", "ta", "tb")) + (
            np.asarray(params["adci"], np.int32),
            np.asarray(params["shift"], np.int32),
            np.asarray(params["aph"], f32),
            np.asarray(params["b1u"], f32),
            btd, rdir,
            np.asarray(params["T1"], f32), np.asarray(params["T2"], f32),
            np.asarray(params["B1"], f32),
            np.zeros_like(params["T1"], f32) if params.get("df") is None
            else np.asarray(params["df"], f32),
            dc)

    return _cached_device(params, build)


def run_composite_kernel(params, nstate, *, interpret=False):
    """Run the composite-GRE kernel; engine-layout output
    ``{"__c_re": (nadc, *batch), "__c_im": ...}`` device arrays."""
    dev = _comp_device_params(params)
    shift = np.asarray(params["shift"])
    has_up = bool((shift == 1).any())
    has_down = bool((shift == -1).any())
    ns = int(nstate)
    if (has_up or has_down) and ns < 1:
        ns = 1
    re, im = _run_comp_jit(
        *dev, nstate=ns, nadc=int(params["nadc"]), interpret=interpret,
        use_df=params.get("df") is not None,
        bshape=tuple(params["shape"]), has_up=has_up, has_down=has_down,
        has_adcph=bool(np.asarray(params["aph"]).any()),
        has_b1u=not bool(np.asarray(params["b1u"]).all()),
        has_d=params.get("diffusion") is not None)
    return {"__c_re": re, "__c_im": im}


def composite_jac_groups(specs):
    """Kernel tangent groups needed by the matched probe specs, in the
    kernel's canonical group order ("T1", "T2", "B1", "df").  Dispatch
    specs name the df column "g" (the E-op parameter); "B1" routes
    through probes when the matcher validated a B1-tracked train
    (r5)."""
    want = set()
    for spec in specs:
        if spec[0] == "jac":
            want.update(n for n in spec[1] if n != "magnitude")
    return tuple(g for g in ("T1", "T2", "B1", "df")
                 if (("g" if g == "df" else g) in want))


@functools.partial(jax.jit, static_argnames=(
    "nstate", "nadc", "interpret", "use_df", "bshape", "has_up",
    "has_down", "has_adcph", "has_b1u", "has_d", "specs", "groups"))
def _run_comp_jac_jit(FA, phi, ta, tb, adci, shift, aph, b1u, btd, rdir,
                      T1, T2, B1, DF, DC, B1S, *, nstate, nadc,
                      interpret, use_df, bshape, has_up, has_down,
                      has_adcph, has_b1u, has_d, specs, groups):
    from .models.pallas_composite import composite_jacobian_pallas

    (re, im), (jre, jim) = composite_jacobian_pallas(
        FA, phi, ta, tb, adci, shift, aph, b1u, T1, T2, B1,
        DF if use_df else None, nadc=nadc, nstate=nstate, groups=groups,
        diffusion=(btd, rdir, DC) if has_d else None,
        has_up=has_up, has_down=has_down, has_adcph=has_adcph,
        has_b1u=has_b1u, interpret=interpret)
    if "B1" in groups:
        # rescale the kernel's (normalized-B1) column to the user's
        # physical B1 units (matcher ratio s; see _run_jac_jit)
        scale = jnp.stack([1.0 / B1S if g == "B1" else jnp.float32(1.0)
                           for g in groups])
        jre = jre * scale
        jim = jim * scale
    # kernel layout is (nadc, B); the shared assembler expects (B, P).
    # The tangent columns follow `groups` order, so map every name
    # explicitly (the assembler's T1/T2 defaults assume fixed slots).
    cols = {("g" if g == "df" else g): j for j, g in enumerate(groups)}
    return _assemble_jac_outputs(
        re.T, im.T, jnp.swapaxes(jre, 0, 1), jnp.swapaxes(jim, 0, 1),
        specs, bshape, cols=cols)


def run_composite_jacobian(params, nstate, specs, *, interpret=False):
    """Fused composite-GRE primal+tangent kernel for matched diff
    probes (tracked vars from {T1, T2, g, B1}; "g" is the df/B0
    column, "B1" requires the matcher-validated B1-tracked train, r5).
    Only the requested tangent groups are propagated (the MPRAGE
    T1-fit spec pays 18 planes, not 30)."""
    dev = _comp_device_params(params)
    shift = np.asarray(params["shift"])
    has_up = bool((shift == 1).any())
    has_down = bool((shift == -1).any())
    ns = int(nstate)
    if (has_up or has_down) and ns < 1:
        ns = 1
    b1s = params.get("b1_scale")
    return _run_comp_jac_jit(
        *dev, np.float32(1.0 if b1s is None else b1s),
        nstate=ns, nadc=int(params["nadc"]), interpret=interpret,
        use_df=params.get("df") is not None,
        bshape=tuple(params["shape"]), has_up=has_up, has_down=has_down,
        has_adcph=bool(np.asarray(params["aph"]).any()),
        has_b1u=not bool(np.asarray(params["b1u"]).all()),
        has_d=params.get("diffusion") is not None, specs=specs,
        groups=composite_jac_groups(specs))
