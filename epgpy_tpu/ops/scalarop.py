"""Generic diagonal (per-component) operator kernel.

A ScalarOp multiplies each k-state's ``(F+, F-, Z)`` vector elementwise by a
coefficient triplet ``arr`` and adds a recovery term ``arr0 * equilibrium``
(reference epgpy/opscalar.py:213-232).  The coefficient triplet must satisfy
the ladder symmetry ``arr == arr[..., (1, 0, 2)].conj()`` so that the state
matrix's conjugate symmetry is preserved.

Real-boundary design: coefficients are stored as (re, im) real leaves and
the complex view is assembled at trace time (``coefficients()``); physics
subclasses (E/P/R) store only their physical parameters and *build* the
coefficients at trace time -- which also makes them transparently
differentiable with ``jax.jacfwd`` w.r.t. the parameter leaves.

On TPU this is a pure VPU elementwise op; XLA fuses chains of ScalarOps and
adjacent rotations into a single kernel, and constant-folds coefficient
construction when parameters are static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import common, config
from . import base

__all__ = ["ScalarOp", "PrecomputedDiagonal", "precompute_diagonal",
           "scalar_combine", "align_batch", "split_complex", "join_complex"]


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


def split_complex(value, none_ok=True):
    """Split a (possibly traced) complex array into real (re, im) leaves."""
    if value is None:
        if not none_ok:
            raise ValueError("Expected a value")
        return None, None
    if isinstance(value, jax.core.Tracer) or isinstance(value, jnp.ndarray):
        value = jnp.asarray(value)
        if jnp.iscomplexobj(value):
            return value.real, value.imag
        return value, jnp.zeros_like(value)
    arr = np.asarray(value)
    if np.iscomplexobj(arr):
        return (np.ascontiguousarray(arr.real), np.ascontiguousarray(arr.imag))
    return arr, np.zeros_like(arr)


def join_complex(re, im):
    """Assemble complex from (re, im); trace-time / CPU-eager only."""
    if re is None:
        return None
    re = jnp.asarray(re, config.real_dtype())
    if im is None:
        return jax.lax.complex(re, jnp.zeros_like(re))
    return jax.lax.complex(re, jnp.asarray(im, config.real_dtype()))


def _format_triplet_np(arr, check=True):
    """Host-side validation of a (..., 3) coefficient array."""
    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr[None]
    if arr.ndim < 2 or arr.shape[-1] != 3:
        raise ValueError(f"Expected (..., 3) coefficient array, got {arr.shape}")
    if check and not np.allclose(arr, np.conj(arr[..., (1, 0, 2)])):
        raise ValueError("Coefficients break ladder conjugate symmetry")
    return arr


def apply_coefficients(sm, arr, arr0):
    """states = arr * states [+ arr0 * equilibrium] with append-broadcast."""
    if sm.lanes:
        return _apply_coefficients_lanes(sm, arr, arr0)
    arr = align_batch(arr, sm.ndim, 1)[..., None, :]
    states = sm.states * arr
    if arr0 is not None:
        arr0 = align_batch(arr0, sm.ndim, 1)[..., None, :]
        states = states + arr0 * jnp.asarray(sm.equilibrium, dtype=states.dtype)
    return sm.update(states=states)


def apply_coefficient_elements(sm, elems, elems0):
    """Element-form diagonal application: elems = (aFp, aFm, aZ) separate
    batch-shaped arrays (never stacked into a (batch, 3) array, whose
    trailing 3 tile-pads to 128 lanes on TPU)."""
    if sm.lanes:
        # half-lanes: only the (Fp, Z) planes are stored; the implied F-
        # plane receives conj(elems[0]) automatically (ScalarOp enforces
        # arr[..., 1] == conj(arr[..., 0]) at construction)
        nb = sm.ndim
        fp = join_complex(sm.states_re[0], sm.states_im[0])
        z = join_complex(sm.states_re[1], sm.states_im[1])
        center_only = sm.options.get("_eq_center", False)
        out = [fp * _coeff_lanes(jnp.atleast_1d(elems[0]), nb),
               z * _coeff_lanes(jnp.atleast_1d(elems[2]), nb)]
        if elems0 is not None:
            out = list(jnp.broadcast_arrays(*out))
            for i, li in ((0, 0), (2, 1)):
                if elems0[i] is None:
                    continue
                rec = _coeff_lanes(jnp.atleast_1d(elems0[i]), nb)
                if center_only and i == 2:
                    # equilibrium is (0, 0, dens) at k=0 only (static
                    # sparsity hint): single-row add, not a ladder FMA
                    c = sm.equilibrium_re[1].shape[0] // 2
                    eq_c = join_complex(sm.equilibrium_re[1][c],
                                        sm.equilibrium_im[1][c])
                    out[1] = out[1].at[c].add(
                        jnp.broadcast_to(rec * eq_c, out[1].shape[1:]))
                elif center_only:
                    continue  # F rows of the equilibrium are all zero
                else:
                    eq_i = join_complex(sm.equilibrium_re[li],
                                        sm.equilibrium_im[li])
                    out[li] = out[li] + rec * eq_i
        return sm.update(states_lanes=tuple(jnp.broadcast_arrays(*out)))

    def al(e):
        return align_batch(jnp.atleast_1d(e), sm.ndim, 0)[..., None]

    s = sm.states
    comps = [s[..., i] * al(elems[i]) for i in range(3)]
    if elems0 is not None:
        eq = jnp.asarray(sm.equilibrium, dtype=s.dtype)
        for i in range(3):
            if elems0[i] is not None:
                comps[i] = comps[i] + al(elems0[i]) * eq[..., i]
    return sm.update(states=jnp.stack(jnp.broadcast_arrays(*comps), axis=-1))


def _coeff_lanes(c, batch_ndim):
    """Batch coefficient -> broadcastable against a (K, *batch) plane."""
    c = jnp.atleast_1d(c)
    return c.reshape(c.shape + (1,) * (batch_ndim - c.ndim))


def _apply_coefficients_lanes(sm, arr, arr0):
    # half-lanes: coefficients 0/2 act on the stored (Fp, Z) planes; the
    # implied F- plane gets conj(arr[..., 0]) by symmetry
    nb = sm.ndim
    fp = join_complex(sm.states_re[0], sm.states_im[0])
    z = join_complex(sm.states_re[1], sm.states_im[1])
    out = [fp * _coeff_lanes(arr[..., 0], nb),
           z * _coeff_lanes(arr[..., 2], nb)]
    if arr0 is not None:
        for i, li in ((0, 0), (2, 1)):
            eq_i = join_complex(sm.equilibrium_re[li], sm.equilibrium_im[li])
            out[li] = out[li] + _coeff_lanes(arr0[..., i], nb) * eq_i
    return sm.update(states_lanes=tuple(out))


@base.register_op
class PrecomputedDiagonal(base.Operator):
    """Diagonal op with trace-free element coefficients (engine-internal).

    The scan planner converts concrete E/P/R ops in a scanned block into
    this form, computing ``coefficient_elements()`` over the whole stacked
    repetition axis ONCE at plan-build time -- the compiled scan body then
    reads precomputed coefficients instead of re-evaluating exp() every
    step (the models/ kernels do the same hoisting by hand).

    F- coefficients are derived as conj(F+); identically-zero imaginary /
    recovery leaves are dropped (None) at build time.
    """

    PARAMS = ("aFp_re", "aFp_im", "aZ_re", "aZ_im", "rec_re", "rec_im")

    def __init__(self, aFp_re, aFp_im, aZ_re, aZ_im, rec_re, rec_im,
                 name=None, **kwargs):
        self.aFp_re = aFp_re
        self.aFp_im = aFp_im
        self.aZ_re = aZ_re
        self.aZ_im = aZ_im
        self.rec_re = rec_re
        self.rec_im = rec_im
        super().__init__(name=name or "PrecomputedDiagonal", **kwargs)

    @property
    def shape(self):
        return common.broadcast_shapes(
            common.get_shape(self.aFp_re), common.get_shape(self.aZ_re), (1,))

    def apply(self, sm):
        aFp = join_complex(self.aFp_re, self.aFp_im)
        aZ = join_complex(self.aZ_re, self.aZ_im)
        elems = (aFp, jnp.conj(aFp), aZ)
        if self.rec_re is None:
            elems0 = None
        else:
            elems0 = (None, None, join_complex(self.rec_re, self.rec_im))
        return apply_coefficient_elements(sm, elems, elems0)


def _ambient_trace() -> bool:
    """True when called inside an active JAX trace (jit/jvp/vmap body)."""
    try:
        from jax._src import core as _core
        return not isinstance(_core.trace_ctx.trace, _core.EvalTrace)
    except Exception:  # pragma: no cover - private-API fallback
        return False


def _split_elements_compiled(op_stacked, scan=True):
    """Element coefficients as REAL arrays + nonzero-imag flags.

    Complex values must never cross an XLA program boundary on TPU, so
    the (complex) element construction runs inside this jit; outputs are
    re/im splits plus reduced any-nonzero flags.
    """
    reps = (jnp.shape(jax.tree_util.tree_leaves(op_stacked)[0])[0]
            if scan else None)

    def prog(op):
        elems, elems0 = op.coefficient_elements()

        def split(x):
            if x is None:
                return None
            x = jnp.asarray(x)
            if scan and x.ndim == 0:
                # literal-constant element (e.g. P's unit Z coefficient):
                # give it the repetition axis so lax.scan can slice it
                x = jnp.broadcast_to(x, (reps,))
            im = x.imag if jnp.iscomplexobj(x) else jnp.zeros_like(jnp.real(x))
            return jnp.real(x), im, jnp.any(im != 0)

        return (split(elems[0]), split(elems[2]),
                split(None if elems0 is None else elems0[2]))

    return jax.jit(prog)(op_stacked)


def precompute_diagonal(op_stacked, scan=True):
    """Build a PrecomputedDiagonal from an E/P/R op (or None).

    With ``scan=True`` the op is a stacked scan slot (leading repetition
    axis on its leaves); with ``scan=False`` it is a single scan-constant
    op.  Only safe for concrete (untraced) parameter leaves: elements are
    evaluated (in a small jit) here, at plan-build time.
    """
    if any(isinstance(l, jax.core.Tracer)
           for l in jax.tree_util.tree_leaves(op_stacked)):
        return None
    if _ambient_trace():
        # plan built inside a trace (diff path): a nested jit would stage
        # into the outer trace and return tracers, not concrete values
        return None
    if getattr(op_stacked, "axes", None) is not None:
        return None
    # memory guard: ~6 element arrays of the op's full stacked batch; keep
    # the parameter form when that would claim more than ~1.5 GB of HBM
    nelem = max(int(np.prod(common.get_shape(l)))
                for l in jax.tree_util.tree_leaves(op_stacked))
    itemsize = np.dtype(config.real_dtype()).itemsize   # 8 under x64
    if 6 * itemsize * nelem > 1_500_000_000:
        return None
    fp, z, rec = _split_elements_compiled(op_stacked, scan=scan)

    def norm(part):
        if part is None:
            return None, None
        re, im, has_im = part
        return re, (im if bool(has_im) else None)

    aFp_re, aFp_im = norm(fp)
    aZ_re, aZ_im = norm(z)
    rec_re, rec_im = norm(rec)
    return PrecomputedDiagonal(aFp_re, aFp_im, aZ_re, aZ_im, rec_re, rec_im)


def pack_diff_arrays(darrs, d2arrs):
    """Split user derivative arrays into a real-leaf dict pytree.

    darrs: {param: darr | (darr, darr0)}; d2arrs: {(p1, p2): same}.
    (Reference epgpy/opscalar.py darrs/d2arrs custom-derivative API.)
    """
    def norm(entry):
        if isinstance(entry, (tuple, list)):
            d, d0 = entry
        else:
            d, d0 = entry, None
        dre, dim = split_complex(d)
        d0re, d0im = split_complex(d0)
        return (dre, dim, d0re, d0im)

    out = {}
    if darrs:
        out["d1"] = {p: norm(v) for p, v in darrs.items()}
    if d2arrs:
        out["d2"] = {tuple(sorted(p)): norm(v) for p, v in d2arrs.items()}
    return out or None


def apply_diff_arrays_to(new, lin, quad, fields=("arr", "arr0")):
    """Shift new.<arr fields> by user derivative arrays; returns handled set.

    arr(eps) = arr + sum_p delta_p darr_p
             + sum_{p1<=p2} lin_p1 lin_p2 d2arr (x 1/2 when p1 == p2)
    """
    da = new.diff_arrays or {}
    d1 = da.get("d1", {})
    d2 = da.get("d2", {})
    main, rec = fields
    arr = join_complex(getattr(new, main + "_re"), getattr(new, main + "_im"))
    rec_re = getattr(new, rec + "_re")
    arr0 = join_complex(rec_re, getattr(new, rec + "_im")) if rec_re is not None \
        else None
    add, add0 = 0.0, 0.0
    handled = set()
    for p, (dre, dim, d0re, d0im) in d1.items():
        if p not in lin and p not in quad:
            continue
        delta = lin.get(p, 0.0) + quad.get(p, 0.0)
        add = add + delta * join_complex(dre, dim)
        if d0re is not None:
            add0 = add0 + delta * join_complex(d0re, d0im)
        handled.add(p)
    for (p1, p2), (dre, dim, d0re, d0im) in d2.items():
        if p1 not in lin or p2 not in lin:
            continue
        dd = (0.5 if p1 == p2 else 1.0) * lin[p1] * lin[p2]
        add = add + dd * join_complex(dre, dim)
        if d0re is not None:
            add0 = add0 + dd * join_complex(d0re, d0im)
        # a param appearing ONLY in d2arrs is consumed here too --
        # without this, diff.substitute falls through to a direct
        # parameter substitution and raises on the op's own spec
        handled.update((p1, p2))
    if handled or d2:
        arr = arr + add
        object.__setattr__(new, main + "_re", arr.real)
        object.__setattr__(new, main + "_im", arr.imag)
        if arr0 is None and not isinstance(add0, float):
            arr0 = add0
        elif arr0 is not None:
            arr0 = arr0 + add0
        if arr0 is not None:
            object.__setattr__(new, rec + "_re", jnp.asarray(arr0).real)
            object.__setattr__(new, rec + "_im", jnp.asarray(arr0).imag)
    return handled


@base.register_op
class ScalarOp(base.DiffOperator, base.CombinableOperator):
    """Diagonal operator: ``states = arr * states [+ arr0 * equilibrium]``.

    `darrs`/`d2arrs` supply custom first/second derivative coefficient
    arrays keyed by parameter name (reference epgpy/opscalar.py API); with
    an `order1`/`order2` spec the diff layer shifts `arr` by them.
    """

    PARAMS = ("arr_re", "arr_im", "arr0_re", "arr0_im", "diff_arrays")
    diagonal = True

    def __init__(self, arr, arr0=None, *, darrs=None, d2arrs=None, axes=None,
                 name=None, duration=None, check=True, **kwargs):
        if isinstance(arr, (jax.core.Tracer, jnp.ndarray)):
            arr = jnp.asarray(arr)
            if arr.ndim == 1:
                arr = arr[None]
            arr0 = None if arr0 is None else jnp.asarray(arr0)
            # traced coefficients are unverified: disable the half-ladder
            # lanes fast path (which assumes arr[1] == conj(arr[0]))
            self.preserves_ladder_symmetry = False
        else:
            arr = _format_triplet_np(arr, check=check)
            if arr0 is not None:
                arr0 = _format_triplet_np(arr0, check=check)
                arr, arr0 = np.broadcast_arrays(arr, arr0)
            if not check:
                sym = np.allclose(arr, np.conj(arr[..., (1, 0, 2)]))
                if arr0 is not None:
                    # recovery term must satisfy the same conjugate
                    # permutation, else lanes would drop a distinct arr0[1]
                    sym = sym and np.allclose(
                        arr0, np.conj(arr0[..., (1, 0, 2)]))
                self.preserves_ladder_symmetry = bool(sym)
        self.arr_re, self.arr_im = split_complex(arr)
        self.arr0_re, self.arr0_im = split_complex(arr0)
        self.diff_arrays = pack_diff_arrays(darrs, d2arrs)
        if darrs or d2arrs:
            self.PARAMETERS_ORDER1 = frozenset(darrs or ()) | {
                p for pair in (d2arrs or ()) for p in pair}
        self.axes = axes
        super().__init__(name=name or "ScalarOp", duration=duration, **kwargs)

    def apply_diff_arrays(self, lin, quad):
        return apply_diff_arrays_to(self, lin, quad, ("arr", "arr0"))

    @property
    def shape(self):
        return common.shape_with_axes(tuple(self.arr_re.shape[:-1]), self.axes)

    def coefficients(self):
        """(arr, arr0) complex coefficient triplets, trace-time."""
        arr = join_complex(self.arr_re, self.arr_im)
        arr0 = join_complex(self.arr0_re, self.arr0_im)
        if self.axes is not None:
            arr = common.set_axes(1, arr, self.axes)
            arr0 = None if arr0 is None else common.set_axes(1, arr0, self.axes)
        return arr, arr0

    def coefficient_elements(self):
        """((aFp, aFm, aZ), (a0Fp, a0Fm, a0Z)|None): separate batch arrays.

        Physics subclasses build these from their parameters without ever
        stacking a (batch, 3) array; the generic op unstacks its storage.
        """
        arr, arr0 = self.coefficients()
        elems = (arr[..., 0], arr[..., 1], arr[..., 2])
        elems0 = None if arr0 is None else (
            arr0[..., 0], arr0[..., 1], arr0[..., 2])
        return elems, elems0

    def _pin_elements(self, elems, elems0):
        """Apply `axes=` pinning to element-form coefficients."""
        if self.axes is None:
            return elems, elems0
        pin = lambda e: None if e is None else common.set_axes(
            0, jnp.atleast_1d(e), self.axes)
        elems = tuple(pin(e) for e in elems)
        elems0 = None if elems0 is None else tuple(pin(e) for e in elems0)
        return elems, elems0

    def matrices(self):
        """Promote the diagonal to (mat, mat0) 3x3 matrices, trace-time."""
        arr, arr0 = self.coefficients()
        eye = jnp.eye(3, dtype=arr.dtype)
        return arr[..., None] * eye, None if arr0 is None else arr0[..., None] * eye

    def apply(self, sm):
        elems, elems0 = self.coefficient_elements()
        return apply_coefficient_elements(sm, elems, elems0)

    # -- combination (reference epgpy/opscalar.py:101-147) --

    def combinable(self, other):
        return isinstance(other, base.CombinableOperator)

    def combine(self, other, *, name=None, duration=None, **kwargs):
        from .combined import CombinedOp
        return CombinedOp.of(self, other, name=name, duration=duration)


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
