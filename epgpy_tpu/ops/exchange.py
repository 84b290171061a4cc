"""Compartment exchange / magnetization transfer (EPG-X).

Physics (parity target: reference epgpy/exchange.py; Van Landeghem 2010):
N exchanging compartments live on a chosen batch axis of the state matrix.
The coupled relaxation-exchange evolution over `tau` is the matrix
exponential of the kinetic matrix:

    xT = -khi + (-1/T2 + 2 i pi g) I      (transverse)
    xL = -khi + (-1/T1) I                 (longitudinal)
    m* = expm(x* tau)

applied across the compartment axis to ``states - equilibrium`` (the
equilibrium is re-added afterwards, so T1 recovery and exchange of the
equilibrium magnetization are handled jointly).

``expm`` uses jax.scipy's Pade scaling-and-squaring (batched, TPU-safe)
instead of the reference's eigendecomposition (epgpy/exchange.py:262-282):
nonsymmetric eig is CPU-only in XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import common, config
from . import base

__all__ = ["X", "exchange_matrix", "exchange_operator",
           "PrecomputedExchange", "precompute_exchange"]


def exchange_matrix(k, *, axis=-1, ncomp=2, densities=None):
    """Kinetic matrix from scalar rate(s): columns sum to zero.

    k: exchange rate(s) (1/ms); returns (..., ncomp, ..., ncomp) with the
    first new axis inserted at `axis` (host-side numpy, static).
    """
    k = np.asarray(k, dtype=float)
    if np.any(k < 0):
        raise ValueError("Cannot have negative exchange rate")
    if axis > k.ndim:
        k = k.reshape(k.shape + (1,) * (axis - k.ndim))
    axis = (k.ndim + axis + 1) if axis < 0 else axis
    kron = np.eye(ncomp) + (np.eye(ncomp) - 1) / (ncomp - 1)
    if densities is not None:
        kron = kron / np.asarray(densities)
    return np.moveaxis(k[..., None, None] * kron, -2, axis)


def exchange_operator(tau, khi, *, axis=0, T1=None, T2=None, g=None):
    """(mT, mL) exchange-evolution matrices, trace-time (complex inside).

    khi: (..., ncomp[axis], ..., ncomp) kinetic matrix; tau ms; T1/T2 ms;
    g kHz (arrays broadcast over the remaining axes, compartment values on
    `axis`).
    """
    cdt = config.complex_dtype()
    rdt = config.real_dtype()
    khi = jnp.asarray(khi, rdt)
    tau = jnp.asarray(tau, rdt)
    T1 = jnp.asarray(np.inf if T1 is None else T1, rdt)
    T2 = jnp.asarray(np.inf if T2 is None else T2, rdt)
    g = jnp.asarray(0.0 if g is None else g, rdt)

    ncomp = khi.shape[-1]
    eye = jnp.eye(ncomp, dtype=rdt)

    # broadcast shapes (append rule), compartment axis -> last
    minshape = khi.shape[:-1]
    shape = _broadcast_rev(tau.shape, T1.shape, T2.shape, g.shape, minshape)
    ndim = len(shape)
    tau, T1, T2, g = (_expand_to(a, ndim) for a in (tau, T1, T2, g))
    T1, T2, g = (jnp.broadcast_to(a, shape) for a in (T1, T2, g))
    # khi's compartment ROW axis sits at `axis` within its leading block
    # (columns appended last): move rows next to the columns so the
    # matrix block is (..., C, C), then right-pad batch dims to the
    # common layout (append rule -- NOT numpy's left-prepend, which
    # misaligns any khi batch axes after the compartment axis)
    rows = axis if axis >= 0 else khi.ndim - 1 + axis
    khi = jnp.moveaxis(khi, rows, -2)
    pad = (ndim - 1) - (khi.ndim - 2)
    if pad > 0:
        khi = khi.reshape(khi.shape[:-2] + (1,) * pad + khi.shape[-2:])
    tau, T1, T2, g = (jnp.moveaxis(a, axis, -1) for a in (tau, T1, T2, g))

    xT = -khi.astype(cdt) + ((-1.0 / T2 + 2j * jnp.pi * g).astype(cdt))[..., None] * eye
    xL = -khi.astype(cdt) + ((-1.0 / T1).astype(cdt))[..., None] * eye

    mT = _expm(xT * tau[..., None].astype(cdt))
    mL = _expm(xL * tau[..., None].astype(cdt))

    mT = jnp.moveaxis(mT, (-2, -1), (axis, axis + 1))
    mL = jnp.moveaxis(mL, (-2, -1), (axis, axis + 1))
    return jnp.stack([mT, jnp.conj(mT), mL], axis=-1)


def _expm2(m):
    """Closed-form 2x2 matrix exponential (spectral formula).

    expm(A) = e^mu [cosh(D) I + sinh(D)/D (A - mu I)] with mu = tr/2 and
    D^2 = (a-d)^2/4 + bc.  The exponents mu +- D are combined BEFORE
    exponentiation, so huge negative rates (T1 -> 0 limiting cases,
    near-infinite exchange) underflow cleanly to 0 instead of producing
    inf/inf = NaN as Pade scaling-and-squaring does.
    """
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    mu = (a + d) / 2
    delta = jnp.sqrt(((a - d) / 2) ** 2 + b * c)
    l1, l2 = mu + delta, mu - delta
    # the smaller-magnitude eigenvalue suffers catastrophic cancellation
    # when |mu| ~ |delta| (one fast, one slow rate): recover it from the
    # determinant product l1 * l2 = det(A)
    det = a * d - b * c
    big = jnp.where(jnp.abs(l1) >= jnp.abs(l2), l1, l2)
    big_safe = jnp.where(big == 0, 1.0, big)
    la = big
    lb = jnp.where(big == 0, l2, det / big_safe)
    diff = la - lb
    # the spectral quotient divides by (la - lb), amplifying eps-level
    # cancellation near degeneracy (measured 14% relative error in
    # complex64 at |diff| ~ 2e-5 with the old 1e-12 threshold, which
    # was f64-calibrated).  Switch WELL before that to the series form
    # of cosh(D), sinh(D)/D -- division-free, D^2 computed directly
    # from the entries; truncation error ~ |D|^8/8! ~ 1e-16 at the
    # 0.04 threshold, below both f32 and f64 roundoff
    # absolute cap: the series accuracy depends only on |D| = |diff|/2
    # (error ~ |D|^8/8!), so a purely relative threshold would route
    # large-common-magnitude eigenvalue pairs (e.g. both pools at kHz
    # off-resonance) with |diff| >> 1 into a divergent series
    degen = jnp.abs(diff) <= jnp.minimum(
        0.04 * (1.0 + jnp.abs(la) + jnp.abs(lb)), 0.5)
    safe = jnp.where(degen, 1.0, diff)
    ea, eb = jnp.exp(la), jnp.exp(lb)
    # spectral form: expm = (ea (A - lb I) - eb (A - la I)) / (la - lb)
    e00 = (ea * (a - lb) - eb * (a - la)) / safe
    e01 = (ea - eb) * b / safe
    e10 = (ea - eb) * c / safe
    e11 = (ea * (d - lb) - eb * (d - la)) / safe
    # near-degenerate: expm = e^mu (cosh(D) I + sinh(D)/D (A - mu I))
    # with D^2 = ((a-d)/2)^2 + bc (no cancelled subtraction)
    D2 = ((a - d) / 2) ** 2 + b * c
    coshD = 1.0 + D2 / 2 * (1.0 + D2 / 12 * (1.0 + D2 / 30))
    sinhc = 1.0 + D2 / 6 * (1.0 + D2 / 20 * (1.0 + D2 / 42))
    emu = jnp.exp(mu)
    e00 = jnp.where(degen, emu * (coshD + sinhc * (a - mu)), e00)
    e01 = jnp.where(degen, emu * sinhc * b, e01)
    e10 = jnp.where(degen, emu * sinhc * c, e10)
    e11 = jnp.where(degen, emu * (coshD + sinhc * (d - mu)), e11)
    row0 = jnp.stack([e00, e01], axis=-1)
    row1 = jnp.stack([e10, e11], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _expm(mat):
    """Batched matrix exponential: closed form for 2 compartments,
    Pade scaling-and-squaring otherwise (nonsymmetric eig is CPU-only
    in XLA, reference epgpy/exchange.py:262-282 uses eig)."""
    if mat.shape[-1] == 2:
        return _expm2(mat)
    from jax.scipy.linalg import expm
    return expm(mat)


def _broadcast_rev(*shapes):
    """Append-rule broadcast (reference epgpy/exchange.py:221-222)."""
    rev = [tuple(s)[::-1] for s in shapes]
    return np.broadcast_shapes(*rev)[::-1]


def _expand_to(arr, ndim):
    return arr.reshape(arr.shape + (1,) * (ndim - arr.ndim))


@base.register_op
class X(base.Operator):
    """Exchange operator: couples compartments along a batch axis.

    Args:
        tau: mixing time (ms).
        khi: scalar exchange rate (1/ms, 2 compartments assumed) or a full
            kinetic matrix (columns sum to 0 along `axis`).
        axis: compartment batch axis of the state matrix.
        T1, T2, g: per-compartment relaxation/shift (arrays on `axis`).
    """

    PARAMS = ("tau", "khi", "T1", "T2", "g")
    #: r5 (beyond reference: epgpy's X raises on _derive1): exchange
    #: parameters are differentiable through the planner's generic
    #: epsilon substitution.  Fit-relevant directions are STRUCTURED
    #: perturbations expressed as array chain-rule coefficients, e.g.
    #: ``order1={"k": {"khi": kron}}`` (d khi/dk for rate k with
    #: khi = k*kron) or ``order1={"T2f": {"T2": e0}}`` (free-pool T2
    #: with e0 the compartment-0 one-hot).  Unit-coefficient specs
    #: perturb the WHOLE leaf (all compartments together).
    PARAMETERS_ORDER1 = frozenset({"tau", "khi", "T1", "T2", "g"})

    def __init__(self, tau, khi, *, axis=-1, T1=None, T2=None, g=None,
                 name=None, duration=None, **kwargs):
        if np.isscalar(khi):
            khi = exchange_matrix(khi, axis=axis, ncomp=2)
        else:
            khi = np.asarray(khi, dtype=float)
            if khi.ndim < 2:
                raise ValueError("Exchange matrix must be at least 2D")
            if khi.shape[:-1][axis] != khi.shape[-1]:
                raise ValueError("Exchange matrix must be square")
            colsums = [np.abs(khi[..., i].sum(axis=axis)).max()
                       for i in range(khi.shape[-1])]
            if not np.allclose(colsums, 0):
                raise ValueError(f"Exchange matrix must sum to 0 along axis {axis}")
        axis = int(khi.ndim + axis - 1) if axis < 0 else int(axis)
        self.axis = axis
        self.khi = jnp.asarray(khi)
        self.tau = jnp.asarray(tau, dtype=float)
        self.T1 = None if T1 is None else jnp.asarray(T1, dtype=float)
        self.T2 = None if T2 is None else jnp.asarray(T2, dtype=float)
        self.g = None if g is None else jnp.asarray(g, dtype=float)
        if name is None:
            name = common.repr_operator("X", ["tau", "khi"], [tau, khi])
        if duration is True:
            duration = tau
        super().__init__(name=name, duration=duration, **kwargs)

    @property
    def shape(self):
        # the mixing matrix inserts the j-compartment axis at axis+1
        # (exchange_operator's final moveaxis); the op's batch shape is
        # the matrix shape minus that axis (reference epgpy/exchange.py:
        # 84-87).  Reproduce the moveaxis on a zero-strided dummy so the
        # drop applies to the MATRIX layout, not the parameter layout
        # (dropping from the parameter shape deleted an innocent batch
        # axis when batch dims followed the compartment axis).
        ps = self._matshape()
        C = self.khi.shape[-1]
        ax = self.axis
        axn = ax % len(ps)
        rest = tuple(d for i, d in enumerate(ps) if i != axn)
        dummy = np.broadcast_to(0.0, rest + (C, C))
        mshape = np.moveaxis(dummy, (-2, -1), (ax, ax + 1)).shape
        return tuple(d for i, d in enumerate(mshape) if i != (ax + 1))

    def _matshape(self):
        shape = _broadcast_rev(
            common.get_shape(self.tau),
            () if self.T1 is None else common.get_shape(self.T1),
            () if self.T2 is None else common.get_shape(self.T2),
            () if self.g is None else common.get_shape(self.g),
            self.khi.shape[:-1],
        )
        return shape

    def apply(self, sm):
        ax = self.axis
        mat = exchange_operator(self.tau, self.khi, axis=ax,
                                T1=self.T1, T2=self.T2, g=self.g)
        ncomp = mat.shape[ax]

        # runtime conservation check (eager/CPU only; under jit the
        # structural column-sum check in __init__ already ran)
        _sre = sm.states_re[0] if sm.lanes else sm.states_re
        if not isinstance(_sre, jax.core.Tracer):
            dens = np.asarray(sm.density)
            if dens.ndim:
                # append-rule broadcast: density's axes lead, new batch
                # axes pad on the RIGHT (not numpy's right-alignment)
                dens_b = np.broadcast_to(
                    dens.reshape(
                        dens.shape + (1,) * (len(sm.shape) - dens.ndim)),
                    sm.shape)
            else:
                dens_b = dens
            if np.ndim(dens_b) > ax and np.shape(dens_b)[ax] == ncomp:
                # pair matching batch elements (append rule: batch
                # blocks left-align, right-pad) -- a tensordot would
                # cross every khi atom with every density atom and
                # reject valid per-atom khi/density pairs
                khi_np = np.asarray(self.khi)
                rows = ax if ax >= 0 else khi_np.ndim - 1 + ax
                khi_a = np.moveaxis(khi_np, rows, -2)
                dens_m = np.moveaxis(dens_b, ax, -1)
                kb, db = khi_a.shape[:-2], dens_m.shape[:-1]
                n = max(len(kb), len(db))
                khi_a = khi_a.reshape(
                    kb + (1,) * (n - len(kb)) + khi_a.shape[-2:])
                dens_m = dens_m.reshape(
                    db + (1,) * (n - len(db)) + dens_m.shape[-1:])
                tot = np.sum(khi_a * dens_m[..., None, :], axis=-1)
                if not np.allclose(tot, 0, atol=1e-8):
                    raise RuntimeError(
                        "Exchange matrix `khi` does not conserve total "
                        "magnetization")

        return _apply_exchange(sm, mat, ax)


def _mat_elem(mat, i, j, comp, ax, nb):
    """mat[..., i@ax, j@ax+1, comp] broadcast-ready against a lanes plane.

    Remaining matrix batch dims left-align with the state batch dims minus
    the compartment axis; pad trailing singletons and prepend the K axis.
    """
    m = mat[..., comp]
    m = jax.lax.index_in_dim(m, j, ax + 1, keepdims=False)
    m = jax.lax.index_in_dim(m, i, ax, keepdims=False)
    return m.reshape((1,) + m.shape + (1,) * max(nb - 1 - m.ndim, 0))


def _apply_exchange_lanes(sm, mat, ax):
    """Lanes-layout exchange: per-plane explicit compartment mixing.

    The (K, *batch) planes never restack into a (batch, K, 3) array (which
    tile-pads 3 -> 128 lanes on TPU); the ncomp x ncomp mix is unrolled
    into elementwise madds per plane.
    """
    ncomp = mat.shape[ax]
    nb = sm.ndim
    pax = 1 + ax  # compartment axis in plane coordinates (K leads)
    planes = sm.half_planes
    new_planes = []
    # half-lanes storage is (Fp, Z) = component indices (0, 2); the
    # implied F- transforms by conj(mT) = mat[..., 1] automatically
    for comp, li in ((0, 0), (2, 1)):
        p = planes[li]
        e = jnp.asarray(_join_eq(sm, li), dtype=p.dtype)
        if p.shape[pax] == 1 and ncomp > 1:
            p = jnp.concatenate([p] * ncomp, axis=pax)
        # append-rule alignment: plane batch axes TRAIL (K leads), so a
        # compact equilibrium pads singleton axes on the right
        if e.ndim < p.ndim:
            e = e.reshape(e.shape + (1,) * (p.ndim - e.ndim))
        e = jnp.broadcast_to(e, p.shape)
        dev = p - e
        devs = [jax.lax.index_in_dim(dev, j, pax, keepdims=False)
                for j in range(ncomp)]
        outs = []
        for i in range(ncomp):
            acc = None
            for j in range(ncomp):
                term = _mat_elem(mat, i, j, comp, ax, nb) * devs[j]
                acc = term if acc is None else acc + term
            outs.append(acc)
        new_planes.append(jnp.stack(outs, axis=pax) + e)
    return sm.update(states_lanes=tuple(new_planes))


def _join_eq(sm, comp):
    re = sm.equilibrium_re[comp]
    im = sm.equilibrium_im[comp]
    return jax.lax.complex(jnp.asarray(re, config.real_dtype()),
                           jnp.asarray(im if im is not None else
                                       jnp.zeros_like(re),
                                       config.real_dtype()))


def _apply_exchange(sm, mat, ax):
    """Apply the (..., ncomp@ax, ncomp@ax+1, ..., 3) mixing matrix."""
    if sm.lanes:
        return _apply_exchange_lanes(sm, mat, ax)
    ncomp = mat.shape[ax]
    states = sm.states
    eq = jnp.asarray(sm.equilibrium, dtype=states.dtype)
    if eq.ndim < states.ndim:
        # append-rule alignment: new batch axes pad on the RIGHT of the
        # equilibrium's batch dims (the trailing (K, 3) stay state dims)
        eq = eq.reshape(
            eq.shape[:-2] + (1,) * (states.ndim - eq.ndim) + eq.shape[-2:])
    if states.shape[ax] == 1 and ncomp > 1:
        states = jnp.concatenate([states] * ncomp, axis=ax)
        eq = jnp.broadcast_to(eq, states.shape) if eq.shape[ax] == 1 else eq
    elif states.shape[ax] != ncomp:
        raise RuntimeError(
            f"State matrix axis {ax} has size {states.shape[ax]}, "
            f"expected {ncomp} compartments")

    # reference semantics (epgpy/exchange.py:103-120): contract the
    # matrix's j-compartment axis (ax+1) with the states' compartment
    # axis, inserted at ax+1 by expand_dims at ax
    dev = states - jnp.broadcast_to(eq, states.shape)
    dev_ins = jnp.expand_dims(dev, ax)          # (..., 1@ax, comp@ax+1, ..., K, 3)
    need = dev_ins.ndim - mat.ndim
    mat_e = mat.reshape(mat.shape[:-1] + (1,) * max(need, 0) + mat.shape[-1:])
    new = jnp.sum(
        jnp.moveaxis(mat_e, ax + 1, -1) * jnp.moveaxis(dev_ins, ax + 1, -1),
        axis=-1,
    )
    return sm.update(states=new + jnp.broadcast_to(eq, new.shape))


@base.register_op
class PrecomputedExchange(base.Operator):
    """Exchange op with the expm mixing matrix precomputed (engine-internal).

    The scan planner converts concrete scan-constant X ops into this form:
    the (Pade) matrix exponential is evaluated ONCE at plan-build time
    instead of inside every scan iteration (its lax control flow would not
    reliably hoist as loop-invariant).
    """

    PARAMS = ("mat_re", "mat_im")

    def __init__(self, mat_re, mat_im, axis=0, name=None, **kwargs):
        self.mat_re = mat_re
        self.mat_im = mat_im
        self.axis = int(axis)
        super().__init__(name=name or "PrecomputedExchange", **kwargs)

    @property
    def shape(self):
        mshape = tuple(self.mat_re.shape[:-1])
        return tuple(d for i, d in enumerate(mshape) if i != self.axis + 1)

    def apply(self, sm):
        mat = jax.lax.complex(
            jnp.asarray(self.mat_re, config.real_dtype()),
            jnp.asarray(self.mat_im, config.real_dtype()))
        return _apply_exchange(sm, mat, self.axis)


def precompute_exchange(op):
    """Build a PrecomputedExchange from a concrete X op (or None)."""
    from .scalarop import _ambient_trace

    if any(isinstance(l, jax.core.Tracer)
           for l in jax.tree_util.tree_leaves(op)):
        return None
    if _ambient_trace():
        return None

    mat_re, mat_im = _precompute_prog(op)
    return PrecomputedExchange(mat_re, mat_im, axis=op.axis)


@jax.jit
def _precompute_prog(o):
    # module-level jit: value-identical X ops (one instance per TR,
    # outside scan grouping) share one compile per shape config instead
    # of paying a fresh trace+compile each (per-call jax.jit wrappers
    # never hit the cache -- the key includes the wrapper identity)
    mat = exchange_operator(o.tau, o.khi, axis=o.axis,
                            T1=o.T1, T2=o.T2, g=o.g)
    return jnp.real(mat), jnp.imag(mat)