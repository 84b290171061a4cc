"""Sharded CRLB sequence optimization (MRF flip-angle train design).

This is the "training step" of the framework: optimize the per-pulse flip
angles of an MRF train to minimize the Cramer-Rao lower bound of (T1, T2)
estimation over a sharded atom grid (reference workflow:
examples/sequence/optim_mrf.py; derivative engine replaced by JAX autodiff,
cf. SURVEY.md §2.6).

Mesh layout ("dp x tp" analog for this domain):
  * ``atoms``    -- data parallel: each device owns an atom shard;
  * ``tangents`` -- the wide per-pulse flip-angle Jacobian is computed with
    its tangent (column) axis sharded, then all-gathered for the Fisher
    product -- the compiled equivalent of the reference's commented-out
    multiprocessing order-2 split (reference epgpy/functions.py:195-248).

All collectives (pmean over atoms, all_gather over tangents) ride the mesh
via shard_map; the backward pass (grad of loss w.r.t. FA) differentiates
straight through them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.mrf import fisp_mrf_signal

__all__ = ["fingerprint_crlb_loss", "crlb_train_step",
           "mrf_design_loss", "mrf_design_step", "FA_BOUNDS", "TR_BOUNDS"]


def _atom_signal_ri(FA, T1, T2, *, TR, TE, nstate):
    """One atom's fingerprint as a (P, 2) real array (re, im columns)."""
    re, im = fisp_mrf_signal(FA, 90.0, TR, TE, T1, T2, 1.0, nstate=nstate)
    return jnp.stack([re, im], axis=-1)


def _crlb_t1t2(FA, T1, T2, *, TR, TE, nstate, ridge):
    """CRLB of (T1, T2) for one atom (relative parametrization)."""
    def f(logt1, logt2):
        return _atom_signal_ri(FA, jnp.exp(logt1), jnp.exp(logt2),
                               TR=TR, TE=TE, nstate=nstate)
    J = jax.jacfwd(f, argnums=(0, 1))(jnp.log(T1), jnp.log(T2))
    J = jnp.stack(J, axis=-1)  # (P, 2, nvars)
    J = J.reshape(-1, J.shape[-1])
    fisher = J.T @ J + ridge * jnp.eye(J.shape[-1], dtype=J.dtype)
    return jnp.trace(jnp.linalg.inv(fisher))


def _crlb_fa_block(FA, T1, T2, *, TR, TE, nstate, ridge, axis):
    """CRLB over per-pulse FA variables, tangent axis sharded over `axis`.

    Each shard seeds jacfwd only with its slice of the FA basis; the Fisher
    product needs all columns, so the J blocks are all-gathered over the
    tangent mesh axis.
    """
    nshards = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    P_fa = FA.shape[0]
    # ceil-divide + zero-pad so any train length works on any tangent
    # axis size; the pad columns are derivatives w.r.t. dummy params
    # (zero by construction) and are trimmed after the gather
    chunk = -(-P_fa // nshards)
    pad = chunk * nshards - P_fa
    FAp = jnp.concatenate([FA, jnp.zeros((pad,), FA.dtype)]) if pad else FA
    start = idx * chunk

    def f(fa_chunk):
        FA2 = jax.lax.dynamic_update_slice(FAp, fa_chunk, (start,))
        return _atom_signal_ri(FA2[:P_fa], T1, T2, TR=TR, TE=TE,
                               nstate=nstate)

    Jblk = jax.jacfwd(f)(jax.lax.dynamic_slice(FAp, (start,), (chunk,)))
    # (P, 2, chunk) -> gather full tangent axis, trim the pad columns
    J = jax.lax.all_gather(Jblk, axis, axis=-1, tiled=True)
    J = J[..., :P_fa].reshape(-1, P_fa)
    fisher = J.T @ J + ridge * jnp.eye(P_fa, dtype=J.dtype)
    return jnp.trace(jnp.linalg.inv(fisher))


#: jitted shard_map losses keyed on (mesh, static opts) -- building a fresh
#: jax.jit(closure) per call would retrace/recompile every training step
_LOSS_CACHE: dict = {}
_LOSS_CACHE_MAX = 8


def _build_loss(mesh: Mesh, TR, TE, nstate, ridge, fa_weight):
    has_tangents = "tangents" in mesh.axis_names

    def shard_fn(FA, T1s, T2s):
        crlb12 = jax.vmap(
            lambda t1, t2: _crlb_t1t2(FA, t1, t2, TR=TR, TE=TE,
                                      nstate=nstate, ridge=ridge)
        )(T1s, T2s)
        loss = jnp.mean(crlb12)
        if has_tangents and fa_weight:
            crlbfa = jax.vmap(
                lambda t1, t2: _crlb_fa_block(FA, t1, t2, TR=TR, TE=TE,
                                              nstate=nstate, ridge=ridge,
                                              axis="tangents")
            )(T1s, T2s)
            loss = loss + fa_weight * jnp.mean(crlbfa)
        return jax.lax.pmean(loss, "atoms")

    in_specs = (P(), P("atoms"), P("atoms"))
    # check_vma=False: the scan carry inside fisp_mrf_signal starts
    # replicated and becomes atom-varying through the captured shard --
    # semantically fine, but the static varying-axis checker rejects it.
    # jit the mapped call: eager shard_map execution is both slower and
    # unsupported on some backends (axon TPU raises UNIMPLEMENTED at the
    # eager collective boundary)
    return jax.jit(jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=P(), check_vma=False))


def fingerprint_crlb_loss(FA, T1s, T2s, mesh: Mesh, *, TR=12.0, TE=5.0,
                          nstate=6, ridge=1e-6, fa_weight=1e-3):
    """Mean CRLB over the (sharded) atom grid; FA replicated.

    loss = mean_atoms CRLB_{T1,T2} + fa_weight * mean_atoms CRLB_{FA train}
    """
    key = (mesh, float(TR), float(TE), int(nstate), float(ridge),
           float(fa_weight))
    loss_fn = _LOSS_CACHE.get(key)
    if loss_fn is None:
        loss_fn = _build_loss(mesh, TR, TE, nstate, ridge, fa_weight)
        if len(_LOSS_CACHE) >= _LOSS_CACHE_MAX:
            _LOSS_CACHE.pop(next(iter(_LOSS_CACHE)))
        _LOSS_CACHE[key] = loss_fn
    return loss_fn(FA, T1s, T2s)


def crlb_train_step(FA, T1s, T2s, mesh: Mesh, *, lr=0.5, **opts):
    """One gradient-descent step on the flip-angle train (jittable)."""
    loss, grad = jax.value_and_grad(
        lambda fa: fingerprint_crlb_loss(fa, T1s, T2s, mesh, **opts))(FA)
    return FA - lr * grad, loss


# -- reference-scale constrained design: FA + TR, 2*nTR free parameters --
# (reference examples/sequence/optim_mrf.py:39-156: 400 TRs, SLSQP with
# bounds alpha in [10,60], TR in [11,16] and |dalpha| < 1.  Here: projected
# gradient -- reverse-mode grad of the CRLB replaces the reference's
# 800-tangent analytic Hessian route, and the box constraints become a
# projection after each step; the smoothness constraint a soft penalty.)

FA_BOUNDS = (10.0, 60.0)
TR_BOUNDS = (11.0, 16.0)


def _atom_crlb_mt1t2(FA, TR, T1, T2, *, TE, nstate, inversion, sigma2,
                     ridge):
    """CRLB of (magnitude, T1, T2) for one atom, reference weighting.

    J columns: the signal itself (d/d magnitude at m=1) and the T1/T2
    sensitivities; W = diag(1, 1/T1^2, 1/T2^2); crlb = tr(W inv(J'J/s2))
    (reference epgpy/stats.py:6-36 + optim_mrf.py:57-60).
    """
    def f(t1, t2):
        re, im = fisp_mrf_signal(FA, 90.0, TR, TE, t1, t2, 1.0,
                                 nstate=nstate, inversion=inversion)
        return jnp.concatenate([re, im])

    s = f(T1, T2)
    d1, d2 = jax.jacfwd(f, argnums=(0, 1))(T1, T2)
    J = jnp.stack([s, d1, d2], axis=-1)                      # (2P, 3)
    fisher = J.T @ J / sigma2 + ridge * jnp.eye(3, dtype=J.dtype)
    w = jnp.asarray([1.0, 1.0 / T1**2, 1.0 / T2**2], J.dtype)
    return jnp.sum(w * jnp.diag(jnp.linalg.inv(fisher)))


def mrf_design_loss(FA, TR, T1s, T2s, mesh: Mesh, *, TE=5.0, nstate=10,
                    inversion=20.0, sigma2=10.0, ridge=1e-9,
                    smooth_weight=0.0):
    """Mean (magnitude, T1, T2)-CRLB over the sharded atom grid.

    FA/TR are (P,) free per-pulse parameters (replicated); atoms shard
    over the ``atoms`` mesh axis; the mean rides a pmean.  An optional
    quadratic penalty enforces the reference's |FA_i - FA_{i-1}| < 1
    smoothness constraint softly.
    """
    def shard_fn(FA, TR, T1s, T2s):
        crlb = jax.vmap(
            lambda t1, t2: _atom_crlb_mt1t2(
                FA, TR, t1, t2, TE=TE, nstate=nstate, inversion=inversion,
                sigma2=sigma2, ridge=ridge)
        )(T1s, T2s)
        loss = jax.lax.pmean(jnp.mean(crlb), "atoms")
        if smooth_weight:
            excess = jnp.maximum(jnp.abs(jnp.diff(FA)) - 1.0, 0.0)
            loss = loss + smooth_weight * jnp.sum(excess**2)
        return loss

    in_specs = (P(), P(), P("atoms"), P("atoms"))
    return jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                         out_specs=P(), check_vma=False)(FA, TR, T1s, T2s)


def mrf_design_loss_grad_fused(FA, TR, T1s, T2s, mesh: Mesh = None, *,
                               TE=5.0, nstate=10, inversion=20.0,
                               sigma2=10.0, smooth_weight=0.0,
                               interpret=False):
    """(loss, gFA, gTR) via the fused per-pulse Hessian kernel.

    Same cost as `mrf_design_loss` (mean (magnitude, T1, T2)-CRLB over
    the atom grid + optional soft smoothness penalty), but value AND
    full 2P-parameter gradient come from ONE kernel launch: the fused
    kernel (models/pallas_hessian) returns J = dS/d(mag, T1, T2) and
    H = d2S/d(mag, T1, T2)d(FA_i, TR_i) per atom, and `stats.crlb`
    contracts the analytic gradient (the reference's Hessian route,
    epgpy stats.py:6-36, at TPU speed).  Atoms shard over ``atoms``
    when a mesh is given.  Jit the call.
    """
    from ..models.pallas_hessian import fisp_hessian_pallas
    from .. import stats

    def local(fa, tr, t1, t2):
        out = fisp_hessian_pallas(fa, 90.0, tr - TE, t1, t2, te=TE,
                                  inversion=inversion, nstate=nstate,
                                  interpret=interpret)
        sig = out["sig"][0] + 1j * out["sig"][1]           # (B, P)
        J = jnp.stack([sig,
                       out["dT1"][0] + 1j * out["dT1"][1],
                       out["dT2"][0] + 1j * out["dT2"][1]], axis=-1)
        H = jnp.stack([
            jnp.concatenate([out["dalpha"][0] + 1j * out["dalpha"][1],
                             out["dtau"][0] + 1j * out["dtau"][1]], -1),
            jnp.concatenate([out["dT1dalpha"][0] + 1j * out["dT1dalpha"][1],
                             out["dT1dtau"][0] + 1j * out["dT1dtau"][1]],
                            -1),
            jnp.concatenate([out["dT2dalpha"][0] + 1j * out["dT2dalpha"][1],
                             out["dT2dtau"][0] + 1j * out["dT2dtau"][1]],
                            -1)], axis=-2)                  # (B, P, 3, 2P)
        w = jnp.stack([jnp.ones_like(t1), 1.0 / t1**2, 1.0 / t2**2], -1)
        cost, grad = stats.crlb(J, H, W=w, sigma2=sigma2)
        return jnp.mean(cost), jnp.mean(grad, axis=0)

    if mesh is None:
        loss, grad = local(FA, TR, T1s, T2s)
    else:
        def shard_fn(fa, tr, t1, t2):
            loss, grad = local(fa, tr, t1, t2)
            return (jax.lax.pmean(loss, "atoms"),
                    jax.lax.pmean(grad, "atoms"))

        loss, grad = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P("atoms"), P("atoms")),
            out_specs=(P(), P()), check_vma=False)(FA, TR, T1s, T2s)
    nTR = FA.shape[0]
    gFA, gTR = grad[:nTR], grad[nTR:]
    if smooth_weight:
        excess = jnp.maximum(jnp.abs(jnp.diff(FA)) - 1.0, 0.0)
        loss = loss + smooth_weight * jnp.sum(excess**2)
        pen = 2.0 * smooth_weight * excess * jnp.sign(jnp.diff(FA))
        gFA = gFA + jnp.concatenate([-pen, jnp.zeros(1)]) \
            + jnp.concatenate([jnp.zeros(1), pen])
    return loss, gFA, gTR


def mrf_design_slsqp(FA0, TR0, T1s, T2s, mesh: Mesh, *, maxiter=250,
                     ftol=1e-6, callback=None, engine="scan", **opts):
    """Reference-fidelity constrained CRLB design: scipy SLSQP driven by
    the sharded JAX value-and-grad.

    Exactly the reference's optimization setup
    (/root/reference/examples/sequence/optim_mrf.py:119-156): parameters
    [FA (P,), TR (P,)], box bounds FA in [10, 60] / TR in [11, 16], and
    the HARD smoothness inequality ``1 - |diff(FA, prepend=FA[0])| >= 0``
    (TR increments unconstrained).  The cost+gradient is one compiled
    reverse-mode pass over the sharded atom mesh per SLSQP iteration --
    replacing the reference's ~800 analytically-propagated derivative
    state matrices per call.

    Returns (FA, TR, scipy result).
    """
    from scipy import optimize

    nTR = len(FA0)
    if engine == "fused":
        # value + full 2P gradient from ONE fused Hessian kernel launch
        # (~ms-scale per SLSQP iteration at 400 TR; the ridge option is
        # not used by the fused path)
        opts.pop("ridge", None)
        val_grad = jax.jit(lambda fa, tr: mrf_design_loss_grad_fused(
            fa, tr, T1s, T2s, mesh, **opts))

        def costjac(x):
            fa, tr = x[:nTR], x[nTR:]
            v, gfa, gtr = jax.device_get(
                val_grad(jnp.asarray(fa, jnp.float32),
                         jnp.asarray(tr, jnp.float32)))
            return float(v), np.concatenate(
                [np.asarray(gfa), np.asarray(gtr)]).astype(float)
    else:
        val_grad = jax.jit(jax.value_and_grad(
            lambda fa, tr: mrf_design_loss(fa, tr, T1s, T2s, mesh, **opts),
            argnums=(0, 1)))

        def costjac(x):
            fa, tr = x[:nTR], x[nTR:]
            v, (gfa, gtr) = jax.device_get(
                val_grad(jnp.asarray(fa), jnp.asarray(tr)))
            return float(v), np.concatenate(
                [np.asarray(gfa), np.asarray(gtr)]).astype(float)

    def constraint_function(params):
        # reference optim_mrf.py:99-103: FA increment magnitude <= 1
        diff = np.diff(params, prepend=params[0])
        diff[nTR:] = 0
        return 1 - np.abs(diff)

    res = optimize.minimize(
        costjac, np.concatenate([np.asarray(FA0), np.asarray(TR0)]),
        jac=True, method="SLSQP",
        bounds=[FA_BOUNDS] * nTR + [TR_BOUNDS] * nTR,
        constraints=[{"type": "ineq", "fun": constraint_function}],
        callback=callback,
        options={"ftol": ftol, "maxiter": maxiter},
    )
    return np.asarray(res.x[:nTR]), np.asarray(res.x[nTR:]), res


def mse_design_loss_grad_fused(FA, ESP, T1s, T2s, mesh: Mesh = None, *,
                               exc=(90.0, 90.0), nstate=None, sigma2=10.0,
                               include_t1=False, interpret=False):
    """(loss, gFA, gESP) for variable-flip TSE design via the fused
    per-echo CPMG kernel.

    Cost: mean (magnitude, T2)-CRLB over the atom grid (reference
    weighting W = diag(1, 1/T2^2), epgpy stats.py:6-36) of the CPMG
    echo train; value AND the full 2E-parameter gradient come from ONE
    `cpmg_design_pallas(second_order=True)` launch per call —
    J = dS/d(targets) and H = d2S/d(targets) d(FA_i, esp_i) per atom,
    contracted by `stats.crlb`'s analytic gradient.  Atoms shard over
    ``atoms`` when a mesh is given.  Jit the call.

    ``include_t1`` adds the T1 column.  It is OFF by default for a
    numerical reason measured on TPU: a CPMG train is a T2 measurement
    — its dS/dT1 column is ~1e-6 of the signal scale, so the 3x3
    Fisher matrix is singular in f32 and its inverse is NaN (the f64
    CPU path survives).  Only enable it for trains that actually carry
    T1 sensitivity (e.g. long recovery gaps).
    """
    from ..models.pallas_msedesign import cpmg_design_pallas
    from .. import stats

    E = FA.shape[0]
    if nstate is None:
        nstate = 2 * E

    def local(fa, esp, t1, t2):
        out = cpmg_design_pallas(exc, fa, 0.0, esp, t1, t2,
                                 nstate=nstate, second_order=True,
                                 interpret=interpret)

        def c(key):
            return out[key][0] + 1j * out[key][1]

        cols = [c("sig"), c("dT2")]
        rows = [jnp.concatenate([c("dalpha"), c("desp")], -1),
                jnp.concatenate([c("dT2dalpha"), c("dT2desp")], -1)]
        ws = [jnp.ones_like(t1), 1.0 / t2**2]
        if include_t1:
            cols.insert(1, c("dT1"))
            rows.insert(1, jnp.concatenate([c("dT1dalpha"),
                                            c("dT1desp")], -1))
            ws.insert(1, 1.0 / t1**2)
        J = jnp.stack(cols, axis=-1)
        H = jnp.stack(rows, axis=-2)                  # (B, E, nv, 2E)
        w = jnp.stack(ws, -1)
        cost, grad = stats.crlb(J, H, W=w, sigma2=sigma2)
        return jnp.mean(cost), jnp.mean(grad, axis=0)

    if mesh is None:
        loss, grad = local(FA, ESP, T1s, T2s)
    else:
        def shard_fn(fa, esp, t1, t2):
            loss, grad = local(fa, esp, t1, t2)
            return (jax.lax.pmean(loss, "atoms"),
                    jax.lax.pmean(grad, "atoms"))

        loss, grad = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P("atoms"), P("atoms")),
            out_specs=(P(), P()), check_vma=False)(FA, ESP, T1s, T2s)
    return loss, grad[:E], grad[E:]


def tse_design_slsqp(FA0, ESP0, T1s, T2s, mesh: Mesh = None, *,
                     maxiter=200, ftol=1e-8, fa_bounds=(50.0, 180.0),
                     esp_bounds=(5.0, 15.0), sar_budget=None,
                     dfa_max=None, fix_esp=False, callback=None, **opts):
    """Constrained variable-flip TSE CRLB design: scipy SLSQP driven by
    the fused per-echo CPMG kernel's value-and-gradient.

    The TSE design tension (Busse 2006): SAR scales with sum(FA_i^2)
    while T2 precision wants large flips — ``sar_budget`` bounds
    ``mean((FA_i/180)^2)`` as a hard inequality; ``dfa_max`` bounds
    per-echo flip increments (signal-level smoothness); ``fix_esp``
    freezes the echo spacings (flip-only design).

    Returns (FA, ESP, scipy result).
    """
    from scipy import optimize

    E = len(FA0)
    val_grad = jax.jit(lambda fa, esp: mse_design_loss_grad_fused(
        fa, esp, T1s, T2s, mesh, **opts))

    def costjac(x):
        fa, esp = x[:E], x[E:]
        v, gfa, gesp = jax.device_get(
            val_grad(jnp.asarray(fa, jnp.float32),
                     jnp.asarray(esp, jnp.float32)))
        g = np.concatenate([np.asarray(gfa),
                            np.zeros(E) if fix_esp else np.asarray(gesp)])
        return float(v), g.astype(float)

    constraints = []
    if sar_budget is not None:
        def sar(x):
            return sar_budget - np.mean((x[:E] / 180.0) ** 2)

        def sar_jac(x):
            g = np.zeros_like(x)
            g[:E] = -2.0 * x[:E] / (180.0 ** 2 * E)
            return g

        constraints.append({"type": "ineq", "fun": sar, "jac": sar_jac})
    if dfa_max is not None:
        def smooth(x):
            return dfa_max - np.abs(np.diff(x[:E]))

        constraints.append({"type": "ineq", "fun": smooth})

    if fix_esp:
        esp_b = [(e, e) for e in np.asarray(ESP0, float)]
    else:
        esp_b = [esp_bounds] * E
    res = optimize.minimize(
        costjac, np.concatenate([np.asarray(FA0, float),
                                 np.asarray(ESP0, float)]),
        jac=True, method="SLSQP",
        bounds=[fa_bounds] * E + esp_b,
        constraints=constraints, callback=callback,
        options={"ftol": ftol, "maxiter": maxiter},
    )
    return np.asarray(res.x[:E]), np.asarray(res.x[E:]), res


def mrf_design_step(FA, TR, T1s, T2s, mesh: Mesh, *, lr_fa=1.0, lr_tr=0.05,
                    **opts):
    """One projected-gradient step on (FA, TR); jit this (eager shard_map
    is unsupported on some backends)."""
    loss, (gFA, gTR) = jax.value_and_grad(
        lambda fa, tr: mrf_design_loss(fa, tr, T1s, T2s, mesh, **opts),
        argnums=(0, 1))(FA, TR)
    FA = jnp.clip(FA - lr_fa * gFA, *FA_BOUNDS)
    TR = jnp.clip(TR - lr_tr * gTR, *TR_BOUNDS)
    return FA, TR, loss
