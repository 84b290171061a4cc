"""Statistics: CRLB cost functions and delta-method confidence intervals.

Semantics parity: reference epgpy/stats.py (same published formulas:
Fisher information F = J^H J / sigma2, CRLB = tr(W F^-1), delta-method
intervals).  All functions are pure jnp and differentiable; `crlb` can
therefore also be optimized directly with ``jax.grad`` instead of the
hand-derived Hessian contraction (which is kept for API parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: TPU matmul default is bf16 passes (~4e-3 relative); Fisher/covariance
#: products feed matrix inversions that amplify that by cond^2 -- run all
#: contractions at full f32 (CLAUDE.md fact 5, as everywhere else)
_HI = jax.lax.Precision.HIGHEST

__all__ = ["crlb", "crlb_split", "confint", "get_tstat_interval"]

#: Fisher matrices with a condition number beyond this are reported as NaN
#: rather than raising (matches the reference's singular-matrix behavior)
_COND_LIMIT = 1e30


def _fisher(J, sigma2):
    """Fisher information (..., p, p) from a complex Jacobian (..., n, p)."""
    J = jnp.asarray(J)
    JH = jnp.swapaxes(jnp.conj(J), -1, -2)
    return jnp.matmul(JH, J, precision=_HI).real / sigma2


def _bound_matrix(fisher):
    """inv(Fisher), with numerically-singular batches mapped to NaN.

    The inversion runs on an identity-substituted matrix so the NaNs never
    enter linalg (NaN inputs poison the whole batch on some backends).
    """
    bad = (jnp.linalg.cond(fisher) > _COND_LIMIT)[..., None, None]
    eye = jnp.eye(fisher.shape[-1], dtype=fisher.dtype)
    inv = jnp.linalg.inv(jnp.where(bad, eye, fisher))
    return jnp.where(bad, jnp.nan, inv)


def crlb(J, H=None, *, W=None, sigma2=1, log=False):
    """Cramer-Rao lower bound cost: sum_p W_p * inv(Fisher)_pp.

    Args:
        J: Jacobian (..., npoint, nparam) complex
        H: optional Hessian (..., npoint, nparam, nvar) -> also return the
            analytic gradient w.r.t. the nvar sequence parameters
        W: optional per-parameter weights
        sigma2: noise variance
        log: return log10 of the cost (and correspondingly scaled gradient)
    """
    lb = _bound_matrix(_fisher(J, sigma2))
    diag = jnp.diagonal(lb, axis1=-2, axis2=-1)
    weights = None if W is None else jnp.asarray(W)
    cost = jnp.sum(diag if weights is None else diag * weights, axis=-1)

    if H is None:
        return jnp.log10(cost) if log else cost

    # d cost / dx = -tr(M dF/dx lb) with M = diag(W) lb and
    # dF/dx = 2 Re(H^H J) / sigma2 (symmetrized over the p,q Fisher axes)
    J = jnp.asarray(J)
    dF = jnp.einsum("...npx,...nq->...pqx", jnp.conj(jnp.asarray(H)), J,
                    precision=_HI).real
    dF = (dF + jnp.swapaxes(dF, -3, -2)) / sigma2
    M = lb if weights is None else lb * weights[..., None]
    grad = -jnp.einsum("...pq,...qrx,...rp->...x", M, dF, lb,
                       precision=_HI)
    if log:
        return jnp.log10(cost), grad / (cost[..., None] * jnp.log(10.0))
    return cost, grad


def crlb_split(J, W=None, sigma2=1, log=False):
    """Per-variable CRB values (leading axis = variable)."""
    lb = _bound_matrix(_fisher(J, sigma2))
    crb = jnp.diagonal(lb, axis1=-2, axis2=-1)
    if W is not None:
        crb = crb * jnp.asarray(W)
    if log:
        crb = jnp.log10(crb)
    return jnp.moveaxis(crb, -1, 0)


def confint(obs, pred, jac, hess=None, *, conflevel=0.95):
    """Delta-method confidence intervals and prediction bands.

    Returns (cints, cband): half-widths of the per-parameter confidence
    intervals (..., nparam) and of the per-point prediction band
    (..., npoint), at `conflevel` with npoint - nparam degrees of freedom.
    """
    jac = jnp.asarray(jac)
    npoint, nparam = jac.shape[-2:]
    dof = npoint - nparam
    res = jnp.asarray(obs) - jnp.asarray(pred)
    sse = jnp.sum((res * jnp.conj(res)).real, axis=-1)

    # observed-information covariance: with res = obs - pred,
    # d res/dtheta = -J, so d2(SSE)/dtheta2 = 2 [J^H J - Re(conj(H) res)]
    info = jnp.matmul(jnp.swapaxes(jnp.conj(jac), -1, -2), jac,
                      precision=_HI).real
    if hess is not None:
        hterm = jnp.einsum(
            "...nqp,...n->...pq", jnp.conj(jnp.asarray(hess)), res,
            precision=_HI).real
        info = info - hterm
    cov = jnp.linalg.inv(info) * (sse[..., None, None] / dof)

    tval = get_tstat_interval(conflevel, dof)
    cints = tval * jnp.sqrt(jnp.diagonal(cov, axis1=-2, axis2=-1))

    # prediction variance per point: j_n^H cov j_n
    predvar = jnp.sum(jnp.matmul(jac, cov.astype(jac.dtype),
                              precision=_HI) * jnp.conj(jac),
                      axis=-1).real
    cband = tval * jnp.sqrt(predvar)
    return cints, cband


#: memo of two-sided Student-t quantiles {(conflevel, dof): t}
_TSTAT_CACHE: dict = {}


def get_tstat_interval(conflevel, nu):
    """Two-sided t-statistic bound at `conflevel` with `nu` dof."""
    key = (float(conflevel), int(nu))
    if key not in _TSTAT_CACHE:
        from scipy import stats as sps
        _TSTAT_CACHE[key] = float(sps.t.interval(key[0], key[1])[1])
    return _TSTAT_CACHE[key]


#: parity alias (reference epgpy/stats.py exposes the table by this name)
TSTAT_INTERVAL = _TSTAT_CACHE
