"""Statistics: CRLB cost functions and delta-method confidence intervals.

Semantics parity: reference epgpy/stats.py.  All functions are pure jnp and
differentiable; `crlb` can therefore also be optimized directly with
``jax.grad`` instead of the hand-derived Hessian contraction (which is kept
for API parity).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["crlb", "crlb_split", "confint", "get_tstat_interval"]


def crlb(J, H=None, *, W=None, sigma2=1, log=False):
    """Cramer-Rao lower bound cost: trace(W inv(Fisher)).

    Args:
        J: Jacobian (..., npoint, nparam) complex
        H: optional Hessian (..., npoint, nparam, nvar) -> also return gradient
        W: optional per-parameter weights
        sigma2: noise variance
        log: return log10 of the cost (and scaled gradient)
    """
    J = jnp.asarray(J)
    fisher = jnp.einsum("...np,...nq->...pq", jnp.conj(J), J).real / sigma2
    fisher = jnp.where(
        (jnp.linalg.cond(fisher) > 1e30)[..., None, None], jnp.nan, fisher
    )
    lb = jnp.linalg.inv(fisher)

    Wb = 1 if W is None else jnp.asarray(W)[..., None]
    cost = jnp.trace(Wb * lb, axis1=-2, axis2=-1)

    if H is None:
        return cost if not log else jnp.log10(cost)

    HJ = jnp.einsum("...npx,...nq->...qpx", jnp.conj(H), J) / sigma2
    HJ = HJ + jnp.conj(jnp.moveaxis(HJ, -3, -2))
    grad = -jnp.einsum("...pq,...qrx,...rp->...x", Wb * lb, HJ.real, lb)
    if not log:
        return cost, grad
    return jnp.log10(cost), grad / cost[..., None] / jnp.log(10.0)


def crlb_split(J, W=None, sigma2=1, log=False):
    """Per-variable CRB values (leading axis = variable)."""
    J = jnp.asarray(J)
    fisher = jnp.einsum("...np,...nq->...pq", jnp.conj(J), J).real / sigma2
    fisher = jnp.where(
        (jnp.linalg.cond(fisher) > 1e30)[..., None, None], jnp.nan, fisher
    )
    lb = jnp.linalg.inv(fisher)
    idiag = jnp.arange(lb.shape[-1])
    crb = lb[..., idiag, idiag]
    if W is not None:
        crb = crb * jnp.asarray(W)
    if log:
        crb = jnp.log10(crb)
    return jnp.moveaxis(crb, -1, 0)


def confint(obs, pred, jac, hess=None, *, conflevel=0.95):
    """Delta-method confidence intervals and prediction bands."""
    jac = jnp.asarray(jac)
    nobs, nparam = jac.shape[-2:]
    dof = nobs - nparam
    res = jnp.asarray(obs) - jnp.asarray(pred)
    sse = jnp.sum(res * jnp.conj(res), axis=-1).real

    if hess is not None:
        Hmle = jnp.einsum("...nqp,...n->...pq", jnp.conj(jnp.asarray(hess)), res).real
        Hmle = Hmle + jnp.einsum("...np,...nq->...pq", jnp.conj(jac), jac).real
        cov = jnp.linalg.inv(Hmle)
    else:
        jac2 = jnp.einsum("...np,...nq->...pq", jnp.conj(jac), jac).real
        cov = jnp.linalg.inv(jac2)
    cov = cov * (sse[..., None, None] / dof)

    tval = get_tstat_interval(conflevel, dof)

    idiag = jnp.arange(nparam)
    cints = tval * jnp.sqrt(cov[..., idiag, idiag])

    predvar = jnp.einsum("...np,...pq,...nq->...n", jnp.conj(jac), cov, jac).real
    cband = tval * jnp.sqrt(predvar)
    return cints, cband


def get_tstat_interval(alpha, nu):
    """Two-sided t-statistic bound; table-first, scipy fallback."""
    key = (float(alpha), int(nu))
    if key not in TSTAT_INTERVAL:
        from scipy import stats as sps
        TSTAT_INTERVAL[key] = float(sps.t.interval(alpha, nu)[1])
    return TSTAT_INTERVAL[key]


def _student_t_table():
    # 95% / 99% two-sided quantiles, dof 1..99 (matches scipy.stats.t.interval)
    table = {}
    q95 = [
        12.706204736432095, 4.302652729911275, 3.182446305284263,
        2.7764451051977987, 2.5705818366147395, 2.4469118487916806,
        2.3646242510102993, 2.3060041350333704, 2.2621571627409915,
        2.2281388519649385, 2.200985160082949, 2.1788128296634177,
        2.1603686564610127, 2.1447866879169273, 2.131449545559323,
        2.1199052992210112, 2.1098155778331806, 2.10092204024096,
        2.093024054408263, 2.0859634472658364, 2.079613844727662,
        2.0738730679040147, 2.0686576104190406, 2.0638985616280205,
        2.059538552753294, 2.055529438642871, 2.0518305164802833,
        2.048407141795244, 2.045229642132703, 2.0422724563012373,
        2.0395134463964077, 2.036933343460101, 2.0345152974493383,
        2.032244509317718, 2.0301079282503425, 2.0280940009804502,
        2.0261924630291093, 2.024394164575136, 2.022690911734728,
        2.0210753829953374, 2.0195409639828936, 2.018081697095881,
        2.0166921941428133, 2.015367569912941, 2.0141033848332923,
        2.0128955952945886, 2.0117405104757546, 2.0106347546964454,
        2.009575234489209, 2.008559109715206, 2.007583768155882,
        2.0066468031022113, 2.0057459935369497, 2.004879286566523,
        2.004044781810181, 2.0032407174966975, 2.0024654580545986,
        2.0017174830120923, 2.00099537704821, 2.0002978210582616,
        1.9996235841149779, 1.9989715162223112, 1.9983405417721956,
        1.9977296536259734, 1.9971379077520122, 1.9965644183594744,
        1.9960083534755055, 1.9954689309194018, 1.9949454146328136,
        1.9944371113297727, 1.993943367434504, 1.9934635662785827,
        1.9929971255321663, 1.99254349484682, 1.9921021536898653,
        1.9916726093523487, 1.9912543951146038, 1.990847068555052,
        1.9904502099893602, 1.990063421028384, 1.9896863232444828,
        1.9893185569368186, 1.988959779987179, 1.9886096667986732,
        1.9882679073103775, 1.9879342060816718, 1.9876082814405769,
        1.9872898646909385, 1.9869786993737677, 1.9866745405784678,
        1.9863771543000648, 1.9860863168388934, 1.9858018142395026,
        1.9855234417658298, 1.9852510034099262, 1.984984311431769,
        1.984723185927883, 1.984467454426692, 1.9842169515086827,
    ]
    q99 = [
        63.65674116287399, 9.92484320091807, 5.84090929975643,
        4.604094871415897, 4.032142983557536, 3.707428021324907,
        3.4994832973505026, 3.3553873313333957, 3.2498355440153697,
    ]
    for i, v in enumerate(q95):
        table[(0.95, i + 1)] = v
    for i, v in enumerate(q99):
        table[(0.99, i + 1)] = v
    return table


TSTAT_INTERVAL = _student_t_table()
