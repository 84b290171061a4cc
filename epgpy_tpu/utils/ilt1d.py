"""1-D inverse Laplace transform by the matrix-pencil method.

Recovers discrete relaxation components ``signal(t) = sum_i a_i e^{-r_i t}``
from regularly sampled decay data (semantics target: reference
epgpy/utilities/ilt1d.py; used for relaxation-exchange spectra).

Pipeline: Hankel shift-pencil -> truncated SVD -> pencil eigenvalues ->
physical-rate filtering -> nonlinear least-squares refinement with exact
JAX gradients (the reference hand-derives the Jacobian) -> CRB error bars
from the autodiff Fisher matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ilt1d", "ilt1d_ls", "flt1d", "ilt1d_crb", "quasi_continuous",
           "get_bounds", "get_kernel", "get_resolution"]


def _tsvd(M, tol=1e-5):
    """Truncated SVD: keep the smallest rank with mean residual^2 < tol."""
    u, d, v = np.linalg.svd(M, full_matrices=False)
    resid = np.array([
        np.sum((M - (u[:, :k] * d[:k]) @ v[:k]) ** 2) for k in range(len(d))
    ]) / M.size
    keep = int(np.argmax(resid < tol))
    keep = max(keep, 1)
    return u[:, :keep], d[:keep], v[:keep]


def get_bounds(times, tol=5e-1):
    """Recoverable rate range from the sampling window.

    A rate is observable if its decay loses at least ``tol`` of its
    amplitude over the window (lower bound) and keeps at least ``tol``
    over one sampling step (upper bound) -- reference
    epgpy/utilities/ilt1d.py:21-28.
    """
    times = np.asarray(times, float)
    mindt = float(np.min(np.diff(times)))
    span = float(np.ptp(times))
    return (-np.log1p(-tol) / span, -np.log(tol) / mindt)


def get_kernel(times, bounds, num):
    """(rates, kernel): geometric rate grid and its exp(-t r) kernel
    (reference epgpy/utilities/ilt1d.py:31-36)."""
    times = np.asarray(times, float)
    rates = np.geomspace(bounds[0], bounds[1], num)
    return rates, np.exp(-np.outer(times, rates))


def get_resolution(times, bounds, *, tol=1e-3, ncurve=100):
    """Smallest geometric kernel that represents every decay in `bounds`
    to within ``tol``: grow the rate count until the least-squares
    projection error of a dense probe set drops below tolerance
    (reference epgpy/utilities/ilt1d.py:39-58).  Returns (res, num)
    with res the rate ratio between adjacent kernel columns.
    """
    probes = np.geomspace(bounds[0], bounds[1], ncurve)
    y = np.exp(-np.outer(np.asarray(times, float), probes))
    num = 2
    while True:
        rates, K = get_kernel(times, bounds, num)
        coef, *_ = np.linalg.lstsq(K.T @ K, K.T @ y, rcond=None)
        err = float(np.linalg.norm(K @ coef - y, axis=0).max())
        if err < tol or num >= ncurve:
            return rates[1] / rates[0], num
        num += 1


def ilt1d(times, signal, *, bounds=None, kernel=None, tol=1e-5, ls=True):
    """Inverse Laplace transform: (rates, amplitudes) of the decay mixture.

    Args:
        times: (Nt,) regular sample times.
        signal: (Nt,) real decay samples.
        bounds: (rmin, rmax) admissible rates; default from the window.
        kernel: optional (Nt', num) exponential kernel (get_kernel);
            its row count sizes the Hankel pencil window (reference
            semantics) -- by default one is derived via get_resolution.
        ls: refine (rates, amplitudes) by nonlinear least squares.
    """
    t = np.asarray(times, float)
    y = np.asarray(signal, float)
    if t.size != y.shape[0]:
        raise ValueError("times and signal lengths differ")
    if np.ptp(np.diff(t)) > 1e-8 * max(abs(t[-1]), 1):
        raise ValueError("Non-regular time sampling")
    dt = t[1] - t[0]
    bounds = bounds or get_bounds(t)
    if kernel is None:
        _, num = get_resolution(t, bounds)
        _, kernel = get_kernel(t, bounds, num)

    # Hankel shift pencil, window sized by the kernel's time support
    n = min(kernel.shape[0], t.size)
    L = n // 2
    Y1 = np.stack([y[i:i + L] for i in range(L)], axis=1)
    Y2 = np.stack([y[i + 1:i + L + 1] for i in range(L)], axis=1)

    U, d, V = _tsvd(Y1, tol=tol)
    p = len(d)
    pencil = (U.T / d[:, None]) @ Y2 @ V.T
    zs = np.linalg.eigvals(pencil)

    # keep physical eigenvalues: real, within the admissible decay range
    zmin = np.exp(-dt * bounds[1])
    zmax = np.exp(-dt * bounds[0])
    keep = np.isclose(zs.imag, 0, atol=1e-8) & (zs.real >= zmin) & (zs.real <= zmax)
    if keep.any():
        zs = np.sort(zs[keep].real)[:p]
    else:
        zs = np.asarray([np.max(zs.real)])
    rates = -np.log(np.abs(zs)) / dt

    if ls:
        return ilt1d_ls(t, y, rates)

    # direct amplitudes from the pencil residues.  Y2 is the SHIFTED
    # Hankel matrix (Y2[i, j] = y[i+j+1]), so its residues carry one
    # extra decay step z_m = e^{-r_m dt}: divide it back out (the
    # reference's identical code omits this and under-reports fast
    # components by exp(-r dt) -- 22% at r dt = 0.25, measured)
    Z = np.linalg.pinv(zs[:, None] ** np.arange(L)).T
    A = Z @ Y2 @ Z.T
    amps = np.diag(A) / zs
    pos = amps > 0
    return rates[pos], amps[pos]


def _vp_cost(log_r, t, y):
    """Variable-projection cost: rates nonneg via log parametrization."""
    r = jnp.exp(log_r)
    R = jnp.exp(-jnp.outer(t, r))
    gram = R.T @ R + 1e-12 * jnp.eye(r.shape[0])
    Ry = R.T @ y
    return jnp.dot(y, y) - Ry @ jnp.linalg.solve(gram, Ry)


def ilt1d_ls(times, signal, rates):
    """Nonlinear LS refinement of rates (variable projection, jax grads)."""
    t = jnp.asarray(times, float)
    y = jnp.asarray(signal, float)
    rates = np.maximum(np.asarray(rates, float), 1e-12)

    fn = jax.jit(jax.value_and_grad(lambda lr: _vp_cost(lr, t, y)))
    try:
        from scipy import optimize
        res = optimize.minimize(
            lambda lr: tuple(np.asarray(v, dtype=float) for v in fn(jnp.asarray(lr))),
            np.log(rates), jac=True, method="L-BFGS-B")
        r = np.exp(res.x)
    except ImportError:  # pragma: no cover - scipy is available in practice
        lr = jnp.log(jnp.asarray(rates))
        for _ in range(200):
            _, g = fn(lr)
            lr = lr - 0.1 * g
        r = np.exp(np.asarray(lr))

    R = np.exp(-np.outer(np.asarray(t), r))
    a = np.linalg.solve(R.T @ R + 1e-12 * np.eye(len(r)), R.T @ np.asarray(y))
    nonzero = (r > 1e-8) & (a > 1e-8)
    return r[nonzero], a[nonzero]


def flt1d(times, rates, amplitudes):
    """Forward Laplace transform: sum_i a_i e^{-r_i t}."""
    t = np.asarray(times)
    return np.sum(np.asarray(amplitudes) * np.exp(-np.outer(t, np.asarray(rates))),
                  axis=1)


def ilt1d_crb(times, signal, rates, amps, *, sigma2=None):
    """Cramer-Rao bounds of (rates, amps) via the autodiff Fisher matrix."""
    t = jnp.asarray(times, float)
    y = np.asarray(signal, float)
    theta = jnp.concatenate([jnp.asarray(rates, float), jnp.asarray(amps, float)])
    nr = len(rates)

    def model(theta):
        r, a = theta[:nr], theta[nr:]
        return jnp.sum(a * jnp.exp(-jnp.outer(t, r)), axis=1)

    J = np.asarray(jax.jacfwd(model)(theta))
    if sigma2 is None:
        resid = y - np.asarray(model(theta))
        dof = max(len(y) - 2 * nr, 1)
        sigma2 = float(resid @ resid) / dof
    fisher = J.T @ J / sigma2
    cov = np.linalg.inv(fisher + 1e-30 * np.eye(2 * nr))
    sd = np.sqrt(np.diag(cov))
    return sd[:nr], sd[nr:]


def quasi_continuous(rates, amps, *, rgrid=None, nbin=200, width=0.05):
    """Render a discrete rate spectrum on a log grid (gaussian kernels)."""
    rates = np.asarray(rates, float)
    amps = np.asarray(amps, float)
    if rgrid is None:
        lo = np.log10(max(rates.min() / 10, 1e-12))
        hi = np.log10(rates.max() * 10)
        rgrid = np.logspace(lo, hi, nbin)
    logg = np.log10(rgrid)
    spec = np.zeros_like(rgrid)
    for r, a in zip(rates, amps):
        spec += a * np.exp(-0.5 * ((logg - np.log10(r)) / width) ** 2)
    return rgrid, spec
