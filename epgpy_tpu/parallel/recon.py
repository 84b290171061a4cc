"""End-to-end MRF map reconstruction: the production serving pipeline.

The reference stops at simulation -- its MRF examples hand-roll the
argmax inner-product match in NumPy (reference
examples/sequence/optim_mrf.py builds dictionaries but never
reconstructs).  Here the whole serving step is one call:

    normalize -> [rank-r SVD compression] -> sharded match ->
    complex PD scale -> [per-voxel damped Gauss-Newton refinement]

Everything device-side except the tiny Gram eigendecomposition
(compress_dictionary) and the final map gather; the dictionary's atom
axis shards over the mesh (XLA inserts the ICI collectives); matching
uses HIGHEST-precision MXU matmuls (bf16 default passes flip matches
between close atoms -- see parallel/match.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .match import compress_dictionary, dictionary_match, project_signals

__all__ = ["mrf_reconstruct", "gauss_newton_refine"]


@jax.jit
def _row_norms(re, im):
    return jnp.sqrt(jnp.sum(re * re + im * im, axis=-1))


@jax.jit
def _pd_scale(dre, dim, sre, sim):
    """Complex proton-density scale <d, s> / <d, d> per row pair."""
    hi = jax.lax.Precision.HIGHEST
    num_re = jnp.einsum("vp,vp->v", dre, sre, precision=hi) \
        + jnp.einsum("vp,vp->v", dim, sim, precision=hi)
    num_im = jnp.einsum("vp,vp->v", dre, sim, precision=hi) \
        - jnp.einsum("vp,vp->v", dim, sre, precision=hi)
    den = jnp.sum(dre * dre + dim * dim, axis=-1)
    den = jnp.where(den == 0, 1.0, den)
    return num_re / den, num_im / den


def mrf_reconstruct(sig_re, sig_im, dict_re, dict_im, atom_params=None,
                    *, mesh=None, axis="atoms", rank=None,
                    compression=None):
    """Match measured fingerprints against a dictionary; produce maps.

    Args:
        sig_re/sig_im: (V, P) measured voxel fingerprints (split
            complex; real acquisitions pass sig_im=0).
        dict_re/dict_im: (B, P) dictionary fingerprints (UNnormalized --
            normalization happens here so the proton-density scale can
            be recovered).
        atom_params: optional (B, npar) grid values (T1, T2, ...) --
            matched rows are gathered into per-voxel maps.
        mesh: optional jax.sharding.Mesh; the atom axis shards over
            ``axis``.
        rank: optional SVD compression rank (McGivney 2014): matching
            runs in the r-dim subspace (P/r fewer FLOPs + bytes).
        compression: reuse the "compression" dict of a previous call
            (serving: compress ONCE, then match batch after batch --
            the Gram eigendecomposition is host-side and would
            otherwise dominate).  With it the whole call is pure jnp:
            wrap in jax.jit for steady-state serving (required when a
            mesh is given on the axon backend -- eager shard_map fails
            there).

    Returns dict:
        "index" (V,) matched atom ids; "corr" (V,) |normalized inner
        product| in [0, 1]; "pd_re"/"pd_im" (V,) complex proton-density
        scale s.t. pd * dict[index] ~= signal; "maps" (V, npar) when
        atom_params is given; "energy" + "compression" (rank= only).
    """
    f = jnp.asarray
    sig_re, sig_im = f(sig_re), f(sig_im)
    dict_re, dict_im = f(dict_re), f(dict_im)

    out = {}
    if compression is not None:
        comp = compression
        mre, mim = comp["cdict_re"], comp["cdict_im"]
        vre, vim = project_signals(comp["basis_re"], comp["basis_im"],
                                   sig_re, sig_im)
    elif rank is not None:
        dnorm = _row_norms(dict_re, dict_im)
        safe = jnp.where(dnorm == 0, 1.0, dnorm)
        comp = compress_dictionary(dict_re / safe[:, None],
                                   dict_im / safe[:, None], rank)
        mre, mim = comp["cdict_re"], comp["cdict_im"]
        vre, vim = project_signals(comp["basis_re"], comp["basis_im"],
                                   sig_re, sig_im)
        out["energy"] = comp["energy"]
        out["compression"] = comp
    else:
        dnorm = _row_norms(dict_re, dict_im)
        safe = jnp.where(dnorm == 0, 1.0, dnorm)
        mre, mim = dict_re / safe[:, None], dict_im / safe[:, None]
        vre, vim = sig_re, sig_im

    snorm = _row_norms(sig_re, sig_im)
    idx, val = dictionary_match(mre, mim, vre, vim, mesh, axis=axis)
    out["index"] = idx
    out["corr"] = val / jnp.where(snorm == 0, 1.0, snorm)

    # complex PD against the matched UNnormalized atom, in the full
    # (uncompressed) space: pd = <d, s> / <d, d>
    dre_m = jnp.take(dict_re, idx, axis=0)
    dim_m = jnp.take(dict_im, idx, axis=0)
    out["pd_re"], out["pd_im"] = _pd_scale(dre_m, dim_m, sig_re, sig_im)

    if atom_params is not None:
        out["maps"] = jnp.take(f(atom_params), idx, axis=0)
    return out


def gauss_newton_refine(signal_and_jac, theta0, sig_re, sig_im, *,
                        iters=6, damping=1e-3, bounds=None,
                        solve_scale=False):
    """Per-voxel damped Gauss-Newton refinement of matched parameters.

    Off-grid accuracy beyond the dictionary step: pairs with the fused
    Jacobian dispatch/kernels (FISP/CPMG/bSSFP/EPG-X families), which
    produce dS/dtheta for ALL voxels in one device pass per iteration.

    Args:
        signal_and_jac: theta (npar, V) -> ((re, im), (jre, jim)) with
            signal (N, V) and Jacobian (N, V, npar) (split complex).
        theta0: (npar, V) initial parameters (e.g. recon["maps"].T).
        sig_re/sig_im: (N, V) measured fingerprints.
        iters, damping: GN iterations / Levenberg diagonal damping.
        bounds: optional (npar, 2) box constraints.
        solve_scale: solve the per-voxel complex proton-density scale c
            in closed form each iteration (min ||y - c s||; variable
            projection) and refine theta on the scaled residual -- use
            when the model does NOT fold PD in (the usual MRF fit).

    Returns refined theta (npar, V) as a NumPy array.
    """
    theta = np.array(theta0, float)
    npar = theta.shape[0]
    sig_re = np.asarray(sig_re, float)
    sig_im = np.asarray(sig_im, float)
    for _ in range(iters):
        (re, im), (jre, jim) = signal_and_jac(theta)
        batch = [np.asarray(a, float)
                 for a in jax.device_get((re, im, jre, jim))]
        re, im, jre, jim = batch
        if solve_scale:
            # c = <s, y> / <s, s> per voxel (complex inner products)
            num_re = np.sum(re * sig_re + im * sig_im, axis=0)
            num_im = np.sum(re * sig_im - im * sig_re, axis=0)
            den = np.maximum(np.sum(re * re + im * im, axis=0), 1e-30)
            cre, cim = num_re / den, num_im / den
            re, im = (cre * re - cim * im, cre * im + cim * re)
            jre, jim = (cre[:, None] * jre - cim[:, None] * jim,
                        cre[:, None] * jim + cim[:, None] * jre)
        rr = sig_re - re                            # (N, V)
        ri = sig_im - im
        # normal equations on the complex residual: A = Re(J^H J),
        # g = Re(J^H r) -- both accumulate the re/im channels
        A = (np.einsum("nvi,nvj->vij", jre, jre)
             + np.einsum("nvi,nvj->vij", jim, jim))
        g = (np.einsum("nvi,nv->vi", jre, rr)
             + np.einsum("nvi,nv->vi", jim, ri))
        diag = np.maximum(A[:, np.arange(npar), np.arange(npar)], 1e-12)
        A[:, np.arange(npar), np.arange(npar)] += damping * diag
        delta = np.linalg.solve(A, g[..., None])[..., 0]   # (V, npar)
        theta = theta + delta.T
        if bounds is not None:
            for p in range(npar):
                theta[p] = np.clip(theta[p], bounds[p][0], bounds[p][1])
    return theta
