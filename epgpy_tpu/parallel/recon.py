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

from functools import partial

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
                    compression=None, atom_chunk=None):
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
        atom_chunk: optional atom-axis chunking for the match (see
            dictionary_match) -- required at dictionary scales where
            the (V, B) correlation plane exceeds HBM (e.g. 1M atoms x
            8k voxels); results are exact.
        compression: reuse the "compression" dict of a previous call
            or of :func:`~epgpy_tpu.parallel.streamed_compress_dictionary`
            (serving: compress ONCE, then match batch after batch --
            the Gram eigendecomposition is host-side and would
            otherwise dominate).  With it the whole call is pure jnp:
            wrap in jax.jit for steady-state serving (required when a
            mesh is given on the axon backend -- eager shard_map fails
            there).  IMPORTANT at scale: pass the dictionary AND the
            compression leaves as jit ARGUMENTS, not closure captures
            -- captured device arrays are baked into the program as
            constants, and at 100k x 1000 the remote-compile payload
            is rejected (~400 MB).  The serving idiom::

                comp = mrf_reconstruct(s0_re, s0_im, dre, dim,
                                       rank=32)["compression"]
                keys = tuple(sorted(comp))

                @jax.jit
                def serve(sre, sim, dre, dim, prm, *cvals):
                    return mrf_reconstruct(
                        sre, sim, dre, dim, prm,
                        compression=dict(zip(keys, cvals)))

                out = serve(sre, sim, dre, dim, grid,
                            *(comp[k] for k in keys))

            Dictionary-free serving: when ``compression`` came from
            :func:`~epgpy_tpu.parallel.streamed_compress_dictionary`
            (it carries per-atom "norms"), pass ``dict_re=None,
            dict_im=None`` — the proton-density scale is then computed
            in the compressed space, ``pd = <c_idx, v> / norms[idx]``
            (exact up to the discarded singular energy), and the full
            (B, P) dictionary is never needed.

    Returns dict:
        "index" (V,) matched atom ids; "corr" (V,) |normalized inner
        product| in [0, 1]; "pd_re"/"pd_im" (V,) complex proton-density
        scale s.t. pd * dict[index] ~= signal; "maps" (V, npar) when
        atom_params is given; "energy" + "compression" (rank= only).
    """
    f = jnp.asarray
    sig_re, sig_im = f(sig_re), f(sig_im)
    if dict_re is None or dict_im is None:
        if compression is None or "norms" not in compression:
            raise ValueError(
                "mrf_reconstruct: dict_re=None requires compression= "
                "from streamed_compress_dictionary (with 'norms')")
    else:
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
    idx, val = dictionary_match(mre, mim, vre, vim, mesh, axis=axis,
                                atom_chunk=atom_chunk)
    out["index"] = idx
    out["corr"] = val / jnp.where(snorm == 0, 1.0, snorm)

    if dict_re is None:
        # dictionary-free (streamed compression): pd = <d, s> / <d, d>
        # with d = norms[idx] * d_hat and <d_hat, s> ~= <c_idx, v> (the
        # projection is orthogonal, so the error is the atom's energy
        # outside the rank-r subspace)
        cre_m = jnp.take(compression["cdict_re"], idx, axis=0)
        cim_m = jnp.take(compression["cdict_im"], idx, axis=0)
        num_re = jnp.sum(cre_m * vre + cim_m * vim, axis=-1)
        num_im = jnp.sum(cre_m * vim - cim_m * vre, axis=-1)
        n_m = jnp.take(f(compression["norms"]), idx, axis=0)
        n_m = jnp.where(n_m == 0, 1.0, n_m)
        out["pd_re"], out["pd_im"] = num_re / n_m, num_im / n_m
    else:
        # complex PD against the matched UNnormalized atom, in the full
        # (uncompressed) space: pd = <d, s> / <d, d>
        dre_m = jnp.take(dict_re, idx, axis=0)
        dim_m = jnp.take(dict_im, idx, axis=0)
        out["pd_re"], out["pd_im"] = _pd_scale(dre_m, dim_m,
                                               sig_re, sig_im)

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

    The normal equations + batched solve + clip run ON DEVICE (one
    jitted update per iteration); signal_and_jac may return device
    arrays to keep the whole loop free of bulk d2h transfers (it
    receives theta as a small host array so operator construction from
    it keeps the fused kernel-dispatch matchers engaged).

    Returns refined theta (npar, V) as a NumPy array.
    """
    theta = jnp.asarray(np.asarray(theta0, np.float32))
    npar = int(theta.shape[0])
    sig_re = jnp.asarray(np.asarray(sig_re, np.float32))
    sig_im = jnp.asarray(np.asarray(sig_im, np.float32))
    if bounds is not None:
        b = np.asarray(bounds, float)
        lo = jnp.asarray(b[:, 0], jnp.float32)
        hi = jnp.asarray(b[:, 1], jnp.float32)
    else:
        lo = hi = jnp.zeros((npar,), jnp.float32)
    damping = jnp.float32(damping)
    for _ in range(iters):
        # theta goes to the model as a HOST array (tiny): op parameters
        # built from host leaves keep the kernel-dispatch matchers
        # engaged (they bail on device leaves to avoid d2h probes)
        (re, im), (jre, jim) = signal_and_jac(np.asarray(theta))
        theta = _gn_update(theta, jnp.asarray(re), jnp.asarray(im),
                           jnp.asarray(jre), jnp.asarray(jim),
                           sig_re, sig_im, damping, lo, hi,
                           solve_scale=bool(solve_scale),
                           use_bounds=bounds is not None)
    return np.asarray(jax.device_get(theta))


@partial(jax.jit, static_argnames=("solve_scale", "use_bounds"))
def _gn_update(theta, re, im, jre, jim, sig_re, sig_im, damping, lo, hi,
               *, solve_scale, use_bounds):
    """One damped GN step, entirely on device (normal equations +
    batched solve); re/im (N, V), jre/jim (N, V, npar), theta (npar, V)."""
    hiprec = jax.lax.Precision.HIGHEST
    if solve_scale:
        # c = <s, y> / <s, s> per voxel (complex inner products)
        num_re = jnp.sum(re * sig_re + im * sig_im, axis=0)
        num_im = jnp.sum(re * sig_im - im * sig_re, axis=0)
        den = jnp.maximum(jnp.sum(re * re + im * im, axis=0), 1e-30)
        cre, cim = num_re / den, num_im / den
        re, im = (cre * re - cim * im, cre * im + cim * re)
        jre, jim = (cre[:, None] * jre - cim[:, None] * jim,
                    cre[:, None] * jim + cim[:, None] * jre)
    rr = sig_re - re                            # (N, V)
    ri = sig_im - im
    # normal equations on the complex residual: A = Re(J^H J),
    # g = Re(J^H r) -- both accumulate the re/im channels
    A = (jnp.einsum("nvi,nvj->vij", jre, jre, precision=hiprec)
         + jnp.einsum("nvi,nvj->vij", jim, jim, precision=hiprec))
    g = (jnp.einsum("nvi,nv->vi", jre, rr, precision=hiprec)
         + jnp.einsum("nvi,nv->vi", jim, ri, precision=hiprec))
    di = jnp.arange(A.shape[-1])
    diag = jnp.maximum(A[:, di, di], 1e-12)
    A = A.at[:, di, di].add(damping * diag)
    delta = jnp.linalg.solve(A, g[..., None])[..., 0]   # (V, npar)
    theta = theta + delta.T
    if use_bounds:
        theta = jnp.clip(theta, lo[:, None], hi[:, None])
    return theta
