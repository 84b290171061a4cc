"""Sharded MRF dictionary matching.

Given a dictionary (atoms x pulses, L2-normalized fingerprints) and
measured signals (voxels x pulses), find for each voxel the atom with the
highest |inner product| -- the MRF reconstruction step.  The dictionary's
atom axis is sharded over the mesh; each device computes its shard's
correlations and the global argmax is a max-reduction over the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["dictionary_match", "compress_dictionary", "project_signals",
           "streamed_compress_dictionary", "save_compression",
           "load_compression"]


def dictionary_match(dict_re, dict_im, sig_re, sig_im, mesh: Mesh = None,
                     *, axis: str = "atoms", atom_chunk: int = None):
    """Best-matching atom index + correlation per voxel.

    Args:
        dict_re/dict_im: (B, P) dictionary fingerprints (split complex).
        sig_re/sig_im: (V, P) measured signals.
        mesh: optional mesh; dictionary sharded over `axis`.
        atom_chunk: optional atom-axis chunk size: the (V, B)
            correlation plane is the match's memory footprint (8192
            voxels x 1M atoms = 33 GB in f32 -- past HBM), so at
            dictionary scale the match runs as a lax.scan over atom
            chunks with a running (max, argmax) carry, materializing
            only (V, atom_chunk) per step.  Exact: ties resolve to the
            lowest atom index either way.  Applies per shard under a
            mesh.

    Returns:
        (indices (V,), correlations (V,)) -- global atom indices.

    The correlation |d^H s| uses the MXU: two (V, P) x (P, B) real matmuls
    per component.
    """
    def local_match(dre, dim, sre, sim):
        if atom_chunk and dre.shape[0] > atom_chunk:
            return _chunked_match(dre, dim, sre, sim, int(atom_chunk))
        # complex inner product via real matmuls (MXU path).  precision
        # "highest": the TPU default is bf16 passes (~4e-3 relative),
        # but close dictionary atoms are separated by 1e-4..1e-3 in
        # correlation (bSSFP T2 neighbors especially) — bf16 matmuls
        # flip those matches deterministically (measured: mrf_bssfp
        # 548->562 at ZERO noise).
        #
        # Re/im are STACKED on the contraction axis so the correlation
        # is TWO (V, 2P)x(2P, B) matmuls instead of four (V, P)x(P, B):
        # the (V, B) matmul outputs are the HBM bottleneck at serving
        # sizes (8192 voxels x 102400 atoms: 45.6 -> 24.8 ms measured,
        # bit-identical matches).
        hi = jax.lax.Precision.HIGHEST
        s_cat = jnp.concatenate([sre, sim], axis=1)       # (V, 2P)
        d_x = jnp.concatenate([dre, dim], axis=1)         # -> Re<d,s>
        d_y = jnp.concatenate([-dim, dre], axis=1)        # -> Im<d,s>
        x = jnp.matmul(s_cat, d_x.T, precision=hi)        # rr + ii
        y = jnp.matmul(s_cat, d_y.T, precision=hi)        # ir - ri
        # argmax + max on |corr|^2 fuse into ONE pass over the (V, B)
        # plane (take_along_axis would re-read it: +33%); sqrt on the
        # reduced vector only
        corr2 = x * x + y * y                             # (V, Blocal)
        best = jnp.argmax(corr2, axis=-1)
        val = jnp.sqrt(jnp.max(corr2, axis=-1))
        return best, val

    if mesh is None:
        return local_match(dict_re, dict_im, sig_re, sig_im)

    def shard_fn(dre, dim, sre, sim):
        nloc = dre.shape[0]
        best, val = local_match(dre, dim, sre, sim)
        best = best + jax.lax.axis_index(axis) * nloc
        # max-reduce (val, best) across shards
        allval = jax.lax.all_gather(val, axis)   # (nshards, V)
        allbest = jax.lax.all_gather(best, axis)
        w = jnp.argmax(allval, axis=0)           # (V,)
        idx = jnp.take_along_axis(allbest, w[None], axis=0)[0]
        v = jnp.take_along_axis(allval, w[None], axis=0)[0]
        return idx, v

    # check_vma=False: outputs are identical on all shards after the
    # all_gather + argmax reduction, but the checker can't infer that.
    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P()), check_vma=False,
    )(dict_re, dict_im, sig_re, sig_im)


def _chunked_match(dre, dim, sre, sim, C):
    """Atom-chunked |corr|^2 argmax: lax.scan over chunk offsets with a
    running (val, index) carry; only a (V, C) plane plus one (C, 2P)
    block is live per step.  The dictionary is sliced in place (no
    padded/concatenated copy: at the 1M-atom scale this function
    exists for, a duplicate would double HBM).  The last offset clamps
    to B - C, so its window overlaps the previous one; re-evaluated
    atoms produce identical corr values and the strict-> merge keeps
    the first occurrence — results match the one-shot argmax exactly."""
    hi = jax.lax.Precision.HIGHEST
    B = dre.shape[0]
    nc = -(-B // C)
    s_cat = jnp.concatenate([sre, sim], axis=1)            # (V, 2P)
    V = s_cat.shape[0]
    offs = jnp.minimum(jnp.arange(nc, dtype=jnp.int32) * C, B - C)

    def body(carry, off):
        best, val = carry
        br = jax.lax.dynamic_slice_in_dim(dre, off, C)     # (C, P)
        bi = jax.lax.dynamic_slice_in_dim(dim, off, C)
        bx = jnp.concatenate([br, bi], axis=1)             # -> Re<d,s>
        by = jnp.concatenate([-bi, br], axis=1)            # -> Im<d,s>
        x = jnp.matmul(s_cat, bx.T, precision=hi)
        y = jnp.matmul(s_cat, by.T, precision=hi)
        corr2 = x * x + y * y                              # (V, C)
        # int32 indices regardless of x64 mode (an HBM-resident
        # dictionary is far below 2^31 atoms); keeps the carry dtype
        # stable across backends
        am = jnp.argmax(corr2, axis=-1).astype(best.dtype)
        mx = jnp.max(corr2, axis=-1)
        take = mx > val
        best = jnp.where(take, am + off, best)
        val = jnp.where(take, mx, val)
        return (best, val), None

    init = (jnp.zeros((V,), jnp.int32), jnp.full((V,), -1.0, sre.dtype))
    (best, val), _ = jax.lax.scan(body, init, offs)
    return best, jnp.sqrt(jnp.maximum(val, 0.0))


def compress_dictionary(dict_re, dict_im, rank):
    """Rank-r SVD compression of an MRF dictionary (McGivney 2014).

    Computes the top-r right-singular subspace of the complex dictionary
    D (B, P) and projects the atoms onto it: matching in the compressed
    r-dimensional space preserves the inner products up to the discarded
    singular energy, cutting match FLOPs and memory by P/r (typical
    P=1000, r=25-50).

    TPU-first split: the (P, P) Gram matrix G = D^H D is computed ON
    DEVICE with four real MXU matmuls (the (B, P) dictionary never
    crosses the host boundary -- at 100k x 1000 that d2h alone is ~30 s
    through the tunnel); only the tiny Gram (2 x P x P floats) comes
    host-side for a NumPy Hermitian eigendecomposition, and the (P, r)
    basis goes back up for the device-side projection.

    Args:
        dict_re/dict_im: (B, P) dictionary fingerprints (split complex).
        rank: number of singular vectors r to keep.

    Returns:
        dict with "basis_re"/"basis_im" ((P, r) right-singular vectors),
        "cdict_re"/"cdict_im" ((B, r) compressed atoms, device arrays)
        and "energy" (fraction of total singular energy captured).
    """
    g_re, g_im = jax.device_get(_gram(jnp.asarray(dict_re),
                                      jnp.asarray(dict_im)))
    b_re, b_im, energy = _host_eigh_basis(g_re, g_im, rank)
    c_re, c_im = project_signals(b_re, b_im, dict_re, dict_im)
    return {"basis_re": b_re, "basis_im": b_im,
            "cdict_re": c_re, "cdict_im": c_im, "energy": energy}


@jax.jit
def _gram(dre, dim):
    """(P, P) Gram G = D^H D of a (B, P) split-complex dictionary block
    via four real MXU matmuls (HIGHEST: see local_match)."""
    hi = jax.lax.Precision.HIGHEST
    grr = jnp.matmul(dre.T, dre, precision=hi)
    gii = jnp.matmul(dim.T, dim, precision=hi)
    gri = jnp.matmul(dre.T, dim, precision=hi)
    gir = jnp.matmul(dim.T, dre, precision=hi)
    # G = D^H D = (Dr - i Di)^T (Dr + i Di)
    return grr + gii, gri - gir


def _host_eigh_basis(g_re, g_im, rank):
    """Top-`rank` eigenbasis of a Hermitian Gram (host-side NumPy;
    the Gram is tiny: 2 x P x P floats)."""
    import numpy as np

    G = np.asarray(g_re) + 1j * np.asarray(g_im)
    w, V = np.linalg.eigh((G + G.conj().T) / 2)   # ascending eigenvalues
    order = np.argsort(w)[::-1][:rank]
    basis = V[:, order]                            # (P, r)
    energy = float(np.clip(w[order], 0, None).sum()
                   / max(np.clip(w, 0, None).sum(), 1e-30))
    b_re = np.ascontiguousarray(basis.real, dtype=np.asarray(g_re).dtype)
    b_im = np.ascontiguousarray(basis.imag, dtype=np.asarray(g_re).dtype)
    return b_re, b_im, energy


@jax.jit
def _normalize_rows(dre, dim):
    """L2-normalize split-complex rows; returns (re, im, norms)."""
    n = jnp.sqrt(jnp.sum(dre * dre + dim * dim, axis=-1))
    safe = jnp.where(n == 0, 1.0, n)
    return dre / safe[:, None], dim / safe[:, None], n


@jax.jit
def _gram_accum(dre, dim, acc_re, acc_im):
    dre, dim, _ = _normalize_rows(dre, dim)
    g_re, g_im = _gram(dre, dim)
    return acc_re + g_re, acc_im + g_im


@jax.jit
def _project_block(b_re, b_im, dre, dim):
    dre, dim, n = _normalize_rows(dre, dim)
    c_re, c_im = project_signals(b_re, b_im, dre, dim)
    return c_re, c_im, n


def streamed_compress_dictionary(generate, nblocks, rank):
    """Rank-r compression of a dictionary too large to materialize.

    Two passes over generated atom blocks (the dictionary itself never
    exists as one (B, P) array — only one block at a time lives in HBM,
    and only the compressed (B, r) atoms plus per-atom norms persist):

    1. accumulate the (P, P) Gram of the row-NORMALIZED blocks on
       device (``sum_b D_b^H D_b`` — exactly the full dictionary's
       Gram), then the host eigendecomposition gives the same basis as
       :func:`compress_dictionary` on the normalized full dictionary;
    2. re-generate each block and project it onto the basis.

    Generation runs twice, but with the fused dictionary kernels a
    block costs milliseconds while materializing a 1M-atom x 1000-pulse
    dictionary would need 8 GB of HBM (and ~5 min of d2h through a
    tunnel at 25 MB/s if brought to host).

    Args:
        generate: ``generate(i) -> (re, im)`` UNnormalized split-complex
            (B_i, P) fingerprint block for ``i in range(nblocks)``;
            called twice per block (make it deterministic).  Blocks may
            differ in row count (each distinct B_i compiles once).
        nblocks: number of blocks.
        rank: singular vectors to keep.

    Returns:
        dict like :func:`compress_dictionary` — "basis_re"/"basis_im"
        (P, r), "cdict_re"/"cdict_im" (B, r) compressed NORMALIZED
        atoms (device arrays), "energy" — plus "norms" (B,) original
        atom norms, so :func:`~epgpy_tpu.parallel.mrf_reconstruct`
        can recover the proton-density scale without the full
        dictionary (pass ``dict_re=None``).
    """
    if nblocks < 1:
        raise ValueError("streamed_compress_dictionary: nblocks >= 1")
    return _streamed_impl(generate, nblocks, rank)


def save_compression(path, comp):
    """Persist a compression dict (compress_dictionary /
    streamed_compress_dictionary output) as one .npz — the serving
    artifact: at rank 32 it is ~P/32 smaller than the dictionary it
    replaces, and reloading skips both dictionary generation and the
    Gram eigendecomposition."""
    import numpy as np

    # ONE batched fetch: per-leaf device_get pays the ~25 ms tunnel
    # latency per transfer (CLAUDE.md fact 10)
    arrays = {k: np.asarray(v)
              for k, v in jax.device_get(dict(comp)).items()}
    np.savez_compressed(path, **arrays)


def load_compression(path):
    """Load a compression artifact saved by :func:`save_compression`.

    Basis leaves come back as host arrays, per-atom leaves as device
    arrays — ready for ``mrf_reconstruct(compression=...)`` (pass them
    as jit arguments in steady-state serving, see that docstring)."""
    import numpy as np

    with np.load(path) as data:
        comp = {k: data[k] for k in data.files}
    if "energy" in comp:
        comp["energy"] = float(comp["energy"])
    for k in ("cdict_re", "cdict_im", "norms"):
        if k in comp:
            comp[k] = jnp.asarray(comp[k])
    return comp


def _streamed_impl(generate, nblocks, rank):
    acc_re = acc_im = None
    for i in range(nblocks):
        dre, dim = (jnp.asarray(a) for a in generate(i))
        if acc_re is None:
            P = dre.shape[-1]
            acc_re = jnp.zeros((P, P), dre.dtype)
            acc_im = jnp.zeros((P, P), dre.dtype)
        acc_re, acc_im = _gram_accum(dre, dim, acc_re, acc_im)
    g_re, g_im = jax.device_get((acc_re, acc_im))
    b_re, b_im, energy = _host_eigh_basis(g_re, g_im, rank)
    parts = [_project_block(b_re, b_im, *(jnp.asarray(a)
                                          for a in generate(i)))
             for i in range(nblocks)]
    return {"basis_re": b_re, "basis_im": b_im,
            "cdict_re": jnp.concatenate([p[0] for p in parts]),
            "cdict_im": jnp.concatenate([p[1] for p in parts]),
            "norms": jnp.concatenate([p[2] for p in parts]),
            "energy": energy}


@jax.jit
def project_signals(basis_re, basis_im, sig_re, sig_im):
    """Project (V, P) signals onto the (P, r) compression basis: s V.

    Complex matmul as four real MXU matmuls (precision "highest": bf16
    default passes distort the projection by ~1e-3, above the
    correlation margins of close atoms); use on measured voxel signals
    before `dictionary_match` against the compressed dictionary (the
    same function -- compressed fingerprints are just shorter)."""
    hi = jax.lax.Precision.HIGHEST
    rr = jnp.matmul(sig_re, basis_re, precision=hi)
    ii = jnp.matmul(sig_im, basis_im, precision=hi)
    ri = jnp.matmul(sig_re, basis_im, precision=hi)
    ir = jnp.matmul(sig_im, basis_re, precision=hi)
    return rr - ii, ri + ir
