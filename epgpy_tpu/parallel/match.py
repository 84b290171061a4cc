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

__all__ = ["dictionary_match"]


def dictionary_match(dict_re, dict_im, sig_re, sig_im, mesh: Mesh = None,
                     *, axis: str = "atoms"):
    """Best-matching atom index + correlation per voxel.

    Args:
        dict_re/dict_im: (B, P) dictionary fingerprints (split complex).
        sig_re/sig_im: (V, P) measured signals.
        mesh: optional mesh; dictionary sharded over `axis`.

    Returns:
        (indices (V,), correlations (V,)) -- global atom indices.

    The correlation |d^H s| uses the MXU: two (V, P) x (P, B) real matmuls
    per component.
    """
    def local_match(dre, dim, sre, sim):
        # complex inner product via real matmuls (MXU path)
        rr = sre @ dre.T
        ii = sim @ dim.T
        ri = sre @ dim.T
        ir = sim @ dre.T
        corr = jnp.sqrt((rr + ii) ** 2 + (ir - ri) ** 2)  # (V, Blocal)
        best = jnp.argmax(corr, axis=-1)
        val = jnp.take_along_axis(corr, best[:, None], axis=-1)[:, 0]
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
