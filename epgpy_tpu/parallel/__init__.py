"""Multi-device execution: meshes, sharded dictionaries, CRLB training.

The reference has no distributed layer at all (SURVEY.md §2.9): its only
scale-out is NumPy broadcasting plus a commented-out multiprocessing split
of derivative pairs (reference epgpy/functions.py:195-248).  The TPU-native
equivalents here:

* atom-axis data parallelism over a ``jax.sharding.Mesh`` (ICI collectives
  inserted by XLA) -- dictionaries, matching;
* tangent-axis sharding of wide ``jacfwd`` Jacobians (the per-pulse
  flip-angle derivative axis of MRF sequence optimization) -- the compiled
  analog of the reference's mp.Pool order-2 split.
"""

from .mesh import make_mesh, atom_sharding
from .crlb import (crlb_train_step, fingerprint_crlb_loss,
                   mrf_design_loss, mrf_design_step, mrf_design_slsqp,
                   mrf_design_loss_grad_fused,
                   mse_design_loss_grad_fused, tse_design_slsqp)
from .match import (dictionary_match, compress_dictionary,
                    project_signals, streamed_compress_dictionary,
                    save_compression, load_compression)
from .recon import mrf_reconstruct, gauss_newton_refine
from .t2spectrum import t2_basis, nnls, t2_spectrum_map

__all__ = [
    "make_mesh", "atom_sharding",
    "crlb_train_step", "fingerprint_crlb_loss",
    "mrf_design_loss", "mrf_design_step", "mrf_design_slsqp",
    "mrf_design_loss_grad_fused",
    "mse_design_loss_grad_fused", "tse_design_slsqp",
    "dictionary_match", "compress_dictionary", "project_signals",
    "streamed_compress_dictionary", "save_compression",
    "load_compression",
    "mrf_reconstruct", "gauss_newton_refine",
    "t2_basis", "nnls", "t2_spectrum_map",
]
