"""Model families: ready-made sequence simulators built on the op kernels."""

from .mrf import fisp_mrf_signal, fisp_mrf_dictionary
from .mse import mse_signal, cpmg_sequence
from .ssfp import spgr_sequence, dess_sequence
from .slice_profile import slice_profile_scales, fisp_mrf_dictionary_sliced

__all__ = [
    "fisp_mrf_signal", "fisp_mrf_dictionary",
    "mse_signal", "cpmg_sequence",
    "spgr_sequence", "dess_sequence",
    "slice_profile_scales", "fisp_mrf_dictionary_sliced",
]
