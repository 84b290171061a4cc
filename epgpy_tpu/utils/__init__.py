"""Auxiliary utilities: constants, imaging, IO, helpers."""

from .constants import gamma_1H, gamma_23Na
from .helpers import (
    Axes, get_norm, get_wavenumber, spatial_range, space_to_freq, freq_to_space,
)
# NOTE: the `imaging` and `ilt1d` *functions* are intentionally not
# re-exported here -- they would shadow their submodules; import them from
# the top-level package or the submodule directly.
from .imaging import dft
from .pulseio import load_pulse, read_pulse, resample_pulse
from .magnettransfer import saturation_rate, absorption_rate
from .ilt1d import ilt1d_ls, flt1d, ilt1d_crb, quasi_continuous

__all__ = [
    "gamma_1H", "gamma_23Na", "Axes", "get_norm", "get_wavenumber",
    "spatial_range", "space_to_freq", "freq_to_space",
    "dft", "load_pulse", "read_pulse", "resample_pulse",
    "saturation_rate", "absorption_rate",
    "flt1d", "ilt1d_crb", "quasi_continuous",
]
