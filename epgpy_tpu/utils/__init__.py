"""Auxiliary utilities: constants, imaging, IO, helpers."""

from .constants import gamma_1H, gamma_23Na
from .helpers import (
    Axes, get_norm, get_wavenumber, spatial_range, space_to_freq, freq_to_space,
)
from .imaging import imaging, dft
from .pulseio import load_pulse, read_pulse, resample_pulse
from .magnettransfer import saturation_rate, absorption_rate

__all__ = [
    "gamma_1H", "gamma_23Na", "Axes", "get_norm", "get_wavenumber",
    "spatial_range", "space_to_freq", "freq_to_space",
    "imaging", "dft", "load_pulse", "read_pulse", "resample_pulse",
    "saturation_rate", "absorption_rate",
]
