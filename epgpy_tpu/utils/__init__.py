"""Auxiliary utilities: constants, imaging, IO, helpers."""

from .constants import gamma_1H, gamma_23Na
from .helpers import (
    Axes, get_norm, get_wavenumber, spatial_range, space_to_freq, freq_to_space,
)

__all__ = [
    "gamma_1H", "gamma_23Na", "Axes", "get_norm", "get_wavenumber",
    "spatial_range", "space_to_freq", "freq_to_space",
]
