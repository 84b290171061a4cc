"""Small conversion helpers (reference epgpy/utils.py:134-213)."""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np

from .constants import gamma_1H

__all__ = [
    "Axes", "get_norm", "get_wavenumber",
    "spatial_range", "space_to_freq", "freq_to_space", "cexp",
]


def Axes(*names):
    """Create an IntEnum mapping axis names to indices (starting at 0)."""
    return enum.IntEnum("Axes", names, start=0)


def get_norm(states):
    """State-matrix norm over the (F-, Z) components."""
    return jnp.sqrt(jnp.sum(jnp.abs(jnp.asarray(states)[..., 1:]) ** 2, axis=(-2, -1)))


def cexp(arr):
    """exp(1j * arr) for real arr."""
    return jax.lax.complex(jnp.cos(arr), jnp.sin(arr))


def get_wavenumber(grad, duration, gamma=gamma_1H):
    """Wavenumber (rad/m) from gradient (mT/m) applied for duration (ms)."""
    return 2 * np.pi * gamma * np.asarray(grad) * 1e-3 * np.asarray(duration)


def spatial_range(fov, nvalue=100):
    """Array of `nvalue` positions spanning `fov` (mm), centered."""
    return fov * np.linspace(-0.5, 0.5, nvalue)


def space_to_freq(grad, positions, *, gamma=gamma_1H):
    """Positions (mm) under gradient (mT/m) -> off-resonance (kHz)."""
    if not np.isscalar(positions):
        positions = np.asarray(positions)
    return grad * 1e-6 * gamma * positions


def freq_to_space(grad, frequencies, *, gamma=gamma_1H):
    """Inverse of space_to_freq."""
    return frequencies / grad / gamma * 1e6


def progressbar(it, prefix="", size=50, out=None):
    """Textual progress bar over an iterable (eager simulation only)."""
    import sys
    out = out or sys.stdout
    items = list(it)
    count = max(len(items), 1)

    def show(j):
        x = int(size * j / count)
        print(f"{prefix}[{'#' * x}{'.' * (size - x)}] {j}/{count}",
              end="\r", file=out, flush=True)

    show(0)
    for i, item in enumerate(items):
        yield item
        show(i + 1)
    print(file=out, flush=True)
