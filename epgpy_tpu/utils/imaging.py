"""Spatially-resolved readout: DFT of the F-state ladder.

Physics (parity target: reference epgpy/utils.py:12-115): the signal at
position ``r`` is the discrete Fourier sum of the transverse configuration
states, optionally weighted by the voxel shape (sinc for a box voxel) and
attenuated/modulated by the accumulated dephasing time (T2' / B0).

Static-shape redesign: the reference compresses near-zero k-columns with
boolean masks (dynamic shapes); here the mask multiplies instead --
identical sums, XLA-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config

__all__ = ["imaging", "dft"]


def _cexp(arr):
    return jax.lax.complex(jnp.cos(arr), jnp.sin(arr))


def _dft(f, k, pos):
    """sum_n f[..., n] exp(i k[..., n, :] . pos[..., :])."""
    kp = jnp.sum(k * pos[..., None, :], axis=-1)     # (..., nstate)
    return jnp.sum(f * _cexp(kp), axis=-1)


def imaging(positions, states, wavenumbers, acctime=None, *, phase=None,
            weights=None, modulation=None, voxel_shape="box", voxel_size=1,
            expand=True, reduce=True, tol=1e-8):
    """Imaging readout: DFT of F states at spatial positions.

    Args:
        positions: (..., npos, d) spatial positions (m); trailing position
            axes are inserted before the state axis when `expand`.
        states: (..., nstate) transverse states (F ladder).
        wavenumbers: (..., nstate, d) physical wavenumbers (rad/m).
        acctime: optional (..., nstate) accumulated dephasing times (ms).
        modulation: scalar/complex T2'/B0 modulation rate (1/ms [+ i kHz]).
        voxel_shape: "box" (sinc weighting) or "point".
        reduce: True -> sum all axes; int/tuple -> sum those axes;
            False/None -> no reduction.
        tol: accepted for reference API parity only.  The reference
            uses it to PRUNE near-zero voxel/modulation columns (a
            host-side speed optimization); the dense TPU implementation
            multiplies instead, so results always equal the reference
            at tol=0.

    Returns:
        image values (complex).
    """
    del tol  # see docstring: dense implementation needs no pruning
    rdt = config.real_dtype()
    F = jnp.asarray(states)
    k = jnp.asarray(wavenumbers, rdt)
    t = None if acctime is None else jnp.asarray(acctime, rdt)

    pos = jnp.asarray(positions, rdt)
    if pos.ndim == 1:
        pos = pos[..., None]
    if expand:
        # insert position batch dims before the state axis
        dims = pos.ndim - 1
        F = F.reshape(F.shape[:-1] + (1,) * dims + F.shape[-1:])
        k = k.reshape(k.shape[:-2] + (1,) * dims + k.shape[-2:])
        if t is not None:
            t = t.reshape(t.shape[:-1] + (1,) * dims + t.shape[-1:])

    # voxel shape weighting
    if voxel_shape == "point":
        voxel = jnp.asarray(1.0, rdt)
    elif voxel_shape == "box":
        voxel = jnp.prod(jnp.sinc(k * voxel_size / 2 / jnp.pi), axis=-1)
    else:
        raise ValueError(f"Unknown voxel shape: {voxel_shape}")

    # T2'/B0 modulation from accumulated time.  The modulation array is
    # aligned with the BATCH dims (e.g. a per-tissue rate on a tissue
    # batch axis): pad it with the inserted position dims + the state
    # axis so it does not leak onto the position axis (reference wire
    # format: System stores (1, 3); the probe passes (1, 3, 1) and
    # imaging appends the state axis -> (1, 3, 1, 1)).
    if t is not None:
        modv = jnp.asarray(1.0 if modulation is None else modulation)
        dims = (pos.ndim - 1) if expand else 0
        modv = modv.reshape(modv.shape + (1,) * (dims + 1))
        mod = jnp.exp(-jnp.abs(t) * jnp.real(modv))
        if jnp.iscomplexobj(modv):
            freq = t * 2 * jnp.pi * jnp.imag(modv)
            mod = mod * _cexp(freq)
    else:
        mod = jnp.asarray(1.0, rdt)

    if phase is not None:
        mod = mod * jnp.exp(1j * jnp.asarray(phase) * jnp.pi / 180)

    kdim = pos.shape[-1]
    im = _dft(voxel * mod * F, k[..., :kdim], pos)

    if weights is not None:
        im = im * jnp.asarray(weights)

    if reduce is True:
        return jnp.sum(im)
    if reduce is not False and reduce is not None:
        return jnp.sum(im, axis=reduce)
    return im


def dft(coords, states, wavenumbers, *, reduce=False):
    """Point-voxel DFT (reference epgpy/utils.py:113-115)."""
    return imaging(coords, states, wavenumbers, reduce=reduce,
                   voxel_shape="point")
