"""Slice-profile-corrected MRF dictionaries.

A real slice-selective RF pulse does not tip the whole voxel by its
nominal flip angle: across the slice, a position z sees an effective
flip ``alpha_eff(z) = alpha_nom * p(z)`` set by the pulse envelope and
the slice-select gradient.  Simulating the MRF train with the shaped
pulse each TR (reference epgpy/rfpulse.py:37-197 hard-pulse trains) is
exact but costs one sub-rotation scan per waveform sample per TR; the
standard correction (Ma et al., MRM 2017: "Slice profile and B1
corrections in 2D magnetic resonance fingerprinting") simulates the
train at a handful of z positions with the IDEAL pulse scaled by p(z)
and sums the signals over the slice.

Because p(z) multiplies every flip in the train exactly like B1 does,
the correction rides the existing B1 batch axis — and therefore the
fused Pallas FISP kernel / lanes scan, at (number of kept z points)
times the atom count.  The reference has no built-in equivalent; it
can only express this by hand-building an RFPulse per TR.

Two pieces:

* :func:`slice_profile_scales` — simulate the shaped pulse once
  (`ops.rfpulse.encode_phase` off-resonance sweep) and convert the
  per-z end state to effective flip-angle scales + quadrature weights.
* :func:`fisp_mrf_dictionary_sliced` — the corrected dictionary:
  an (atoms x z) outer batch through `models.mrf.fisp_mrf_dictionary`,
  contracted over z with the profile weights.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import config
from .mrf import fisp_mrf_dictionary

__all__ = ["slice_profile_scales", "fisp_mrf_dictionary_sliced"]


def slice_profile_scales(pulse, *, gradient, fov, npoint=64, rewind=True,
                         threshold=0.02, gamma=None):
    """Effective flip-angle scales across the excited slice.

    Simulates the shaped slice-selective ``pulse`` (an
    `ops.rfpulse.RFPulse`) from equilibrium on an ``npoint`` z grid
    under ``gradient`` (mT/m, via `encode_phase`), with an optional
    rewinder lobe, and converts each z end state to an effective ideal
    flip angle ``alpha_eff(z) = atan2(|F0(z)|, Re Z0(z))`` — exact for
    a pure rotation from equilibrium (F0 = sin(a) * e^{i phi},
    Z0 = cos(a)).

    Args:
        pulse: calibrated RFPulse (its ``.alpha`` is the nominal flip).
        gradient: slice-select gradient (mT/m).
        fov: z extent to simulate (mm), or an explicit position array.
        npoint: z grid size when ``fov`` is scalar.
        rewind: refocus half the slice-select area (True = 0.5, or a
            float fraction), as in `encode_phase`.
        threshold: drop z points with ``scale < threshold`` — they
            contribute no signal but would still cost dictionary atoms.
        gamma: gyromagnetic ratio override (kHz/mT).

    Returns:
        ``(scales, weights)`` numpy arrays of equal length: per-z
        effective-flip scales (alpha_eff / alpha_nom) and uniform
        quadrature weights ``1/npoint`` for each kept point (their sum
        is the excited fraction of the simulated FOV; dictionary
        normalization removes the overall scale).
    """
    from ..ops.rfpulse import RFPulse, encode_phase
    from ..engine import simulate

    if not isinstance(pulse, RFPulse):
        raise TypeError("pulse must be an ops.rfpulse.RFPulse")
    nominal = float(pulse.alpha)
    if not nominal:
        raise ValueError("pulse has zero nominal flip angle")
    prof = encode_phase(pulse, gradient=gradient, fov=fov, npoint=npoint,
                        rewind=rewind, gamma=gamma)
    from ..ops.probe import ADC
    f0, z0 = simulate([prof, ADC], probe=["F0", "Z0"])
    f0 = np.asarray(f0).reshape(-1)
    z0 = np.asarray(z0).reshape(-1)
    alpha_eff = np.degrees(np.arctan2(np.abs(f0), np.real(z0)))
    scales = alpha_eff / abs(nominal)
    keep = scales >= threshold
    weights = np.full(keep.sum(), 1.0 / len(scales))
    return scales[keep], weights


def fisp_mrf_dictionary_sliced(FA, TR, TE, T1s, T2s, B1s=None, *, scales,
                               weights=None, phi=90.0, nstate: int = 10,
                               demodulate: bool = False, inversion=None,
                               normalize: bool = False, sharding=None):
    """Slice-profile-corrected FISP MRF dictionary.

    Evaluates `models.mrf.fisp_mrf_dictionary` on the (atoms x z) outer
    batch ``B1_eff[a, z] = B1s[a] * scales[z]`` and contracts the z
    axis with ``weights``:

        D[a, p] = sum_z w_z * S(T1_a, T2_a, B1_a * scales_z)[p]

    Args mirror `fisp_mrf_dictionary`; ``scales``/``weights`` come from
    :func:`slice_profile_scales` (weights default to uniform 1/nz).
    The z axis multiplies the simulated batch — with the fused kernel
    at >1M atoms/s a 16-point profile on a 100k-atom grid is still a
    sub-2 s build.

    Returns:
        ``(re, im)``: (B, P) float arrays (complex fingerprint, split).
    """
    rdtype = config.real_dtype()
    T1s = jnp.asarray(T1s, rdtype).reshape(-1)
    T2s = jnp.asarray(T2s, rdtype).reshape(-1)
    B1s = (jnp.ones_like(T1s) if B1s is None
           else jnp.asarray(B1s, rdtype).reshape(-1))
    scales = jnp.asarray(scales, rdtype).reshape(-1)
    nz = scales.shape[0]
    if weights is None:
        weights = jnp.full((nz,), 1.0 / nz, rdtype)
    else:
        weights = jnp.asarray(weights, rdtype).reshape(-1)
        if weights.shape[0] != nz:
            raise ValueError(f"weights length {weights.shape[0]} != "
                             f"scales length {nz}")
    batch = T1s.shape[0]
    # atoms-major flattening keeps each atom's z copies adjacent (one
    # reshape on output, no transpose)
    t1 = jnp.repeat(T1s, nz)
    t2 = jnp.repeat(T2s, nz)
    b1 = (B1s[:, None] * scales[None, :]).reshape(-1)
    re, im = fisp_mrf_dictionary(
        FA, TR, TE, t1, t2, b1, phi=phi, nstate=nstate,
        demodulate=demodulate, inversion=inversion, normalize=False,
        sharding=sharding)
    npulse = re.shape[-1]
    re = (re.reshape(batch, nz, npulse) * weights[None, :, None]).sum(axis=1)
    im = (im.reshape(batch, nz, npulse) * weights[None, :, None]).sum(axis=1)
    if normalize:
        norm = jnp.sqrt(jnp.sum(re * re + im * im, axis=-1, keepdims=True))
        norm = jnp.where(norm == 0, 1.0, norm)
        re, im = re / norm, im / norm
    return re, im
