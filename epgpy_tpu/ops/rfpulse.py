"""Shaped RF pulses (hard-pulse approximation).

A shaped pulse is a train of small instantaneous rotations, one per
waveform sample (semantics: reference epgpy/rfpulse.py:37-197).  The i-th
sub-rotation has flip ``180 * |v_i| * rf`` degrees and phase
``angle(v_i)``; an optional constant phase offset wraps the train in
``Phi(-offset) ... Phi(offset)``.

The sub-pulse train is a MultiOperator of identically-shaped T operators,
so the engine's scan planner compiles it to a single ``lax.scan`` -- a
1000-sample pulse costs one compiled step, not 1000 traced ops.

RF calibration:
  * constant-phase waveforms: closed form ``rf = alpha / 180 / |sum v|``;
  * otherwise: minimize the distance to the ideal-pulse state with
    jax-gradient descent (the reference shells out to scipy SLSQP,
    reference epgpy/rfpulse.py:225-314).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from . import base
from .transition import T, Phi, rotation_operator
from .evolution import P

LOGGER = logging.getLogger(__name__)

__all__ = ["RFPulse", "make_pulse_sequence", "estimate_rf", "estimate_alpha",
           "encode_phase"]


@base.register_op
class RFPulse(base.MultiOperator):
    """Realistic shaped RF pulse built from complex waveform samples."""

    PARAMS = ("operators",)

    def __init__(self, values, duration, *, rf=None, alpha=None, phi=None,
                 name=None, **kwargs):
        values = np.asarray(values, dtype=np.complex128)
        if rf is None and alpha is None:
            raise ValueError('Either "rf" or "alpha" must be provided')
        if rf is None:
            rf = estimate_rf(values, alpha)
        elif alpha is None:
            alpha = estimate_alpha(values, rf)

        seq = make_pulse_sequence(values, duration, rf, offset=phi)

        T1, T2, g = kwargs.pop("T1", None), kwargs.pop("T2", None), kwargs.pop("g", None)
        if not all(v is None for v in (T1, T2, g)):
            from ..engine import modify
            T1 = 1e10 if T1 is None else T1
            T2 = 1e10 if T2 is None else T2
            g = 0 if g is None else g
            seq = modify(seq, T1=T1, T2=T2, g=g, expand=False)

        self.values = values
        self.rf = rf
        self.alpha = alpha
        self.phi = phi
        super().__init__(seq, name=name or f"RFPulse({len(values)}, {duration}ms)",
                         duration=duration)


def make_pulse_sequence(values, duration, rf, offset=None):
    """Train of small T rotations from complex waveform samples."""
    values = np.asarray(values)
    if values.ndim > 1:
        raise ValueError("`values` array must be 1-dimensional")
    if np.max(np.abs(values)) > 1:
        raise ValueError("pulse values must have magnitude <= 1")
    nvalue = len(values)

    ndim = len(np.shape(rf))
    if ndim >= 1:
        values = values.reshape((nvalue,) + (1,) * ndim)

    if np.isscalar(duration):
        durations = np.full(nvalue, duration / nvalue)
    elif len(duration) == nvalue:
        durations = np.asarray(duration)
    else:
        raise ValueError("duration and values must have the same length")

    alphas = 180.0 * np.abs(values) * np.asarray(rf)
    phis = np.angle(values, deg=True)

    seq = [T(a, p, duration=d) for a, p, d in zip(alphas, phis, durations)]
    if offset:
        seq = [Phi(-offset)] + seq + [Phi(offset)]
    return seq


def _combined_rotation(alphas, phis):
    """Net 3x3 rotation of a sub-pulse train (trace-safe)."""
    mats = rotation_operator(jnp.asarray(alphas), jnp.asarray(phis))
    # mats: (nvalue, 3, 3): fold left-to-right
    def body(acc, m):
        return jnp.einsum("ij,jk->ik", m, acc, precision="highest"), None
    net, _ = jax.lax.scan(body, jnp.eye(3, dtype=mats.dtype), mats)
    return net


def estimate_alpha(values, rf):
    """Effective flip angle of the waveform at RF amplitude `rf` (degrees)."""
    values = np.asarray(values)
    alphas = 180.0 * np.abs(values) * rf
    phis = np.angle(values, deg=True)
    # host-side calibration: eager complex ops crash the axon TPU
    # backend (CLAUDE.md fact 1) and the complex d2h is banned -- pin
    # this tiny 3x3 work to the CPU device
    with jax.default_device(jax.devices("cpu")[0]):
        net = np.asarray(_combined_rotation(alphas, phis))
    z = net @ np.asarray([0.0, 0.0, 1.0])
    absZ = np.mod(np.real(z[2]) + 1, 2) - 1
    return float(np.mod(np.arccos(absZ) / np.pi * 180 + 180, 360) - 180)


def estimate_rf(values, alpha, *, steps=200):
    """RF amplitude (kHz-equivalent scale) achieving flip `alpha` (degrees)."""
    values = np.asarray(values)
    if np.max(np.abs(values)) > 1:
        raise ValueError("pulse values must have magnitude <= 1")

    phase_diffs = np.diff(np.mod(np.angle(values, deg=True), 180))
    if np.all(np.isclose(phase_diffs, 0, atol=1e-5)):
        LOGGER.info("constant-phase pulse: closed-form rf for alpha=%s", alpha)
        return float(alpha / 180.0 / np.abs(np.sum(values)))

    LOGGER.info("optimizing rf for alpha=%s", alpha)
    alphas = 180.0 * np.abs(values)
    phis = np.angle(values, deg=True)
    # host-side calibration loop: pin to the CPU device -- eager
    # complex ops crash the axon TPU backend (CLAUDE.md fact 1), and
    # the per-step float() syncs would cost ~40 ms tunnel round-trips
    # each on the tunnel
    with jax.default_device(jax.devices("cpu")[0]):
        target = np.abs(np.asarray(rotation_operator(alpha, 90.0))[0]
                        @ np.asarray([0.0, 0.0, 1.0]))

        def cost(rf):
            net = _combined_rotation(rf * alphas, phis)
            z = net @ jnp.asarray([0.0, 0.0, 1.0], net.dtype)
            return jnp.sum((jnp.abs(z) - target) ** 2)

        grad = jax.jit(jax.value_and_grad(cost))
        rf = jnp.asarray(alpha / 180.0 / np.abs(np.sum(values)))
        lr = 0.1 * float(rf)
        best_rf, best_c = float(rf), np.inf
        for _ in range(steps):
            c, g = grad(rf)
            c = float(c)
            if c < best_c:
                best_c, best_rf = c, float(rf)
            rf = jnp.clip(rf - lr * g, 0.0, None)
            if abs(float(g)) < 1e-12 or c < 1e-14:
                break
    return best_rf


def encode_phase(pulse, gradient, fov, *, expand=True, rewind=None,
                 npoint=101, gamma=None):
    """Add a slice-select gradient axis to a pulse (off-resonance sweep)."""
    from ..utils import constants, helpers
    from ..engine import modify

    if gamma is None:
        gamma = constants.gamma_1H
    if not isinstance(pulse, RFPulse):
        raise TypeError("Can only use RFPulse operators")
    if np.isscalar(fov):
        fov = helpers.spatial_range(fov, npoint)
    freqs = helpers.space_to_freq(gradient, fov, gamma=gamma)
    if expand:
        dims = tuple(range(len(pulse.shape)))
        freqs = np.expand_dims(freqs, dims)

    modified = modify(pulse, g=freqs, expand=False)
    if not isinstance(modified, base.MultiOperator):
        modified = base.MultiOperator(modified)
    if rewind is not None:
        rewind = 0.5 if rewind is True else float(rewind)
        modified.operators.append(
            P(pulse.duration * rewind, g=-freqs, duration=0))
    return modified
