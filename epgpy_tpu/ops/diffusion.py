"""Anisotropic diffusion operator (Weigel 2010 EPG diffusion).

Physics (parity target: reference epgpy/diffusion.py): each k-state is
attenuated by ``exp(-Tr(b D))`` where the b-matrix integrates the k-space
trajectory over the diffusion interval:

  * longitudinal states: ``bL = tau k k^T``  (k constant during tau);
  * transverse states during a gradient ramp from ``k1 = k - dk`` to
    ``k2 = k``: ``bT = tau (k1 k1^T + (k1 dk^T + dk k1^T)/2 + dk dk^T / 3)``
    (the Stejskal-Tanner 1/3 term).

Units: tau in ms, k in rad/m, D in mm^2/s -> b in s/mm^2.

``D(tau, D, k)`` with ``k`` set models attenuation *during* the gradient
and must be placed right after the corresponding ``S(k)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import common, config
from . import base

__all__ = ["D", "compute_bmatrix", "diffusion_operator"]


def compute_bmatrix(tau, k1, k2=None):
    """b-matrix (s/mm^2) for constant k (k2 None) or linear ramp k1 -> k2.

    tau: ms; k1, k2: (..., n, d<=3) rad/m.
    """
    rdt = config.real_dtype()
    tau = jnp.asarray(tau, rdt) * 1e-3          # ms -> s
    k1 = jnp.asarray(k1, rdt) * 1e-3            # rad/m -> rad/mm
    if k1.ndim == 1:
        k1 = k1[None]
    if k1.shape[-1] > 3:
        raise ValueError("Only 1d, 2d and 3d wavenumbers are allowed")

    def outer(a, b):
        return a[..., :, None] * b[..., None, :]

    if tau.ndim:  # batched tau: batch dims lead, broadcast over (n, d, d)
        tau = tau.reshape(tau.shape + (1,) * (k1.ndim + 1 - tau.ndim))
    bmat = outer(k1, k1) * tau

    if k2 is None:
        return bmat
    k2 = jnp.asarray(k2, rdt) * 1e-3
    kd = k2 - k1
    bmat = bmat + tau * (
        0.5 * outer(k1, kd) + 0.5 * outer(kd, k1) + (1.0 / 3.0) * outer(kd, kd)
    )
    return bmat


def diffusion_operator(bL, bT, Dcoef):
    """Attenuation factors (DL, DT) = exp(-Tr(b D)) for L and T states."""
    Dval = jnp.asarray(Dcoef, config.real_dtype())
    if Dval.ndim == 0:
        # isotropic: exp(-Tr(b) D)
        trL = jnp.trace(bL, axis1=-2, axis2=-1)
        trT = jnp.trace(bT, axis1=-2, axis2=-1)
        return jnp.exp(-trL * Dval), jnp.exp(-trT * Dval)
    # tensor: exp(-sum(b * D))
    DL = jnp.exp(-jnp.sum(bL * Dval, axis=(-2, -1)))
    DT = jnp.exp(-jnp.sum(bT * Dval, axis=(-2, -1)))
    return DL, DT


@base.register_op
class D(base.Operator):
    """Diffusion attenuation: tau (ms), D (mm^2/s scalar or 3x3 tensor).

    With `k` (rad/m) set, models attenuation during the gradient that
    produced the k-shift (place right after the matching S(k)).
    """

    PARAMS = ("tau", "Dcoef", "kshift")
    #: r5 (beyond reference: epgpy's D has no derivatives): the
    #: diffusivity is differentiable -- order1=["Dcoef"] (or the alias
    #: {"D": "Dcoef"}) tracks dS/dD for ADC-mapping fits; the DW-FISP
    #: Jacobian kernel's dD column routes such trains fused
    PARAMETERS_ORDER1 = frozenset({"Dcoef"})

    def __init__(self, tau, D, k=None, *, name=None, duration=None, **kwargs):
        self.tau = jnp.asarray(tau, dtype=float) if not np.isscalar(tau) else float(tau)
        self.Dcoef = jnp.asarray(D, dtype=float)
        if self.Dcoef.ndim == 1:
            raise ValueError("D can only be a scalar or a 2d matrix")
        if self.Dcoef.ndim >= 2 and self.Dcoef.shape[-1] != self.Dcoef.shape[-2]:
            raise ValueError("D must be a square 2d matrix")
        self.kshift = None if k is None else jnp.atleast_2d(jnp.asarray(k, dtype=float))
        if (k is not None and np.ndim(k) > 0 and self.Dcoef.ndim >= 2
                and np.shape(k)[-1] != self.Dcoef.shape[-1]):
            # reference epgpy/diffusion.py:161-171: a SCALAR k is
            # exempt (1-D attenuation via b00 broadcast), but an array
            # k must match the tensor's dimensionality -- otherwise
            # off-diagonal elements would silently sum as if isotropic
            raise ValueError("Incompatible D and k dimensions")
        if name is None:
            name = common.repr_operator("D", ["tau", "D", "k"], [tau, D, k],
                                        [".1f", "", ""])
        if duration is True:
            duration = tau
        # order1/order2 pass through (previously **kwargs silently
        # swallowed a differentiation spec)
        super().__init__(name=name, duration=duration, **kwargs)

    @property
    def shape(self):
        tshape = common.get_shape(self.tau)
        dshape = common.get_shape(self.Dcoef)[:-2]
        kshape = () if self.kshift is None else common.get_shape(self.kshift)[:-1]
        return common.broadcast_shapes(tshape, dshape, kshape, (1,))

    @property
    def kdim(self):
        if self.kshift is None:
            return 1
        return self.kshift.shape[-1]

    def apply(self, sm):
        if not common.broadcastable(self.shape, sm.shape):
            # clear message for DIRECT op application (simulate()'s
            # sequence-shape validation catches this earlier); matches
            # the reference's prepare-time check
            raise ValueError("Incompatible StateMatrix and operator "
                             f"shapes: {sm.shape}, {self.shape}")
        k = sm.k  # (..., C, <=3) physical wavenumbers
        kd = k.shape[-1]
        if self.kshift is None:
            bL = compute_bmatrix(self.tau, k)
            bT = bL
        else:
            # self.kshift is in the same (grid) units as S(k): scale by kvalue
            shift = jnp.asarray(self.kshift, config.real_dtype()) * sm.kvalue
            if shift.shape[-1] < kd:
                shift = jnp.pad(shift, [(0, 0)] * (shift.ndim - 1)
                                + [(0, kd - shift.shape[-1])])
            if shift.shape[:-1] == (1,):
                shift = shift[0]          # single vector: broadcast over states
            else:
                shift = shift[..., None, :]  # batched: add the state axis
            bL = compute_bmatrix(self.tau, k)
            bT = compute_bmatrix(self.tau, k - shift, k)

        # tensor D with lower-dimensional wavenumbers: the (kd, kd)
        # b-matrix BROADCASTS against the (3, 3) tensor, exactly like the
        # reference's expand_arrays + elementwise sum (epgpy/diffusion.py
        # :131-145) -- for kd == 1 the attenuation uses b00 * sum(D).
        # Mismatched non-broadcastable ranks (kd == 2 vs 3x3) error in
        # the reference too.
        DL, DT = diffusion_operator(bL, bT, self.Dcoef)

        states = sm.states
        Fp = states[..., 0] * DT.astype(states.dtype)
        Z = states[..., 2] * DL.astype(states.dtype)
        # F-(k) = conj(F+(-k)): tables are exactly reversal-symmetric,
        # so the mirrored attenuation keeps the ladder consistent
        Fm = jnp.conj(Fp[..., ::-1])
        return sm.update(states=jnp.stack([Fp, Fm, Z], axis=-1))