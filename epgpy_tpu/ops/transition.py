"""RF-pulse (transition) operators.

Physics: an instantaneous RF pulse of flip angle ``alpha`` and phase ``phi``
(both in degrees) mixes each k-state's ``(F+, F-, Z)`` components by the
Weigel EPG rotation matrix ``Rz(phi) . Rx(alpha) . Rz(-phi)`` expressed in
the configuration basis (parity target: reference epgpy/transition.py:7-151).

TPU-first: operators store only the physical angles (real leaves); the
complex rotation matrix is built *at trace time* inside the compiled
program.  This keeps program boundaries real (TPU constraint), lets XLA
constant-fold static pulses, and makes ``jax.jacfwd`` w.r.t. alpha/phi
replace the reference's hand-derived derivative matrices
(reference epgpy/transition.py:160-247).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import common, config
from . import base
from .matrixop import MatrixOp

__all__ = ["T", "Tx", "Ty", "Phi", "rotation_operator", "rotation_phi"]


def rotation_alpha(alpha):
    """EPG rotation about x by `alpha` degrees, configuration basis."""
    cdtype = config.complex_dtype()
    a = jnp.deg2rad(jnp.asarray(alpha, dtype=config.real_dtype()))
    cos2, sin2 = jnp.cos(a / 2) ** 2, jnp.sin(a / 2) ** 2
    sin, cos = jnp.sin(a), jnp.cos(a)
    mat = jnp.stack([
        jnp.stack([cos2, sin2, -sin], axis=-1),
        jnp.stack([sin2, cos2, sin], axis=-1),
        jnp.stack([-0.5 * sin, 0.5 * sin, cos], axis=-1),
    ], axis=-2).astype(cdtype)
    # multiply the off-diagonal sin terms by +/- i
    imag_mask = jnp.asarray(
        [[1, 1, 1j], [1, 1, 1j], [1j, 1j, 1]], dtype=cdtype
    )
    return mat * imag_mask


def rotation_phi(phi):
    """z-rotation by `phi` degrees: diag(e^{i phi}, e^{-i phi}, 1)."""
    cdtype = config.complex_dtype()
    p = jnp.deg2rad(jnp.asarray(phi, dtype=config.real_dtype()))
    e = jnp.exp(1j * p).astype(cdtype)
    zero = jnp.zeros_like(e)
    one = jnp.ones_like(e)
    return jnp.stack([
        jnp.stack([e, zero, zero], axis=-1),
        jnp.stack([zero, jnp.conj(e), zero], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ], axis=-2)


def rotation_elements(alpha, phi):
    """The nine Weigel rotation coefficients as separate batch-shaped arrays.

    Used for application: a materialized (batch, 3, 3) matrix tile-pads
    3 -> (8, 128) on TPU (~100x memory blowup per intermediate); nine
    (batch,) coefficient arrays stay dense (see CLAUDE.md fact #3/#4).
    """
    cdtype = config.complex_dtype()
    alpha, phi = common.expand_arrays(alpha, phi, append=True)
    a = jnp.deg2rad(jnp.asarray(alpha, dtype=config.real_dtype()))
    p = jnp.deg2rad(jnp.asarray(phi, dtype=config.real_dtype()))
    a, p = jnp.broadcast_arrays(a, p)
    cos2 = ((1 + jnp.cos(a)) / 2).astype(cdtype)
    sin2 = ((1 - jnp.cos(a)) / 2).astype(cdtype)
    sin = jnp.sin(a)
    ep = jnp.exp(1j * p).astype(cdtype)
    i = jnp.asarray(1j, cdtype)
    m01 = ep * ep * sin2
    m02 = -i * ep * sin
    m12 = i * jnp.conj(ep) * sin
    m20 = -0.5 * i * jnp.conj(ep) * sin
    m21 = 0.5 * i * ep * sin
    m22 = jnp.cos(a).astype(cdtype)
    return (cos2, m01, m02, jnp.conj(m01), cos2, m12, m20, m21, m22)


def rotation_operator(alpha, phi):
    """Full RF rotation ``Rz(phi) Rx(alpha) Rz(-phi)`` (degrees)."""
    alpha, phi = common.expand_arrays(alpha, phi, append=True)
    ra = rotation_alpha(alpha)
    rp = rotation_phi(phi)
    rm = rotation_phi(jnp.asarray(phi) * (-1))
    ra, rp, rm = common.extend_operators(2, ra, rp, rm)
    mat = jnp.einsum("...ij,...jk,...kl->...il", rp, ra, rm, precision="highest")
    if mat.ndim == 2:
        mat = mat[None]
    return mat


@base.register_op
class T(MatrixOp):
    """Instantaneous RF pulse: flip `alpha`, phase `phi` (degrees)."""

    PARAMS = ("alpha", "phi")
    PARAMETERS_ORDER1 = frozenset({"alpha", "phi"})

    def __init__(self, alpha, phi, *, axes=None, name=None, duration=None, **kwargs):
        self.alpha = _as_real(alpha)
        self.phi = _as_real(phi)
        self.axes = axes
        if not name:
            name = common.repr_operator("T", ["alpha", "phi"], [alpha, phi],
                                        [".1f", ".1f"])
        base.Operator.__init__(self, name=name, duration=duration, **kwargs)

    @property
    def shape(self):
        return common.shape_with_axes(common.broadcast_shapes(
            common.get_shape(self.alpha), common.get_shape(self.phi), (1,)),
            self.axes)

    def matrices(self):
        mat = rotation_operator(self.alpha, self.phi)
        if self.axes is not None:
            mat = common.set_axes(2, mat, self.axes)
        return mat, None

    def apply(self, sm):
        # coefficient-level madds: never materialize a (batch, 3, 3) array
        from .scalarop import align_batch, _coeff_lanes
        elems = rotation_elements(self.alpha, self.phi)
        if self.axes is not None:
            # atleast_1d: scalar alpha/phi give 0-d elements, and
            # set_axes on an empty batch would die (as _pin_elements)
            elems = tuple(common.set_axes(0, jnp.atleast_1d(e), self.axes)
                          for e in elems)

        if sm.lanes:
            # half-lanes: reconstruct the implied F- plane once, update
            # only (Fp, Z) -- a third fewer madds per pulse
            m = [_coeff_lanes(e, sm.ndim) for e in elems]
            Fp, Fm, Z = sm.planes
            out = (m[0] * Fp + m[1] * Fm + m[2] * Z,
                   m[6] * Fp + m[7] * Fm + m[8] * Z)
            return sm.update(states_lanes=out)

        def al(e):
            e = jnp.atleast_1d(e)
            return align_batch(e, sm.ndim, 0)[..., None]  # ladder axis

        m = [al(e) for e in elems]
        s = sm.states
        comps = [
            m[3 * i] * s[..., 0] + m[3 * i + 1] * s[..., 1]
            + m[3 * i + 2] * s[..., 2]
            for i in range(3)
        ]
        return sm.update(states=jnp.stack(comps, axis=-1))


def Tx(alpha, **kwargs):
    """RF pulse about x (phi = 0)."""
    return T(alpha, 0, **kwargs)


def Ty(alpha, **kwargs):
    """RF pulse about y (phi = 90)."""
    return T(alpha, 90, **kwargs)


@base.register_op
class Phi(MatrixOp):
    """Pure phase offset (z-rotation by `phi` degrees)."""

    PARAMS = ("phi",)
    PARAMETERS_ORDER1 = frozenset({"phi"})
    diagonal = True

    def __init__(self, phi, *, axes=None, name=None, duration=0, **kwargs):
        self.phi = _as_real(phi)
        self.axes = axes
        if not name:
            name = common.repr_operator("Phi", ["phi"], [phi], [".1f"])
        base.Operator.__init__(self, name=name, duration=duration, **kwargs)

    @property
    def shape(self):
        return common.shape_with_axes(common.get_shape(self.phi) or (1,),
                                      self.axes)

    def coefficients(self):
        p = jnp.deg2rad(jnp.asarray(self.phi, dtype=config.real_dtype()))
        e = jnp.exp(1j * p).astype(config.complex_dtype())
        arr = jnp.stack([e, jnp.conj(e), jnp.ones_like(e)], axis=-1)
        if arr.ndim == 1:
            arr = arr[None]
        if self.axes is not None:
            arr = common.set_axes(1, arr, self.axes)
        return arr, None

    def matrices(self):
        arr, _ = self.coefficients()
        return arr[..., None] * jnp.eye(3, dtype=arr.dtype), None

    def apply(self, sm):
        from .scalarop import apply_coefficients
        arr, arr0 = self.coefficients()
        return apply_coefficients(sm, arr, arr0)


_as_real = common.as_real
