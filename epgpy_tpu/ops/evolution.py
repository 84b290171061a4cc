"""Relaxation / precession operators.

Physics (parity target: reference epgpy/evolution.py:220-256):

* ``R(rT, rL, r0)``  -- generic diagonal evolution with complex rates:
  ``diag(conj(e^{-rT}), e^{-rT}, e^{-rL})`` plus recovery ``(0,0,1-e^{-r0})``.
* ``E(tau, T1, T2, g)`` -- relaxation + precession:
  ``rT = tau (1/T2 + 2 i pi g)``, ``rL = r0 = tau / T1``.
* ``P(tau, g)``     -- pure precession: ``rT = 2 i pi g tau``.

Operators store only their physical parameters (real leaves; complex rates
split re/im) and build the diagonal coefficients at trace time, so JAX
autodiff replaces the hand-derived kernels of reference
epgpy/evolution.py:360-488.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import common, config
from . import base
from .scalarop import ScalarOp, split_complex, join_complex

__all__ = ["R", "E", "P", "evolution_operator", "relaxation_operator",
           "precession_operator"]


def evolution_operator(rT, rL, r0=None):
    """Diagonal evolution coefficients (arr, arr0) from complex rates."""
    cdtype = config.complex_dtype()
    rT, rL, r0 = common.expand_arrays(rT, rL, r0, append=True)
    rT = jnp.asarray(rT, dtype=cdtype)
    rL = jnp.asarray(rL, dtype=cdtype)
    eT = jnp.exp(-rT)
    eL = jnp.exp(-rL)
    arr = jnp.stack(jnp.broadcast_arrays(jnp.conj(eT), eT, eL), axis=-1)
    if arr.ndim == 1:
        arr = arr[None]
    if r0 is None:
        return arr, None
    r0 = jnp.asarray(r0, dtype=cdtype)
    z = jnp.zeros_like(r0)
    arr0 = jnp.stack(jnp.broadcast_arrays(z, z, 1 - jnp.exp(-r0)), axis=-1)
    if arr0.ndim == 1:
        arr0 = arr0[None]
    arr, arr0 = jnp.broadcast_arrays(arr, arr0)
    return arr, arr0


def relaxation_operator(tau, T1, T2, g):
    """E coefficients: transverse decay+precession, longitudinal recovery."""
    tau, T1, T2, g = common.expand_arrays(tau, T1, T2, g, append=True)
    tau = jnp.asarray(tau, dtype=config.real_dtype())
    rT = tau * (1.0 / jnp.asarray(T2) + 2j * jnp.pi * jnp.asarray(g))
    rL = tau / jnp.asarray(T1)
    return evolution_operator(rT, rL, rL)


def precession_operator(tau, g):
    tau, g = common.expand_arrays(tau, g, append=True)
    rT = 2j * jnp.pi * jnp.asarray(g) * jnp.asarray(tau)
    return evolution_operator(rT, 0.0, None)


def evolution_elements(rT, rL, r0=None):
    """Element-form evolution coefficients: separate batch-shaped arrays
    ``(conj(e^{-rT}), e^{-rT}, e^{-rL})`` — never stacked into a
    ``(batch, 3)`` array whose trailing 3 tile-pads to 128 TPU lanes."""
    cdtype = config.complex_dtype()
    rT, rL, r0 = common.expand_arrays(rT, rL, r0, append=True)
    eT = jnp.exp(-jnp.asarray(rT, dtype=cdtype))
    eL = jnp.exp(-jnp.asarray(rL, dtype=cdtype))
    elems = (jnp.conj(eT), eT, eL)
    if r0 is None:
        return elems, None
    rec = 1 - jnp.exp(-jnp.asarray(r0, dtype=cdtype))
    return elems, (None, None, rec)


_as_real = common.as_real


@base.register_op
class R(ScalarOp):
    """Generic evolution operator with raw complex rates."""

    PARAMS = ("rT_re", "rT_im", "rL_re", "rL_im", "r0_re", "r0_im")
    PARAMETERS_ORDER1 = frozenset({"rT", "rL", "r0"})

    def __init__(self, rT=0, rL=0, *, r0=None, axes=None, name=None,
                 duration=None, **kwargs):
        self.rT_re, self.rT_im = split_complex(rT)
        self.rL_re, self.rL_im = split_complex(rL)
        self.r0_re, self.r0_im = split_complex(r0)
        if r0 is None:
            # order1=True must not try to differentiate an absent
            # recovery term (diff.substitute would shift a None leaf)
            self.PARAMETERS_ORDER1 = frozenset({"rT", "rL"})
        self.axes = axes
        if not name:
            name = common.repr_operator("R", ["rT", "rL", "r0"], [rT, rL, r0],
                                        [".1f", ".1f", ".1f"])
        base.Operator.__init__(self, name=name, duration=duration, **kwargs)

    rT = property(lambda self: join_complex(self.rT_re, self.rT_im))
    rL = property(lambda self: join_complex(self.rL_re, self.rL_im))
    r0 = property(lambda self: join_complex(self.r0_re, self.r0_im))

    @property
    def shape(self):
        return common.shape_with_axes(common.broadcast_shapes(
            common.get_shape(self.rT_re), common.get_shape(self.rL_re),
            common.get_shape(self.r0_re), (1,)), self.axes)

    def coefficients(self):
        r0 = None if self.r0_re is None else self.r0
        arr, arr0 = evolution_operator(self.rT, self.rL, r0)
        if self.axes is not None:
            arr = common.set_axes(1, arr, self.axes)
            arr0 = None if arr0 is None else common.set_axes(1, arr0, self.axes)
        return arr, arr0

    def coefficient_elements(self):
        r0 = None if self.r0_re is None else self.r0
        elems, elems0 = evolution_elements(self.rT, self.rL, r0)
        return self._pin_elements(elems, elems0)


@base.register_op
class E(ScalarOp):
    """Relaxation + precession: tau (ms), T1/T2 (ms), g (kHz)."""

    PARAMS = ("tau", "T1", "T2", "g")
    PARAMETERS_ORDER1 = frozenset({"tau", "T1", "T2", "g"})

    def __init__(self, tau, T1, T2, g=0, *, axes=None, name=None, duration=None,
                 **kwargs):
        self.tau = _as_real(tau)
        self.T1 = _as_real(T1)
        self.T2 = _as_real(T2)
        self.g = _as_real(0 if g is None else g)  # E(g=None) == E(g=0)
        self.axes = axes
        if not name:
            name = common.repr_operator("E", ["tau", "T1", "T2", "g"],
                                        [tau, T1, T2, g], [".1f", ".1f", ".1f", ".3f"])
        if duration is True:
            duration = tau
        base.Operator.__init__(self, name=name, duration=duration, **kwargs)

    @property
    def shape(self):
        return common.shape_with_axes(common.broadcast_shapes(
            common.get_shape(self.tau), common.get_shape(self.T1),
            common.get_shape(self.T2), common.get_shape(self.g), (1,)),
            self.axes)

    def coefficients(self):
        arr, arr0 = relaxation_operator(self.tau, self.T1, self.T2, self.g)
        if self.axes is not None:
            arr = common.set_axes(1, arr, self.axes)
            arr0 = common.set_axes(1, arr0, self.axes)
        return arr, arr0

    def coefficient_elements(self):
        tau, T1, T2, g = common.expand_arrays(
            self.tau, self.T1, self.T2, self.g, append=True)
        tau = jnp.asarray(tau, dtype=config.real_dtype())
        rT = tau * (1.0 / jnp.asarray(T2) + 2j * jnp.pi * jnp.asarray(g))
        rL = tau / jnp.asarray(T1)
        elems, elems0 = evolution_elements(rT, rL, rL)
        return self._pin_elements(elems, elems0)


@base.register_op
class P(ScalarOp):
    """Pure precession: tau (ms), g (kHz)."""

    PARAMS = ("tau", "g")
    PARAMETERS_ORDER1 = frozenset({"tau", "g"})

    def __init__(self, tau, g, *, axes=None, name=None, duration=None, **kwargs):
        self.tau = _as_real(tau)
        self.g = _as_real(g)
        self.axes = axes
        if not name:
            name = common.repr_operator("P", ["tau", "g"], [tau, g], [".1f", ".3f"])
        if duration is True:
            duration = tau
        base.Operator.__init__(self, name=name, duration=duration, **kwargs)

    @property
    def shape(self):
        return common.shape_with_axes(common.broadcast_shapes(
            common.get_shape(self.tau), common.get_shape(self.g), (1,)),
            self.axes)

    def coefficients(self):
        arr, arr0 = precession_operator(self.tau, self.g)
        if self.axes is not None:
            arr = common.set_axes(1, arr, self.axes)
        return arr, arr0

    def coefficient_elements(self):
        tau, g = common.expand_arrays(self.tau, self.g, append=True)
        rT = 2j * jnp.pi * jnp.asarray(g) * jnp.asarray(tau)
        elems, elems0 = evolution_elements(rT, 0.0, None)
        return self._pin_elements(elems, elems0)
