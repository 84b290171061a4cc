"""Probe (readout) operators.

Probes are no-op operators that record data from the state matrix
(reference epgpy/probe.py).  In this framework a probe's ``acquire`` runs at
*trace time* inside the compiled program: the returned arrays become scan
outputs / jit results, so there is no per-ADC host copy (the reference
copies device->host at every ADC, reference epgpy/probe.py:63-66).

Eval-string probes are supported for API parity: the expression is
evaluated once at trace time with jnp as the math namespace.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import base

__all__ = ["Probe", "Adc", "ADC", "DFT", "Imaging"]


# StateMatrix attributes accessible in eval-string probes
SM_LOCALS = [
    "nstate", "ndim", "kdim", "states", "coords",
    "F", "F0", "F0t", "Z", "Z0", "k", "t", "t0",
]


class _SMNamespace(dict):
    """Lazy attribute access on the state matrix for eval-probes."""

    def __init__(self, sm, extra):
        super().__init__(extra)
        self._sm = sm

    def __missing__(self, key):
        if key in SM_LOCALS:
            return getattr(self._sm, key)
        raise KeyError(key)


@base.register_op
class Probe(base.EmptyOperator):
    """No-op operator holding a callback or eval-string to record data."""

    def __init__(self, obj, *args, post=None, name=None, **kwargs):
        if isinstance(obj, str):
            self._expr = obj
            self._callable = None
        elif callable(obj):
            self._expr = None
            self._callable = obj
        else:
            raise TypeError(f"Invalid probe object: {obj}")
        self._args = args
        self._kwargs = kwargs
        self._post = post
        super().__init__(name=name or f"Probe({obj!r})")

    def _acquire(self, sm):
        if self._expr is not None:
            namespace = _SMNamespace(sm, self._kwargs)
            return eval(self._expr, vars(jnp), namespace)
        return self._callable(sm, *self._args, **self._kwargs)

    def acquire(self, sm, post=None):
        post = post if post is not None else self.post
        return post(self._acquire(sm))

    def post(self, obj):
        if getattr(self, "_post", None) is None:
            return obj
        return self._post(obj)

    def apply(self, sm):
        return sm


@base.register_op
class Adc(Probe):
    """Simplified probe with weights/reduction and phase compensation.

    `phase` and `weights` are traced leaves: ADCs differing only in these
    (e.g. RF-spoiled readout phases) still group into one lax.scan.
    """

    PARAMS = ("phase", "weights")

    def __init__(self, attr="F0", *, phase=None, reduce=None, weights=None,
                 name="ADC"):
        if attr not in SM_LOCALS:
            raise ValueError(f"Invalid StateMatrix attribute: {attr}")
        self.attr = attr
        # keep device/traced phases as-is (they ARE traced leaves, per
        # the class docstring; np.asarray on a Tracer raises, and on a
        # device array costs a d2h tunnel round-trip)
        self.phase = (phase if phase is None
                      or isinstance(phase, (jax.Array, jax.core.Tracer))
                      else np.asarray(phase))

        if reduce is not None and reduce is not True and reduce is not False:
            reduce = (reduce,) if isinstance(reduce, int) else tuple(reduce)
            if not all(isinstance(ax, int) for ax in reduce):
                raise ValueError(f"Expected (tuple of) int axes, got: {reduce}")
        self.reduce = reduce

        if weights is not None:
            if not isinstance(weights, (jax.Array, jax.core.Tracer)):
                weights = np.asarray(weights)
            ndim = max(weights.ndim, 1)
            if reduce is None:
                self.reduce = tuple(range(ndim))
            elif reduce not in (True, False) and not set(reduce) <= set(range(ndim)):
                raise ValueError(f"Invalid reduce dimension(s): {reduce}")
        self.weights = weights
        base.Operator.__init__(self, name=name)

    def _acquire(self, sm):
        arr = getattr(sm, self.attr)
        if self.weights is not None:
            w = jnp.asarray(self.weights)
            if w.size > 1 and w.ndim < arr.ndim:
                w = w.reshape(w.shape + (1,) * (arr.ndim - w.ndim))
            arr = arr * w
        if self.reduce is None or self.reduce is False:
            return arr
        if self.reduce is True:
            return jnp.sum(arr)
        return jnp.sum(arr, axis=self.reduce)

    def _post(self, obj):
        if self.phase is None:
            return obj
        phasor = jnp.exp(1j * jnp.asarray(self.phase) * jnp.pi / 180)
        arr = jnp.asarray(obj)
        if phasor.size > 1 and phasor.ndim < arr.ndim:
            phasor = phasor.reshape(phasor.shape + (1,) * (arr.ndim - phasor.ndim))
        return arr * phasor

    def post(self, obj):
        return self._post(obj)


@base.register_op
class DFT(Probe):
    """Point-voxel discrete Fourier transform of F states at coords."""

    PARAMS = ("coords",)

    def __init__(self, coords=None, *, name=None):
        self.coords = None if coords is None else jnp.asarray(coords)
        base.Operator.__init__(self, name=name or "DFT")

    def _acquire(self, sm):
        from ..utils.imaging import dft
        coords = self.coords if self.coords is not None else sm.system["coords"]
        return dft(coords, sm.F, sm.k[..., :3])

    def post(self, obj):
        return obj

    def apply(self, sm):
        return sm


@base.register_op
class Imaging(Probe):
    """Spatially-resolved imaging readout (DFT + voxel shape + T2*/B0)."""

    PARAMS = ("coords",)

    def __init__(self, coords=None, *, name=None, **opts):
        self.coords = None if coords is None else jnp.asarray(coords)
        self.opts = dict(opts)
        base.Operator.__init__(self, name=name or "Imaging")

    def _acquire(self, sm):
        from ..utils.imaging import imaging as _imaging
        opts = dict(self.opts)
        coords = self.coords
        if coords is None:
            coords = sm.system.get("coords")
        modulation = opts.pop("modulation", None)
        if modulation is None:
            modulation = sm.system.get("modulation")
        weights = opts.pop("weights", None)
        if weights is None:
            weights = sm.system.get("weights")
        return _imaging(
            coords, sm.F, sm.k[..., :3],
            acctime=sm.t if sm.kdim == 4 else None,
            modulation=modulation, weights=weights, **opts,
        )

    def post(self, obj):
        return obj

    def apply(self, sm):
        return sm


# default ADC instance (records F0)
ADC = Adc(attr="F0", name="ADC")
