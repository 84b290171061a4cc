"""Global configuration: dtypes and precision policy.

TPU-first policy:
  * default compute dtype is complex64 (float32 pairs) -- fast on TPU;
  * enabling ``jax.config.update('jax_enable_x64', True)`` switches the whole
    framework to complex128/float64, used for parity tests against the
    reference semantics (epgpy is complex128-only, cf. reference
    epgpy/statematrix.py:392).

Unlike the reference's global numpy/cupy array-module switch
(reference epgpy/common.py:21-74) there is no backend registry here: JAX is
the single array backend and the device (TPU/CPU) is chosen by JAX itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "real_dtype",
    "complex_dtype",
    "int_dtype",
    "x64_enabled",
]


def x64_enabled() -> bool:
    """True when JAX is running in 64-bit mode."""
    return bool(jax.config.read("jax_enable_x64"))


def real_dtype():
    """Default floating dtype (float64 under x64, else float32)."""
    return jnp.float64 if x64_enabled() else jnp.float32


def complex_dtype():
    """Default complex dtype (complex128 under x64, else complex64)."""
    return jnp.complex128 if x64_enabled() else jnp.complex64


def int_dtype():
    """Default integer dtype for k-state coordinates."""
    return jnp.int64 if x64_enabled() else jnp.int32
