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
    "setup_compilation_cache",
]


def setup_compilation_cache(path: str | None = None):
    """Enable JAX's persistent compilation cache (idempotent).

    Long scanned programs cost 20-350 s to compile through the TPU tunnel
    on a fresh process; the persistent cache drops warm-process compiles to
    seconds.  Called at package import.  Disable with ``EPGPY_TPU_CACHE=0``;
    relocate with ``EPGPY_TPU_CACHE_DIR``.  Returns the cache dir or None.
    """
    import os

    if os.environ.get("EPGPY_TPU_CACHE", "1").lower() in ("0", "false", "no"):
        return None
    if path is None:
        path = os.environ.get("EPGPY_TPU_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "epgpy_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program: through the axon tunnel the client-side
        # compile returns quickly (the real compile is remote/async), so a
        # compile-time threshold would skip exactly the expensive programs
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except (OSError, AttributeError, ValueError):  # pragma: no cover
        return None
    return path


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
