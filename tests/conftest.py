"""Test configuration: CPU backend, 8 virtual devices, float64 parity mode.

Must run before jax initializes a backend: forces an 8-device virtual CPU
mesh (for sharding tests) and 64-bit mode (for parity with the reference's
complex128 semantics).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# the axon TPU plugin force-registers even under JAX_PLATFORMS=cpu;
# steer all test computation to the host CPU devices explicitly.
try:
    _cpus = jax.devices("cpu")
    jax.config.update("jax_default_device", _cpus[0])
except RuntimeError:
    pass

import gc  # noqa: E402

import pytest  # noqa: E402

# Single-process full-suite runs used to degrade to >45 min on a 1-CPU box:
# Python's cyclic GC repeatedly walks the ever-growing live object graph of
# jaxpr/executable caches. Two mitigations: collect far less often (memory is
# plentiful: 128 GB), and drop the in-memory JAX + engine caches whenever a
# test module finishes so the object graph stays bounded.
gc.set_threshold(100_000, 50, 50)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_caches():
    yield
    try:
        from epgpy_tpu import engine

        engine.clear_caches()
    except Exception:
        pass
    jax.clear_caches()
    gc.collect()


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")
