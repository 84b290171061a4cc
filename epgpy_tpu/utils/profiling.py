"""Profiling helpers (the reference has no tracing subsystem, SURVEY §5).

Thin wrappers over jax.profiler producing TensorBoard-compatible traces of
the compiled simulation programs.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace("/tmp/tb"): simulate(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (context manager)."""
    return jax.profiler.TraceAnnotation(name)
