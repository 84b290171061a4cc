"""Device-mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "atom_sharding"]


def make_mesh(devices: Optional[Sequence] = None,
              axes: Sequence[str] = ("atoms",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over `devices` with named `axes`.

    With no explicit `shape`, all devices go to the first axis and the rest
    get size 1.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"Mesh shape {shape} != device count {n}")
    return Mesh(np.asarray(devices).reshape(shape), tuple(axes))


def atom_sharding(mesh: Mesh, axis: str = "atoms") -> NamedSharding:
    """Sharding placing the leading (atom) array axis on `axis`."""
    return NamedSharding(mesh, PartitionSpec(axis))
