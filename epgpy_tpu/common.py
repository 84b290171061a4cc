"""Shape utilities: append-style broadcasting.

The framework follows the reference's broadcasting law (reference
epgpy/common.py:273-334): parameter arrays broadcast **left-aligned**
("append" style) -- new axes are appended *after* existing ones, the
opposite of NumPy's prepend rule.  An operator with batch shape (100,)
composes with one of batch shape (100, 50) by implicit trailing expansion,
so each physical parameter sweep owns a fixed leading axis position
regardless of how many sweeps follow it.

All functions here are Python/trace-time helpers operating on static shapes
plus `jnp.reshape`-based array expansion; nothing allocates on device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "get_shape",
    "expand_shapes",
    "broadcastable",
    "broadcast_shapes",
    "expand_arrays",
    "expand_dims_after",
    "set_axes",
    "repr_operator",
    "repr_value",
]


def get_shape(obj) -> tuple:
    """Shape of an array, nested sequence or scalar (scalars -> ())."""
    if obj is None:
        return ()
    if hasattr(obj, "shape"):
        return tuple(obj.shape)
    if isinstance(obj, (list, tuple)):
        if len(obj) == 0:
            return (0,)
        return (len(obj),) + get_shape(obj[0])
    return ()


def expand_shapes(*shapes, append=True):
    """Pad shapes to a common rank (append: pad on the right)."""
    ndim = max((len(s) for s in shapes), default=0)
    if append:
        return [tuple(s) + (1,) * (ndim - len(s)) for s in shapes]
    return [(1,) * (ndim - len(s)) + tuple(s) for s in shapes]


def broadcastable(*shapes, append=True) -> bool:
    """Whether shapes broadcast together under the append rule."""
    padded = expand_shapes(*shapes, append=append)
    return all(len({d for d in dims if d != 1}) <= 1 for dims in zip(*padded))


def broadcast_shapes(*shapes, append=True) -> tuple:
    """Broadcast shapes together (left-aligned when append=True)."""
    padded = expand_shapes(*shapes, append=append)
    out = []
    for dims in zip(*padded):
        nontrivial = {d for d in dims if d != 1}
        if len(nontrivial) > 1:
            raise ValueError(f"Incompatible shapes: {shapes}")
        out.append(nontrivial.pop() if nontrivial else 1)
    return tuple(out)


def expand_dims_after(arr, ndim: int):
    """Append trailing singleton axes until `arr.ndim == ndim`."""
    arr = jnp.asarray(arr)
    if arr.ndim >= ndim:
        return arr
    return arr.reshape(arr.shape + (1,) * (ndim - arr.ndim))


def expand_arrays(*objs, append=True):
    """Expand arrays to a common rank (None passes through)."""
    shapes = [get_shape(o) for o in objs]
    if not broadcastable(*shapes, append=append):
        raise ValueError(f"Shapes cannot be broadcast: {shapes}")
    ndim = max((len(s) for s in shapes), default=0)
    out = []
    for obj, shape in zip(objs, shapes):
        if obj is None or not shape:
            out.append(obj)
        elif append:
            out.append(expand_dims_after(jnp.asarray(obj), ndim))
        else:
            arr = jnp.asarray(obj)
            out.append(arr.reshape((1,) * (ndim - arr.ndim) + arr.shape))
    return tuple(out)


def extend_operators(core_ndim: int, *arrs):
    """Align operator arrays' batch axes (left-aligned), keeping core axes.

    Each array's batch part is ``shape[:-core_ndim]``; singleton axes are
    inserted between batch and core so all arrays share the same rank
    (mirrors reference epgpy/common.py:354-364 semantics).
    """
    ranks = [a.ndim - core_ndim for a in arrs if a is not None]
    nbatch = max(ranks, default=0)
    out = []
    for arr in arrs:
        if arr is None:
            out.append(None)
            continue
        b = arr.ndim - core_ndim
        arr = arr.reshape(arr.shape[:b] + (1,) * (nbatch - b) + arr.shape[b:])
        out.append(arr)
    return tuple(out)


def shape_with_axes(shape: tuple, axes) -> tuple:
    """Operator batch shape after `axes=` pinning (see set_axes)."""
    if axes is None:
        return shape
    nbatch = len(shape)
    if isinstance(axes, int):
        axes = tuple(range(axes, axes + nbatch))
    if len(axes) != nbatch:
        # mirror set_axes' validation: a silently zip-truncated shape
        # would diverge from what apply() later accepts
        raise ValueError(
            f"Invalid axes {axes} for {nbatch} batch dim(s)")
    out = [1] * (max(axes) + 1)
    for pos, dim in zip(axes, shape):
        out[pos] = dim
    return tuple(out)


def set_axes(core_ndim: int, arr, axes):
    """Pin an operator's parameter axes to user-chosen batch positions.

    Mirrors the semantics of the reference's ``axes=`` keyword (reference
    epgpy/common.py:337-347): the array's existing batch axes (all axes
    except the trailing `core_ndim` ones) are moved to positions `axes`
    by inserting singleton axes before them.
    """
    nbatch = arr.ndim - core_ndim
    if isinstance(axes, int):
        axes = tuple(range(axes, axes + nbatch))
    axes = tuple(axes)
    if len(axes) != nbatch or any(not isinstance(ax, int) for ax in axes):
        raise ValueError(f"Invalid axes {axes} for {nbatch} batch dims")
    # insert singleton dims for all positions < max(axes) not in axes
    newdims = tuple(i for i in range(max(axes)) if i not in axes)
    arr = jnp.asarray(arr)
    for dim in sorted(newdims):
        arr = jnp.expand_dims(arr, dim)
    return arr


# -- repr helpers (cosmetic parity with reference epgpy/common.py) --


def repr_value(value, fmt="") -> str:
    shape = get_shape(value)
    if not shape:
        try:
            return format(value, fmt)
        except (TypeError, ValueError):
            return str(value)
    return "array" + str(tuple(shape))


def repr_operator(name, argnames=(), argvalues=(), formats=()) -> str:
    formats = list(formats) + [""] * (len(argnames) - len(formats))
    args = ", ".join(
        repr_value(v, f) for v, f in zip(argvalues, formats) if v is not None
    )
    return f"{name}({args})"


def asnumpy(obj):
    """Copy a device array to host numpy."""
    return np.asarray(obj)


# -- aux-data freezing (pytree aux must be hashable & comparable) --


class Frozen(tuple):
    """Marker wrapper for a dict frozen as a sorted item tuple."""


class _FrozenList(tuple):
    """Hashable stand-in for a frozen list aux value: unfreeze_aux
    restores it as a list (a plain tuple would silently mutate the
    attribute's type on every Operator.copy()/strip_meta round-trip)."""

    __slots__ = ()


def as_real(value):
    """Parameter coercion shared by the physics ops: None passes
    through, traced/device values stay jnp, concrete values become
    float numpy arrays (host-side, scan-stackable)."""
    if value is None:
        return None
    if isinstance(value, (jax.core.Tracer, jnp.ndarray)):
        return jnp.asarray(value)
    return np.asarray(value, dtype=float)


def freeze_aux(v):
    if isinstance(v, dict):
        return Frozen(sorted((k, freeze_aux(x)) for k, x in v.items()))
    if isinstance(v, list):
        return _FrozenList(freeze_aux(x) for x in v)
    if isinstance(v, tuple) and not isinstance(v, Frozen):
        return tuple(freeze_aux(x) for x in v)
    if isinstance(v, np.ndarray):
        return ("__ndarray__", v.tobytes(), v.dtype.str, v.shape)
    return v


def unfreeze_aux(v):
    if isinstance(v, Frozen):
        return {k: unfreeze_aux(x) for k, x in v}
    if isinstance(v, _FrozenList):
        return [unfreeze_aux(x) for x in v]
    if isinstance(v, tuple) and len(v) == 4 and v[0] == "__ndarray__":
        return np.frombuffer(v[1], dtype=np.dtype(v[2])).reshape(v[3]).copy()
    if isinstance(v, tuple):
        return tuple(unfreeze_aux(x) for x in v)
    return v
