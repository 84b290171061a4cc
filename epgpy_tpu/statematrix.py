"""Fixed-capacity EPG state matrix as a JAX pytree.

Design (TPU-first, cf. SURVEY.md §7):

* The reference grows/shrinks its state ladder dynamically
  (reference epgpy/statematrix.py:293-297, epgpy/shift.py:82-152).  XLA
  requires static shapes, so here the ladder capacity ``K = 2*ncap + 1`` is
  fixed at construction -- chosen by the simulation driver from the
  sequence's total shift count or the user's ``max_nstate`` option.  Unused
  rows hold exact zeros: every operator (diagonal decay, 3x3 per-state
  rotation, ladder shift) maps zero rows to zero rows, so no validity mask
  is needed.

* The state array layout is ``(*batch, K, 3)`` complex, storing the full
  symmetric ladder with components ``(F+, F-, Z)`` per k-state and the k=0
  row at index ``ncap`` (same convention as reference
  epgpy/statematrix.py:9-81, docs/basics.md:13).  The conjugate symmetry
  ``states[..., i, 1] == conj(states[..., K-1-i, 0])`` is preserved exactly
  by all operators (complex conjugation is exact in IEEE arithmetic).

* **Real-boundary storage**: the TPU backend only supports complex values
  strictly *inside* a compiled program -- never as eager-op results, jit
  inputs/outputs, or host transfers.  The pytree leaves are therefore the
  real/imaginary planes (``states_re``/``states_im``); the ``.states``
  property assembles the complex view lazily (at trace time inside jit, or
  eagerly on CPU).  Host-side construction/validation is pure NumPy.

* Batch ("parameter sweep") axes broadcast with the *append* rule: new
  parameter axes are appended after existing ones (see common.py).  There
  is no ArrayCollection: broadcasting is resolved functionally at operator
  application time and ``vmap``/``pjit`` own the batch axes.

* The object is an immutable pytree; operators return updated copies via
  :meth:`update`.  ``options`` and structural metadata are static aux data
  so ``jit`` caches compile per structure, not per value.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import common, config

__all__ = ["StateMatrix"]


def _freeze(obj):
    """Recursively convert dicts/lists to hashable static structures."""
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


def _split(arr):
    """Split a complex (or real) array into (re, im) real parts."""
    if arr is None:
        return None, None
    if isinstance(arr, np.ndarray):
        rdtype = np.float64 if config.x64_enabled() else np.float32
        return (np.ascontiguousarray(arr.real, dtype=rdtype),
                np.ascontiguousarray(arr.imag, dtype=rdtype))
    arr = jnp.asarray(arr)
    if jnp.iscomplexobj(arr):
        return arr.real, arr.imag
    return arr, jnp.zeros_like(arr)


def _join(re, im):
    """Assemble the complex view (trace-time / CPU-eager only)."""
    if re is None:
        return None
    return jax.lax.complex(jnp.asarray(re, config.real_dtype()),
                           jnp.asarray(im, config.real_dtype()))


class StateMatrix:
    """n-dimensional phase-state matrix with static ladder capacity."""

    __slots__ = (
        "states_re", "states_im", "equilibrium_re", "equilibrium_im",
        "coords", "kvalue", "tvalue", "system", "options", "lanes",
    )

    def __init__(
        self,
        init=None,
        *,
        density=1.0,
        equilibrium=None,
        coords=None,
        kvalue=1.0,
        tvalue=1.0,
        nstate: Optional[int] = None,
        shape: Optional[tuple] = None,
        check: bool = True,
        system: Optional[dict] = None,
        **options,
    ):
        # host-side (NumPy) construction: no device complex anywhere
        if equilibrium is None:
            dens = np.atleast_1d(np.asarray(density, dtype=np.complex128))
            dens = dens.reshape(dens.shape + (1, 1))
            equilibrium = dens * np.asarray([[0, 0, 1]], dtype=np.complex128)
        equilibrium = _format_states(equilibrium, check=check)

        if init is None:
            states = equilibrium
        else:
            states = _format_states(init, check=check)

        # static hint: were the init/equilibrium ladders actually
        # verified to satisfy F-(k)=conj(F+(-k))?  check=False and
        # device/traced inputs skip the check, so the half-ladder lanes
        # layout (which silently symmetrizes by dropping F-) must not
        # engage for them.  MUST be decided here: _pad_ladder_np below
        # converts device ladders to NumPy (np.pad), which would make
        # the post-padding isinstance test vacuously pass.
        def _host_checked(x):
            return not isinstance(x, (jax.core.Tracer, jnp.ndarray))

        sym_verified = bool(check and _host_checked(states)
                            and _host_checked(equilibrium))

        # common ladder size
        K = max(states.shape[-2], equilibrium.shape[-2])
        if nstate is not None:
            K = max(K, 2 * int(nstate) + 1)
        states = _pad_ladder_np(states, K)
        equilibrium = _pad_ladder_np(equilibrium, K)

        if shape:
            bshape = common.broadcast_shapes(states.shape[:-2], tuple(shape))
            nb = states.ndim - 2
            states = states.reshape(
                states.shape[:nb] + (1,) * (len(bshape) - nb) + states.shape[nb:])
            states = np.broadcast_to(states, bshape + states.shape[-2:]).copy()

        self.states_re, self.states_im = _split(states)
        self.equilibrium_re, self.equilibrium_im = _split(equilibrium)
        self.lanes = False
        self.coords = None if coords is None else jnp.asarray(coords)
        self.kvalue = kvalue
        self.tvalue = tvalue
        self.system = dict(system) if system else {}
        self.options = dict(options)
        # static sparsity hint: equilibrium supported only on the Z row at
        # k=0 (the overwhelmingly common case) -- lets relaxation recovery
        # apply as a single-row add instead of a full-ladder FMA
        if isinstance(equilibrium, (jax.core.Tracer, jnp.ndarray)):
            # can't inspect device/traced values host-side: disable the
            # single-row recovery fast path (conservative, correct)
            self.options["_eq_center"] = False
        else:
            c = equilibrium.shape[-2] // 2
            off = equilibrium.copy()
            off[..., c, 2] = 0
            self.options["_eq_center"] = bool(not off.any())
        self.options["_sym_verified"] = sym_verified

    # -- construction helpers --

    @classmethod
    def _from_fields(cls, states_re, states_im, equilibrium_re, equilibrium_im,
                     coords, kvalue, tvalue, system, options, lanes=False):
        sm = object.__new__(cls)
        sm.states_re = states_re
        sm.states_im = states_im
        sm.equilibrium_re = equilibrium_re
        sm.equilibrium_im = equilibrium_im
        sm.coords = coords
        sm.kvalue = kvalue
        sm.tvalue = tvalue
        sm.system = system
        sm.options = options
        sm.lanes = lanes
        return sm

    def update(self, **fields) -> "StateMatrix":
        """Functional update; `states=`/`equilibrium=` accept complex arrays
        in the canonical (*batch, K, 3) view regardless of storage layout;
        `states_lanes=(Fp, Fm, Z)` stores complex planes directly."""
        vals = {name: getattr(self, name) for name in self.__slots__}
        lanes = fields.get("lanes", self.lanes)

        def store(value):
            re, im = _split(value)
            if lanes:
                # lanes layout keeps (Fp, Z) planes as SEPARATE leaves (no
                # per-op (3, K, batch) restack); the F- plane is implied by
                # the conjugate ladder symmetry F-(k) = conj(F+(-k)) and
                # reconstructed on read -- a third less carry traffic and
                # per-op math in compiled programs
                re = tuple(jnp.moveaxis(re[..., i], -1, 0) for i in (0, 2))
                im = tuple(jnp.moveaxis(im[..., i], -1, 0) for i in (0, 2))
            return re, im

        if "states" in fields:
            vals["states_re"], vals["states_im"] = store(fields.pop("states"))
        if "states_lanes" in fields:
            # equal plane shapes keep scan carries structure-invariant
            planes = fields.pop("states_lanes")
            if len(planes) == 3:  # (Fp, Fm, Z): drop the implied F- plane
                planes = (planes[0], planes[2])
            planes = jnp.broadcast_arrays(*planes)
            vals["states_re"] = tuple(jnp.real(p) for p in planes)
            vals["states_im"] = tuple(jnp.imag(p) for p in planes)
        if "equilibrium" in fields:
            eq = fields.pop("equilibrium")
            vals["equilibrium_re"], vals["equilibrium_im"] = store(eq)
            center_only = False
            if not isinstance(eq, jax.core.Tracer):
                host = np.asarray(eq)
                off = host.copy()
                off[..., host.shape[-2] // 2, 2] = 0
                center_only = bool(not off.any())
            vals["options"] = {**vals["options"], "_eq_center": center_only}
        vals.update(fields)
        return StateMatrix._from_fields(
            vals["states_re"], vals["states_im"],
            vals["equilibrium_re"], vals["equilibrium_im"],
            vals["coords"], vals["kvalue"], vals["tvalue"],
            vals["system"], vals["options"], vals["lanes"],
        )

    copy = update  # parity alias (reference epgpy/statematrix.py:276)

    # -- lanes layout (TPU): (Fp, Z) x (K, *batch) plane-major storage
    #    (the F- plane is implied: F-(k) = conj(F+(-k))) --

    def to_lanes(self) -> "StateMatrix":
        """Transpose to the TPU-friendly (3, K, *batch) internal layout.

        Batch dims become the minor (lane-tiled) axes: a (*batch, K, 3)
        array tile-pads its trailing (K, 3) to (8k, 128) on TPU.  Only
        1-D-ladder operators support this layout (engine checks).
        """
        if self.lanes:
            return self

        def tr(a):
            return None if a is None else tuple(
                jnp.moveaxis(a[..., i], -1, 0) for i in (0, 2))

        return self.update(
            states_re=tr(self.states_re), states_im=tr(self.states_im),
            equilibrium_re=tr(self.equilibrium_re),
            equilibrium_im=tr(self.equilibrium_im), lanes=True)

    def from_lanes(self) -> "StateMatrix":
        if not self.lanes:
            return self

        def tr(t, sign):
            # (Fp, Z) -> (Fp, Fm, Z) with Fm = conj(flip_k(Fp)): the re
            # part flips, the im part flips and negates
            if t is None:
                return None
            fp, z = t
            fm = sign * fp[::-1]
            return jnp.stack(
                [jnp.moveaxis(p, 0, -1) for p in (fp, fm, z)], axis=-1)

        return self.update(
            states_re=tr(self.states_re, 1), states_im=tr(self.states_im, -1),
            equilibrium_re=tr(self.equilibrium_re, 1),
            equilibrium_im=tr(self.equilibrium_im, -1), lanes=False)

    # -- complex views --

    @property
    def states(self):
        """Complex state ladder, always viewed as (*batch, K, 3)."""
        if self.lanes:
            fp, fm, z = self.planes
            return jnp.stack(
                [jnp.moveaxis(p, 0, -1) for p in (fp, fm, z)], axis=-1)
        return _join(self.states_re, self.states_im)

    @property
    def half_planes(self):
        """Stored (Fp, Z) complex planes, each (K, *batch) (lanes mode)."""
        assert self.lanes
        return (_join(self.states_re[0], self.states_im[0]),
                _join(self.states_re[1], self.states_im[1]))

    @property
    def planes(self):
        """(Fp, Fm, Z) complex planes, each (K, *batch) (lanes mode)."""
        if self.lanes:
            fp = _join(self.states_re[0], self.states_im[0])
            z = _join(self.states_re[1], self.states_im[1])
            return fp, jnp.conj(fp[::-1]), z
        s = jnp.moveaxis(_join(self.states_re, self.states_im), (-2, -1), (1, 0))
        return s[0], s[1], s[2]

    @property
    def equilibrium(self):
        if self.lanes:
            fp = _join(self.equilibrium_re[0], self.equilibrium_im[0])
            z = _join(self.equilibrium_re[1], self.equilibrium_im[1])
            return jnp.stack(
                [jnp.moveaxis(p, 0, -1)
                 for p in (fp, jnp.conj(fp[::-1]), z)], axis=-1)
        return _join(self.equilibrium_re, self.equilibrium_im)

    # -- structural properties --

    @property
    def shape(self) -> tuple:
        """Batch shape (parameter-sweep axes)."""
        if self.lanes:
            return self.states_re[0].shape[1:]
        return self.states_re.shape[:-2]

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def size(self) -> int:
        return math.prod(self.shape)

    @property
    def nstate(self) -> int:
        """Ladder half-size: K == 2*nstate + 1."""
        K = self.states_re[0].shape[0] if self.lanes else self.states_re.shape[-2]
        return (K - 1) // 2

    @property
    def kdim(self) -> int:
        return 1 if self.coords is None else self.coords.shape[-1]

    # -- physics views --

    @property
    def F(self):
        """Transverse states F+ ladder, (*batch, K)."""
        if self.lanes:
            return jnp.moveaxis(_join(self.states_re[0], self.states_im[0]),
                                0, -1)
        return self.states[..., 0]

    @property
    def i0(self):
        """Center index (k == 0) or mask of k==0 rows for kdim == 4."""
        if self.kdim < 4:
            return self.nstate
        return jnp.all(jnp.abs(self.coords[..., :3]) < 1e-12, axis=-1)

    @property
    def F0(self):
        """Echo amplitude: F+ at k=0 (T2'-weighted sum over times if kdim==4)."""
        if self.lanes:
            return _join(self.states_re[0][self.nstate],
                         self.states_im[0][self.nstate])
        if self.kdim < 4:
            return self.states[..., self.nstate, 0]
        evol = jnp.exp(-jnp.abs(self.t))
        return jnp.sum(self.states[..., 0] * self.i0 * evol, axis=-1)

    @property
    def F0t(self):
        """Separate F0 per accumulated time (kdim == 4)."""
        if self.kdim < 4:
            return self.states[..., self.nstate, 0]
        return self.states[..., 0] * self.i0

    @property
    def Z(self):
        if self.lanes:
            return jnp.moveaxis(_join(self.states_re[1], self.states_im[1]),
                                0, -1)
        return self.states[..., 2]

    @property
    def Z0(self):
        if self.lanes:
            return _join(self.states_re[1][self.nstate],
                         self.states_im[1][self.nstate])
        if self.kdim < 4:
            return self.states[..., self.nstate, 2]
        return self.states[..., 2] * self.i0

    @property
    def k(self):
        """Physical wavenumbers (rad/m): coords[..., :3] * kvalue."""
        coords = self.coords
        if coords is None:
            n = self.nstate
            coords = jnp.arange(-n, n + 1, dtype=config.real_dtype())[:, None]
            coords = coords.reshape((1,) * self.ndim + coords.shape)
        kvalue = self.kvalue
        if not jnp.isscalar(kvalue) and common.get_shape(kvalue):
            kvalue = jnp.asarray(kvalue)[: coords.shape[-1]]
        return coords[..., :3] * kvalue

    @property
    def t(self):
        """Accumulated dephasing time (4th coordinate)."""
        if self.kdim < 4:
            return jnp.zeros(())
        return self.coords[..., 3] * self.tvalue

    @property
    def t0(self):
        if self.kdim < 4:
            return jnp.zeros(())
        return self.coords[..., 3] * self.i0 * self.tvalue

    @property
    def ktvalue(self):
        """Per-coordinate scaling [kvalue...(<=3), tvalue (if kdim==4)]."""
        kdim = self.kdim
        kvalue, tvalue = self.kvalue, self.tvalue
        if not common.get_shape(kvalue):
            coeff = [kvalue] * min(kdim, 3) + [tvalue] * (kdim == 4)
        else:
            coeff = list(np.asarray(kvalue).ravel())[:3] + [tvalue] * (kdim == 4)
        return jnp.asarray(coeff, dtype=config.real_dtype())

    @property
    def density(self):
        if self.lanes:
            z = self.equilibrium_re[1]
            return z[(z.shape[0] - 1) // 2]
        n = (self.equilibrium_re.shape[-2] - 1) // 2
        return self.equilibrium_re[..., n, 2]

    @property
    def norm(self):
        """State-matrix norm over (F-, Z) components (reference utils.py:152)."""
        if self.lanes:
            # |F-| sums equal |F+| sums under the conjugate-flip symmetry
            mag2 = sum(self.states_re[i] ** 2 + self.states_im[i] ** 2
                       for i in (0, 1))
            return jnp.sqrt(jnp.sum(mag2, axis=0))
        mag2 = self.states_re[..., 1:] ** 2 + self.states_im[..., 1:] ** 2
        return jnp.sqrt(jnp.sum(mag2, axis=(-2, -1)))

    # -- shape manipulation --

    def expand(self, ndim: int) -> "StateMatrix":
        """Append trailing batch axes until batch rank is `ndim`."""
        diff = ndim - self.ndim
        if diff <= 0:
            return self

        if self.lanes:
            def _exl(t):
                if t is None:
                    return None
                return tuple(p.reshape(p.shape + (1,) * diff) for p in t)

            return self.update(
                states_re=_exl(self.states_re), states_im=_exl(self.states_im),
                equilibrium_re=_exl(self.equilibrium_re),
                equilibrium_im=_exl(self.equilibrium_im),
            )

        def _ex(arr, core):
            # pad each leaf to batch rank `ndim` individually: a leaf may
            # already carry more batch axes than the states (e.g. a coords
            # table pre-expanded to the full broadcast shape)
            if arr is None:
                return None
            nbatch = arr.ndim - core
            d = ndim - nbatch
            if d <= 0:
                return arr
            return arr.reshape(arr.shape[:nbatch] + (1,) * d + arr.shape[nbatch:])

        return self.update(
            states_re=_ex(self.states_re, 2), states_im=_ex(self.states_im, 2),
            equilibrium_re=_ex(self.equilibrium_re, 2),
            equilibrium_im=_ex(self.equilibrium_im, 2),
            coords=_ex(self.coords, 2),
        )

    def broadcast(self, shape: tuple) -> "StateMatrix":
        """Broadcast batch axes to `shape` (append rule), materializing states."""
        if self.lanes:  # compat-layout structural op
            return self.from_lanes().broadcast(shape).to_lanes()
        shape = tuple(shape)
        sm = self.expand(len(shape))
        target = common.broadcast_shapes(sm.shape, shape)
        core = sm.states_re.shape[-2:]
        return sm.update(
            states_re=jnp.broadcast_to(sm.states_re, target + core),
            states_im=jnp.broadcast_to(sm.states_im, target + core),
        )

    def resize(self, nstate: int) -> "StateMatrix":
        """Pad/crop the ladder symmetrically to half-size `nstate` (static)."""
        if self.lanes:  # compat-layout structural op
            return self.from_lanes().resize(nstate).to_lanes()
        K = 2 * int(nstate) + 1
        return self.update(
            states_re=_pad_ladder(self.states_re, K),
            states_im=_pad_ladder(self.states_im, K),
            equilibrium_re=_pad_ladder(self.equilibrium_re, K),
            equilibrium_im=_pad_ladder(self.equilibrium_im, K),
            coords=None if self.coords is None else _pad_ladder(self.coords, K),
        )

    def setup_coords(self, kdim: int) -> "StateMatrix":
        """Attach (or widen) explicit k-coordinates of dimension `kdim`."""
        n = self.nstate
        if self.coords is not None:
            diff = kdim - self.kdim
            if diff < 0:
                raise RuntimeError("Cannot remove existing k-dimensions")
            if diff == 0:
                return self
            zeros = jnp.zeros(self.coords.shape[:-1] + (diff,), self.coords.dtype)
            return self.update(coords=jnp.concatenate([self.coords, zeros], axis=-1))
        # fresh ladder: build host-side (np) -- eager jnp ops here cost
        # several device round-trips per simulate() call
        rdt = np.float64 if config.x64_enabled() else np.float32
        ladder = np.arange(-n, n + 1, dtype=rdt)
        coords = np.stack(
            [ladder] + [np.zeros_like(ladder)] * (kdim - 1), axis=-1
        )
        coords = coords.reshape((1,) * self.ndim + coords.shape)
        return self.update(coords=coords)

    def stack(self, others, *, axis: int = 0) -> "StateMatrix":
        """Stack state matrices along a new batch axis."""
        if self.lanes:  # compat-layout structural op
            return self.from_lanes().stack(
                [s.from_lanes() for s in others], axis=axis).to_lanes()
        sms = [self] + list(others)

        def _st(field):
            arrs = [getattr(s, field) for s in sms]
            full = [jnp.broadcast_to(a, sms[i].states_re.shape)
                    for i, a in enumerate(arrs)]
            return jnp.stack(full, axis=axis)

        coords = None
        if sms[0].coords is not None:
            coords = jnp.stack([s.coords for s in sms], axis=axis)
        # the center-only-equilibrium fast-path hint must hold for EVERY
        # stacked matrix (raw equilibrium_re/_im fields bypass update()'s
        # recompute; keeping only self's hint would skip F-row recovery
        # for a stacked partner with an off-center equilibrium)
        hint = all(bool(s.options.get("_eq_center", False)) for s in sms)
        opts = self.options
        if bool(opts.get("_eq_center", False)) != hint:
            opts = {**opts, "_eq_center": hint}
        return self.update(
            states_re=jnp.stack([s.states_re for s in sms], axis=axis),
            states_im=jnp.stack([s.states_im for s in sms], axis=axis),
            equilibrium_re=_st("equilibrium_re"),
            equilibrium_im=_st("equilibrium_im"),
            coords=coords,
            options=opts,
        )

    def unstack(self, *, axis: int = 0):
        """Split along a batch axis into a list of state matrices."""
        if self.lanes:  # compat-layout structural op
            return [s.to_lanes() for s in self.from_lanes().unstack(axis=axis)]
        n = self.states_re.shape[axis]
        out = []
        for i in range(n):
            idx = (slice(None),) * axis + (i,)
            eq_re = jnp.broadcast_to(self.equilibrium_re, self.states_re.shape)
            eq_im = jnp.broadcast_to(self.equilibrium_im, self.states_re.shape)
            out.append(self.update(
                states_re=self.states_re[idx], states_im=self.states_im[idx],
                equilibrium_re=eq_re[idx], equilibrium_im=eq_im[idx],
                coords=None if self.coords is None else self.coords[idx]))
        return out

    def check(self) -> bool:
        """Verify conjugate ladder symmetry (reference utils.py:118-121)."""
        if self.lanes:
            sm = self.from_lanes()
        else:
            sm = self
        s = np.asarray(jnp.stack([sm.states_re, sm.states_im], axis=0))
        s = s[0] + 1j * s[1]
        return bool(np.allclose(s, np.conj(s[..., ::-1, :][..., (1, 0, 2)])))

    def __repr__(self):
        return f"StateMatrix({self.shape}, nstate={self.nstate})"


def _pad_ladder(arr, K: int):
    """Pad or crop the (second-to-last) ladder axis symmetrically to size K."""
    cur = arr.shape[-2]
    if cur == K:
        return arr
    diff = (K - cur) // 2
    if (K - cur) % 2 != 0:
        raise ValueError(f"Ladder sizes must share parity: {cur} -> {K}")
    if diff > 0:
        pad = [(0, 0)] * (arr.ndim - 2) + [(diff, diff), (0, 0)]
        return jnp.pad(arr, pad)
    return arr[..., -diff:cur + diff, :]


def _pad_ladder_np(arr, K: int):
    cur = arr.shape[-2]
    if cur == K:
        return arr
    diff = (K - cur) // 2
    if (K - cur) % 2 != 0:
        raise ValueError(f"Ladder sizes must share parity: {cur} -> {K}")
    # traced/device ladders must stay in jnp: np.pad would force a d2h
    # transfer (complex d2h is UNIMPLEMENTED on the axon TPU backend)
    # and breaks under jit tracing
    xp = jnp if isinstance(arr, (jax.core.Tracer, jnp.ndarray)) else np
    if diff > 0:
        pad = [(0, 0)] * (arr.ndim - 2) + [(diff, diff), (0, 0)]
        return xp.pad(arr, pad)
    return arr[..., -diff:cur + diff, :]


def _format_states(states, check: bool = True):
    """Normalize an init spec to a (..., 2n+1, 3) complex128 NumPy ladder."""
    if isinstance(states, jax.core.Tracer) or isinstance(states, jnp.ndarray):
        # traced / device input: skip value checks, keep as-is
        states = jnp.asarray(states)
        if states.ndim == 1:
            states = states.reshape((1, 3))
        if states.ndim == 2:
            states = states[None]
        return states
    states = np.asarray(states, dtype=np.complex128)
    if states.ndim == 1:
        if check and states.size != 3:
            raise ValueError("The number of state components must be 3")
        states = states.reshape((1, 3))
    if check:
        if states.shape[-1] != 3:
            raise ValueError("The number of state components must be 3")
        if states.shape[-2] % 2 != 1:
            raise ValueError("The number of states must be odd")
        if not np.allclose(states[..., 1], np.conj(states[..., ::-1, 0])):
            raise ValueError("The F-state columns do not match")
        if not np.allclose(states[..., 2], np.conj(states[..., ::-1, 2])):
            raise ValueError("The Z-state column is not symmetrical")
    if states.ndim == 2:
        states = states[None]
    return states


# -- pytree registration --

def _sm_flatten(sm: StateMatrix):
    syskeys = tuple(sorted(sm.system))
    children = (
        sm.states_re, sm.states_im, sm.equilibrium_re, sm.equilibrium_im,
        sm.coords, sm.kvalue, sm.tvalue,
        tuple(sm.system[k] for k in syskeys),
    )
    aux = (syskeys, _freeze(sm.options), sm.lanes)
    return children, aux


def _sm_unflatten(aux, children):
    syskeys, frozen_opts, lanes = aux
    (states_re, states_im, equilibrium_re, equilibrium_im,
     coords, kvalue, tvalue, sysvals) = children
    options = {k: v for k, v in frozen_opts}
    system = dict(zip(syskeys, sysvals))
    return StateMatrix._from_fields(
        states_re, states_im, equilibrium_re, equilibrium_im,
        coords, kvalue, tvalue, system, options, lanes,
    )


jax.tree_util.register_pytree_node(StateMatrix, _sm_flatten, _sm_unflatten)
