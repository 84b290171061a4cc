"""MR fingerprinting (FISP) dictionary generation -- the flagship fast path.

Physics per TR (hard-pulse FISP, cf. reference examples
examples/profiling/differentiation_mrf.py and BASELINE config 2):

    T(FA_p * B1, phi_p)  ->  E(TE)  ->  echo = F0 [* e^{-i phi_p}]
    ->  E(TR_p - TE)  ->  S(1)

implemented as a single ``lax.scan`` over the pulse train with the state
ladder as carry.  Atom sweeps (T1 x T2 x B1 [x df]) are ``vmap``-ed; the
whole dictionary is one XLA program.  All program boundaries are real
(re/im split) -- see statematrix.py for why.

Performance model: per TR the state (B, K, 3) is read+written a few times
from HBM; XLA fuses the rotation/decay/shift chain into a handful of
elementwise kernels.  For B=100k atoms, K=21, 1000 TRs this is ~100 GB of
HBM traffic => sub-second on a v5e chip, vs minutes for the NumPy
reference.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..ops.transition import rotation_operator
from ..ops.shift import shift1d

__all__ = ["fisp_mrf_signal", "fisp_mrf_dictionary"]


def _relax(states, tau, T1, T2, nstate):
    """Apply relaxation for `tau` ms: decay + Z0 recovery toward 1."""
    E1 = jnp.exp(-tau / T1)
    E2 = jnp.exp(-tau / T2)
    decay = jnp.stack([E2, E2, E1], axis=-1)  # real diagonal (g=0 frame)
    states = states * decay.astype(states.dtype)
    return states.at[..., nstate, 2].add((1.0 - E1).astype(states.dtype))


def fisp_mrf_signal(FA, phi, TR, TE, T1, T2, B1=1.0, *, nstate: int = 10,
                    demodulate: bool = False, inversion: Optional[float] = None):
    """Simulate one atom's FISP MRF fingerprint.

    Args:
        FA: (P,) flip angles in degrees.
        phi: scalar or (P,) RF phases in degrees.
        TR: scalar or (P,) repetition times (ms).
        TE: scalar or (P,) echo times (ms) -- canonical MRF-FISP trains
            (Jiang 2015) vary TE alongside TR.
        T1, T2: scalar relaxation times (ms).
        B1: scalar relative transmit field.
        nstate: ladder half-size (static capacity).
        demodulate: multiply each echo by e^{-i phi_p} (receiver phase).
        inversion: if set, 180deg inversion followed by this delay (ms)
            before the train.

    Returns:
        (re, im): two (P,) float arrays -- the complex fingerprint split at
        the program boundary.
    """
    cdtype = config.complex_dtype()
    rdtype = config.real_dtype()
    P = FA.shape[0]
    phi = jnp.broadcast_to(jnp.asarray(phi, rdtype), (P,))
    TR = jnp.broadcast_to(jnp.asarray(TR, rdtype), (P,))
    TE = jnp.broadcast_to(jnp.asarray(TE, rdtype), (P,))
    K = 2 * nstate + 1

    states = jnp.zeros((K, 3), cdtype).at[nstate, 2].set(1.0)
    if inversion is not None:
        # 180deg inversion (B1-scaled) + recovery delay
        mat = rotation_operator(180.0 * B1, 0.0)[0].astype(cdtype)
        states = jnp.einsum("ij,kj->ki", mat, states, precision="highest")
        states = _relax(states, jnp.asarray(inversion, rdtype), T1, T2, nstate)

    def step(states, xs):
        fa, ph, tr, te = xs
        mat = rotation_operator(fa * B1, ph)[0].astype(cdtype)
        states = jnp.einsum("ij,kj->ki", mat, states, precision="highest")
        states = _relax(states, te, T1, T2, nstate)
        echo = states[nstate, 0]
        if demodulate:
            echo = echo * jnp.exp(-1j * jnp.deg2rad(ph)).astype(cdtype)
        states = _relax(states, tr - te, T1, T2, nstate)
        states = shift1d(states[None], 1)[0]
        return states, echo

    _, echoes = jax.lax.scan(step, states,
                             (jnp.asarray(FA, rdtype), phi, TR, TE))
    return echoes.real, echoes.imag


def _rotation_elems(alpha_deg, phi_deg):
    """Nine (B,) rotation coefficients for per-atom flip angles (degrees).

    Same Weigel matrix as ops.transition.rotation_operator, returned as
    flat coefficients so the 3x3 mix stays explicit VPU madds -- XLA
    lowers a batched (3,3,B) einsum into per-atom micro-dot_generals,
    which measured ~200x slower at B=100k.
    """
    rdtype = config.real_dtype()
    cdtype = config.complex_dtype()
    a = jnp.deg2rad(jnp.asarray(alpha_deg, rdtype))
    p = jnp.deg2rad(jnp.asarray(phi_deg, rdtype))
    cos2, sin2 = jnp.cos(a / 2) ** 2, jnp.sin(a / 2) ** 2
    sin, cos = jnp.sin(a), jnp.cos(a)
    ep = jnp.exp(1j * p).astype(cdtype)     # e^{i phi}
    ep2 = ep * ep
    i = jnp.asarray(1j, cdtype)
    # Rz(phi) Rx(a) Rz(-phi) in the (F+, F-, Z) basis:
    m00 = cos2.astype(cdtype)
    m01 = ep2 * sin2
    m02 = -i * ep * sin
    m10 = jnp.conj(m01)
    m11 = m00
    m12 = i * jnp.conj(ep) * sin
    m20 = -0.5 * i * jnp.conj(ep) * sin
    m21 = 0.5 * i * ep * sin
    m22 = cos.astype(cdtype)
    return (m00, m01, m02, m10, m11, m12, m20, m21, m22)


@partial(jax.jit, static_argnames=("nstate", "demodulate", "inversion", "normalize"))
def _dictionary_program(FA, phi, TR, TE, T1s, T2s, B1s, dfs, *, nstate,
                        demodulate, inversion, normalize):
    """Batched FISP scan with TPU-native layout: states (3, K, B).

    The atom axis B sits on the minor (lane) dimension so tiles pack
    densely; K rides the sublanes; the per-TR 3x3 mix is 9 fused VPU madds
    per lane.  (A (B, K, 3) layout pads 3 -> 128 lanes: 42x memory blowup.)
    """
    cdtype = config.complex_dtype()
    rdtype = config.real_dtype()
    K = 2 * nstate + 1
    B = T1s.shape[0]
    P = FA.shape[0]
    phi_b = jnp.broadcast_to(jnp.asarray(phi, rdtype), (P,))
    TR_b = jnp.broadcast_to(jnp.asarray(TR, rdtype), (P,))
    TE = jnp.asarray(TE, rdtype)
    var_te = TE.ndim == 1  # per-pulse echo times (canonical MRF-FISP)

    def te_terms(te):
        # off-resonance: F+ accumulates exp(+2i pi df tau) (reference
        # epgpy/evolution.py:230-256 sign convention); F- the conjugate
        return (jnp.exp(-te / T1s), jnp.exp(-te / T2s),
                jnp.exp(2j * jnp.pi * dfs * te).astype(cdtype)
                if dfs is not None else None)

    const_te = None if var_te else te_terms(TE)

    def rotate(states, fa_scaled, ph):
        Fp, Fm, Z = states
        m00, m01, m02, m10, m11, m12, m20, m21, m22 = _rotation_elems(fa_scaled, ph)
        nFp = m00 * Fp + m01 * Fm + m02 * Z
        nFm = m10 * Fp + m11 * Fm + m12 * Z
        nZ = m20 * Fp + m21 * Fm + m22 * Z
        return nFp, nFm, nZ

    def relax(states, E1, E2):
        Fp, Fm, Z = states
        E1c, E2c = E1.astype(cdtype), E2.astype(cdtype)
        Z = (Z * E1c).at[nstate, :].add(1.0 - E1c)
        return Fp * E2c, Fm * E2c, Z

    z0 = jnp.zeros((K, B), cdtype)
    states = (z0, z0, z0.at[nstate, :].set(1.0))

    if inversion is not None:
        states = rotate(states, 180.0 * B1s, jnp.zeros_like(B1s))
        states = relax(states, jnp.exp(-inversion / T1s),
                       jnp.exp(-inversion / T2s))
        if dfs is not None:
            # the residual transverse magnetization of an imperfect
            # (B1 != 1) inversion precesses during TI like any other
            # delay (phase convention as te_terms)
            phs = jnp.exp(2j * jnp.pi * dfs * inversion).astype(cdtype)
            Fp, Fm, Z = states
            states = (Fp * phs, Fm * jnp.conj(phs), Z)

    def step(carry, xs):
        # One fused plane pass per TR: both relaxations fold into the
        # rotation coefficients (decay is k-independent, so it commutes
        # with the shift; only the k=0 Z recovery needs separate adds):
        #   F_out = shift( rot(F,Z) * E2te * E2b )
        #   Z_out = rotZ(F,Z) * E1te * E1b + [(1-E1te) E1b + (1-E1b)] @ k=0
        #
        # Half-ladder carry: the F- plane is implied by the conjugate
        # symmetry F-(k) = conj(F+(-k)) and reconstructed with a row flip
        # (lax.rev is cheap in XLA, unlike Pallas TPU) -- the scan carry
        # and the per-TR update shrink from 3 to 2 planes.
        if var_te:
            fa, ph, tr, te = xs
            E1_te, E2_te, pe_te = te_terms(te)
        else:
            (fa, ph, tr), te = xs, TE
            E1_te, E2_te, pe_te = const_te
        Fp, Z = carry
        Fm = jnp.conj(Fp[::-1])
        m00, m01, m02, m10, m11, m12, m20, m21, m22 = _rotation_elems(
            fa * B1s, ph)
        E1b = jnp.exp(-(tr - te) / T1s)
        E2b = jnp.exp(-(tr - te) / T2s)
        cF = (E2_te * E2b).astype(cdtype)
        cZ = (E1_te * E1b).astype(cdtype)
        rec = ((1.0 - E1_te) * E1b + (1.0 - E1b)).astype(cdtype)

        # echo from the k=0 row only (post-rotation, post-TE decay)
        e2c = E2_te.astype(cdtype)
        if pe_te is not None:
            e2c = e2c * pe_te
        echo = (m00 * Fp[nstate] + m01 * Fm[nstate] + m02 * Z[nstate]) * e2c
        if demodulate:
            echo = echo * jnp.exp(-1j * jnp.deg2rad(ph)).astype(cdtype)

        cFp = cF
        if pe_te is not None:
            pe_tr = jnp.exp(2j * jnp.pi * dfs * (tr - te)).astype(cdtype)
            cFp = cF * pe_te * pe_tr
        nFp = (m00 * cFp) * Fp + (m01 * cFp) * Fm + (m02 * cFp) * Z
        nZ = (m20 * cZ) * Fp + (m21 * cZ) * Fm + (m22 * cZ) * Z
        nZ = nZ.at[nstate, :].add(rec)
        zrow = jnp.zeros((1, B), cdtype)
        nFp = jnp.concatenate([zrow, nFp[:-1, :]], axis=0)
        return (nFp, nZ), echo

    xs = (jnp.asarray(FA, rdtype), phi_b, TR_b)
    if var_te:
        xs += (jnp.broadcast_to(TE, (P,)),)
    _, echoes = jax.lax.scan(step, (states[0], states[2]), xs)
    re, im = echoes.real.T, echoes.imag.T                 # (B, P)
    if normalize:
        nrm = jnp.sqrt(jnp.sum(re * re + im * im, axis=-1, keepdims=True))
        scale = jnp.where(nrm > 0, 1.0 / nrm, 0.0)
        re, im = re * scale, im * scale
    return re, im


def fisp_mrf_dictionary(FA, TR, TE, T1s, T2s, B1s=None, dfs=None, *, phi=90.0,
                        nstate: int = 10, demodulate: bool = False,
                        inversion: Optional[float] = None,
                        normalize: bool = False, sharding=None):
    """Generate a FISP MRF dictionary: one fingerprint per atom.

    Args:
        FA: (P,) flip-angle train (deg); TR: scalar/(P,) (ms);
            TE: scalar or (P,) (ms).
        T1s, T2s, B1s: (B,) per-atom parameters (B1s defaults to ones).
        dfs: optional (B,) per-atom off-resonance (kHz) -- the 4th
            dictionary dimension of pSSFP-style MRF.  With `inversion`,
            the imperfect-inversion (B1 != 1) residual F+ precesses
            during TI too (the train equals an operator sequence whose
            prep E carries g=df; the kernel dispatch keeps the g=0-prep
            convention for matched op trains via inversion_df=False).
        sharding: optional ``jax.sharding.NamedSharding`` for the atom axis
            (multi-device data parallelism).

    Returns:
        (re, im): (B, P) float arrays (complex fingerprint, split).
    """
    rdtype = config.real_dtype()
    T1s = jnp.asarray(T1s, rdtype)
    T2s = jnp.asarray(T2s, rdtype)
    B1s = jnp.ones_like(T1s) if B1s is None else jnp.asarray(B1s, rdtype)
    dfs = None if dfs is None else jnp.asarray(dfs, rdtype)
    if sharding is not None:
        T1s = jax.device_put(T1s, sharding)
        T2s = jax.device_put(T2s, sharding)
        B1s = jax.device_put(B1s, sharding)
        if dfs is not None:
            dfs = jax.device_put(dfs, sharding)
    return _dictionary_program(
        jnp.asarray(FA, rdtype), phi, TR, jnp.asarray(TE, rdtype),
        T1s, T2s, B1s, dfs,
        nstate=nstate, demodulate=demodulate, inversion=inversion,
        normalize=normalize,
    )


def save_dictionary(path, re, im, T1s, T2s, B1s=None, **meta):
    """Persist a dictionary (split-complex fingerprints + atom grid)."""
    np.savez_compressed(
        path, re=np.asarray(re), im=np.asarray(im),
        T1s=np.asarray(T1s), T2s=np.asarray(T2s),
        B1s=np.ones(len(np.asarray(T1s))) if B1s is None else np.asarray(B1s),
        **{k: np.asarray(v) for k, v in meta.items()},
    )


def load_dictionary(path):
    """Load a dictionary saved by save_dictionary -> dict of numpy arrays."""
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def fisp_mrf_jacobian(FA, TR, TE, T1s, T2s, B1s=None, dfs=None, *, phi=90.0,
                      variables=("T1", "T2"), nstate: int = 10,
                      demodulate: bool = False, inversion=None):
    """Per-atom fingerprint derivatives dS/d(variables).

    variables: subset of ("T1", "T2", "B1").  Returns
    ((re, im), (dre, dim)) with fingerprints (B, P) and derivatives
    (B, P, nvars) -- the inputs to CRLB maps and dictionary-free fitting.
    `dfs` is an optional (B,) per-atom off-resonance (kHz; not a
    differentiation variable -- the phase is parameter-independent).
    """
    rdtype = config.real_dtype()
    T1s = jnp.asarray(T1s, rdtype)
    T2s = jnp.asarray(T2s, rdtype)
    B1s = jnp.ones_like(T1s) if B1s is None else jnp.asarray(B1s, rdtype)
    dfs = None if dfs is None else jnp.asarray(dfs, rdtype)
    FA = jnp.asarray(FA, rdtype)
    TE = jnp.asarray(TE, rdtype)
    idx = {"T1": 0, "T2": 1, "B1": 2}
    sel = tuple(idx[v] for v in variables)

    use_df = dfs is not None
    dfz = jnp.zeros_like(T1s) if dfs is None else dfs
    inv = None if inversion is None else float(inversion)
    return _jacobian_run(FA, jnp.asarray(phi, rdtype),
                         jnp.asarray(TR, rdtype), TE, T1s, T2s, B1s, dfz,
                         sel=sel, nstate=int(nstate),
                         demodulate=bool(demodulate),
                         inversion=inv, use_df=use_df)


# Atoms are independent, so dS_b/dtheta_b is a jvp of the BATCHED
# (K, B)-layout program with an all-ones tangent on that parameter.
# All nvars tangents push through ONE pass: vmap(jvp) over the
# tangent basis batches only the tangent half of the computation
# (the primal does not depend on the tangent inputs, so vmap leaves
# it unbatched and out_axes=None returns it once) -- 1 primal +
# one nvars-wide tangent sweep, instead of the nvars separate jvp
# calls that re-ran the primal each time (1 + 2*nvars passes).
# A vmapped per-atom jacfwd would be worse still: it puts the atom
# axis on the major dim ((B, K) states: K pads to 128 lanes) --
# measured ~60x slower.  Module-level jit: a per-call wrapper would
# retrace and recompile on EVERY fisp_mrf_jacobian call (the jit cache
# keys on wrapper identity -- CLAUDE.md fact 15).
@partial(jax.jit, static_argnames=("sel", "nstate", "demodulate",
                                   "inversion", "use_df"))
def _jacobian_run(FA, phi, TR, TE, T1s, T2s, B1s, dfs, *,
                  sel, nstate, demodulate, inversion, use_df):
    # `inversion` is STATIC (as in _dictionary_program -- a traced
    # value cannot feed that jit's static argname)
    def f(t1, t2, b1):
        return _dictionary_program(
            FA, phi, TR, TE, t1, t2, b1, dfs if use_df else None,
            nstate=nstate, demodulate=demodulate,
            inversion=inversion, normalize=False)

    ones = jnp.ones_like(T1s)
    zeros = jnp.zeros_like(T1s)

    def pushfwd(onehot):
        tangents = tuple(
            ones * onehot[sel.index(v)] if v in sel else zeros
            for v in range(3))
        return jax.jvp(f, (T1s, T2s, B1s), tangents)

    basis = jnp.eye(len(sel), dtype=T1s.dtype)
    sig, (dre, dim) = jax.vmap(
        pushfwd, in_axes=0, out_axes=(None, 0))(basis)
    return sig, (jnp.moveaxis(dre, 0, -1), jnp.moveaxis(dim, 0, -1))
