"""Pallas TPU kernel: fused EPG-X (exchange / magnetization-transfer) GRE trains.

The canonical EPG-X workload (Malik 2018; reference
epgpy/exchange.py:89-120 applied per TR in
examples/exchange/gre_exchange.py) is a spoiled-GRE train over C
exchanging compartments:

    [ R(sat)? , T(alpha_i, phi_i) , X(tauA)? , ADC , X(tauB)? , S(1) ] * N

where ``R`` is an optional per-TR bound-pool saturation (raw complex
rates, no recovery), ``T`` rotates each compartment independently
(per-compartment flip angles -- the bound pool typically gets alpha=0),
and ``X`` jointly relaxes and exchanges the compartments via the matrix
exponential of the kinetic matrix.  Up to two X stages per TR are
supported (readout between them); an absent stage is the identity.

Like the FISP/CPMG kernels (pallas_fisp.py, pallas_mse.py) the whole
folded half-ladder (A(k)=F+(k), B(k)=F+(-k), Z(k), k >= 0) lives in VMEM
scratch across the train -- here one 6-plane set PER COMPARTMENT -- and
only the per-TR center states stream out.  The compartment mix is a
C x C complex madd per plane (C is static; unrolled), never a stacked
matmul.  Exchange relaxes ``states - equilibrium`` and re-adds the
equilibrium (reference epgpy/exchange.py:103-120): the equilibrium is
supported on the Z row at k=0 with per-compartment densities.

All mixing matrices are per-atom (the T2/T1/g sweeps ride the atom
axis): they are computed OUTSIDE the kernel by the closed-form 2x2
spectral expm (ops/exchange._expm) and streamed in as a packed
(6*C*C, B) coefficient block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["xgre_dictionary_pallas", "xgre_dictionary_pallas_sharded",
           "xgre_jacobian_pallas", "exchange_stage_mats"]


# plane math shared across kernel families -- see pallas_common
from .pallas_common import (_cmul, _rot_coeffs, _apply_rot, _mix_planes,
                            _shift_store, _store_set)


def _kernel_xgre(alpha_ref, phi_ref, sfr_ref, sfi_ref, szr_ref, szi_ref,
                 dens_ref, b1_ref, coef_ref, *refs, nstate, ntr, ncomp,
                 shift=True):
    """See module docstring.  refs = (out_re_0, out_im_0, ..., st_ref).

    st_ref: (6*C, nstate+1, btile) VMEM scratch; per compartment c the
    planes 6c..6c+5 are (AR, AI, BR, BI, ZR, ZI).  coef_ref packs the
    two exchange stages as rows [stage*3CC + part*CC + i*C + j] with
    part 0/1/2 = mT_re / mT_im / mL (mL is real: expm of a real
    matrix).  B planes are F+(-k), i.e. still F+ states: they transform
    with mT (NOT conj(mT), which acts on the implied F-) and with
    conj(e^{-rT}) under R -- exactly like the A planes.  b1_ref is the
    per-atom flip scale (rank-1 ``outer(alpha_ic, B1_b)`` trains).
    """
    C = ncomp
    CC = C * C
    f32 = jnp.float32
    out_refs = refs[:2 * C]
    st_ref = refs[2 * C]
    H = nstate + 1
    btile = st_ref.shape[2]
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0).astype(f32)

    # init: A = B = 0, Z_c(0) = 1 (simulate()'s default [0, 0, 1] ladder;
    # the per-compartment DENSITIES enter only through the equilibrium)
    st_ref[...] = jnp.zeros_like(st_ref)
    ones = jnp.ones((btile,), f32)
    for c in range(C):
        st_ref[6 * c + 4, 0, :] = ones

    def mix(stage, sets):
        return _mix_planes(
            sets,
            lambda part, i, j: coef_ref[stage * 3 * CC + part * CC
                                        + i * C + j, :],
            lambda j: dens_ref[0, j], rowmask, C)

    def step(i, _):
        sets = []
        for c in range(C):
            s = tuple(st_ref[6 * c + j] for j in range(6))
            # saturation: F+ states (A and B planes) scale by
            # conj(e^{-rT}), Z by e^{-rL} (evolution_operator diag)
            sfr, sfi = sfr_ref[i, c], sfi_ref[i, c]
            szr, szi = szr_ref[i, c], szi_ref[i, c]
            ar, ai = _cmul(sfr, sfi, s[0], s[1])
            br, bi = _cmul(sfr, sfi, s[2], s[3])
            zr, zi = _cmul(szr, szi, s[4], s[5])
            s = (ar, ai, br, bi, zr, zi)

            # per-compartment rotation: a = alpha_ic * B1_b, ph = phi_ic
            rad = jnp.pi / 180.0
            rc = _rot_coeffs(alpha_ref[i, c] * rad * b1_ref[0, :],
                             phi_ref[i, c] * rad)
            sets.append(_apply_rot(rc, s))

        # exchange stage A -> readout -> exchange stage B -> shift
        sets = mix(0, sets)
        for c in range(C):
            out_refs[2 * c][i, :] = sets[c][0][0, :]
            out_refs[2 * c + 1][i, :] = sets[c][1][0, :]
        sets = mix(1, sets)
        store = _shift_store if shift else _store_set
        for c in range(C):
            store(st_ref, 6 * c, sets[c])
        return 0

    jax.lax.fori_loop(0, ntr, step, 0)


def _exchange_mats(khi, T1, T2, g, tau):
    """Per-atom (mT, mL) stage matrices: (B, C, C) complex64 / float32.

    khi (C, C); T1/T2/g (C, B) float32; tau scalar.  tau == 0 yields the
    identity (absent stage).  Uses the NaN-safe closed-form 2x2 spectral
    expm for two compartments, Pade otherwise (ops/exchange._expm;
    reference epgpy/exchange.py:262-282 uses eigendecomposition).
    """
    from ..ops.exchange import _expm

    c64 = jnp.complex64
    C = khi.shape[0]
    eye = jnp.eye(C, dtype=jnp.float32)
    rT = (-1.0 / T2 + 2j * jnp.pi * g).astype(c64)        # (C, B)
    rL = (-1.0 / T1).astype(c64)
    xT = -khi.astype(c64)[:, :, None] + eye.astype(c64)[:, :, None] * rT[:, None, :]
    xL = -khi.astype(c64)[:, :, None] + eye.astype(c64)[:, :, None] * rL[:, None, :]
    tau = jnp.asarray(tau, jnp.float32).astype(c64)
    mT = _expm(jnp.moveaxis(xT * tau, -1, 0))             # (B, C, C)
    mL = jnp.real(_expm(jnp.moveaxis(xL * tau, -1, 0)))
    return mT, jnp.real(mT), jnp.imag(mT), mL


@partial(jax.jit, static_argnames=("nstate", "btile", "interpret", "shift"))
def xgre_dictionary_pallas(alpha, phi, satf_re, satf_im, satz_re, satz_im,
                           dens, stageA, stageB, b1=None, *,
                           nstate, btile=512, interpret=False, shift=True):
    """EPG-X GRE trains via the fused Pallas kernel.

    With ``shift=False`` the per-TR unit gradient shift is omitted —
    the balanced EPG-X family (bSSFP-MT / exchange-bSSFP, Gloor 2008):
    the whole ladder stays at k=0, so pass ``nstate=0`` and the scratch
    is (6C, 1, btile).  Alternating RF phase rides the per-TR ``phi``
    train; per-TR relaxation+exchange splits TE/TR-TE across the two X
    stages.

    Args:
        alpha, phi: (N, C) per-TR per-compartment flip angles / phases
            (degrees).
        satf_re/im, satz_re/im: (N, C) per-TR saturation factors applied
            BEFORE the pulse -- ``conj(exp(-rT))`` on F+ states and
            ``exp(-rL)`` on Z (identity rows = 1+0j when absent).
        dens: (C,) equilibrium densities.
        stageA, stageB: per-stage ``(khi, T1, T2, g, tau)`` tuples --
            khi (C, C) kinetic matrix (columns sum to 0); T1/T2/g
            (C, B) per-compartment per-atom; tau the mixing time (ms;
            0 = absent stage = identity).
        b1: optional (B,) per-atom flip scale (rank-1 alpha trains).
        nstate: ladder half-size (static capacity).

    Returns (re, im): (N, C, B) float32 center transverse states
    (``F0`` per compartment at each ADC).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    alpha = jnp.asarray(alpha, f32)
    N, C = alpha.shape
    phi = jnp.broadcast_to(jnp.asarray(phi, f32), (N, C))
    satf_re = jnp.broadcast_to(jnp.asarray(satf_re, f32), (N, C))
    satf_im = jnp.broadcast_to(jnp.asarray(satf_im, f32), (N, C))
    satz_re = jnp.broadcast_to(jnp.asarray(satz_re, f32), (N, C))
    satz_im = jnp.broadcast_to(jnp.asarray(satz_im, f32), (N, C))
    dens = jnp.asarray(dens, f32).reshape(1, C)
    B = jnp.shape(stageA[2])[1]

    Bp = -(-B // btile) * btile
    CC = C * C

    def pack(stage):
        khi, T1, T2, g, tau = (jnp.asarray(x, f32) for x in stage)
        if Bp > B:
            padv = jnp.ones((C, Bp - B), f32)
            T1 = jnp.concatenate([T1, padv], axis=1)
            T2 = jnp.concatenate([T2, padv], axis=1)
            g = jnp.concatenate([g, jnp.zeros((C, Bp - B), f32)], axis=1)
        _, mr, mi, ml = _exchange_mats(khi, T1, T2, g, tau)
        to_rows = lambda m: jnp.moveaxis(m, 0, -1).reshape(CC, Bp)
        return jnp.concatenate([to_rows(mr), to_rows(mi), to_rows(ml)],
                               axis=0)

    coef = jnp.concatenate([pack(stageA), pack(stageB)], axis=0)  # (6CC, Bp)
    b1 = jnp.ones(B, f32) if b1 is None else jnp.asarray(b1, f32)
    if Bp > B:
        b1 = jnp.concatenate([b1, jnp.ones(Bp - B, f32)])
    b1 = b1.reshape(1, Bp)

    kernel = partial(_kernel_xgre, nstate=nstate, ntr=N, ncomp=C,
                     shift=shift)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # alpha
            pl.BlockSpec(memory_space=pltpu.SMEM),            # phi
            pl.BlockSpec(memory_space=pltpu.SMEM),            # satf_re
            pl.BlockSpec(memory_space=pltpu.SMEM),            # satf_im
            pl.BlockSpec(memory_space=pltpu.SMEM),            # satz_re
            pl.BlockSpec(memory_space=pltpu.SMEM),            # satz_im
            pl.BlockSpec(memory_space=pltpu.SMEM),            # dens
            pl.BlockSpec((1, btile), lambda b: (0, b)),       # b1
            pl.BlockSpec((6 * CC, btile), lambda b: (0, b)),  # coef
        ],
        out_specs=[pl.BlockSpec((N, btile), lambda b: (0, b))] * (2 * C),
        out_shape=[jax.ShapeDtypeStruct((N, Bp), f32)] * (2 * C),
        scratch_shapes=[pltpu.VMEM((6 * C, nstate + 1, btile), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(alpha, phi, satf_re, satf_im, satz_re, satz_im, dens, b1, coef)

    re = jnp.stack([outs[2 * c][:, :B] for c in range(C)], axis=1)
    im = jnp.stack([outs[2 * c + 1][:, :B] for c in range(C)], axis=1)
    return re, im


def exchange_stage_mats(khi, T1, T2, g=None, tau=1.0):
    """Differentiable per-atom exchange stage matrices ``(mr, mi, ml)``.

    The fused-Jacobian entry point (xgre_jacobian_pallas) takes the
    stage mixing matrices AND their per-variable tangents as inputs;
    this helper is the differentiable map from physical parameters to
    those matrices -- run ``jax.jvp(exchange_stage_mats, ...)`` once per
    fit variable to obtain the tangents (the expm is the closed-form
    2x2 spectral formula of ops/exchange._expm, smooth away from
    degenerate eigenvalue pairs).

    Args:
        khi: kinetic matrix, (C, C) shared or (C, C, B) per-atom
            (per-voxel bound-pool fractions change khi AND densities).
        T1, T2: (C, B) per-compartment per-atom (ms).
        g: optional (C, B) off-resonance (kHz).
        tau: scalar mixing time (ms).

    Returns three (B, C, C) float32 arrays: Re/Im of the transverse
    mixing matrix and the (real) longitudinal one.

    NOTE: complex intermediates -- on the TPU backend call this inside
    jit only (eager complex ops fail on the axon plugin; CLAUDE.md
    fact 1).
    """
    from ..ops.exchange import _expm

    c64 = jnp.complex64
    f32 = jnp.float32
    T1 = jnp.asarray(T1, f32)
    T2 = jnp.asarray(T2, f32)
    C = T2.shape[0]
    khi = jnp.asarray(khi, f32)
    if khi.ndim == 2:
        khi = khi[:, :, None]
    gv = jnp.zeros_like(T2) if g is None else jnp.asarray(g, f32)
    eye = jnp.eye(C, dtype=f32)[:, :, None].astype(c64)
    rT = (-1.0 / T2).astype(c64) + 2j * jnp.pi * gv.astype(c64)   # (C, B)
    rL = (-1.0 / T1).astype(c64)
    xT = -khi.astype(c64) + eye * rT[:, None, :]
    xL = -khi.astype(c64) + eye * rL[:, None, :]
    tau = jnp.asarray(tau, f32).astype(c64)
    mT = _expm(jnp.moveaxis(xT * tau, -1, 0))                     # (B, C, C)
    mL = jnp.real(_expm(jnp.moveaxis(xL * tau, -1, 0)))
    return jnp.real(mT), jnp.imag(mT), mL


def _kernel_xgre_jac(alpha_ref, phi_ref, sfr_ref, sfi_ref, szr_ref, szi_ref,
                     b1_ref, dens_ref, coef_ref, *refs,
                     nstate, ntr, ncomp, nvar, shift=True):
    """Fused primal + tangent EPG-X GRE propagation.

    Plane groups g = 0 (primal), 1..nvar (one tangent per fit variable)
    each hold the 6C half-ladder planes of _kernel_xgre.  Saturation,
    rotation and the ladder shift are AFFINE and variable-independent
    here (variables enter only through the exchange stage matrices and
    the equilibrium densities), so tangents propagate by the same
    per-TR operator; the exchange stage adds the product-rule term
    ``dM (x - e) + M (t - de) + de`` using the streamed per-variable
    matrix/density tangents.  dens_ref rows: g*C + c (per-atom -- the
    per-voxel bound-pool-fraction fit); coef_ref rows:
    g*6CC + stage*3CC + part*CC + i*C + j.
    """
    C = ncomp
    CC = C * C
    G = nvar + 1
    f32 = jnp.float32
    out_refs = refs[:2 * C * G]
    st_ref = refs[2 * C * G]
    H = nstate + 1
    btile = st_ref.shape[2]
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0).astype(f32)

    st_ref[...] = jnp.zeros_like(st_ref)
    ones = jnp.ones((btile,), f32)
    for c in range(C):
        st_ref[6 * c + 4, 0, :] = ones    # primal Z_c(0) = 1; tangents 0

    def m(g, stage, part, i, j):
        return coef_ref[g * 6 * CC + stage * 3 * CC + part * CC + i * C + j, :]

    def dens(g, c):
        return dens_ref[g * C + c, :]

    def mix_primal(stage, sets):
        return _mix_planes(sets,
                           lambda part, i, j: m(0, stage, part, i, j),
                           lambda j: dens(0, j), rowmask, C)

    def mix_tangent(stage, g, tsets, xsets):
        """t'_i = sum_j [ M_ij (t_j - de_j) + dM_ij (x_j - e_j) ] + de_i
        (equilibrium e supported on the k=0 Z row only)."""
        xdevs = [(xsets[j][4] - dens(0, j) * rowmask, xsets[j][5])
                 for j in range(C)]
        tdevs = [(tsets[j][4] - dens(g, j) * rowmask, tsets[j][5])
                 for j in range(C)]
        out = []
        for i in range(C):
            nAR = nAI = nBR = nBI = nZR = nZI = None
            for j in range(C):
                mr, mi = m(0, stage, 0, i, j), m(0, stage, 1, i, j)
                ml = m(0, stage, 2, i, j)
                dmr, dmi = m(g, stage, 0, i, j), m(g, stage, 1, i, j)
                dml = m(g, stage, 2, i, j)
                tAR, tAI, tBR, tBI, _, _ = tsets[j]
                xAR, xAI, xBR, xBI, _, _ = xsets[j]
                ar, ai = _cmul(mr, mi, tAR, tAI)
                dar, dai = _cmul(dmr, dmi, xAR, xAI)
                br, bi = _cmul(mr, mi, tBR, tBI)
                dbr, dbi = _cmul(dmr, dmi, xBR, xBI)
                zr = ml * tdevs[j][0] + dml * xdevs[j][0]
                zi = ml * tdevs[j][1] + dml * xdevs[j][1]
                ar, ai = ar + dar, ai + dai
                br, bi = br + dbr, bi + dbi
                if j == 0:
                    nAR, nAI, nBR, nBI, nZR, nZI = ar, ai, br, bi, zr, zi
                else:
                    nAR, nAI = nAR + ar, nAI + ai
                    nBR, nBI = nBR + br, nBI + bi
                    nZR, nZI = nZR + zr, nZI + zi
            out.append((nAR, nAI, nBR, nBI,
                        nZR + dens(g, i) * rowmask, nZI))
        return out

    def step(i, _):
        rad = jnp.pi / 180.0
        # per-compartment saturation + rotation coefficients -- shared
        # across plane groups (variables do not enter sat/rot)
        rotc = [_rot_coeffs(alpha_ref[i, c] * rad * b1_ref[0, :],
                            phi_ref[i, c] * rad) for c in range(C)]

        groups = []
        for g in range(G):
            sets = []
            for c in range(C):
                s = tuple(st_ref[6 * (g * C + c) + j] for j in range(6))
                sfr, sfi = sfr_ref[i, c], sfi_ref[i, c]
                szr, szi = szr_ref[i, c], szi_ref[i, c]
                ar, ai = _cmul(sfr, sfi, s[0], s[1])
                br, bi = _cmul(sfr, sfi, s[2], s[3])
                zr, zi = _cmul(szr, szi, s[4], s[5])
                sets.append(_apply_rot(rotc[c], (ar, ai, br, bi, zr, zi)))
            groups.append(sets)

        # exchange stage A (tangents first: they need the pre-mix primal)
        groups = ([mix_primal(0, groups[0])]
                  + [mix_tangent(0, g, groups[g], groups[0])
                     for g in range(1, G)])
        for g in range(G):
            for c in range(C):
                out_refs[2 * (g * C + c)][i, :] = groups[g][c][0][0, :]
                out_refs[2 * (g * C + c) + 1][i, :] = groups[g][c][1][0, :]
        groups = ([mix_primal(1, groups[0])]
                  + [mix_tangent(1, g, groups[g], groups[0])
                     for g in range(1, G)])
        store = _shift_store if shift else _store_set
        for g in range(G):
            for c in range(C):
                store(st_ref, 6 * (g * C + c), groups[g][c])
        return 0

    jax.lax.fori_loop(0, ntr, step, 0)


@partial(jax.jit, static_argnames=("nstate", "btile", "interpret", "shift"))
def xgre_jacobian_pallas(alpha, phi, satf_re, satf_im, satz_re, satz_im,
                         dens, matsA, matsB, dmatsA, dmatsB, ddens,
                         b1=None, *, nstate, btile=512, interpret=False,
                         shift=True):
    """EPG-X GRE train Jacobian via the fused primal+tangent kernel.

    A capability BEYOND the reference: epgpy's X operator is not
    differentiable at all (no _derive1; reference epgpy/exchange.py) --
    here per-voxel Gauss-Newton qMT fitting (bound-pool fraction f,
    free-pool T2, exchange rate, ...) runs as one VMEM-resident pass.
    Variables must enter ONLY through the exchange stage matrices and
    the equilibrium densities (not sat/rot/B1): compute the matrices
    with exchange_stage_mats and their tangents with jax.jvp, one per
    variable.

    Args:
        alpha, phi, satf_re/im, satz_re/im: (N, C) per-TR trains as in
            xgre_dictionary_pallas.
        dens: (C, B) per-atom equilibrium densities (or (C,) shared).
        matsA, matsB: per-stage ``(mr, mi, ml)`` mixing matrices, each
            (B, C, C) (identity for an absent stage).
        dmatsA, dmatsB: per-variable tangents, each (V, B, C, C) x3.
        ddens: (V, C, B) (or (V, C)) density tangents.
        b1: optional (B,) per-atom flip scale (a CONSTANT of the fit).

    Returns ``(re, im), (jre, jim)``: (N, C, B) primal center states and
    (N, V, C, B) tangents.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    alpha = jnp.asarray(alpha, f32)
    N, C = alpha.shape
    CC = C * C
    phi = jnp.broadcast_to(jnp.asarray(phi, f32), (N, C))
    satf_re = jnp.broadcast_to(jnp.asarray(satf_re, f32), (N, C))
    satf_im = jnp.broadcast_to(jnp.asarray(satf_im, f32), (N, C))
    satz_re = jnp.broadcast_to(jnp.asarray(satz_re, f32), (N, C))
    satz_im = jnp.broadcast_to(jnp.asarray(satz_im, f32), (N, C))
    B = jnp.shape(matsA[0])[0]
    V = jnp.shape(dmatsA[0])[0]
    G = V + 1

    Bp = -(-B // btile) * btile
    pad = Bp - B

    def rows(mat):                       # (B, C, C) -> (CC, Bp)
        r = jnp.moveaxis(jnp.asarray(mat, f32), 0, -1).reshape(CC, B)
        return jnp.pad(r, ((0, 0), (0, pad))) if pad else r

    def group(mA, mB):                   # one (6CC, Bp) coefficient group
        return jnp.concatenate([rows(mA[0]), rows(mA[1]), rows(mA[2]),
                                rows(mB[0]), rows(mB[1]), rows(mB[2])], 0)

    coef = jnp.concatenate(
        [group(matsA, matsB)]
        + [group(tuple(d[v] for d in dmatsA), tuple(d[v] for d in dmatsB))
           for v in range(V)], axis=0)   # (G*6CC, Bp)

    dens = jnp.asarray(dens, f32)
    if dens.ndim == 1:
        dens = jnp.broadcast_to(dens[:, None], (C, B))
    ddens = jnp.asarray(ddens, f32)
    if ddens.ndim == 2:
        ddens = jnp.broadcast_to(ddens[:, :, None], (V, C, B))
    densrows = jnp.concatenate([dens, ddens.reshape(V * C, B)], axis=0)
    if pad:
        densrows = jnp.pad(densrows, ((0, 0), (0, pad)))

    b1 = jnp.ones(B, f32) if b1 is None else jnp.asarray(b1, f32)
    if pad:
        b1 = jnp.concatenate([b1, jnp.ones(pad, f32)])
    b1 = b1.reshape(1, Bp)

    kernel = partial(_kernel_xgre_jac, nstate=nstate, ntr=N, ncomp=C,
                     nvar=V, shift=shift)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # alpha
            pl.BlockSpec(memory_space=pltpu.SMEM),              # phi
            pl.BlockSpec(memory_space=pltpu.SMEM),              # satf_re
            pl.BlockSpec(memory_space=pltpu.SMEM),              # satf_im
            pl.BlockSpec(memory_space=pltpu.SMEM),              # satz_re
            pl.BlockSpec(memory_space=pltpu.SMEM),              # satz_im
            pl.BlockSpec((1, btile), lambda b: (0, b)),         # b1
            pl.BlockSpec((G * C, btile), lambda b: (0, b)),     # dens
            pl.BlockSpec((G * 6 * CC, btile), lambda b: (0, b)),  # coef
        ],
        out_specs=[pl.BlockSpec((N, btile), lambda b: (0, b))] * (2 * C * G),
        out_shape=[jax.ShapeDtypeStruct((N, Bp), f32)] * (2 * C * G),
        scratch_shapes=[pltpu.VMEM((6 * C * G, nstate + 1, btile), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(alpha, phi, satf_re, satf_im, satz_re, satz_im, b1, densrows, coef)

    re = jnp.stack([outs[2 * c][:, :B] for c in range(C)], axis=1)
    im = jnp.stack([outs[2 * c + 1][:, :B] for c in range(C)], axis=1)
    jre = jnp.stack(
        [jnp.stack([outs[2 * ((v + 1) * C + c)][:, :B] for c in range(C)], 1)
         for v in range(V)], axis=1)
    jim = jnp.stack(
        [jnp.stack([outs[2 * ((v + 1) * C + c) + 1][:, :B]
                    for c in range(C)], 1) for v in range(V)], axis=1)
    return (re, im), (jre, jim)


def xgre_dictionary_pallas_sharded(alpha, phi, satf_re, satf_im, satz_re,
                                   satz_im, dens, stageA, stageB, b1=None,
                                   *, mesh, axis="atoms", **kw):
    """Atom-sharded EPG-X Pallas dictionary over a device mesh.

    Same scheme as the FISP/CPMG sharded wrappers: GSPMD cannot
    partition a pallas_call, so each device runs the VMEM-resident
    kernel on its local atom shard under jax.shard_map (train arrays
    replicated; the atom axis of the stages' T1/T2/g and b1 must divide
    the mesh axis).
    """
    from jax.sharding import PartitionSpec as PS

    f32 = jnp.float32
    if b1 is None:
        b1 = jnp.ones(jnp.shape(stageA[2])[1], f32)

    def local(t1a, t2a, ga, t1b, t2b, gb, b1s):
        return xgre_dictionary_pallas(
            alpha, phi, satf_re, satf_im, satz_re, satz_im, dens,
            (stageA[0], t1a, t2a, ga, stageA[4]),
            (stageB[0], t1b, t2b, gb, stageB[4]), b1s, **kw)

    spec = PS(None, axis)
    f = jax.shard_map(local, mesh=mesh, in_specs=(spec,) * 6 + (PS(axis),),
                      out_specs=(PS(None, None, axis),) * 2,
                      check_vma=False)
    return jax.jit(f)(jnp.asarray(stageA[1], f32), jnp.asarray(stageA[2], f32),
                      jnp.asarray(stageA[3], f32), jnp.asarray(stageB[1], f32),
                      jnp.asarray(stageB[2], f32), jnp.asarray(stageB[3], f32),
                      jnp.asarray(b1, f32))
