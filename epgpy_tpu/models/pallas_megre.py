"""Pallas TPU kernel: fused multi-echo spoiled GRE (ME-GRE) trains.

Multi-echo gradient echo reads m echoes per TR at increasing echo
times before the spoiler — the standard T2*/R2*/B0-mapping and QSM
acquisition.  Per TR the operator train is
``[T, E(te1), ADC, E(te2-te1), ADC, ..., E(rest), S(1)]`` (reference
analog: the per-op trains of epgpy/evolution.py + shift.py applied in
sequence; epgpy has no fused path for any of this).

k-independent relaxation commutes with everything between the pulse
and the shift, so echo j is the k=0 row of the rotated state decayed
by ``exp(-te_j / T2)`` (plus the off-resonance phase ``2 pi df te_j``)
— the kernel evaluates the rotation ONCE per TR and writes m decayed
copies of its center row, then applies the full-TR decay and the
folded unit shift exactly like the FISP kernel
(models/pallas_fisp._kernel_half).

State: 6 folded half-ladder planes (A=F+(k), B=F+(-k), Z; re/im) of
nstate+1 rows in VMEM; outputs are m (P, B) echo pairs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pallas_common import (_rot_A, _rot_B, _rot_Z, _rot_coeffs,
                            _round_block,
                            _shift_store)

__all__ = ["megre_dictionary_pallas", "megre_jacobian_pallas"]


def _pick_pchunk(P, btile, nout):
    """Pulse-chunk size bounding the kernel's output-window VMEM.

    Output blocks live in VMEM double-buffered: total live bytes are
    ~2 * nout * pchunk * btile * 4.  Cap the single-buffer footprint at
    16 MB so any echo count m stays well under the 100 MB kernel limit
    (high-m trains must dispatch-and-run, never dispatch-and-crash).
    A chunk below P must honor TPU block divisibility (multiple of
    8/128 -- CLAUDE.md fact 8); pchunk == P equals the array dim and
    is always legal."""
    cap = max((1 << 24) // (nout * btile * 4), 8)
    return P if cap >= P else _round_block(cap)


def _pad_megre(FA, phi, TR, TEs, T1s, T2s, B1s, dfs, btile, pchunk, nout):
    """Pad/chunk setup shared by the ME-GRE primal and Jacobian
    wrappers (the (m, P) echo-time matrix keeps it out of
    pallas_common._pad_setup, which assumes one TE row).  Padded
    pulses are FA=0 no-ops; their TR/TE fills only need to be valid
    positive times."""
    f32 = jnp.float32
    FA = jnp.asarray(FA, f32)
    P = FA.shape[0]
    phi = jnp.broadcast_to(jnp.asarray(phi, f32), (P,))
    TR = jnp.broadcast_to(jnp.asarray(TR, f32), (P,))
    TEs = jnp.asarray(TEs, f32)
    if TEs.ndim == 1:
        TEs = jnp.broadcast_to(TEs[:, None], (TEs.shape[0], P))
    m = TEs.shape[0]
    T1s = jnp.asarray(T1s, f32)
    T2s = jnp.asarray(T2s, f32)
    B1s = jnp.asarray(B1s, f32)
    DFs = jnp.zeros_like(T1s) if dfs is None else jnp.asarray(dfs, f32)
    B = T1s.shape[0]

    if pchunk is None:
        pchunk = _pick_pchunk(P, btile, nout * m)
    Bp = -(-B // btile) * btile
    Pp = -(-P // pchunk) * pchunk

    def padb(x):
        return jnp.concatenate([x, jnp.ones((Bp - B,), f32)]) if Bp > B else x

    def padp(x, fill):
        return (jnp.concatenate([x, jnp.full((Pp - P,), fill, f32)])
                if Pp > P else x)

    FA_p, phi_p = padp(FA, 0.0), padp(phi, 0.0)
    TR_p = padp(TR, 2.0)
    TE_p = (jnp.concatenate([TEs, jnp.ones((m, Pp - P), f32)], axis=1)
            if Pp > P else TEs)
    T1p, T2p, B1p, DFp = (padb(T1s), padb(T2s), padb(B1s), padb(DFs))
    args = [x.reshape(1, -1) for x in (FA_p, phi_p, TR_p)]
    args += [TE_p] + [x.reshape(1, -1) for x in (T1p, T2p, B1p, DFp)]
    return P, B, Pp, Bp, m, pchunk, args


def _kernel_megre(fa_ref, phi_ref, tr_ref, te_ref, t1_ref, t2_ref,
                  b1_ref, df_ref, *refs, nstate, pchunk, nechoes,
                  demodulate, use_df):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    out_refs, st_ref = refs[:2 * nechoes], refs[2 * nechoes]
    pc = pl.program_id(1)
    H = nstate + 1
    f32 = jnp.float32

    @pl.when(pc == 0)
    def _init():
        st_ref[...] = jnp.zeros_like(st_ref)
        st_ref[4, 0, :] = jnp.ones_like(st_ref[4, 0, :])  # Z(0) = 1

    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0).astype(f32)
    T1 = t1_ref[0, :]
    T2 = t2_ref[0, :]
    B1 = b1_ref[0, :]
    DF = df_ref[0, :]
    base = pc * pchunk

    def step(i, _):
        planes = [st_ref[j] for j in range(6)]

        fa = fa_ref[0, base + i]
        ph = phi_ref[0, base + i] * (jnp.pi / 180.0)
        a = fa * B1 * (jnp.pi / 180.0)
        rc = _rot_coeffs(a, ph)
        cp, sp = jnp.cos(ph), jnp.sin(ph)

        RA = _rot_A(*rc[:5], planes)
        RB = _rot_B(*rc[:5], planes)
        SZ = _rot_Z(*rc[5:], planes)

        # m echoes from the rotated k=0 row, each with its own decay
        # and off-resonance phase (static unroll: m is tiny)
        for j in range(nechoes):
            te = te_ref[j, base + i]
            e2te = jnp.exp(-te / T2)
            eR = e2te * RA[0][0, :]
            eI = e2te * RA[1][0, :]
            if use_df:
                ang = 2 * jnp.pi * DF * te
                c, s = jnp.cos(ang), jnp.sin(ang)
                eR, eI = eR * c - eI * s, eI * c + eR * s
            if demodulate:
                eR, eI = eR * cp + eI * sp, eI * cp - eR * sp
            out_refs[2 * j][i, :] = eR
            out_refs[2 * j + 1][i, :] = eI

        TRi = tr_ref[0, base + i]
        cF = jnp.exp(-TRi / T2)
        cZ = jnp.exp(-TRi / T1)
        rec = 1.0 - cZ
        if use_df:
            ang = 2 * jnp.pi * DF * TRi
            cFr, cFi = cF * jnp.cos(ang), cF * jnp.sin(ang)
            nAR = cFr * RA[0] - cFi * RA[1]
            nAI = cFr * RA[1] + cFi * RA[0]
            nBR = cFr * RB[0] - cFi * RB[1]
            nBI = cFr * RB[1] + cFi * RB[0]
        else:
            nAR, nAI = cF * RA[0], cF * RA[1]
            nBR, nBI = cF * RB[0], cF * RB[1]
        nZR = cZ * SZ[0] + rowmask * rec
        nZI = cZ * SZ[1]
        _shift_store(st_ref, 0, (nAR, nAI, nBR, nBI, nZR, nZI))
        return 0

    jax.lax.fori_loop(0, pchunk, step, 0)


@partial(jax.jit, static_argnames=("nstate", "btile", "pchunk",
                                   "demodulate", "interpret"))
def megre_dictionary_pallas(FA, phi, TR, TEs, T1s, T2s, B1s, dfs=None, *,
                            nstate=10, btile=512, pchunk=None,
                            demodulate=False, interpret=False):
    """Multi-echo spoiled GRE via the fused folded-half-ladder kernel.

    FA (P,) degrees; phi/TR broadcast to (P,); TEs (m,) cumulative echo
    times shared across TRs, or (m, P) per-pulse.  T1s/T2s/B1s/dfs are
    (B,) per-atom; per-atom `dfs` (kHz) gives each echo its
    ``exp(2 pi i df te_j)`` phase — the B0-mapping signal model.
    Returns (re, im): (B, P, m) float32 echo trains, echo index last.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    nstate = max(int(nstate), 1)
    use_df = dfs is not None
    P, B, Pp, Bp, m, pchunk, args = _pad_megre(
        FA, phi, TR, TEs, T1s, T2s, B1s, dfs, btile, pchunk, nout=2)
    nP, nB = Pp // pchunk, Bp // btile

    kernel = partial(_kernel_megre, nstate=nstate, pchunk=pchunk,
                     nechoes=m, demodulate=demodulate, use_df=use_df)
    outs = pl.pallas_call(
        kernel,
        grid=(nB, nP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # FA
            pl.BlockSpec(memory_space=pltpu.SMEM),              # phi
            pl.BlockSpec(memory_space=pltpu.SMEM),              # TR
            pl.BlockSpec(memory_space=pltpu.SMEM),              # TEs (m, Pp)
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # T1
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # T2
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # B1
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # df
        ],
        out_specs=[pl.BlockSpec((pchunk, btile),
                                lambda b, pc: (pc, b))] * (2 * m),
        out_shape=[jax.ShapeDtypeStruct((Pp, Bp), f32)] * (2 * m),
        scratch_shapes=[pltpu.VMEM((6, nstate + 1, btile), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    o = [x[:P, :B].T for x in outs]
    re = jnp.stack(o[0::2], axis=-1)            # (B, P, m)
    im = jnp.stack(o[1::2], axis=-1)
    return re, im


def _kernel_megre_jac(fa_ref, phi_ref, tr_ref, te_ref, t1_ref, t2_ref,
                      b1_ref, df_ref, *refs, nstate, pchunk, nechoes,
                      demodulate, use_df):
    """Fused ME-GRE primal + (dT1, dT2, dB1, ddf) tangents.

    30 VMEM planes (primal at 0-5, one 6-plane group per variable).
    T1/T2/B1 tangents follow the DESS/FISP jac scheme; the df tangent
    is new: off-resonance enters ONLY through phasors, so its
    coefficient derivatives are rotations of the primal coefficients —
    d/ddf [cF e^{i w TR}] = i (2 pi TR) cF e^{i w TR} on the carried
    state and d/ddf [e^{i w te_j}] = i (2 pi te_j) e^{i w te_j} on each
    echo (w = 2 pi df).  The df column is well-defined at df = 0 (the
    B0-fitting initialization), so it is computed whether or not dfs
    was supplied.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    out_refs, st_ref = refs[:10 * nechoes], refs[10 * nechoes]
    pc = pl.program_id(1)
    H = nstate + 1
    f32 = jnp.float32

    @pl.when(pc == 0)
    def _init():
        st_ref[...] = jnp.zeros_like(st_ref)
        st_ref[4, 0, :] = jnp.ones_like(st_ref[4, 0, :])  # Z(0) = 1

    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0).astype(f32)
    T1 = t1_ref[0, :]
    T2 = t2_ref[0, :]
    B1 = b1_ref[0, :]
    DF = df_ref[0, :]
    base = pc * pchunk
    twopi = 2 * jnp.pi

    def step(i, _):
        P6 = [st_ref[j] for j in range(6)]
        tans = [[st_ref[6 * v + j] for j in range(6)] for v in (1, 2, 3, 4)]

        fa = fa_ref[0, base + i]
        ph = phi_ref[0, base + i] * (jnp.pi / 180.0)
        rad = jnp.pi / 180.0
        a = fa * B1 * rad
        rc = _rot_coeffs(a, ph)
        cp, sp = jnp.cos(ph), jnp.sin(ph)
        # B1 tangents of the rotation coefficients
        ca, sa = jnp.cos(a), jnp.sin(a)
        da = fa * rad
        dsa, dca = ca * da, -sa * da
        dcos2, dsin2 = -0.5 * sa * da, 0.5 * sa * da
        c2p, s2p = jnp.cos(2 * ph), jnp.sin(2 * ph)
        drc = (dcos2, c2p * dsin2, s2p * dsin2, sp * dsa, -cp * dsa,
               dca, -0.5 * sp * dsa, -0.5 * cp * dsa,
               -0.5 * sp * dsa, 0.5 * cp * dsa)

        prim = partial(_rot_A, *rc[:5])
        primB = partial(_rot_B, *rc[:5])
        primZ = partial(_rot_Z, *rc[5:])
        RA, RB, SZ = prim(P6), primB(P6), primZ(P6)
        tRA = [prim(t) for t in tans]
        tRB = [primB(t) for t in tans]
        tSZ = [primZ(t) for t in tans]
        cRA = _rot_A(*drc[:5], P6)
        cRB = _rot_B(*drc[:5], P6)
        cSZ = _rot_Z(*drc[5:], P6)

        def demod_write(jref, eR, eI):
            if demodulate:
                eR, eI = eR * cp + eI * sp, eI * cp - eR * sp
            out_refs[jref][i, :] = eR
            out_refs[jref + 1][i, :] = eI

        # m echoes: primal + 4 tangent columns each
        for j in range(nechoes):
            te = te_ref[j, base + i]
            e2te = jnp.exp(-te / T2)
            de2te = e2te * te / (T2 * T2)
            if use_df:
                ang = twopi * DF * te
                c, s = jnp.cos(ang), jnp.sin(ang)
            else:
                c, s = 1.0, 0.0

            def ph_te(re0, im0):
                return re0 * c - im0 * s, im0 * c + re0 * s

            base_j = 10 * j
            a0r, a0i = RA[0][0, :], RA[1][0, :]
            er, ei = ph_te(e2te * a0r, e2te * a0i)
            demod_write(base_j, er, ei)
            # dT1
            er, ei = ph_te(e2te * tRA[0][0][0, :], e2te * tRA[0][1][0, :])
            demod_write(base_j + 2, er, ei)
            # dT2: tangent state + TE-decay derivative
            er, ei = ph_te(e2te * tRA[1][0][0, :] + de2te * a0r,
                           e2te * tRA[1][1][0, :] + de2te * a0i)
            demod_write(base_j + 4, er, ei)
            # dB1: tangent state + rotation-coefficient pass
            er, ei = ph_te(e2te * (tRA[2][0][0, :] + cRA[0][0, :]),
                           e2te * (tRA[2][1][0, :] + cRA[1][0, :]))
            demod_write(base_j + 6, er, ei)
            # ddf: tangent state + i (2 pi te) x primal echo
            pr, pi_ = ph_te(e2te * a0r, e2te * a0i)
            tr_, ti_ = ph_te(e2te * tRA[3][0][0, :],
                             e2te * tRA[3][1][0, :])
            demod_write(base_j + 8, tr_ - twopi * te * pi_,
                        ti_ + twopi * te * pr)

        TRi = tr_ref[0, base + i]
        cF = jnp.exp(-TRi / T2)
        cZ = jnp.exp(-TRi / T1)
        rec = 1.0 - cZ
        dcZ = cZ * TRi / (T1 * T1)
        dcF = cF * TRi / (T2 * T2)
        if use_df:
            ang = twopi * DF * TRi
            cFr, cFi = cF * jnp.cos(ang), cF * jnp.sin(ang)
            dcFr, dcFi = dcF * jnp.cos(ang), dcF * jnp.sin(ang)
        else:
            cFr, cFi = cF, jnp.zeros_like(cF)
            dcFr, dcFi = dcF, jnp.zeros_like(dcF)
        # d/ddf of the carried F coefficient: i (2 pi TR) (cFr + i cFi)
        fFr, fFi = -twopi * TRi * cFi, twopi * TRi * cFr

        def fmul(re, im, cr=cFr, ci=cFi):
            return cr * re - ci * im, cr * im + ci * re

        # primal
        pAr, pAi = fmul(RA[0], RA[1])
        pBr, pBi = fmul(RB[0], RB[1])
        _shift_store(st_ref, 0, (pAr, pAi, pBr, pBi,
                                 cZ * SZ[0] + rowmask * rec, cZ * SZ[1]))
        # dT1
        t1Ar, t1Ai = fmul(tRA[0][0], tRA[0][1])
        t1Br, t1Bi = fmul(tRB[0][0], tRB[0][1])
        _shift_store(st_ref, 6, (t1Ar, t1Ai, t1Br, t1Bi,
                                 cZ * tSZ[0][0] + dcZ * SZ[0]
                                 - rowmask * dcZ,
                                 cZ * tSZ[0][1] + dcZ * SZ[1]))
        # dT2
        t2Ar, t2Ai = fmul(tRA[1][0], tRA[1][1])
        x2Ar, x2Ai = fmul(RA[0], RA[1], dcFr, dcFi)
        t2Br, t2Bi = fmul(tRB[1][0], tRB[1][1])
        x2Br, x2Bi = fmul(RB[0], RB[1], dcFr, dcFi)
        _shift_store(st_ref, 12, (t2Ar + x2Ar, t2Ai + x2Ai,
                                  t2Br + x2Br, t2Bi + x2Bi,
                                  cZ * tSZ[1][0], cZ * tSZ[1][1]))
        # dB1
        bAr, bAi = fmul(tRA[2][0] + cRA[0], tRA[2][1] + cRA[1])
        bBr, bBi = fmul(tRB[2][0] + cRB[0], tRB[2][1] + cRB[1])
        _shift_store(st_ref, 18, (bAr, bAi, bBr, bBi,
                                  cZ * (tSZ[2][0] + cSZ[0]),
                                  cZ * (tSZ[2][1] + cSZ[1])))
        # ddf: tangent state through the primal coefficient + the
        # phasor derivative applied to the primal planes (F only: Z
        # carries no off-resonance)
        fAr, fAi = fmul(tRA[3][0], tRA[3][1])
        xAr, xAi = fmul(RA[0], RA[1], fFr, fFi)
        fBr, fBi = fmul(tRB[3][0], tRB[3][1])
        xBr, xBi = fmul(RB[0], RB[1], fFr, fFi)
        _shift_store(st_ref, 24, (fAr + xAr, fAi + xAi,
                                  fBr + xBr, fBi + xBi,
                                  cZ * tSZ[3][0], cZ * tSZ[3][1]))
        return 0

    jax.lax.fori_loop(0, pchunk, step, 0)


@partial(jax.jit, static_argnames=("nstate", "btile", "pchunk",
                                   "demodulate", "interpret"))
def megre_jacobian_pallas(FA, phi, TR, TEs, T1s, T2s, B1s, dfs=None, *,
                          nstate=10, btile=512, pchunk=None,
                          demodulate=False, interpret=False):
    """ME-GRE echoes + dS/d(T1, T2, B1, df) in one fused kernel.

    Same contract as :func:`megre_dictionary_pallas` plus derivatives:
    returns ``(re, im), (jre, jim)`` with signals (B, P, m) and
    Jacobians (B, P, m, 4) ordered (T1, T2, B1, df).  The df column
    (d/d off-resonance, signal per kHz) is exact at any df including 0
    — joint T2 + B0 (+ PD scale) Gauss-Newton mapping from one
    multi-echo acquisition (the reference's E op does carry dg
    analytically, but has no fused path and no B0-fitting example).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    nstate = max(int(nstate), 1)
    use_df = dfs is not None
    P, B, Pp, Bp, m, pchunk, args = _pad_megre(
        FA, phi, TR, TEs, T1s, T2s, B1s, dfs, btile, pchunk, nout=10)
    nP, nB = Pp // pchunk, Bp // btile

    kernel = partial(_kernel_megre_jac, nstate=nstate, pchunk=pchunk,
                     nechoes=m, demodulate=demodulate, use_df=use_df)
    outs = pl.pallas_call(
        kernel,
        grid=(nB, nP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # FA
            pl.BlockSpec(memory_space=pltpu.SMEM),              # phi
            pl.BlockSpec(memory_space=pltpu.SMEM),              # TR
            pl.BlockSpec(memory_space=pltpu.SMEM),              # TEs
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # T1
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # T2
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # B1
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # df
        ],
        out_specs=[pl.BlockSpec((pchunk, btile),
                                lambda b, pc: (pc, b))] * (10 * m),
        out_shape=[jax.ShapeDtypeStruct((Pp, Bp), f32)] * (10 * m),
        scratch_shapes=[pltpu.VMEM((30, nstate + 1, btile), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    o = [x[:P, :B].T for x in outs]                 # 10m x (B, P)
    # per echo j: [sig_re, sig_im, (dre, dim) x (T1, T2, B1, df)]
    re = jnp.stack([o[10 * j] for j in range(m)], axis=-1)
    im = jnp.stack([o[10 * j + 1] for j in range(m)], axis=-1)
    jre = jnp.stack([jnp.stack([o[10 * j + 2 + 2 * v]
                                for v in range(4)], axis=-1)
                     for j in range(m)], axis=2)    # (B, P, m, 4)
    jim = jnp.stack([jnp.stack([o[10 * j + 3 + 2 * v]
                                for v in range(4)], axis=-1)
                     for j in range(m)], axis=2)
    return (re, im), (jre, jim)
