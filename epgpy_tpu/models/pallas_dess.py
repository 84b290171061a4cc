"""Pallas TPU kernel: fused DESS (double-echo steady state) trains.

DESS reads TWO echoes per TR: the FISP echo (pre-gradient, at TE after
the pulse) and the PSIF echo (post-gradient).  Per TR the operator
train is ``[T, E(TE1), ADC, E(mid), S(1), E(TE2), ADC]`` (reference
examples/basics/dess.py; our golden `dess.npz`).  Two exact
identities make the fused kernel a small extension of the folded
half-ladder FISP kernel (models/pallas_fisp._kernel_half):

- k-independent relaxation commutes with the shift, so the PSIF echo
  = F+(-1) right after the rotation, decayed over the FULL TR
  (TE1 + mid + TE2) — the mid/TE2 split never enters the signal; and
- after the folded unit shift A(0) <- B(1) cF, the new A(0) row IS
  that value: the PSIF echo is read directly from the updated state.

State: 6 folded planes (A=F+(k), B=F+(-k), Z; re/im) of N+1 rows in
VMEM, identical to the FISP kernel; outputs are two (P, B) echo pairs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pallas_common import (_cmul, _pad_setup, _rot_A, _rot_B, _rot_Z,
                            _rot_coeffs, _shift_store)

__all__ = ["dess_dictionary_pallas", "dess_jacobian_pallas"]


def _kernel_dess(fa_ref, phi_ref, tr_ref, te_ref, t1_ref, t2_ref,
                 b1_ref, df_ref, out1_re_ref, out1_im_ref,
                 out2_re_ref, out2_im_ref, st_ref, *, nstate, pchunk,
                 demodulate, use_df, var_te=False):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

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
    if not var_te:
        TE = te_ref[0, 0]
        E2te = jnp.exp(-TE / T2)

    def step(i, _):
        if var_te:
            te = te_ref[0, base + i]
            e2te = jnp.exp(-te / T2)
        else:
            te, e2te = TE, E2te
        AR, AI = st_ref[0], st_ref[1]
        BR, BI = st_ref[2], st_ref[3]
        ZR, ZI = st_ref[4], st_ref[5]

        fa = fa_ref[0, base + i]
        ph = phi_ref[0, base + i] * (jnp.pi / 180.0)
        a = fa * B1 * (jnp.pi / 180.0)
        ca, sa = jnp.cos(a), jnp.sin(a)
        cos2, sin2 = (1 + ca) / 2, (1 - ca) / 2
        cp, sp = jnp.cos(ph), jnp.sin(ph)
        c2p, s2p = jnp.cos(2 * ph), jnp.sin(2 * ph)

        m01r, m01i = c2p * sin2, s2p * sin2
        m02r, m02i = sp * sa, -cp * sa
        m20r, m20i = -0.5 * sp * sa, -0.5 * cp * sa
        m21r, m21i = -0.5 * sp * sa, 0.5 * cp * sa

        cmul = _cmul

        TRi = tr_ref[0, base + i]
        cF = jnp.exp(-TRi / T2)
        cZ = jnp.exp(-TRi / T1)
        rec = 1.0 - cZ

        if use_df:
            ang_te = 2 * jnp.pi * DF * te
            pteR, pteI = jnp.cos(ang_te), jnp.sin(ang_te)
        # FISP echo from the k=0 row (F-(0) = conj(A(0)))
        eR, eI = cmul(m01r, m01i, AR[0, :], -AI[0, :])
        e2R, e2I = cmul(m02r, m02i, ZR[0, :], ZI[0, :])
        eR = (cos2 * AR[0, :] + eR + e2R) * e2te
        eI = (cos2 * AI[0, :] + eI + e2I) * e2te
        if use_df:
            eR, eI = cmul(pteR, pteI, eR, eI)
        if demodulate:
            eR, eI = eR * cp + eI * sp, eI * cp - eR * sp
        out1_re_ref[i, :] = eR
        out1_im_ref[i, :] = eI

        if use_df:
            ang = 2 * jnp.pi * DF * TRi
            cFpR, cFpI = cF * jnp.cos(ang), cF * jnp.sin(ang)
        else:
            cFpR = cF
            cFpI = jnp.zeros_like(cF)

        cmul3 = _cmul

        c00r, c00i = cmul3(cFpR, cFpI, cos2, jnp.zeros_like(cos2))
        c01r, c01i = cmul3(cFpR, cFpI, m01r, m01i)
        c02r, c02i = cmul3(cFpR, cFpI, m02r, m02i)
        aR, aI = cmul(c00r, c00i, AR, AI)
        bR, bI = cmul(c01r, c01i, BR, -BI)
        dR, dI = cmul(c02r, c02i, ZR, ZI)
        nAR, nAI = aR + bR + dR, aI + bI + dI
        aR, aI = cmul(c00r, c00i, BR, BI)
        bR, bI = cmul(c01r, c01i, AR, -AI)
        dR, dI = cmul(c02r, c02i, ZR, -ZI)
        nBR, nBI = aR + bR + dR, aI + bI + dI
        aR, aI = cmul(m20r * cZ, m20i * cZ, AR, AI)
        bR, bI = cmul(m21r * cZ, m21i * cZ, BR, -BI)
        nZR = aR + bR + (ca * cZ) * ZR + rowmask * rec
        nZI = aI + bI + (ca * cZ) * ZI

        zrow = jnp.zeros_like(nAR[:1])
        st_ref[0] = jnp.concatenate([nBR[1:2], nAR[:-1]], axis=0)
        st_ref[1] = jnp.concatenate([nBI[1:2], nAI[:-1]], axis=0)
        st_ref[2] = jnp.concatenate([nBR[1:], zrow], axis=0)
        st_ref[3] = jnp.concatenate([nBI[1:], zrow], axis=0)
        st_ref[4] = nZR
        st_ref[5] = nZI

        # PSIF echo: the post-shift k=0 row A(0) = cF phi(TR) B_rot(1)
        # (full-TR decay of the pre-shift F+(-1); recovery is Z-only)
        pR2, pI2 = st_ref[0][0, :], st_ref[1][0, :]
        if demodulate:
            pR2, pI2 = pR2 * cp + pI2 * sp, pI2 * cp - pR2 * sp
        out2_re_ref[i, :] = pR2
        out2_im_ref[i, :] = pI2
        return 0

    jax.lax.fori_loop(0, pchunk, step, 0)


@partial(jax.jit, static_argnames=("nstate", "btile", "pchunk",
                                   "demodulate", "interpret"))
def dess_dictionary_pallas(FA, phi, TR, TE, T1s, T2s, B1s, dfs=None, *,
                           nstate=10, btile=512, pchunk=None,
                           demodulate=False, interpret=False):
    """DESS train via the fused folded-half-ladder Pallas kernel.

    FA (P,) degrees; phi/TR broadcast to (P,); TE the FISP echo time
    (scalar or per-pulse) — the PSIF echo depends only on the full TR,
    never on the mid/TE2 split.  T1s/T2s/B1s/dfs are (B,) per-atom.
    Returns ((re1, im1), (re2, im2)): two (B, P) float32 echo trains
    (FISP, PSIF).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    use_df = dfs is not None
    # shared pad/chunk setup with the bSSFP family (same no-op pulse
    # fills and TR > TE invariant for padded pulses)
    (P, B, Pp, Bp, pchunk, var_te, args, TE_arr, atom_args) = _pad_setup(
        FA, phi, TR, TE, T1s, T2s, B1s, dfs, btile, pchunk, nout=4)
    nP, nB = Pp // pchunk, Bp // btile
    args = args + [TE_arr] + atom_args

    kernel = partial(_kernel_dess, nstate=nstate, pchunk=pchunk,
                     demodulate=demodulate, use_df=use_df, var_te=var_te)
    outs = pl.pallas_call(
        kernel,
        grid=(nB, nP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # FA
            pl.BlockSpec(memory_space=pltpu.SMEM),              # phi
            pl.BlockSpec(memory_space=pltpu.SMEM),              # TR
            pl.BlockSpec(memory_space=pltpu.SMEM),              # TE
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # T1
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # T2
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # B1
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # df
        ],
        out_specs=[pl.BlockSpec((pchunk, btile), lambda b, pc: (pc, b))] * 4,
        out_shape=[jax.ShapeDtypeStruct((Pp, Bp), f32)] * 4,
        scratch_shapes=[pltpu.VMEM((6, nstate + 1, btile), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    r1, i1, r2, i2 = [o[:P, :B].T for o in outs]
    return (r1, i1), (r2, i2)


def _kernel_dess_jac(fa_ref, phi_ref, tr_ref, te_ref, t1_ref, t2_ref,
                     b1_ref, df_ref, *refs, nstate, pchunk, demodulate,
                     use_df, var_te=False):
    """Fused DESS primal + (dT1, dT2, dB1) tangents, folded ladder.

    Forward-mode derivative of `_kernel_dess` in the style of
    pallas_fisp._kernel_jac: 24 VMEM planes (primal at 0-5, one 6-plane
    group per variable), sparse coefficient tangents (T1 only perturbs
    cZ/rec, T2 only cF and the TE-decay of the FISP echo, B1 only the
    rotation coefficients).  Both echoes get tangent columns: the PSIF
    echo is the post-update A(0) row, so its tangents are read from the
    updated tangent planes — including the dT2 contribution through the
    full-TR decay dcF (reference has no DESS derivatives at all;
    closest anchor is epgpy diff.py order1 propagation, SURVEY §2.6).
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    out_refs, st_ref = refs[:16], refs[16]
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
    if not var_te:
        TE = te_ref[0, 0]
        E2te = jnp.exp(-TE / T2)
        dE2te = E2te * TE / (T2 * T2)          # d/dT2
        if use_df:
            ang_te = 2 * jnp.pi * DF * TE
            pteR, pteI = jnp.cos(ang_te), jnp.sin(ang_te)

    def step(i, _):
        if var_te:
            te = te_ref[0, base + i]
            e2te = jnp.exp(-te / T2)
            de2te = e2te * te / (T2 * T2)
            if use_df:
                ang = 2 * jnp.pi * DF * te
                pter, ptei = jnp.cos(ang), jnp.sin(ang)
        else:
            te, e2te, de2te = TE, E2te, dE2te
            if use_df:
                pter, ptei = pteR, pteI
        if not use_df:
            pter = ptei = None
        P6 = [st_ref[j] for j in range(6)]
        tans = [[st_ref[6 * v + j] for j in range(6)] for v in (1, 2, 3)]

        fa = fa_ref[0, base + i]
        ph = phi_ref[0, base + i] * (jnp.pi / 180.0)
        rad = jnp.pi / 180.0
        a = fa * B1 * rad
        rc = _rot_coeffs(a, ph)
        ca, sa = jnp.cos(a), jnp.sin(a)
        cp, sp = jnp.cos(ph), jnp.sin(ph)
        c2p, s2p = jnp.cos(2 * ph), jnp.sin(2 * ph)
        # B1 tangents of the rotation coefficients (shared-form
        # derivatives of _rot_coeffs' 10-tuple)
        da = fa * rad
        dsa, dca = ca * da, -sa * da
        dcos2, dsin2 = -0.5 * sa * da, 0.5 * sa * da
        drc = (dcos2, c2p * dsin2, s2p * dsin2, sp * dsa, -cp * dsa,
               dca, -0.5 * sp * dsa, -0.5 * cp * dsa,
               -0.5 * sp * dsa, 0.5 * cp * dsa)

        TRi = tr_ref[0, base + i]
        cF = jnp.exp(-TRi / T2)
        cZ = jnp.exp(-TRi / T1)
        rec = 1.0 - cZ
        dcZ = cZ * TRi / (T1 * T1)          # d/dT1
        dcF = cF * TRi / (T2 * T2)          # d/dT2
        if use_df:
            ang = 2 * jnp.pi * DF * TRi
            cpR, cpI = jnp.cos(ang), jnp.sin(ang)
            cFr, cFi = cF * cpR, cF * cpI
            dcFr, dcFi = dcF * cpR, dcF * cpI

        def fmul(re, im):
            if use_df:
                return cFr * re - cFi * im, cFr * im + cFi * re
            return cF * re, cF * im

        def dfmul(re, im):
            if use_df:
                return dcFr * re - dcFi * im, dcFr * im + dcFi * re
            return dcF * re, dcF * im

        prim = partial(_rot_A, *rc[:5])
        primB = partial(_rot_B, *rc[:5])
        primZ = partial(_rot_Z, *rc[5:])

        RA = prim(P6)
        RB = primB(P6)
        SZ = primZ(P6)
        tRA = [prim(t) for t in tans]
        tRB = [primB(t) for t in tans]
        tSZ = [primZ(t) for t in tans]
        # B1 coefficient-derivative pass over the primal planes
        cRA = _rot_A(*drc[:5], P6)
        cRB = _rot_B(*drc[:5], P6)
        cSZ = _rot_Z(*drc[5:], P6)

        def demod_write(re_ref, im_ref, eR, eI, with_df_te):
            if use_df and with_df_te:
                eR, eI = eR * pter - eI * ptei, eI * pter + eR * ptei
            if demodulate:
                eR, eI = eR * cp + eI * sp, eI * cp - eR * sp
            re_ref[i, :] = eR
            im_ref[i, :] = eI

        # FISP echoes (pre-update k=0 row, TE decay + df phase at TE)
        demod_write(out_refs[0], out_refs[1],
                    e2te * RA[0][0, :], e2te * RA[1][0, :], True)
        demod_write(out_refs[4], out_refs[5],
                    e2te * tRA[0][0][0, :], e2te * tRA[0][1][0, :], True)
        demod_write(out_refs[6], out_refs[7],
                    e2te * tRA[1][0][0, :] + de2te * RA[0][0, :],
                    e2te * tRA[1][1][0, :] + de2te * RA[1][0, :], True)
        demod_write(out_refs[8], out_refs[9],
                    e2te * (tRA[2][0][0, :] + cRA[0][0, :]),
                    e2te * (tRA[2][1][0, :] + cRA[1][0, :]), True)

        # updated planes
        pAr, pAi = fmul(RA[0], RA[1])
        pBr, pBi = fmul(RB[0], RB[1])
        pZr, pZi = cZ * SZ[0] + rowmask * rec, cZ * SZ[1]
        # dT1: only cZ / rec carry tangents
        t1Ar, t1Ai = fmul(tRA[0][0], tRA[0][1])
        t1Br, t1Bi = fmul(tRB[0][0], tRB[0][1])
        t1Zr = cZ * tSZ[0][0] + dcZ * SZ[0] - rowmask * dcZ
        t1Zi = cZ * tSZ[0][1] + dcZ * SZ[1]
        # dT2: only cF carries tangents
        t2Ar, t2Ai = fmul(tRA[1][0], tRA[1][1])
        x2Ar, x2Ai = dfmul(RA[0], RA[1])
        t2Br, t2Bi = fmul(tRB[1][0], tRB[1][1])
        x2Br, x2Bi = dfmul(RB[0], RB[1])
        t2Ar, t2Ai = t2Ar + x2Ar, t2Ai + x2Ai
        t2Br, t2Bi = t2Br + x2Br, t2Bi + x2Bi
        t2Zr, t2Zi = cZ * tSZ[1][0], cZ * tSZ[1][1]
        # dB1: only the rotation coefficients carry tangents
        bAr, bAi = fmul(tRA[2][0] + cRA[0], tRA[2][1] + cRA[1])
        bBr, bBi = fmul(tRB[2][0] + cRB[0], tRB[2][1] + cRB[1])
        bZr, bZi = cZ * (tSZ[2][0] + cSZ[0]), cZ * (tSZ[2][1] + cSZ[1])

        # PSIF echoes: the post-update A(0) row == updated B row 1
        # (full-TR decay already inside cF; no extra df phase)
        demod_write(out_refs[2], out_refs[3], pBr[1, :], pBi[1, :], False)
        demod_write(out_refs[10], out_refs[11],
                    t1Br[1, :], t1Bi[1, :], False)
        demod_write(out_refs[12], out_refs[13],
                    t2Br[1, :], t2Bi[1, :], False)
        demod_write(out_refs[14], out_refs[15],
                    bBr[1, :], bBi[1, :], False)

        _shift_store(st_ref, 0, (pAr, pAi, pBr, pBi, pZr, pZi))
        _shift_store(st_ref, 6, (t1Ar, t1Ai, t1Br, t1Bi, t1Zr, t1Zi))
        _shift_store(st_ref, 12, (t2Ar, t2Ai, t2Br, t2Bi, t2Zr, t2Zi))
        _shift_store(st_ref, 18, (bAr, bAi, bBr, bBi, bZr, bZi))
        return 0

    jax.lax.fori_loop(0, pchunk, step, 0)


@partial(jax.jit, static_argnames=("nstate", "btile", "pchunk",
                                   "demodulate", "interpret"))
def dess_jacobian_pallas(FA, phi, TR, TE, T1s, T2s, B1s, dfs=None, *,
                         nstate=10, btile=512, pchunk=None,
                         demodulate=False, interpret=False):
    """Both DESS echo trains + dS/d(T1, T2, B1) in one fused kernel.

    Same contract as :func:`dess_dictionary_pallas` plus derivatives:
    returns ``((re1, im1), (re2, im2)), ((j1re, j1im), (j2re, j2im))``
    with signals (B, P) and Jacobians (B, P, 3) ordered (T1, T2, B1)
    for the FISP and PSIF echoes respectively.  Enables joint T1+T2
    (+B1) Gauss-Newton mapping from a single DESS acquisition — a
    capability the reference does not have (its X/S/D ops carry no
    derivatives; DESS mapping there would be finite differences).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    nstate = max(int(nstate), 1)
    use_df = dfs is not None
    (P, B, Pp, Bp, pchunk, var_te, args, TE_arr, atom_args) = _pad_setup(
        FA, phi, TR, TE, T1s, T2s, B1s, dfs, btile, pchunk, nout=16)
    nP, nB = Pp // pchunk, Bp // btile
    args = args + [TE_arr] + atom_args

    kernel = partial(_kernel_dess_jac, nstate=nstate, pchunk=pchunk,
                     demodulate=demodulate, use_df=use_df, var_te=var_te)
    outs = pl.pallas_call(
        kernel,
        grid=(nB, nP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # FA
            pl.BlockSpec(memory_space=pltpu.SMEM),              # phi
            pl.BlockSpec(memory_space=pltpu.SMEM),              # TR
            pl.BlockSpec(memory_space=pltpu.SMEM),              # TE
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # T1
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # T2
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # B1
            pl.BlockSpec((1, btile), lambda b, pc: (0, b)),     # df
        ],
        out_specs=[pl.BlockSpec((pchunk, btile),
                                lambda b, pc: (pc, b))] * 16,
        out_shape=[jax.ShapeDtypeStruct((Pp, Bp), f32)] * 16,
        scratch_shapes=[pltpu.VMEM((24, nstate + 1, btile), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    o = [x[:P, :B].T for x in outs]
    j1re = jnp.stack([o[4], o[6], o[8]], axis=-1)
    j1im = jnp.stack([o[5], o[7], o[9]], axis=-1)
    j2re = jnp.stack([o[10], o[12], o[14]], axis=-1)
    j2im = jnp.stack([o[11], o[13], o[15]], axis=-1)
    return ((o[0], o[1]), (o[2], o[3])), ((j1re, j1im), (j2re, j2im))
