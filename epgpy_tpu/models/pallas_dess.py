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

from .pallas_common import _cmul, _pad_setup

__all__ = ["dess_dictionary_pallas"]


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
