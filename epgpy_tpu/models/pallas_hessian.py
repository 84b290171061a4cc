"""Pallas TPU kernel: fused per-pulse MRF Hessian (the flagship workload).

The reference's largest published differentiation problem — a 400-TR FISP
train ``[T(alpha_i), E(tau_i, T1, T2), ADC, S(1)] * N`` with Hessian
w.r.t. (magnitude, T1, T2) x (N alpha + N tau) = 3 x 2N variables
(reference examples/profiling/differentiation_mrf.py:18-67) — costs the
general engine minutes: nested jacfwd re-runs the 400-step scan once per
tangent chunk and every chunk round-trips the state through HBM.

EPG operators are AFFINE in the state, so every first- and second-order
tangent propagates by the SAME per-TR operator as the primal:

    s'      = Sh(D M s + r)
    v_q'    = Sh(D M v_q) + Sh(d_q(D M) s + d_q r)
    h_qq''  = Sh(D M h) + Sh(d_q'(D M) v_q) + Sh(d_q(D M) v_q')
              + Sh(d2_qq'(D M) s + d2_qq' r)

with M the Weigel rotation (depends on alpha_n only), D the diagonal
relaxation (tau_n, T1, T2), r the k=0 recovery, Sh the folded unit
shift.  Per-pulse tangents v_{alpha_i} / v_{tau_i} are zero until pulse
i and are seeded by the d_q terms exactly once (a lane mask) — so the
whole 6N+3-tangent forward propagation is ONE vectorized plane pass per
TR with the tangent index on the TPU lane axis, entirely in VMEM.

Nine plane groups of 6 real planes (A/B/Z re+im, folded half-ladder of
N_s+1 rows, models/pallas_fisp._kernel_half layout):

    0 primal s        1 u1 = ds/dT1      2 u2 = ds/dT2
    3 a_i = ds/da_i   4 t_i = ds/dtau_i
    5 w1_i = d2s/dT1 da_i    6 w2_i = d2s/dT2 da_i
    7 x1_i = d2s/dT1 dtau_i  8 x2_i = d2s/dT2 dtau_i

Groups 0-2 are lane-replicated (every lane carries the same value) so
seed terms need no cross-lane broadcasts.  ``second_order=False`` drops
groups 5-8 (the per-pulse Jacobian workload of CRLB sequence design,
reference examples/sequence/optim_mrf.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["fisp_hessian_pallas", "fisp_hessian_pallas_sharded"]


def fisp_hessian_pallas_sharded(FA, phi, TAU, T1s, T2s, *, mesh,
                                axis="atoms", second_order=True, **kw):
    """Atom-sharded fused per-pulse Hessian kernel over a device mesh.

    Each device runs the full VMEM-resident kernel on its local atom
    shard (embarrassingly parallel, no collectives) — per-atom CRLB /
    design maps at multi-chip scale.  The atom count must divide the
    `axis` size of `mesh`; pulse arrays are replicated.  Returns the
    `fisp_hessian_pallas` dict sharded on the leading atom axis.
    """
    from jax.sharding import PartitionSpec as PS

    def local(t1, t2):
        return fisp_hessian_pallas(FA, phi, TAU, t1, t2,
                                   second_order=second_order, **kw)

    vec = (PS(axis, None), PS(axis, None))
    mat = (PS(axis, None, None), PS(axis, None, None))
    out_specs = {"sig": vec, "dT1": vec, "dT2": vec,
                 "dalpha": mat, "dtau": mat}
    if second_order:
        out_specs.update({"dT1dalpha": mat, "dT2dalpha": mat,
                          "dT1dtau": mat, "dT2dtau": mat})
    f = jax.shard_map(local, mesh=mesh, in_specs=(PS(axis), PS(axis)),
                      out_specs=out_specs, check_vma=False)
    T1s = jnp.atleast_1d(jnp.asarray(T1s, jnp.float32))
    T2s = jnp.atleast_1d(jnp.asarray(T2s, jnp.float32))
    T1s, T2s = jnp.broadcast_arrays(T1s, T2s)
    return jax.jit(f)(T1s, T2s)

# group indices
_P, _U1, _U2, _A, _T, _W1, _W2, _X1, _X2 = range(9)


def _kernel_hess(fa_ref, phi_ref, tau_ref, te_ref, ti_ref, t1_ref, t2_ref,
                 *refs, nstate, pchunk, second_order, te_sep, use_inv):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    ngroups = 9 if second_order else 5
    outs = refs[:2 * ngroups]
    st_ref = refs[2 * ngroups]
    b = pl.program_id(0)
    pc = pl.program_id(1)
    H = nstate + 1
    f32 = jnp.float32
    Na = st_ref.shape[-1]
    T1 = t1_ref[0, b]
    T2 = t2_ref[0, b]

    @pl.when(pc == 0)
    def _init():
        st_ref[...] = jnp.zeros_like(st_ref)
        if use_inv:
            # perfect (B1=1) 180deg inversion + TI relaxation: F+ = 0
            # exactly (sin(pi) = 0), Z(0) = 1 - 2 E1i; the only nonzero
            # tangent seed is dZ(0)/dT1 = -2 dE1i (u1 group, plane ZR)
            TI = ti_ref[0, 0]
            E1i = jnp.exp(-TI / T1)
            one = jnp.ones_like(st_ref[4, 0, :])
            st_ref[6 * _P + 4, 0, :] = (1.0 - 2.0 * E1i) * one
            st_ref[6 * _U1 + 4, 0, :] = (-2.0 * E1i * TI / (T1 * T1)) * one
        else:
            # primal Z(0) = 1, replicated across all tangent lanes
            st_ref[4, 0, :] = jnp.ones_like(st_ref[4, 0, :])

    rowm = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0).astype(f32)
    base = pc * pchunk
    rad = jnp.pi / 180.0
    if te_sep:
        # fixed echo time: e2te is pulse-independent, no tau echo terms
        TEc = te_ref[0, 0]
        E2TE = jnp.exp(-TEc / T2)
        dE2TE = E2TE * TEc / (T2 * T2)

    def step(i, _):
        n = base + i                      # global pulse index == lane
        fa = fa_ref[0, n]
        ph = phi_ref[0, n] * rad
        tau = tau_ref[0, n]

        # rotation coefficients (scalars; alpha in degrees)
        a = fa * rad
        ca, sa = jnp.cos(a), jnp.sin(a)
        cos2, sin2 = (1 + ca) / 2, (1 - ca) / 2
        cp, sp = jnp.cos(ph), jnp.sin(ph)
        c2p, s2p = jnp.cos(2 * ph), jnp.sin(2 * ph)
        m01 = (c2p * sin2, s2p * sin2)
        m02 = (sp * sa, -cp * sa)
        m20 = (-0.5 * sp * sa, -0.5 * cp * sa)
        m21 = (-0.5 * sp * sa, 0.5 * cp * sa)
        # d/d(alpha in degrees) of the coefficients
        dsa, dca = ca * rad, -sa * rad
        dcos2, dsin2 = -0.5 * sa * rad, 0.5 * sa * rad
        dm01 = (c2p * dsin2, s2p * dsin2)
        dm02 = (sp * dsa, -cp * dsa)
        dm20 = (-0.5 * sp * dsa, -0.5 * cp * dsa)
        dm21 = (-0.5 * sp * dsa, 0.5 * cp * dsa)

        # relaxation diagonals over the full TR.  te_sep=False: the
        # 4-op train (echo at te = tau, rem = 0).  te_sep=True: the
        # 5-op train (echo at the fixed TE; tau is the TRACKED tail
        # TR - TE, so d/dtau formulas are unchanged while the T1/T2
        # derivatives use the total time).
        ttot = tau + TEc if te_sep else tau
        cF = jnp.exp(-ttot / T2)
        cZ = jnp.exp(-ttot / T1)
        rec = 1.0 - cZ
        dcF2 = cF * ttot / (T2 * T2)      # dcF/dT2
        dcZ1 = cZ * ttot / (T1 * T1)      # dcZ/dT1
        cFt = -cF / T2                    # dcF/dtau
        cZt = -cZ / T1                    # dcZ/dtau
        cFt2 = cF * (1.0 - ttot / T2) / (T2 * T2)   # d2cF/dtau dT2
        cZt1 = cZ * (1.0 - ttot / T1) / (T1 * T1)   # d2cZ/dtau dT1
        # echo decay and its direct derivative terms
        if te_sep:
            e2 = E2TE
            de2 = dE2TE                   # d e2te / dT2
        else:
            e2, de2 = cF, dcF2

        maskL = (jax.lax.broadcasted_iota(jnp.int32, (1, Na), 1)
                 == n).astype(f32)
        mrow = maskL[0, :]

        def planes(g):
            return [st_ref[6 * g + j] for j in range(6)]

        def rot(c2, a01, a02, a20, a21, caa, p6):
            """Folded-ladder Weigel rotation with scalar coefficients.

            YA = c2 A + a01 conj(B) + a02 Z;  YB = c2 B + a01 conj(A)
            + a02 conj(Z);  YZ = a20 A + a21 conj(B) + caa Z.
            Returns ((YAr, YAi), (YBr, YBi), (YZr, YZi))."""
            AR, AI, BR, BI, ZR, ZI = p6
            yar = c2 * AR + a01[0] * BR + a01[1] * BI + a02[0] * ZR \
                - a02[1] * ZI
            yai = c2 * AI + a01[1] * BR - a01[0] * BI + a02[0] * ZI \
                + a02[1] * ZR
            ybr = c2 * BR + a01[0] * AR + a01[1] * AI + a02[0] * ZR \
                + a02[1] * ZI
            ybi = c2 * BI + a01[1] * AR - a01[0] * AI + a02[1] * ZR \
                - a02[0] * ZI
            yzr = a20[0] * AR - a20[1] * AI + a21[0] * BR + a21[1] * BI \
                + caa * ZR
            yzi = a20[0] * AI + a20[1] * AR + a21[1] * BR - a21[0] * BI \
                + caa * ZI
            return (yar, yai), (ybr, ybi), (yzr, yzi)

        rot0 = partial(rot, cos2, m01, m02, m20, m21, ca)
        rotd = partial(rot, dcos2, dm01, dm02, dm20, dm21, dca)

        Y = [rot0(planes(g)) for g in range(ngroups)]
        Qp = rotd(planes(_P))
        Qu1 = rotd(planes(_U1))
        Qu2 = rotd(planes(_U2))

        # --- echoes: e = cF * YA[0] + direct terms (te decay d/dT2 is
        # dcF2, d/dtau is cFt, d2/dtau dT2 is cFt2)
        def row0(y):
            return y[0][0][0, :], y[0][1][0, :]

        eP = row0(Y[_P])
        eU1 = row0(Y[_U1])
        eU2 = row0(Y[_U2])
        eA = row0(Y[_A])
        eT = row0(Y[_T])
        qP = row0(Qp)
        qU1 = row0(Qu1)
        qU2 = row0(Qu2)

        def write(g, vr, vi):
            outs[2 * g][0, i, :] = vr
            outs[2 * g + 1][0, i, :] = vi

        write(_P, e2 * eP[0], e2 * eP[1])
        write(_U1, e2 * eU1[0], e2 * eU1[1])
        write(_U2, e2 * eU2[0] + de2 * eP[0], e2 * eU2[1] + de2 * eP[1])
        write(_A, e2 * (eA[0] + mrow * qP[0]), e2 * (eA[1] + mrow * qP[1]))
        if te_sep:
            # TE fixed: tau has no direct echo term
            write(_T, e2 * eT[0], e2 * eT[1])
        else:
            write(_T, e2 * eT[0] + mrow * cFt * eP[0],
                  e2 * eT[1] + mrow * cFt * eP[1])
        if second_order:
            eW1 = row0(Y[_W1])
            eW2 = row0(Y[_W2])
            eX1 = row0(Y[_X1])
            eX2 = row0(Y[_X2])
            write(_W1, e2 * (eW1[0] + mrow * qU1[0]),
                  e2 * (eW1[1] + mrow * qU1[1]))
            write(_W2, e2 * eW2[0] + de2 * eA[0]
                  + mrow * (e2 * qU2[0] + de2 * qP[0]),
                  e2 * eW2[1] + de2 * eA[1]
                  + mrow * (e2 * qU2[1] + de2 * qP[1]))
            if te_sep:
                write(_X1, e2 * eX1[0], e2 * eX1[1])
                write(_X2, e2 * eX2[0] + de2 * eT[0],
                      e2 * eX2[1] + de2 * eT[1])
            else:
                write(_X1, e2 * eX1[0] + mrow * cFt * eU1[0],
                      e2 * eX1[1] + mrow * cFt * eU1[1])
                write(_X2, e2 * eX2[0] + de2 * eT[0]
                      + mrow * (cFt * eU2[0] + cFt2 * eP[0]),
                      e2 * eX2[1] + de2 * eT[1]
                      + mrow * (cFt * eU2[1] + cFt2 * eP[1]))

        # --- state updates: nA/nB scale by cF (+ extras), nZ by cZ
        # (+ extras and k=0 recovery terms), then the folded unit shift
        def shift6(g, nar, nai, nbr, nbi, nzr, nzi):
            zrow = jnp.zeros_like(nar[:1])
            s0 = 6 * g
            st_ref[s0 + 0] = jnp.concatenate([nbr[1:2], nar[:-1]], axis=0)
            st_ref[s0 + 1] = jnp.concatenate([nbi[1:2], nai[:-1]], axis=0)
            st_ref[s0 + 2] = jnp.concatenate([nbr[1:], zrow], axis=0)
            st_ref[s0 + 3] = jnp.concatenate([nbi[1:], zrow], axis=0)
            st_ref[s0 + 4] = nzr
            st_ref[s0 + 5] = nzi

        def F(y):
            return y[0][0], y[0][1], y[1][0], y[1][1]

        def Z(y):
            return y[2][0], y[2][1]

        PAr, PAi, PBr, PBi = F(Y[_P])
        PZr, PZi = Z(Y[_P])
        qAr, qAi, qBr, qBi = F(Qp)
        qZr, qZi = Qp[2]

        # primal
        shift6(_P, cF * PAr, cF * PAi, cF * PBr, cF * PBi,
               cZ * PZr + rowm * rec, cZ * PZi)
        # u1 = d/dT1: D'_T1 = diag(0, 0, dcZ1); r'_T1 = -dcZ1 at k=0
        yA = Y[_U1]
        shift6(_U1, cF * yA[0][0], cF * yA[0][1], cF * yA[1][0],
               cF * yA[1][1],
               cZ * yA[2][0] + dcZ1 * PZr - rowm * dcZ1,
               cZ * yA[2][1] + dcZ1 * PZi)
        # u2 = d/dT2: D'_T2 = diag(dcF2, dcF2, 0)
        yA = Y[_U2]
        shift6(_U2, cF * yA[0][0] + dcF2 * PAr, cF * yA[0][1] + dcF2 * PAi,
               cF * yA[1][0] + dcF2 * PBr, cF * yA[1][1] + dcF2 * PBi,
               cZ * yA[2][0], cZ * yA[2][1])
        # a_i: seed lane n with D M' s
        yA = Y[_A]
        aAr = cF * (yA[0][0] + maskL * qAr)
        aAi = cF * (yA[0][1] + maskL * qAi)
        aBr = cF * (yA[1][0] + maskL * qBr)
        aBi = cF * (yA[1][1] + maskL * qBi)
        aZr = cZ * (yA[2][0] + maskL * qZr)
        aZi = cZ * (yA[2][1] + maskL * qZi)
        shift6(_A, aAr, aAi, aBr, aBi, aZr, aZi)
        # t_i: seed lane n with D'_tau M s + r'_tau (r'_tau = -cZt = cZ/T1)
        yA = Y[_T]
        shift6(_T,
               cF * yA[0][0] + maskL * cFt * PAr,
               cF * yA[0][1] + maskL * cFt * PAi,
               cF * yA[1][0] + maskL * cFt * PBr,
               cF * yA[1][1] + maskL * cFt * PBi,
               cZ * yA[2][0] + maskL * (cZt * PZr - rowm * cZt),
               cZ * yA[2][1] + maskL * cZt * PZi)
        if not second_order:
            return 0

        TAr, TAi, TBr, TBi = F(Y[_T])
        TZr, TZi = Z(Y[_T])
        AAr, AAi, ABr, ABi = F(Y[_A])
        AZr, AZi = Z(Y[_A])
        q1Ar, q1Ai = Qu1[0]
        q1Br, q1Bi = Qu1[1]
        q1Zr, q1Zi = Qu1[2]
        q2Ar, q2Ai = Qu2[0]
        q2Br, q2Bi = Qu2[1]
        q2Zr, q2Zi = Qu2[2]
        U1Ar, U1Ai, U1Br, U1Bi = F(Y[_U1])
        U1Zr, U1Zi = Z(Y[_U1])
        U2Ar, U2Ai, U2Br, U2Bi = F(Y[_U2])
        U2Zr, U2Zi = Z(Y[_U2])

        # w1 = d2/dT1 da_i: D'_T1(M a) on Z; seed D(M' u1) + D'_T1(M' s)
        yA = Y[_W1]
        shift6(_W1,
               cF * (yA[0][0] + maskL * q1Ar),
               cF * (yA[0][1] + maskL * q1Ai),
               cF * (yA[1][0] + maskL * q1Br),
               cF * (yA[1][1] + maskL * q1Bi),
               cZ * (yA[2][0] + maskL * q1Zr)
               + dcZ1 * (AZr + maskL * qZr),
               cZ * (yA[2][1] + maskL * q1Zi)
               + dcZ1 * (AZi + maskL * qZi))
        # w2 = d2/dT2 da_i: D'_T2(M a) on A/B; seed D(M' u2) + D'_T2(M' s)
        yA = Y[_W2]
        shift6(_W2,
               cF * (yA[0][0] + maskL * q2Ar) + dcF2 * (AAr + maskL * qAr),
               cF * (yA[0][1] + maskL * q2Ai) + dcF2 * (AAi + maskL * qAi),
               cF * (yA[1][0] + maskL * q2Br) + dcF2 * (ABr + maskL * qBr),
               cF * (yA[1][1] + maskL * q2Bi) + dcF2 * (ABi + maskL * qBi),
               cZ * (yA[2][0] + maskL * q2Zr),
               cZ * (yA[2][1] + maskL * q2Zi))
        # x1 = d2/dT1 dtau_i: D'_T1(M t) on Z; seed D'_tau(M u1)
        # + D''_tauT1(M s) + r''_tauT1 (= -cZt1) at k=0
        yA = Y[_X1]
        shift6(_X1,
               cF * yA[0][0] + maskL * cFt * U1Ar,
               cF * yA[0][1] + maskL * cFt * U1Ai,
               cF * yA[1][0] + maskL * cFt * U1Br,
               cF * yA[1][1] + maskL * cFt * U1Bi,
               cZ * yA[2][0] + dcZ1 * TZr
               + maskL * (cZt * U1Zr + cZt1 * PZr - rowm * cZt1),
               cZ * yA[2][1] + dcZ1 * TZi
               + maskL * (cZt * U1Zi + cZt1 * PZi))
        # x2 = d2/dT2 dtau_i: D'_T2(M t) on A/B; seed D'_tau(M u2)
        # + D''_tauT2(M s)
        yA = Y[_X2]
        shift6(_X2,
               cF * yA[0][0] + dcF2 * TAr
               + maskL * (cFt * U2Ar + cFt2 * PAr),
               cF * yA[0][1] + dcF2 * TAi
               + maskL * (cFt * U2Ai + cFt2 * PAi),
               cF * yA[1][0] + dcF2 * TBr
               + maskL * (cFt * U2Br + cFt2 * PBr),
               cF * yA[1][1] + dcF2 * TBi
               + maskL * (cFt * U2Bi + cFt2 * PBi),
               cZ * yA[2][0] + maskL * cZt * U2Zr,
               cZ * yA[2][1] + maskL * cZt * U2Zi)
        return 0

    jax.lax.fori_loop(0, pchunk, step, 0)


@partial(jax.jit, static_argnames=("nstate", "pchunk", "second_order",
                                   "interpret"))
def fisp_hessian_pallas(FA, phi, TAU, T1s, T2s, *, te=None, inversion=None,
                        nstate=10, pchunk=None, second_order=True,
                        interpret=False):
    """Per-pulse MRF Jacobian/Hessian via one fused Pallas kernel.

    ``te=None`` (the flagship 4-op form): ``[T(FA_i, phi_i),
    E(TAU_i, T1, T2), ADC, S(1)] * N`` — the echo is read at TAU_i.
    ``te=TE`` (the 5-op MRF/design form): ``[T, E(TE), ADC,
    E(TAU_i), S(1)] * N`` — the echo is read at the fixed TE and TAU_i
    is the TRACKED tail (pass ``TR_i - TE``; d/dTAU == d/dTR at fixed
    TE).  ``inversion=TI`` prepends a perfect 180deg inversion + TI
    relaxation (its dT1 tangent seeded in closed form).  FA/phi/TAU are
    (N,) per-pulse arrays (degrees / degrees / ms), T1s/T2s (B,)
    per-atom.

    Returns a dict of float32 arrays (complex split re/im):
      ``sig``:  ((B, N), (B, N))                signal
      ``dT1``, ``dT2``: ((B, N), (B, N))        dS/dT1, dS/dT2
      ``dalpha``, ``dtau``: ((B, N, N), (B, N, N))   dS_j/d(alpha_i, tau_i)
      and with ``second_order=True``:
      ``dT1dalpha``, ``dT2dalpha``, ``dT1dtau``, ``dT2dtau``:
          ((B, N, N), (B, N, N))                d2S_j/dT_c dp_i

    Echo-axis j leads; pulse-variable axis i is last.  Entries with
    i > j are exactly zero (causality).  All 6N+3 tangents propagate in
    VMEM in one pass (the tangent index rides the TPU lane axis).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    FA = jnp.asarray(FA, f32)
    N = FA.shape[0]
    phi = jnp.broadcast_to(jnp.asarray(phi, f32), (N,))
    TAU = jnp.broadcast_to(jnp.asarray(TAU, f32), (N,))
    T1s = jnp.atleast_1d(jnp.asarray(T1s, f32))
    T2s = jnp.atleast_1d(jnp.asarray(T2s, f32))
    T1s, T2s = jnp.broadcast_arrays(T1s, T2s)
    B = T1s.shape[0]

    Na = max(-(-N // 128) * 128, 128)          # lane-padded pulse count
    if pchunk is None:
        pchunk = min(Na, 128)
    Pp = -(-N // pchunk) * pchunk

    def padp(x, fill):
        return (jnp.concatenate([x, jnp.full((Pp - N,), fill, f32)])
                if Pp > N else x)

    FA_p = padp(FA, 0.0).reshape(1, Pp)
    phi_p = padp(phi, 0.0).reshape(1, Pp)
    TAU_p = padp(TAU, 1.0).reshape(1, Pp)
    ngroups = 9 if second_order else 5
    nP = Pp // pchunk

    te_arr = jnp.full((1, 1), 0.0 if te is None else te, f32)
    ti_arr = jnp.full((1, 1), 0.0 if inversion is None else inversion, f32)
    kernel = partial(_kernel_hess, nstate=nstate, pchunk=pchunk,
                     second_order=second_order, te_sep=te is not None,
                     use_inv=inversion is not None)
    outs = pl.pallas_call(
        kernel,
        grid=(B, nP),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 7,
        out_specs=[pl.BlockSpec((1, pchunk, Na), lambda b, pc: (b, pc, 0))
                   ] * (2 * ngroups),
        out_shape=[jax.ShapeDtypeStruct((B, Pp, Na), f32)] * (2 * ngroups),
        scratch_shapes=[pltpu.VMEM((6 * ngroups, nstate + 1, Na), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(FA_p, phi_p, TAU_p, te_arr, ti_arr,
      T1s.reshape(1, B), T2s.reshape(1, B))

    def scal(g):   # lane-replicated groups: any lane holds the value
        return outs[2 * g][:, :N, 0], outs[2 * g + 1][:, :N, 0]

    def vec(g):
        return outs[2 * g][:, :N, :N], outs[2 * g + 1][:, :N, :N]

    res = {"sig": scal(_P), "dT1": scal(_U1), "dT2": scal(_U2),
           "dalpha": vec(_A), "dtau": vec(_T)}
    if second_order:
        res.update({"dT1dalpha": vec(_W1), "dT2dalpha": vec(_W2),
                    "dT1dtau": vec(_X1), "dT2dtau": vec(_X2)})
    return res
