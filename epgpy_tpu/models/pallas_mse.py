"""Pallas TPU kernel: fused CPMG / multi-spin-echo trains.

The reference's one published benchmark is an 18-echo MSE over 5,000
signals (reference docs/basics.md:250-267; sequence built in
examples/basics/mse.py).  Per echo the train is

    E(tau1) -> S(1) -> T(ref_fa_i * B1, ref_phi_i) -> E(tau2) -> S(1) -> ADC

after one excitation ``T(exc_alpha, exc_phi)`` from equilibrium.  Like
the FISP kernel (pallas_fisp.py) this holds the whole folded half-ladder
(A(k)=F+(k), B(k)=F+(-k), Z(k), k >= 0) in VMEM scratch across the
train and streams only the echoes out; E and S are applied rowwise (no
reversal -- the conjugate symmetry F-(k) = conj(F+(-k)) is preserved by
rotation/relaxation/shift from an equilibrium start).

Unlike FISP there are TWO relaxation+shift stages per refocusing pulse
and the readout sits at k=0 after the second shift.  Echo spacings may
vary per echo (tau1/tau2 are SMEM arrays); refocusing angles may be
per-atom B1-scaled (rank-1 ``outer(FA, B1)``, e.g. the reference's
``T(180*att, 0)`` attenuation sweep).

``diffusion=`` adds the DW-TSE variant (Weigel 2010 "diffusion trap"
physics on the unit-shift grid): per-stage Stejskal-Tanner row factors
x per-atom diffusivity, applied after each of the two shifts — the
``[E, S(1), D] ... [E, S(1), D]`` half idiom (reference places D right
after the matching S, epgpy/diffusion.py:126-147).
"""

from __future__ import annotations

from functools import partial

from .pallas_common import _cmul, _rot_A, _rot_B, _rot_Z

import jax
import jax.numpy as jnp

__all__ = ["cpmg_dictionary_pallas", "cpmg_jacobian_pallas",
           "cpmg_dictionary_pallas_sharded", "cpmg_jacobian_pallas_sharded"]


def cpmg_dictionary_pallas_sharded(exc, FA, phi, tau1, tau2, T1s, T2s, B1s,
                                   *, mesh, axis="atoms", **kw):
    """Atom-sharded CPMG Pallas dictionary over a device mesh.

    Same scheme as pallas_fisp.fisp_dictionary_pallas_sharded: GSPMD
    cannot partition a pallas_call, so each device runs the full
    VMEM-resident kernel on its local atom shard under jax.shard_map
    (embarrassingly parallel; echo-train arrays replicated).  The atom
    count must divide the `axis` size of `mesh`.
    """
    from jax.sharding import PartitionSpec as PS

    def local(t1, t2, b1):
        return cpmg_dictionary_pallas(exc, FA, phi, tau1, tau2,
                                      t1, t2, b1, **kw)

    spec = PS(axis)
    out_spec = PS(axis, None)
    f = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                      out_specs=(out_spec, out_spec), check_vma=False)
    return jax.jit(f)(jnp.asarray(T1s, jnp.float32),
                      jnp.asarray(T2s, jnp.float32),
                      jnp.asarray(B1s, jnp.float32))


def cpmg_jacobian_pallas_sharded(exc, FA, phi, tau1, tau2, T1s, T2s, B1s,
                                 *, mesh, axis="atoms", **kw):
    """Atom-sharded fused CPMG primal+tangent kernel (see above)."""
    from jax.sharding import PartitionSpec as PS

    def local(t1, t2, b1):
        return cpmg_jacobian_pallas(exc, FA, phi, tau1, tau2, t1, t2, b1,
                                    **kw)

    spec = PS(axis)
    f = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                      out_specs=((PS(axis, None),) * 2,
                                 (PS(axis, None, None),) * 2),
                      check_vma=False)
    return jax.jit(f)(jnp.asarray(T1s, jnp.float32),
                      jnp.asarray(T2s, jnp.float32),
                      jnp.asarray(B1s, jnp.float32))


def _diff_att_planes(bd_ref, dc1_ref, dc2_ref, H, ramp1, ramp2):
    """Per-row diffusion attenuation planes for the two shift stages.

    Same math as pallas_fisp's DW block (D(tau, D, k=1) placed after a
    unit S(1)): A(k)=F+(k) ramped k-1 -> k, B(k)=F+(-k) ramped
    -(k+1) -> -k (Stejskal-Tanner 1/3 terms), Z at constant k;
    aZ(0) = 1 exactly so the k=0 recovery is untouched.  ``ramp=False``
    is the constant-k variant (D with k=None).  b factors are per-stage
    host scalars (the matcher requires one D op instance per half), so
    the six (H, btile) planes are loop-invariant.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0).astype(jnp.float32)
    k2r = rows * rows

    def att(bT, bL, ramp, Dc):
        if ramp:
            fA = bT * (k2r - rows + 1.0 / 3.0)
            fB = bT * (k2r + rows + 1.0 / 3.0)
        else:
            fA = fB = bT * k2r
        return (jnp.exp(-fA * Dc), jnp.exp(-fB * Dc),
                jnp.exp(-(bL * k2r) * Dc))

    a1 = att(bd_ref[0, 0], bd_ref[0, 1], ramp1, dc1_ref[0, :])
    a2 = att(bd_ref[0, 2], bd_ref[0, 3], ramp2, dc2_ref[0, :])
    return a1, a2


def _kernel_mse(exc_ref, fa_ref, phi_ref, tau1_ref, tau2_ref, t1_ref,
                t2_ref, b1_ref, *rest, nstate, nech, use_diff=False,
                ramp1=True, ramp2=True):
    import jax.numpy as jnp

    if use_diff:
        bd_ref, dc1_ref, dc2_ref, out_re_ref, out_im_ref, st_ref = rest
    else:
        out_re_ref, out_im_ref, st_ref = rest

    H = nstate + 1
    f32 = jnp.float32
    T1 = t1_ref[0, :]
    T2 = t2_ref[0, :]
    B1 = b1_ref[0, :]
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0).astype(f32)
    if use_diff:
        att1, att2 = _diff_att_planes(bd_ref, dc1_ref, dc2_ref, H,
                                      ramp1, ramp2)

    # excitation from equilibrium, closed form: F+(0) = -i e^{i p} sin a,
    # Z(0) = cos a (folded layout keeps B(0) = A(0))
    ea = exc_ref[0, 0] * (jnp.pi / 180.0)
    ep = exc_ref[0, 1] * (jnp.pi / 180.0)
    ones = jnp.ones_like(T1)
    st_ref[...] = jnp.zeros_like(st_ref)
    st_ref[0, 0, :] = jnp.sin(ep) * jnp.sin(ea) * ones       # AR
    st_ref[1, 0, :] = -jnp.cos(ep) * jnp.sin(ea) * ones      # AI
    st_ref[2, 0, :] = jnp.sin(ep) * jnp.sin(ea) * ones       # BR = AR at k=0
    st_ref[3, 0, :] = -jnp.cos(ep) * jnp.sin(ea) * ones      # BI
    st_ref[4, 0, :] = jnp.cos(ea) * ones                     # ZR

    cmul = _cmul

    def step(i, _):
        AR, AI = st_ref[0], st_ref[1]
        BR, BI = st_ref[2], st_ref[3]
        ZR, ZI = st_ref[4], st_ref[5]

        def relax(tau, AR, AI, BR, BI, ZR, ZI):
            E1 = jnp.exp(-tau / T1)
            E2 = jnp.exp(-tau / T2)
            return (AR * E2, AI * E2, BR * E2, BI * E2,
                    ZR * E1 + rowmask * (1.0 - E1), ZI * E1)

        def shift(AR, AI, BR, BI):
            # unit ladder shift folded through k=0:
            # A(k) <- A(k-1) for k>=1, A(0) <- F+(-1) = B(1);
            # B(k) <- B(k+1), zero-fill the k=N edge
            zrow = jnp.zeros_like(AR[:1])
            nAR = jnp.concatenate([BR[1:2], AR[:-1]], axis=0)
            nAI = jnp.concatenate([BI[1:2], AI[:-1]], axis=0)
            nBR = jnp.concatenate([BR[1:], zrow], axis=0)
            nBI = jnp.concatenate([BI[1:], zrow], axis=0)
            return nAR, nAI, nBR, nBI

        # E(tau1) -> S(1) [-> D]
        AR, AI, BR, BI, ZR, ZI = relax(tau1_ref[0, i], AR, AI, BR, BI, ZR, ZI)
        AR, AI, BR, BI = shift(AR, AI, BR, BI)
        if use_diff:
            aA, aB, aZ = att1
            AR, AI, BR, BI = AR * aA, AI * aA, BR * aB, BI * aB
            ZR, ZI = ZR * aZ, ZI * aZ

        # refocusing rotation (Weigel matrix, same forms as _kernel_half)
        a = fa_ref[0, i] * B1 * (jnp.pi / 180.0)
        ph = phi_ref[0, i] * (jnp.pi / 180.0)
        ca, sa = jnp.cos(a), jnp.sin(a)
        cos2, sin2 = (1 + ca) / 2, (1 - ca) / 2
        cp, sp = jnp.cos(ph), jnp.sin(ph)
        c2p, s2p = jnp.cos(2 * ph), jnp.sin(2 * ph)
        m01r, m01i = c2p * sin2, s2p * sin2
        m02r, m02i = sp * sa, -cp * sa
        m20r, m20i = -0.5 * sp * sa, -0.5 * cp * sa
        m21r, m21i = -0.5 * sp * sa, 0.5 * cp * sa

        # nA(k) = cos2 A(k) + m01 conj(B(k)) + m02 Z(k)
        ar, ai = cmul(m01r, m01i, BR, -BI)
        dr, di = cmul(m02r, m02i, ZR, ZI)
        nAR = cos2 * AR + ar + dr
        nAI = cos2 * AI + ai + di
        # nB(k) = cos2 B(k) + m01 conj(A(k)) + m02 conj(Z(k))
        ar, ai = cmul(m01r, m01i, AR, -AI)
        dr, di = cmul(m02r, m02i, ZR, -ZI)
        nBR = cos2 * BR + ar + dr
        nBI = cos2 * BI + ai + di
        # nZ(k) = m20 A(k) + m21 conj(B(k)) + ca Z(k)
        ar, ai = cmul(m20r, m20i, AR, AI)
        br_, bi_ = cmul(m21r, m21i, BR, -BI)
        nZR = ar + br_ + ca * ZR
        nZI = ai + bi_ + ca * ZI

        # E(tau2) -> S(1) [-> D] -> echo = F0 = A(0)
        nAR, nAI, nBR, nBI, nZR, nZI = relax(tau2_ref[0, i],
                                             nAR, nAI, nBR, nBI, nZR, nZI)
        nAR, nAI, nBR, nBI = shift(nAR, nAI, nBR, nBI)
        if use_diff:
            aA, aB, aZ = att2
            nAR, nAI, nBR, nBI = nAR * aA, nAI * aA, nBR * aB, nBI * aB
            nZR, nZI = nZR * aZ, nZI * aZ
        out_re_ref[i, :] = nAR[0, :]
        out_im_ref[i, :] = nAI[0, :]

        st_ref[0], st_ref[1] = nAR, nAI
        st_ref[2], st_ref[3] = nBR, nBI
        st_ref[4], st_ref[5] = nZR, nZI
        return 0

    jax.lax.fori_loop(0, nech, step, 0)


@partial(jax.jit, static_argnames=("nstate", "btile", "interpret",
                                   "diff_ramp"))
def cpmg_dictionary_pallas(exc, FA, phi, tau1, tau2, T1s, T2s, B1s, *,
                           nstate, btile=512, interpret=False,
                           diffusion=None, diff_ramp=(True, True)):
    """CPMG echo trains via the fused Pallas kernel.

    Args:
        exc: (alpha, phi) of the excitation pulse (degrees, host scalars).
        FA, phi: (E,) refocusing flip angles / phases (deg; FA scales with
            the per-atom B1).
        tau1, tau2: (E,) pre-/post-refocusing relaxation times (ms).
        T1s, T2s, B1s: (B,) per-atom parameters.
        nstate: ladder half-size (static capacity; >= 2*E for exactness).
        diffusion: optional ``(bT1, bL1, bT2, bL2, Dc1, Dc2)`` DW-TSE
            attenuation — per-stage b-value bases (scalar, s/mm^2 per
            squared state index) x per-atom diffusivities (scalar or
            (B,), mm^2/s), applied after each of the two unit shifts
            (the ``[E, S(1), D]`` half idiom).  A stage with b = 0 is
            a no-op.  ``diff_ramp``: per-stage gradient-ramp flags
            (D with k=1 vs k=None).

    Returns (re, im): (B, E) float32 echo trains.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    FA = jnp.asarray(FA, f32)
    E = FA.shape[0]
    phi = jnp.broadcast_to(jnp.asarray(phi, f32), (E,))
    tau1 = jnp.broadcast_to(jnp.asarray(tau1, f32), (E,))
    tau2 = jnp.broadcast_to(jnp.asarray(tau2, f32), (E,))
    T1s = jnp.asarray(T1s, f32)
    T2s = jnp.asarray(T2s, f32)
    B1s = jnp.asarray(B1s, f32)
    B = T1s.shape[0]
    use_diff = diffusion is not None

    Bp = -(-B // btile) * btile

    def padb(x):
        return jnp.concatenate([x, jnp.ones((Bp - B,), f32)]) if Bp > B else x

    exc_arr = jnp.stack([jnp.asarray(exc[0], f32),
                         jnp.asarray(exc[1], f32)]).reshape(1, 2)
    args = [exc_arr] + [x.reshape(1, E) for x in (FA, phi, tau1, tau2)]
    args += [padb(x).reshape(1, Bp) for x in (T1s, T2s, B1s)]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 5 + [
        pl.BlockSpec((1, btile), lambda b: (0, b))] * 3
    if use_diff:
        bT1, bL1, bT2, bL2, Dc1, Dc2 = diffusion
        bd = jnp.stack([jnp.asarray(x, f32)
                        for x in (bT1, bL1, bT2, bL2)]).reshape(1, 4)
        args.append(bd)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        for dc in (Dc1, Dc2):
            dc = jnp.broadcast_to(jnp.asarray(dc, f32), (B,))
            args.append(padb(dc).reshape(1, Bp))
            in_specs.append(pl.BlockSpec((1, btile), lambda b: (0, b)))

    kernel = partial(_kernel_mse, nstate=nstate, nech=E, use_diff=use_diff,
                     ramp1=diff_ramp[0], ramp2=diff_ramp[1])
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((E, btile), lambda b: (0, b)),
            pl.BlockSpec((E, btile), lambda b: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E, Bp), f32),
            jax.ShapeDtypeStruct((E, Bp), f32),
        ],
        scratch_shapes=[pltpu.VMEM((6, nstate + 1, btile), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    return out_re[:, :B].T, out_im[:, :B].T


def _kernel_mse_jac(exc_ref, fa_ref, phi_ref, tau1_ref, tau2_ref, t1_ref,
                    t2_ref, b1_ref, *rest, nstate, nech, use_diff=False,
                    ramp1=True, ramp2=True):
    """Fused CPMG primal + (dT1, dT2, dB1) tangent propagation.

    Forward-mode derivative of `_kernel_mse`, following the layout of
    pallas_fisp._kernel_jac: 24 VMEM planes of N+1 rows (primal A/B/Z
    re+im at indices 0-5, then 6 planes per tangent variable).  The
    coefficient tangents are sparse per stage: T1 only perturbs the E1
    decay and the k=0 recovery (drec = -dE1), T2 only the E2 decay, B1
    only the refocusing-rotation coefficients (the scalar excitation is
    exact, so all tangents start at zero).  Unlike FISP there are TWO
    relax+shift stages per refocusing pulse and the echo is read
    directly from A(0) after the second shift -- no extra decay factor
    on the tangent echoes.

    With ``use_diff`` the DW-TSE attenuation planes multiply EVERY set
    (primal + tangents) identically post-shift: the attenuation is
    parameter-independent for (T1, T2, B1), so d(a x) = a dx.
    """
    import jax.numpy as jnp

    if use_diff:
        (bd_ref, dc1_ref, dc2_ref, out_re_ref, out_im_ref,
         d1_re_ref, d1_im_ref, d2_re_ref, d2_im_ref,
         db_re_ref, db_im_ref, st_ref) = rest
    else:
        (out_re_ref, out_im_ref, d1_re_ref, d1_im_ref, d2_re_ref,
         d2_im_ref, db_re_ref, db_im_ref, st_ref) = rest

    H = nstate + 1
    f32 = jnp.float32
    T1 = t1_ref[0, :]
    T2 = t2_ref[0, :]
    B1 = b1_ref[0, :]
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0).astype(f32)
    if use_diff:
        att1, att2 = _diff_att_planes(bd_ref, dc1_ref, dc2_ref, H,
                                      ramp1, ramp2)

    # excitation from equilibrium (closed form); tangents start at zero
    ea = exc_ref[0, 0] * (jnp.pi / 180.0)
    ep = exc_ref[0, 1] * (jnp.pi / 180.0)
    ones = jnp.ones_like(T1)
    st_ref[...] = jnp.zeros_like(st_ref)
    st_ref[0, 0, :] = jnp.sin(ep) * jnp.sin(ea) * ones
    st_ref[1, 0, :] = -jnp.cos(ep) * jnp.sin(ea) * ones
    st_ref[2, 0, :] = jnp.sin(ep) * jnp.sin(ea) * ones
    st_ref[3, 0, :] = -jnp.cos(ep) * jnp.sin(ea) * ones
    st_ref[4, 0, :] = jnp.cos(ea) * ones

    cmul = _cmul

    def relax_shift(tau, att, sets):
        """E(tau) then S(1) [then D] on (primal, dT1, dT2, dB1) sets.

        Tangent rules (d/dT1 hits E1 and rec = rowmask*(1-E1); d/dT2
        hits E2; dB1 passes through): each evaluated from the incoming
        primal planes, then everything shifts identically (the shift is
        linear and parameter-free)."""
        E1 = jnp.exp(-tau / T1)
        E2 = jnp.exp(-tau / T2)
        dE1 = E1 * tau / (T1 * T1)
        dE2 = E2 * tau / (T2 * T2)
        P, G1, G2, GB = sets
        out_P = (P[0] * E2, P[1] * E2, P[2] * E2, P[3] * E2,
                 P[4] * E1 + rowmask * (1.0 - E1), P[5] * E1)
        out_1 = (G1[0] * E2, G1[1] * E2, G1[2] * E2, G1[3] * E2,
                 G1[4] * E1 + P[4] * dE1 - rowmask * dE1,
                 G1[5] * E1 + P[5] * dE1)
        out_2 = (G2[0] * E2 + P[0] * dE2, G2[1] * E2 + P[1] * dE2,
                 G2[2] * E2 + P[2] * dE2, G2[3] * E2 + P[3] * dE2,
                 G2[4] * E1, G2[5] * E1)
        out_b = (GB[0] * E2, GB[1] * E2, GB[2] * E2, GB[3] * E2,
                 GB[4] * E1, GB[5] * E1)

        def shift(s):
            AR, AI, BR, BI, ZR, ZI = s
            zrow = jnp.zeros_like(AR[:1])
            return (jnp.concatenate([BR[1:2], AR[:-1]], axis=0),
                    jnp.concatenate([BI[1:2], AI[:-1]], axis=0),
                    jnp.concatenate([BR[1:], zrow], axis=0),
                    jnp.concatenate([BI[1:], zrow], axis=0),
                    ZR, ZI)

        res = tuple(shift(s) for s in (out_P, out_1, out_2, out_b))
        if att is not None:
            aA, aB, aZ = att
            res = tuple((s[0] * aA, s[1] * aA, s[2] * aB, s[3] * aB,
                         s[4] * aZ, s[5] * aZ) for s in res)
        return res

    # rotation forms shared across kernel families (pallas_common):
    # the tangent passes below reuse them with derivative coefficients
    rot_A, rot_B, rot_Z = _rot_A, _rot_B, _rot_Z

    def step(i, _):
        sets = tuple(tuple(st_ref[6 * s + j] for j in range(6))
                     for s in range(4))

        # E(tau1) -> S(1) [-> D]
        sets = relax_shift(tau1_ref[0, i], att1 if use_diff else None, sets)

        # refocusing rotation: a = FA_i * B1 (same Weigel forms as the
        # primal kernel); the dB1 set adds a coefficient-derivative
        # pass over the primal planes
        rad = jnp.pi / 180.0
        fa = fa_ref[0, i]
        a = fa * B1 * rad
        ph = phi_ref[0, i] * rad
        ca, sa = jnp.cos(a), jnp.sin(a)
        cos2, sin2 = (1 + ca) / 2, (1 - ca) / 2
        cp, sp = jnp.cos(ph), jnp.sin(ph)
        c2p, s2p = jnp.cos(2 * ph), jnp.sin(2 * ph)
        m01r, m01i = c2p * sin2, s2p * sin2
        m02r, m02i = sp * sa, -cp * sa
        m20r, m20i = -0.5 * sp * sa, -0.5 * cp * sa
        m21r, m21i = -0.5 * sp * sa, 0.5 * cp * sa
        da = fa * rad
        dsa, dca = ca * da, -sa * da
        dcos2, dsin2 = -0.5 * sa * da, 0.5 * sa * da
        dm01r, dm01i = c2p * dsin2, s2p * dsin2
        dm02r, dm02i = sp * dsa, -cp * dsa
        dm20r, dm20i = -0.5 * sp * dsa, -0.5 * cp * dsa
        dm21r, dm21i = -0.5 * sp * dsa, 0.5 * cp * dsa

        def rot(s):
            ar, ai = rot_A(cos2, m01r, m01i, m02r, m02i, s)
            br, bi = rot_B(cos2, m01r, m01i, m02r, m02i, s)
            zr, zi = rot_Z(ca, m20r, m20i, m21r, m21i, s)
            return (ar, ai, br, bi, zr, zi)

        P, G1, G2, GB = sets
        rGB = rot(GB)
        car, cai = rot_A(dcos2, dm01r, dm01i, dm02r, dm02i, P)
        cbr, cbi = rot_B(dcos2, dm01r, dm01i, dm02r, dm02i, P)
        czr, czi = rot_Z(dca, dm20r, dm20i, dm21r, dm21i, P)
        rGB = (rGB[0] + car, rGB[1] + cai, rGB[2] + cbr, rGB[3] + cbi,
               rGB[4] + czr, rGB[5] + czi)
        sets = (rot(P), rot(G1), rot(G2), rGB)

        # E(tau2) -> S(1) [-> D] -> echo = A(0) per set
        sets = relax_shift(tau2_ref[0, i], att2 if use_diff else None, sets)
        for (s, rr, ii) in zip(sets, (out_re_ref, d1_re_ref, d2_re_ref,
                                      db_re_ref),
                               (out_im_ref, d1_im_ref, d2_im_ref,
                                db_im_ref)):
            rr[i, :] = s[0][0, :]
            ii[i, :] = s[1][0, :]
        for s in range(4):
            for j in range(6):
                st_ref[6 * s + j] = sets[s][j]
        return 0

    jax.lax.fori_loop(0, nech, step, 0)


@partial(jax.jit, static_argnames=("nstate", "btile", "interpret",
                                   "diff_ramp"))
def cpmg_jacobian_pallas(exc, FA, phi, tau1, tau2, T1s, T2s, B1s, *,
                         nstate, btile=256, interpret=False,
                         diffusion=None, diff_ramp=(True, True)):
    """CPMG echo trains + dS/d(T1, T2, B1) via one fused Pallas kernel.

    Same arguments as `cpmg_dictionary_pallas` (incl. the optional
    DW-TSE ``diffusion`` stages, which multiply primal and tangent
    planes identically).  Returns ``((re, im), (dre, dim))``: (B, E)
    echo trains and (B, E, 3) derivatives ordered (T1, T2, B1) -- the
    layout of pallas_fisp.fisp_jacobian_pallas (reference cost anchor:
    epgpy diff.py order1 propagation, SURVEY §3.2).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    FA = jnp.asarray(FA, f32)
    E = FA.shape[0]
    phi = jnp.broadcast_to(jnp.asarray(phi, f32), (E,))
    tau1 = jnp.broadcast_to(jnp.asarray(tau1, f32), (E,))
    tau2 = jnp.broadcast_to(jnp.asarray(tau2, f32), (E,))
    T1s = jnp.asarray(T1s, f32)
    T2s = jnp.asarray(T2s, f32)
    B1s = jnp.asarray(B1s, f32)
    B = T1s.shape[0]
    use_diff = diffusion is not None

    Bp = -(-B // btile) * btile

    def padb(x):
        return jnp.concatenate([x, jnp.ones((Bp - B,), f32)]) if Bp > B else x

    exc_arr = jnp.stack([jnp.asarray(exc[0], f32),
                         jnp.asarray(exc[1], f32)]).reshape(1, 2)
    args = [exc_arr] + [x.reshape(1, E) for x in (FA, phi, tau1, tau2)]
    args += [padb(x).reshape(1, Bp) for x in (T1s, T2s, B1s)]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 5 + [
        pl.BlockSpec((1, btile), lambda b: (0, b))] * 3
    if use_diff:
        bT1, bL1, bT2, bL2, Dc1, Dc2 = diffusion
        bd = jnp.stack([jnp.asarray(x, f32)
                        for x in (bT1, bL1, bT2, bL2)]).reshape(1, 4)
        args.append(bd)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        for dc in (Dc1, Dc2):
            dc = jnp.broadcast_to(jnp.asarray(dc, f32), (B,))
            args.append(padb(dc).reshape(1, Bp))
            in_specs.append(pl.BlockSpec((1, btile), lambda b: (0, b)))

    kernel = partial(_kernel_mse_jac, nstate=nstate, nech=E,
                     use_diff=use_diff, ramp1=diff_ramp[0],
                     ramp2=diff_ramp[1])
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((E, btile), lambda b: (0, b))] * 8,
        out_shape=[jax.ShapeDtypeStruct((E, Bp), f32)] * 8,
        scratch_shapes=[pltpu.VMEM((24, nstate + 1, btile), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    sig = (outs[0][:, :B].T, outs[1][:, :B].T)
    dre = jnp.stack([outs[2][:, :B].T, outs[4][:, :B].T,
                     outs[6][:, :B].T], axis=-1)
    dim = jnp.stack([outs[3][:, :B].T, outs[5][:, :B].T,
                     outs[7][:, :B].T], axis=-1)
    return sig, (dre, dim)
