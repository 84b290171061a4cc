"""Composite-GRE fused Pallas kernel: arbitrary gradient-echo stage trains.

One "stage" is the op block ``[T(alpha, phi)?, E(tau1)*, Adc?, E(tau2)*,
S(+-1)?]`` -- every element optional -- so a host-known train of stages
covers the segmented / prepared GRE families that the specialized
kernels (FISP/bSSFP/DESS/ME-GRE) do not match:

- MPRAGE / MP2RAGE: per-segment ``[T(180), E(TI)]`` inversions between
  readout blocks, recovery delays (``E(TD)``-only stages);
- cardiac MRF (Hamilton 2017): T2prep composites (90x - 180y - 90-x
  stages with no gradient) and IR preps interleaved with FISP blocks;
- saturation-recovery GRE: periodic ``[T(90), S(1)]`` saturation stages.

Reference semantics: the epgpy operator chain T/E/Adc/S
(/root/reference/epgpy/transition.py:7-65, evolution.py:69-153,
probe.py Adc, shift.py:14-160); matched and driven by
``fisp_dispatch.match_composite``.

Per-stage host-known scalars ride SMEM arrays: flip (deg), phase (deg),
pre-/post-ADC relaxation times, an ADC output-row index (-1 = no
readout), a shift direction in {-1, 0, +1}, the ADC phasor angle, and a
B1-sensitivity flag (adiabatic preps -- scalar flips -- bypass the
per-atom B1 scale, which is exactly the MPRAGE inversion convention).
The folded half-ladder plane layout and rotation forms are shared with
the other kernel families (models/pallas_common.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pallas_common import (_cmul, _rot_coeffs, _rot_A, _rot_B, _rot_Z)

__all__ = ["composite_pallas", "composite_jacobian_pallas",
           "composite_jacobian_pallas_sharded"]


def _datten(btd_ref, rdir_ref, dc_ref, i, H):
    """Per-stage diffusion attenuation planes (aA, aB, aZ).

    Stage grammar: an optional ``D`` op closes a stage (placed after
    its shift).  SMEM carries the b-value base per squared state index
    ``bt = tau_D [s] * (kvalue [rad/mm])^2`` (the
    fisp_dispatch._dw_bvalue convention) and the ramp direction ``rd``
    in {-1, 0, +1}: rd = 0
    is constant-k attenuation exp(-bt k^2 D); rd = +-1 the
    Stejskal-Tanner gradient-ramp form -- A(k) was ramped (k-rd) -> k,
    B(k) = F+(-k) was ramped -(k+rd) -> -k, so
    b_A(k) = bt (k^2 - rd k + rd^2/3), b_B(k) = bt (k^2 + rd k +
    rd^2/3); Z never ramps (b_Z = bt k^2).  Stages without a D have
    bt = 0 (attenuation == 1).  Reference semantics:
    /root/reference/epgpy/diffusion.py:126-171."""
    f32 = jnp.float32
    bt = btd_ref[0, i]
    rd = rdir_ref[0, i]
    Dc = dc_ref[0, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0).astype(f32)
    k2 = rows * rows
    third = (rd * rd) * (1.0 / 3.0)
    aA = jnp.exp(-(bt * (k2 - rd * rows + third)) * Dc)
    aB = jnp.exp(-(bt * (k2 + rd * rows + third)) * Dc)
    aZ = jnp.exp(-(bt * k2) * Dc)
    return aA, aB, aZ


def _kernel_comp(fa_ref, phi_ref, ta_ref, tb_ref, adci_ref, shf_ref,
                 aph_ref, b1u_ref, btd_ref, rdir_ref,
                 t1_ref, t2_ref, b1_ref, df_ref, dc_ref,
                 out_re_ref, out_im_ref, st_ref, *, nstages, nstate,
                 use_df, has_up, has_down, has_adcph, has_b1u, has_d):
    """One atom tile: run all stages with the planes VMEM-resident.

    Folded half-ladder layout (see models/pallas_fisp._kernel_half):
    A(k) = F+(k), B(k) = F+(-k), Z(k) for k = 0..nstate; invariants
    A(0) == B(0) and Im Z(0) == 0 hold through rotations and both
    shift directions.
    """
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    H = nstate + 1

    # grid is (atom tiles,) only: every program step is a fresh tile
    st_ref[...] = jnp.zeros_like(st_ref)
    st_ref[4, 0, :] = jnp.ones_like(st_ref[4, 0, :])   # Z(0) = 1

    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0
               ).astype(f32)
    T1 = t1_ref[0, :]
    T2 = t2_ref[0, :]
    B1 = b1_ref[0, :]
    DF = df_ref[0, :]

    def step(i, _):
        AR, AI = st_ref[0], st_ref[1]
        BR, BI = st_ref[2], st_ref[3]
        ZR, ZI = st_ref[4], st_ref[5]

        fa = fa_ref[0, i]
        ph = phi_ref[0, i] * (jnp.pi / 180.0)
        if has_b1u:
            # per-stage B1 sensitivity: adiabatic (scalar-flip) stages
            # apply the nominal angle to every atom
            b1u = b1u_ref[0, i]
            a = fa * (1.0 + b1u * (B1 - 1.0)) * (jnp.pi / 180.0)
        else:
            a = fa * B1 * (jnp.pi / 180.0)
        (cos2, m01r, m01i, m02r, m02i,
         ca, m20r, m20i, m21r, m21i) = _rot_coeffs(a, ph)

        ta = ta_ref[0, i]
        tb = tb_ref[0, i]
        e1a = jnp.exp(-ta / T1)
        e2a = jnp.exp(-ta / T2)
        e1b = jnp.exp(-tb / T1)
        e2b = jnp.exp(-tb / T2)
        cF = e2a * e2b
        cZ = e1a * e1b
        rec = (1.0 - e1a) * e1b + (1.0 - e1b)

        # echo: rotated k=0 row after the pre-ADC relaxation (T2 decay
        # + off-resonance phase over ta; recovery is longitudinal only)
        eR, eI = _rot_A(cos2, m01r, m01i, m02r, m02i,
                        (AR[0, :], AI[0, :], BR[0, :], BI[0, :],
                         ZR[0, :], ZI[0, :]))
        eR, eI = eR * e2a, eI * e2a
        if use_df:
            ang_a = 2 * jnp.pi * DF * ta
            eR, eI = _cmul(jnp.cos(ang_a), jnp.sin(ang_a), eR, eI)
        if has_adcph:
            # Adc(phase=p): signal *= exp(i p) (probe.py Adc semantics)
            aph = aph_ref[0, i]
            eR, eI = _cmul(jnp.cos(aph), jnp.sin(aph), eR, eI)
        idx = adci_ref[0, i]

        @pl.when(idx >= 0)
        def _write():
            out_re_ref[idx, :] = eR
            out_im_ref[idx, :] = eI

        # full-stage plane update: E(ta+tb) . T, recovery at k=0
        if use_df:
            ang = 2 * jnp.pi * DF * (ta + tb)
            cFpR, cFpI = cF * jnp.cos(ang), cF * jnp.sin(ang)
        else:
            cFpR = cF
            cFpI = jnp.zeros_like(cF)
        c00r, c00i = _cmul(cFpR, cFpI, cos2, jnp.zeros_like(cos2))
        c01r, c01i = _cmul(cFpR, cFpI, m01r, m01i)
        c02r, c02i = _cmul(cFpR, cFpI, m02r, m02i)
        # nA(k) = c00 A(k) + c01 conj(B(k)) + c02 Z(k)
        ar, ai = _cmul(c00r, c00i, AR, AI)
        br, bi = _cmul(c01r, c01i, BR, -BI)
        dr, di = _cmul(c02r, c02i, ZR, ZI)
        nAR, nAI = ar + br + dr, ai + bi + di
        # nB(k) = c00 B(k) + c01 conj(A(k)) + c02 conj(Z(k))
        ar, ai = _cmul(c00r, c00i, BR, BI)
        br, bi = _cmul(c01r, c01i, AR, -AI)
        dr, di = _cmul(c02r, c02i, ZR, -ZI)
        nBR, nBI = ar + br + dr, ai + bi + di
        # nZ(k) = cZ (m20 A(k) + m21 conj(B(k)) + ca Z(k)) + rec at k=0
        ar, ai = _cmul(m20r * cZ, m20i * cZ, AR, AI)
        br, bi = _cmul(m21r * cZ, m21i * cZ, BR, -BI)
        nZR = ar + br + (ca * cZ) * ZR + rowmask * rec
        nZI = ai + bi + (ca * cZ) * ZI

        if has_up or has_down:
            s = shf_ref[0, i]
            zrow = jnp.zeros_like(nAR[:1])
            if has_up:
                # S(+1): A(k) <- A(k-1), A(0) <- B(1); B(k) <- B(k+1)
                uAR = jnp.concatenate([nBR[1:2], nAR[:-1]], axis=0)
                uAI = jnp.concatenate([nBI[1:2], nAI[:-1]], axis=0)
                uBR = jnp.concatenate([nBR[1:], zrow], axis=0)
                uBI = jnp.concatenate([nBI[1:], zrow], axis=0)
                up = s == 1
                nAR, nAI = (jnp.where(up, uAR, nAR),
                            jnp.where(up, uAI, nAI))
                nBR, nBI = (jnp.where(up, uBR, nBR),
                            jnp.where(up, uBI, nBI))
            if has_down:
                # S(-1): A(k) <- A(k+1); B(k) <- B(k-1), B(0) <- A(1)
                dAR = jnp.concatenate([nAR[1:], zrow], axis=0)
                dAI = jnp.concatenate([nAI[1:], zrow], axis=0)
                dBR = jnp.concatenate([nAR[1:2], nBR[:-1]], axis=0)
                dBI = jnp.concatenate([nAI[1:2], nBI[:-1]], axis=0)
                dn = s == -1
                nAR, nAI = (jnp.where(dn, dAR, nAR),
                            jnp.where(dn, dAI, nAI))
                nBR, nBI = (jnp.where(dn, dBR, nBR),
                            jnp.where(dn, dBI, nBI))
        if has_d:
            # diffusion attenuation closes the stage (post-shift)
            aA, aB, aZ = _datten(btd_ref, rdir_ref, dc_ref, i, H)
            nAR, nAI = nAR * aA, nAI * aA
            nBR, nBI = nBR * aB, nBI * aB
            nZR, nZI = nZR * aZ, nZI * aZ
        st_ref[0] = nAR
        st_ref[1] = nAI
        st_ref[2] = nBR
        st_ref[3] = nBI
        st_ref[4] = nZR
        st_ref[5] = nZI
        return 0

    jax.lax.fori_loop(0, nstages, step, 0)


def _comp_setup(FA, phi, ta, tb, adci, shift, aph, b1u, T1s, T2s, B1s,
                dfs, btile, has_up, has_down, has_adcph, has_b1u,
                nstate, diffusion=None):
    """Shared pad/flag setup for the composite primal and Jacobian
    wrappers: derive the static codegen gates from host arrays when not
    given, ceil-pad the atom axis to btile, and build the kernel input
    list (10 SMEM per-stage rows + 5 per-atom parameter planes).

    ``diffusion``: optional ``(btd, rdir, Dc)`` -- per-stage b-value
    bases (N,), ramp directions (N,) in {-1, 0, +1}, and the per-atom
    diffusion coefficient (scalar or (B,)); see :func:`_datten`."""
    import numpy as np

    f32 = jnp.float32
    FA = jnp.asarray(FA, f32)
    N = FA.shape[0]
    T1s = jnp.asarray(T1s, f32)
    B = T1s.shape[0]
    if has_up is None:
        has_up = bool((np.asarray(shift) == 1).any())
    if has_down is None:
        has_down = bool((np.asarray(shift) == -1).any())
    if has_adcph is None:
        has_adcph = aph is not None and bool(np.asarray(aph).any())
    if has_b1u is None:
        has_b1u = b1u is not None and not bool(np.asarray(b1u).all())
    if (has_up or has_down) and nstate < 1:
        raise ValueError("shifting composite trains need nstate >= 1")

    Bp = -(-B // btile) * btile
    pad = Bp - B

    def padb(x):
        return jnp.concatenate([x, jnp.ones((pad,), f32)]) if pad else x

    def padb0(x):
        return jnp.concatenate([x, jnp.zeros((pad,), f32)]) if pad else x

    if diffusion is None:
        btd = rdir = jnp.zeros((N,), f32)
        dc = jnp.zeros((B,), f32)
    else:
        btd, rdir, dc = diffusion
        dc = jnp.broadcast_to(jnp.asarray(dc, f32).reshape(-1), (B,))

    row = lambda x: jnp.asarray(x, f32).reshape(1, N)
    irow = lambda x: jnp.asarray(x, jnp.int32).reshape(1, N)
    inputs = [
        row(FA), row(phi), row(ta), row(tb), irow(adci), irow(shift),
        row(jnp.zeros((N,), f32) if aph is None else aph),
        row(jnp.ones((N,), f32) if b1u is None else b1u),
        row(btd), row(rdir),
        padb(T1s).reshape(1, Bp), padb(jnp.asarray(T2s, f32)).reshape(1, Bp),
        padb(jnp.broadcast_to(jnp.asarray(B1s, f32), (B,))).reshape(1, Bp),
        padb(jnp.zeros((B,), f32) if dfs is None
             else jnp.broadcast_to(jnp.asarray(dfs, f32), (B,))
             ).reshape(1, Bp),
        padb0(dc).reshape(1, Bp),
    ]
    return N, B, Bp, has_up, has_down, has_adcph, has_b1u, inputs


def composite_pallas(FA, phi, ta, tb, adci, shift, aph, b1u,
                     T1s, T2s, B1s, dfs=None, *, nadc, nstate,
                     diffusion=None,
                     has_up=None, has_down=None, has_adcph=None,
                     has_b1u=None, btile=512, interpret=False):
    """Run a composite-GRE stage train through the fused kernel.

    Args:
        FA, phi: (N,) per-stage flip / pulse phase [deg].
        ta, tb: (N,) pre-/post-ADC relaxation times [ms].
        adci: (N,) int32 output-row index per stage, -1 = no readout.
        shift: (N,) int32 unit-shift direction in {-1, 0, +1}.
        aph: (N,) ADC phasor angle [rad] (0 when absent).
        b1u: (N,) per-stage B1-sensitivity flag (0 = nominal angle),
            or None when every stage scales with B1.
        T1s, T2s, B1s: (B,) per-atom parameters; dfs optional (B,) [kHz].
        nadc: number of readout rows (static).
        nstate: ladder capacity (static); >= 1 when any stage shifts.
        diffusion: optional ``(btd, rdir, Dc)`` per-stage diffusion
            attenuation (see :func:`_datten`): DW-MPRAGE / crushed
            trains.
        has_up/has_down/has_adcph/has_b1u: static codegen gates; when
            None they are derived host-side from the corresponding
            argument (which must then be a host array, not a tracer --
            under jit pass them explicitly as statics).

    Returns (re, im): (nadc, B) float32 echo trains.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    (N, B, Bp, has_up, has_down, has_adcph, has_b1u, inputs
     ) = _comp_setup(FA, phi, ta, tb, adci, shift, aph, b1u, T1s, T2s,
                     B1s, dfs, btile, has_up, has_down, has_adcph,
                     has_b1u, nstate, diffusion)
    use_df = dfs is not None
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 10 + [
        pl.BlockSpec((1, btile), lambda b: (0, b))] * 5

    kernel = partial(
        _kernel_comp, nstages=N, nstate=nstate, use_df=use_df,
        has_up=has_up, has_down=has_down, has_adcph=has_adcph,
        has_b1u=has_b1u, has_d=diffusion is not None)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((nadc, btile), lambda b: (0, b)),
                   pl.BlockSpec((nadc, btile), lambda b: (0, b))],
        out_shape=[jax.ShapeDtypeStruct((nadc, Bp), f32),
                   jax.ShapeDtypeStruct((nadc, Bp), f32)],
        scratch_shapes=[pltpu.VMEM((6, nstate + 1, btile), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return out_re[:, :B], out_im[:, :B]


def _shift_sel(planes, s, has_up, has_down):
    """Per-stage ladder shift of one folded plane set, selected by the
    SMEM direction scalar ``s`` in {-1, 0, +1} (same algebra as the
    primal kernel; applied identically to every tangent group -- the
    shift is linear and parameter-independent)."""
    nAR, nAI, nBR, nBI, nZR, nZI = planes
    if not (has_up or has_down):
        return planes
    zrow = jnp.zeros_like(nAR[:1])
    if has_up:
        # S(+1): A(k) <- A(k-1), A(0) <- B(1); B(k) <- B(k+1)
        uAR = jnp.concatenate([nBR[1:2], nAR[:-1]], axis=0)
        uAI = jnp.concatenate([nBI[1:2], nAI[:-1]], axis=0)
        uBR = jnp.concatenate([nBR[1:], zrow], axis=0)
        uBI = jnp.concatenate([nBI[1:], zrow], axis=0)
        up = s == 1
        nAR, nAI = jnp.where(up, uAR, nAR), jnp.where(up, uAI, nAI)
        nBR, nBI = jnp.where(up, uBR, nBR), jnp.where(up, uBI, nBI)
    if has_down:
        # S(-1): A(k) <- A(k+1); B(k) <- B(k-1), B(0) <- A(1)
        dAR = jnp.concatenate([nAR[1:], zrow], axis=0)
        dAI = jnp.concatenate([nAI[1:], zrow], axis=0)
        dBR = jnp.concatenate([nAR[1:2], nBR[:-1]], axis=0)
        dBI = jnp.concatenate([nAI[1:2], nBI[:-1]], axis=0)
        dn = s == -1
        nAR, nAI = jnp.where(dn, dAR, nAR), jnp.where(dn, dAI, nAI)
        nBR, nBI = jnp.where(dn, dBR, nBR), jnp.where(dn, dBI, nBI)
    return nAR, nAI, nBR, nBI, nZR, nZI


def _kernel_comp_jac(fa_ref, phi_ref, ta_ref, tb_ref, adci_ref, shf_ref,
                     aph_ref, b1u_ref, btd_ref, rdir_ref,
                     t1_ref, t2_ref, b1_ref, df_ref, dc_ref,
                     *refs, nstages, nstate, use_df, has_up, has_down,
                     has_adcph, has_b1u, has_d, groups):
    """Fused composite-GRE primal + selected tangent groups.

    ``groups`` is a static tuple drawn from ("T1", "T2", "B1", "df"):
    6 VMEM planes per entry after the primal at 0-5, and one
    (re, im) output pair per entry after the signal pair.  Unrequested
    groups cost nothing (the MPRAGE T1-fit spec tracks only (T1, T2):
    18 planes, not 30).  Every EPG op in the stage grammar is affine in
    the state, so each tangent group propagates through the SAME
    per-stage operator as the primal plus the coefficient-derivative
    term applied to the primal planes (reference chain-rule semantics:
    /root/reference/epgpy/diff.py:119-139 accumulated op-by-op; here
    one VMEM-resident pass):

    - dT1: d(cZ)/dT1 = cZ (ta+tb)/T1^2 on the Z ladder; the recovery
      term is rec = 1 - cZ, so d(rec)/dT1 = -dcZ (the k=0 row);
    - dT2: d(cF)/dT2 = cF (ta+tb)/T2^2 on the F coefficient and
      d(e2a)/dT2 = e2a ta/T2^2 on the echo decay;
    - dB1: rotation-coefficient tangents with da/dB1 = fa*rad (all-B1
      trains) or fa*b1u*rad (adiabatic stages drop out: their flip does
      not scale with B1, the MPRAGE inversion convention);
    - ddf: off-resonance enters only through phasors, so the tangents
      are i 2 pi (ta+tb) x the carried F coefficient and i 2 pi ta x
      the primal echo -- exact at df = 0 (the B0-fit initialization).

    The per-stage ladder shift applies identically to all groups (it is
    linear and parameter-independent).
    """
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    H = nstate + 1
    ng = len(groups)
    nout = 2 + 2 * ng
    out_refs, st_ref = refs[:nout], refs[nout]
    gi = {name: j for j, name in enumerate(groups)}

    st_ref[...] = jnp.zeros_like(st_ref)
    st_ref[4, 0, :] = jnp.ones_like(st_ref[4, 0, :])   # primal Z(0) = 1

    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0
               ).astype(f32)
    T1 = t1_ref[0, :]
    T2 = t2_ref[0, :]
    B1 = b1_ref[0, :]
    DF = df_ref[0, :]
    twopi = 2 * jnp.pi
    rad = jnp.pi / 180.0

    def step(i, _):
        P6 = [st_ref[j] for j in range(6)]
        tans = [[st_ref[6 * (g + 1) + j] for j in range(6)]
                for g in range(ng)]

        fa = fa_ref[0, i]
        ph = phi_ref[0, i] * rad
        if has_b1u:
            b1u = b1u_ref[0, i]
            a = fa * (1.0 + b1u * (B1 - 1.0)) * rad
            da = fa * b1u * rad
        else:
            a = fa * B1 * rad
            da = fa * rad
        rc = _rot_coeffs(a, ph)

        rotA = partial(_rot_A, *rc[:5])
        rotB = partial(_rot_B, *rc[:5])
        rotZ = partial(_rot_Z, *rc[5:])
        RA, RB, SZ = rotA(P6), rotB(P6), rotZ(P6)
        tRA = [rotA(t) for t in tans]
        tRB = [rotB(t) for t in tans]
        tSZ = [rotZ(t) for t in tans]
        if "B1" in gi:
            # B1 tangents of the rotation coefficients (d rc / da * da)
            ca, sa = jnp.cos(a), jnp.sin(a)
            dsa, dca = ca * da, -sa * da
            dcos2, dsin2 = -0.5 * sa * da, 0.5 * sa * da
            cp, sp = jnp.cos(ph), jnp.sin(ph)
            c2p, s2p = jnp.cos(2 * ph), jnp.sin(2 * ph)
            drc = (dcos2, c2p * dsin2, s2p * dsin2, sp * dsa, -cp * dsa,
                   dca, -0.5 * sp * dsa, -0.5 * cp * dsa,
                   -0.5 * sp * dsa, 0.5 * cp * dsa)
            cRA = _rot_A(*drc[:5], P6)      # dB1 coefficient pass
            cRB = _rot_B(*drc[:5], P6)
            cSZ = _rot_Z(*drc[5:], P6)

        ta = ta_ref[0, i]
        tb = tb_ref[0, i]
        tt = ta + tb
        e1a = jnp.exp(-ta / T1)
        e1b = jnp.exp(-tb / T1)
        e2a = jnp.exp(-ta / T2)
        cF = e2a * jnp.exp(-tb / T2)
        cZ = e1a * e1b
        rec = 1.0 - cZ                  # == (1-e1a) e1b + (1-e1b)
        de2a = e2a * ta / (T2 * T2)
        dcF = cF * tt / (T2 * T2)
        dcZ = cZ * tt / (T1 * T1)

        # echo phasor chain over ta (off-resonance + ADC phase)
        if use_df:
            ang_a = twopi * DF * ta
            pc, ps = jnp.cos(ang_a), jnp.sin(ang_a)
        else:
            pc, ps = 1.0, 0.0
        if has_adcph:
            aph = aph_ref[0, i]
            pc, ps = _cmul(pc, ps, jnp.cos(aph), jnp.sin(aph))

        def echo(re0, im0):
            return _cmul(pc, ps, e2a * re0, e2a * im0)

        idx = adci_ref[0, i]
        pe = echo(RA[0][0, :], RA[1][0, :])

        @pl.when(idx >= 0)
        def _write():
            out_refs[0][idx, :] = pe[0]
            out_refs[1][idx, :] = pe[1]
            for name, g in gi.items():
                t = tRA[g]
                if name == "T1":
                    er, ei = echo(t[0][0, :], t[1][0, :])
                elif name == "T2":
                    # tangent state + echo-decay derivative
                    er, ei = echo(t[0][0, :], t[1][0, :])
                    xr, xi = _cmul(pc, ps, de2a * RA[0][0, :],
                                   de2a * RA[1][0, :])
                    er, ei = er + xr, ei + xi
                elif name == "B1":
                    # tangent state + rotation-coefficient pass
                    er, ei = echo(t[0][0, :] + cRA[0][0, :],
                                  t[1][0, :] + cRA[1][0, :])
                else:   # df: tangent state + i (2 pi ta) x primal echo
                    er, ei = echo(t[0][0, :], t[1][0, :])
                    er, ei = er - twopi * ta * pe[1], ei + twopi * ta * pe[0]
                out_refs[2 + 2 * g][idx, :] = er
                out_refs[3 + 2 * g][idx, :] = ei

        # full-stage carried coefficients: cFp = cF e^{i 2 pi df tt}
        if use_df:
            ang = twopi * DF * tt
            cc, cs = jnp.cos(ang), jnp.sin(ang)
            cFr, cFi = cF * cc, cF * cs
            dcFr, dcFi = dcF * cc, dcF * cs
        else:
            cFr, cFi = cF, jnp.zeros_like(cF)
            dcFr, dcFi = dcF, jnp.zeros_like(dcF)
        # d/ddf of the carried F coefficient: i (2 pi tt) (cFr + i cFi)
        fFr, fFi = -twopi * tt * cFi, twopi * tt * cFr

        s = shf_ref[0, i]
        if has_d:
            # stage-closing diffusion attenuation: multiplies every
            # tangent group identically (the attenuation is independent
            # of T1/T2/B1/df; a dD column would need the extra
            # -b(k) a(k) primal term -- model level only, like DW-FISP)
            atten = _datten(btd_ref, rdir_ref, dc_ref, i, H)

        def fmul(re, im, cr=cFr, ci=cFi):
            return _cmul(cr, ci, re, im)

        def store(base, planes):
            sh = _shift_sel(planes, s, has_up, has_down)
            if has_d:
                aA, aB, aZ = atten
                sh = (sh[0] * aA, sh[1] * aA, sh[2] * aB, sh[3] * aB,
                      sh[4] * aZ, sh[5] * aZ)
            for j in range(6):
                st_ref[base + j] = sh[j]

        # primal
        pAr, pAi = fmul(RA[0], RA[1])
        pBr, pBi = fmul(RB[0], RB[1])
        store(0, (pAr, pAi, pBr, pBi,
                  cZ * SZ[0] + rowmask * rec, cZ * SZ[1]))
        for name, g in gi.items():
            base = 6 * (g + 1)
            tA, tB, tZ = tRA[g], tRB[g], tSZ[g]
            if name == "T1":
                store(base, (*fmul(tA[0], tA[1]), *fmul(tB[0], tB[1]),
                             cZ * tZ[0] + dcZ * SZ[0] - rowmask * dcZ,
                             cZ * tZ[1] + dcZ * SZ[1]))
            elif name == "T2":
                t2A = fmul(tA[0], tA[1])
                x2A = fmul(RA[0], RA[1], dcFr, dcFi)
                t2B = fmul(tB[0], tB[1])
                x2B = fmul(RB[0], RB[1], dcFr, dcFi)
                store(base, (t2A[0] + x2A[0], t2A[1] + x2A[1],
                             t2B[0] + x2B[0], t2B[1] + x2B[1],
                             cZ * tZ[0], cZ * tZ[1]))
            elif name == "B1":
                store(base, (*fmul(tA[0] + cRA[0], tA[1] + cRA[1]),
                             *fmul(tB[0] + cRB[0], tB[1] + cRB[1]),
                             cZ * (tZ[0] + cSZ[0]), cZ * (tZ[1] + cSZ[1])))
            else:   # df
                fA = fmul(tA[0], tA[1])
                xA = fmul(RA[0], RA[1], fFr, fFi)
                fB = fmul(tB[0], tB[1])
                xB = fmul(RB[0], RB[1], fFr, fFi)
                store(base, (fA[0] + xA[0], fA[1] + xA[1],
                             fB[0] + xB[0], fB[1] + xB[1],
                             cZ * tZ[0], cZ * tZ[1]))
        return 0

    jax.lax.fori_loop(0, nstages, step, 0)


COMP_JAC_GROUPS = ("T1", "T2", "B1", "df")


def composite_jacobian_pallas(FA, phi, ta, tb, adci, shift, aph, b1u,
                              T1s, T2s, B1s, dfs=None, *, nadc, nstate,
                              groups=COMP_JAC_GROUPS, diffusion=None,
                              has_up=None, has_down=None, has_adcph=None,
                              has_b1u=None, btile=512, interpret=False):
    """Composite-GRE stage train + dS/d(selected params) in one fused
    kernel.

    Same contract as :func:`composite_pallas` plus derivatives:
    ``groups`` selects tangent columns from ("T1", "T2", "B1", "df")
    (canonical order enforced); returns ``(re, im), (jre, jim)`` with
    signals (nadc, B) and Jacobians (nadc, B, len(groups)) in group
    order.  The df column (signal per kHz of off-resonance) is exact at
    any df including 0; the B1 column is w.r.t. the B1s actually passed
    (dispatch callers get the matcher's max-normalized B1).
    FD-validated against the f64 planner in
    tests/test_composite_jacobian.py.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    groups = tuple(g for g in COMP_JAC_GROUPS if g in groups)
    ng = len(groups)
    (N, B, Bp, has_up, has_down, has_adcph, has_b1u, inputs
     ) = _comp_setup(FA, phi, ta, tb, adci, shift, aph, b1u, T1s, T2s,
                     B1s, dfs, btile, has_up, has_down, has_adcph,
                     has_b1u, nstate, diffusion)
    use_df = dfs is not None
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 10 + [
        pl.BlockSpec((1, btile), lambda b: (0, b))] * 5

    kernel = partial(
        _kernel_comp_jac, nstages=N, nstate=nstate, use_df=use_df,
        has_up=has_up, has_down=has_down, has_adcph=has_adcph,
        has_b1u=has_b1u, has_d=diffusion is not None, groups=groups)
    nout = 2 + 2 * ng
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((nadc, btile), lambda b: (0, b))] * nout,
        out_shape=[jax.ShapeDtypeStruct((nadc, Bp), f32)] * nout,
        scratch_shapes=[pltpu.VMEM((6 * (ng + 1), nstate + 1, btile),
                                   f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    o = [x[:, :B] for x in outs]
    re, im = o[0], o[1]
    if ng:
        jre = jnp.stack(o[2::2], axis=-1)           # (nadc, B, ng)
        jim = jnp.stack(o[3::2], axis=-1)
    else:
        # magnitude-only probes: zero-width tangent axis (jnp.stack
        # of an empty list raises)
        jre = jim = jnp.zeros(re.shape + (0,), f32)
    return (re, im), (jre, jim)


def composite_jacobian_pallas_sharded(FA, phi, ta, tb, adci, shift, aph,
                                      b1u, T1s, T2s, B1s, dfs=None, *,
                                      mesh, axis="atoms", **kw):
    """Atom-sharded composite Jacobian over a device mesh.

    GSPMD cannot partition a `pallas_call`, so the kernel runs under
    `jax.shard_map`: each device propagates its local atom shard
    (embarrassingly parallel; per-stage SMEM rows replicate).  The atom
    count must divide the mesh's `axis` size.  A per-atom diffusion
    coefficient (B,) shards WITH the atoms; scalar Dc replicates.
    Call under jit on the axon TPU backend (eager shard_map is
    UNIMPLEMENTED there).  kw forwards to
    :func:`composite_jacobian_pallas` (nadc, nstate, groups, ...).
    """
    from jax.sharding import PartitionSpec as PS

    use_df = dfs is not None
    diffusion = kw.pop("diffusion", None)
    dshard = (diffusion is not None
              and getattr(jnp.asarray(diffusion[2]), "ndim", 0) == 1)

    def local(t1, t2, b1, df, dc):
        diff = ((diffusion[0], diffusion[1], dc) if dshard
                else diffusion)
        return composite_jacobian_pallas(
            FA, phi, ta, tb, adci, shift, aph, b1u, t1, t2, b1,
            df if use_df else None, diffusion=diff, **kw)

    spec = PS(axis)
    cspec = PS(None, axis)
    jspec = PS(None, axis, None)
    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(spec,) * 5,
                      out_specs=((cspec, cspec), (jspec, jspec)),
                      check_vma=False)
    T1s = jnp.asarray(T1s, jnp.float32)
    dfz = (jnp.zeros_like(T1s) if dfs is None
           else jnp.broadcast_to(jnp.asarray(dfs, jnp.float32),
                                 T1s.shape))
    dcz = (jnp.asarray(diffusion[2], jnp.float32) if dshard
           else jnp.zeros_like(T1s))
    B1b = jnp.broadcast_to(jnp.asarray(B1s, jnp.float32), T1s.shape)
    return f(T1s, jnp.asarray(T2s, jnp.float32), B1b, dfz, dcz)
