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

from .pallas_common import _cmul, _rot_coeffs, _rot_A

__all__ = ["composite_pallas"]


def _kernel_comp(fa_ref, phi_ref, ta_ref, tb_ref, adci_ref, shf_ref,
                 aph_ref, b1u_ref, t1_ref, t2_ref, b1_ref, df_ref,
                 out_re_ref, out_im_ref, st_ref, *, nstages, nstate,
                 use_df, has_up, has_down, has_adcph, has_b1u):
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
        st_ref[0] = nAR
        st_ref[1] = nAI
        st_ref[2] = nBR
        st_ref[3] = nBI
        st_ref[4] = nZR
        st_ref[5] = nZI
        return 0

    jax.lax.fori_loop(0, nstages, step, 0)


def composite_pallas(FA, phi, ta, tb, adci, shift, aph, b1u,
                     T1s, T2s, B1s, dfs=None, *, nadc, nstate,
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
        has_up/has_down/has_adcph/has_b1u: static codegen gates; when
            None they are derived host-side from the corresponding
            argument (which must then be a host array, not a tracer --
            under jit pass them explicitly as statics).

    Returns (re, im): (nadc, B) float32 echo trains.
    """
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    FA = jnp.asarray(FA, f32)
    N = FA.shape[0]
    T1s = jnp.asarray(T1s, f32)
    B = T1s.shape[0]
    use_df = dfs is not None
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

    row = lambda x: jnp.asarray(x, f32).reshape(1, N)
    irow = lambda x: jnp.asarray(x, jnp.int32).reshape(1, N)
    inputs = [
        row(FA), row(phi), row(ta), row(tb), irow(adci), irow(shift),
        row(jnp.zeros((N,), f32) if aph is None else aph),
        row(jnp.ones((N,), f32) if b1u is None else b1u),
        padb(T1s).reshape(1, Bp), padb(jnp.asarray(T2s, f32)).reshape(1, Bp),
        padb(jnp.broadcast_to(jnp.asarray(B1s, f32), (B,))).reshape(1, Bp),
        padb(jnp.zeros((B,), f32) if dfs is None
             else jnp.broadcast_to(jnp.asarray(dfs, f32), (B,))
             ).reshape(1, Bp),
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 8 + [
        pl.BlockSpec((1, btile), lambda b: (0, b))] * 4

    kernel = partial(
        _kernel_comp, nstages=N, nstate=nstate, use_df=use_df,
        has_up=has_up, has_down=has_down, has_adcph=has_adcph,
        has_b1u=has_b1u)
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
