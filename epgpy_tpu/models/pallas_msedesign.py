"""Pallas TPU kernel: fused per-echo CPMG design Jacobian.

CRLB-guided design of variable-flip TSE / MSE protocols (Lee 2019 for
the autodiff framing; Busse 2006 for variable-flip TSE) needs the
signal derivatives w.r.t. EVERY per-echo control — refocusing angle
``alpha_i`` and echo spacing ``esp_i`` — plus the physiological
(T1, T2) columns, at every design iteration.  The reference can only
express this through its alias machinery (one dense derivative state
per variable propagated op-by-op: epgpy diff.py order1 chain,
examples/differentiation/optim_mse.py); the general engine here runs
it as chunked jacfwd over the scanned planner.

Like `pallas_hessian` (the FISP flagship), this kernel exploits that
EPG operators are AFFINE in the state: every per-echo tangent
propagates by the SAME per-echo operator as the primal and is seeded
exactly once (a lane mask), so all 2E+2 tangents ride the TPU lane
axis through one VMEM-resident pass.

Per echo i (the CPMG block, pallas_mse._kernel_mse stage order):

    x1 = Sh(D(esp_i/2) x + r)        # E -> S(1)
    x2 = M(alpha_i, phi_i) x1        # refocusing rotation
    x3 = Sh(D(esp_i/2) x2 + r)       # E -> S(1)
    echo_i = x3.A(0)                 # F0, read directly

Five (or nine, ``second_order=True``) plane groups of 6 folded
half-ladder planes (A/B/Z re+im):

    0 primal s (lane-replicated)   1 u1 = ds/dT1   2 u2 = ds/dT2
    3 a_i = ds/dalpha_i (lane = echo index)
    4 t_i = ds/desp_i   (the esp derivative hits BOTH half-spacings
                         with coefficient 1/2, and the recovery terms)
    5 w1_i = d2s/dT1 dalpha_i   6 w2_i = d2s/dT2 dalpha_i
    7 x1_i = d2s/dT1 desp_i     8 x2_i = d2s/dT2 desp_i

The mixed second-order groups are exactly what a CRLB design gradient
needs: with Fisher F = J^H J over (T1, T2), dF/dp_i = 2 Re(dJ/dp_i^H J)
— one kernel launch yields the full 2E-parameter gradient (the MSE
analog of `pallas_hessian`'s role in `parallel.crlb.mrf_design_slsqp`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["cpmg_design_pallas", "cpmg_design_pallas_sharded"]

# group indices
_P, _U1, _U2, _A, _T = range(5)


def cpmg_design_pallas_sharded(exc, FA, phi, ESP, T1s, T2s, *, mesh,
                               axis="atoms", **kw):
    """Atom-sharded per-echo CPMG design kernel over a device mesh
    (embarrassingly parallel; echo arrays replicated; the atom count
    must divide the `axis` size of `mesh`)."""
    from jax.sharding import PartitionSpec as PS

    def local(t1, t2):
        return cpmg_design_pallas(exc, FA, phi, ESP, t1, t2, **kw)

    vec = (PS(axis, None), PS(axis, None))
    mat = (PS(axis, None, None), PS(axis, None, None))
    out_specs = {"sig": vec, "dT1": vec, "dT2": vec,
                 "dalpha": mat, "desp": mat}
    if kw.get("second_order"):
        out_specs.update({"dT1dalpha": mat, "dT2dalpha": mat,
                          "dT1desp": mat, "dT2desp": mat})
    f = jax.shard_map(local, mesh=mesh, in_specs=(PS(axis), PS(axis)),
                      out_specs=out_specs, check_vma=False)
    T1s = jnp.atleast_1d(jnp.asarray(T1s, jnp.float32))
    T2s = jnp.atleast_1d(jnp.asarray(T2s, jnp.float32))
    T1s, T2s = jnp.broadcast_arrays(T1s, T2s)
    return jax.jit(f)(T1s, T2s)


def _kernel_design(exc_ref, fa_ref, phi_ref, esp_ref, t1_ref, t2_ref,
                   *refs, nstate, pchunk, second_order):
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
    rad = jnp.pi / 180.0

    @pl.when(pc == 0)
    def _init():
        # excitation from equilibrium, closed form (tangents start at
        # zero; the exc pulse is not a design variable); primal
        # replicated across all tangent lanes
        st_ref[...] = jnp.zeros_like(st_ref)
        ea = exc_ref[0, 0] * rad
        ep = exc_ref[0, 1] * rad
        one = jnp.ones_like(st_ref[0, 0, :])
        ar = jnp.sin(ep) * jnp.sin(ea) * one
        ai = -jnp.cos(ep) * jnp.sin(ea) * one
        st_ref[6 * _P + 0, 0, :] = ar
        st_ref[6 * _P + 1, 0, :] = ai
        st_ref[6 * _P + 2, 0, :] = ar
        st_ref[6 * _P + 3, 0, :] = ai
        st_ref[6 * _P + 4, 0, :] = jnp.cos(ea) * one

    rowm = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0).astype(f32)
    base = pc * pchunk

    def step(i, _):
        n = base + i                    # global echo index == lane
        fa = fa_ref[0, n]
        ph = phi_ref[0, n] * rad
        tau = 0.5 * esp_ref[0, n]       # symmetric CPMG half-spacing

        cF = jnp.exp(-tau / T2)
        cZ = jnp.exp(-tau / T1)
        rec = 1.0 - cZ
        dcF2 = cF * tau / (T2 * T2)     # dcF/dT2
        dcZ1 = cZ * tau / (T1 * T1)     # dcZ/dT1
        # d/desp = (1/2) d/dtau on each half-spacing
        eF = -0.5 * cF / T2
        eZ = -0.5 * cZ / T1             # d rec/desp = -eZ
        if second_order:
            # mixed d2/desp dT{1,2} (the 1/2 chain factor included)
            eF2 = 0.5 * cF * (1.0 - tau / T2) / (T2 * T2)
            eZ1 = 0.5 * cZ * (1.0 - tau / T1) / (T1 * T1)

        maskL = (jax.lax.broadcasted_iota(jnp.int32, (1, Na), 1)
                 == n).astype(f32)

        def planes(g):
            return [st_ref[6 * g + j] for j in range(6)]

        def relax_shift(groups):
            """E(tau) with tangent coefficient terms, then the folded
            unit shift.  The esp-direction terms (groups T/X1/X2, lane
            n only) fire per stage with the 1/2 chain coefficient
            already folded into eF/eZ/eF2/eZ1.

            Stage rule for a tangent h = d2 s / (d theta d p) of the
            affine stage S(x) = Sh(D x + r):
                h' = Sh(D h + D'_theta t_p + [lane] (D'_p u_theta
                         + D''_{theta p} s + r''_{theta p}))
            with t_p the design-direction tangent (A/T groups) and
            u_theta the physiological tangent (U1/U2)."""
            P, U1, U2, A, T = groups[:5]
            nP = (cF * P[0], cF * P[1], cF * P[2], cF * P[3],
                  cZ * P[4] + rowm * rec, cZ * P[5])
            nU1 = (cF * U1[0], cF * U1[1], cF * U1[2], cF * U1[3],
                   cZ * U1[4] + dcZ1 * P[4] - rowm * dcZ1,
                   cZ * U1[5] + dcZ1 * P[5])
            nU2 = (cF * U2[0] + dcF2 * P[0], cF * U2[1] + dcF2 * P[1],
                   cF * U2[2] + dcF2 * P[2], cF * U2[3] + dcF2 * P[3],
                   cZ * U2[4], cZ * U2[5])
            nA = (cF * A[0], cF * A[1], cF * A[2], cF * A[3],
                  cZ * A[4], cZ * A[5])
            nT = (cF * T[0] + maskL * eF * P[0],
                  cF * T[1] + maskL * eF * P[1],
                  cF * T[2] + maskL * eF * P[2],
                  cF * T[3] + maskL * eF * P[3],
                  cZ * T[4] + maskL * (eZ * P[4] - rowm * eZ),
                  cZ * T[5] + maskL * eZ * P[5])
            news = [nP, nU1, nU2, nA, nT]
            if second_order:
                W1, W2, X1, X2 = groups[5:]
                news.append((cF * W1[0], cF * W1[1], cF * W1[2],
                             cF * W1[3],
                             cZ * W1[4] + dcZ1 * A[4],
                             cZ * W1[5] + dcZ1 * A[5]))
                news.append((cF * W2[0] + dcF2 * A[0],
                             cF * W2[1] + dcF2 * A[1],
                             cF * W2[2] + dcF2 * A[2],
                             cF * W2[3] + dcF2 * A[3],
                             cZ * W2[4], cZ * W2[5]))
                news.append((cF * X1[0] + maskL * eF * U1[0],
                             cF * X1[1] + maskL * eF * U1[1],
                             cF * X1[2] + maskL * eF * U1[2],
                             cF * X1[3] + maskL * eF * U1[3],
                             cZ * X1[4] + dcZ1 * T[4]
                             + maskL * (eZ * U1[4] + eZ1 * P[4]
                                        - rowm * eZ1),
                             cZ * X1[5] + dcZ1 * T[5]
                             + maskL * (eZ * U1[5] + eZ1 * P[5])))
                news.append((cF * X2[0] + dcF2 * T[0]
                             + maskL * (eF * U2[0] + eF2 * P[0]),
                             cF * X2[1] + dcF2 * T[1]
                             + maskL * (eF * U2[1] + eF2 * P[1]),
                             cF * X2[2] + dcF2 * T[2]
                             + maskL * (eF * U2[2] + eF2 * P[2]),
                             cF * X2[3] + dcF2 * T[3]
                             + maskL * (eF * U2[3] + eF2 * P[3]),
                             cZ * X2[4] + maskL * eZ * U2[4],
                             cZ * X2[5] + maskL * eZ * U2[5]))

            def shift(s):
                AR, AI, BR, BI, ZR, ZI = s
                zrow = jnp.zeros_like(AR[:1])
                return (jnp.concatenate([BR[1:2], AR[:-1]], axis=0),
                        jnp.concatenate([BI[1:2], AI[:-1]], axis=0),
                        jnp.concatenate([BR[1:], zrow], axis=0),
                        jnp.concatenate([BI[1:], zrow], axis=0),
                        ZR, ZI)

            return tuple(shift(s) for s in news)

        # rotation coefficients + d/d(alpha in degrees)
        a = fa * rad
        ca, sa = jnp.cos(a), jnp.sin(a)
        cos2, sin2 = (1 + ca) / 2, (1 - ca) / 2
        cp, sp = jnp.cos(ph), jnp.sin(ph)
        c2p, s2p = jnp.cos(2 * ph), jnp.sin(2 * ph)
        coef = (cos2, (c2p * sin2, s2p * sin2), (sp * sa, -cp * sa),
                (-0.5 * sp * sa, -0.5 * cp * sa),
                (-0.5 * sp * sa, 0.5 * cp * sa), ca)
        dsa, dca = ca * rad, -sa * rad
        dcos2, dsin2 = -0.5 * sa * rad, 0.5 * sa * rad
        dcoef = (dcos2, (c2p * dsin2, s2p * dsin2), (sp * dsa, -cp * dsa),
                 (-0.5 * sp * dsa, -0.5 * cp * dsa),
                 (-0.5 * sp * dsa, 0.5 * cp * dsa), dca)

        def rot(cf, p6):
            c2, a01, a02, a20, a21, caa = cf
            AR, AI, BR, BI, ZR, ZI = p6
            yar = c2 * AR + a01[0] * BR + a01[1] * BI \
                + a02[0] * ZR - a02[1] * ZI
            yai = c2 * AI + a01[1] * BR - a01[0] * BI \
                + a02[0] * ZI + a02[1] * ZR
            ybr = c2 * BR + a01[0] * AR + a01[1] * AI \
                + a02[0] * ZR + a02[1] * ZI
            ybi = c2 * BI + a01[1] * AR - a01[0] * AI \
                + a02[1] * ZR - a02[0] * ZI
            yzr = a20[0] * AR - a20[1] * AI + a21[0] * BR \
                + a21[1] * BI + caa * ZR
            yzi = a20[0] * AI + a20[1] * AR + a21[1] * BR \
                - a21[0] * BI + caa * ZI
            return (yar, yai, ybr, ybi, yzr, yzi)

        # stage 1: E -> S on all groups
        groups = relax_shift(tuple(planes(g) for g in range(ngroups)))

        # rotation: zero-order on every group; alpha seeds (lane n):
        # group A gets M' s, and the mixed groups W1/W2 get M' u1/u2
        # (d/dalpha of M u_theta — M'' never appears at order <= 2
        # mixed with theta)
        q = rot(dcoef, groups[_P])      # M'(alpha_i) applied to primal
        rotated = [rot(coef, g) for g in groups]
        rotated[_A] = tuple(rotated[_A][j] + maskL * q[j]
                            for j in range(6))
        if second_order:
            q1 = rot(dcoef, groups[_U1])
            q2 = rot(dcoef, groups[_U2])
            rotated[5] = tuple(rotated[5][j] + maskL * q1[j]
                               for j in range(6))
            rotated[6] = tuple(rotated[6][j] + maskL * q2[j]
                               for j in range(6))

        # stage 2: E -> S; echo = A(0) row per group
        groups = relax_shift(tuple(rotated))
        for g in range(ngroups):
            for j in range(6):
                st_ref[6 * g + j] = groups[g][j]
            outs[2 * g][0, i, :] = groups[g][0][0, :]
            outs[2 * g + 1][0, i, :] = groups[g][1][0, :]
        return 0

    jax.lax.fori_loop(0, pchunk, step, 0)


@partial(jax.jit, static_argnames=("nstate", "pchunk", "second_order",
                                   "interpret"))
def cpmg_design_pallas(exc, FA, phi, ESP, T1s, T2s, *, nstate,
                       pchunk=None, second_order=False, interpret=False):
    """Per-echo CPMG design Jacobian (+ mixed Hessian) via one fused
    Pallas kernel.

    Args:
        exc: (alpha, phi) of the excitation pulse (degrees, host
            scalars; not a design variable).
        FA, phi: (E,) refocusing flip angles / phases (degrees).
        ESP: (E,) echo spacings (ms); each splits symmetrically into
            two half-spacings around the refocusing pulse.
        T1s, T2s: (B,) per-atom parameters.
        nstate: ladder half-size (>= 2*E for exactness).
        second_order: also propagate the mixed second derivatives
            d2S/(dT_c dp_i) — the terms a CRLB design gradient needs
            (dFisher/dp = 2 Re(dJ/dp^H J)).

    Returns a dict of float32 arrays (complex split re/im):
      ``sig``:  ((B, E), (B, E))           echo train
      ``dT1``, ``dT2``: ((B, E), (B, E))   dS/dT1, dS/dT2
      ``dalpha``, ``desp``: ((B, E, E), (B, E, E))
          dS_j/d(alpha_i), dS_j/d(esp_i); echo axis j leads, design
          variable i last; i > j entries are exactly zero (causality);
      and with ``second_order=True``:
      ``dT1dalpha``, ``dT2dalpha``, ``dT1desp``, ``dT2desp``:
          ((B, E, E), (B, E, E)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    FA = jnp.asarray(FA, f32)
    E = FA.shape[0]
    phi = jnp.broadcast_to(jnp.asarray(phi, f32), (E,))
    ESP = jnp.broadcast_to(jnp.asarray(ESP, f32), (E,))
    T1s = jnp.atleast_1d(jnp.asarray(T1s, f32))
    T2s = jnp.atleast_1d(jnp.asarray(T2s, f32))
    T1s, T2s = jnp.broadcast_arrays(T1s, T2s)
    B = T1s.shape[0]

    Na = max(-(-E // 128) * 128, 128)   # lane-padded echo count
    if pchunk is None:
        pchunk = min(Na, 128)
    Pp = -(-E // pchunk) * pchunk

    def padp(x, fill):
        return (jnp.concatenate([x, jnp.full((Pp - E,), fill, f32)])
                if Pp > E else x)

    exc_arr = jnp.stack([jnp.asarray(exc[0], f32),
                         jnp.asarray(exc[1], f32)]).reshape(1, 2)
    FA_p = padp(FA, 0.0).reshape(1, Pp)
    phi_p = padp(phi, 0.0).reshape(1, Pp)
    ESP_p = padp(ESP, 1.0).reshape(1, Pp)
    nP = Pp // pchunk
    ngroups = 9 if second_order else 5

    kernel = partial(_kernel_design, nstate=nstate, pchunk=pchunk,
                     second_order=second_order)
    outs = pl.pallas_call(
        kernel,
        grid=(B, nP),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 6,
        out_specs=[pl.BlockSpec((1, pchunk, Na), lambda b, pc: (b, pc, 0))
                   ] * (2 * ngroups),
        out_shape=[jax.ShapeDtypeStruct((B, Pp, Na), f32)] * (2 * ngroups),
        scratch_shapes=[pltpu.VMEM((6 * ngroups, nstate + 1, Na), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(exc_arr, FA_p, phi_p, ESP_p, T1s.reshape(1, B), T2s.reshape(1, B))

    def scal(g):   # lane-replicated groups: any lane holds the value
        return outs[2 * g][:, :E, 0], outs[2 * g + 1][:, :E, 0]

    def vec(g):
        return outs[2 * g][:, :E, :E], outs[2 * g + 1][:, :E, :E]

    res = {"sig": scal(_P), "dT1": scal(_U1), "dT2": scal(_U2),
           "dalpha": vec(_A), "desp": vec(_T)}
    if second_order:
        res.update({"dT1dalpha": vec(5), "dT2dalpha": vec(6),
                    "dT1desp": vec(7), "dT2desp": vec(8)})
    return res
