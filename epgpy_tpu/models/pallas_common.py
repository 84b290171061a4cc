"""Plane math shared by the folded half-ladder Pallas kernel families
(FISP/CPMG/bSSFP/DESS/EPG-X).

A sign or coefficient fix here updates EVERY kernel family; primal and
tangent propagation must stay bit-synchronized (the FD-validation tests
enforce it).  Layout conventions: a plane "set" is the 6-tuple
(AR, AI, BR, BI, ZR, ZI) of (nstate+1, btile) f32 planes with
A(k) = F+(k), B(k) = F+(-k) (B planes are still F+ states: they
transform with the same coefficients as A up to the conjugate-pair
signs in _rot_B), Z the longitudinal ladder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cmul(cr, ci, xr, xi):
    return cr * xr - ci * xi, cr * xi + ci * xr


def _round_block(n):
    """Round a block dim down to TPU divisibility: a multiple of 128
    when possible, else a multiple of 8 (block dims must divide
    (8, 128) or equal the array dim -- Mosaic rejects e.g. 819)."""
    if n >= 128:
        return n - n % 128
    return max(n - n % 8, 8)


def _rot_coeffs(a, ph):
    """Weigel rotation closed forms: the 10-tuple
    (c2, m01r, m01i, m02r, m02i, ca, m20r, m20i, m21r, m21i)."""
    ca, sa = jnp.cos(a), jnp.sin(a)
    cos2, sin2 = (1 + ca) / 2, (1 - ca) / 2
    cp, sp = jnp.cos(ph), jnp.sin(ph)
    c2p, s2p = jnp.cos(2 * ph), jnp.sin(2 * ph)
    return (cos2, c2p * sin2, s2p * sin2, sp * sa, -cp * sa,
            ca, -0.5 * sp * sa, -0.5 * cp * sa,
            -0.5 * sp * sa, 0.5 * cp * sa)


def _rot_A(c2, a1r, a1i, a2r, a2i, s):
    AR, AI, BR, BI, ZR, ZI = s
    re = c2 * AR + a1r * BR + a1i * BI + a2r * ZR - a2i * ZI
    im = c2 * AI + a1i * BR - a1r * BI + a2r * ZI + a2i * ZR
    return re, im


def _rot_B(c2, a1r, a1i, a2r, a2i, s):
    AR, AI, BR, BI, ZR, ZI = s
    re = c2 * BR + a1r * AR + a1i * AI + a2r * ZR + a2i * ZI
    im = c2 * BI + a1i * AR - a1r * AI + a2i * ZR - a2r * ZI
    return re, im


def _rot_Z(caa, b0r, b0i, b1r, b1i, s):
    AR, AI, BR, BI, ZR, ZI = s
    re = b0r * AR - b0i * AI + b1r * BR + b1i * BI + caa * ZR
    im = b0r * AI + b0i * AR + b1i * BR - b1r * BI + caa * ZI
    return re, im


def _apply_rot(rc, s):
    """Apply a _rot_coeffs rotation to one plane set."""
    c2, a1r, a1i, a2r, a2i, caa, b0r, b0i, b1r, b1i = rc
    ar, ai = _rot_A(c2, a1r, a1i, a2r, a2i, s)
    br, bi = _rot_B(c2, a1r, a1i, a2r, a2i, s)
    zr, zi = _rot_Z(caa, b0r, b0i, b1r, b1i, s)
    return ar, ai, br, bi, zr, zi


def _mix_planes(sets, m, dens, rowmask, C):
    """C x C exchange madd: F planes with mT, Z with mL around the k=0
    equilibrium (dev = Z - dens*rowmask).  ``m(part, i, j)`` streams
    the stage-matrix rows (part 0/1/2 = mT_re / mT_im / mL);
    ``dens(j)`` the compartment densities."""
    devs = [(sets[j][4] - dens(j) * rowmask, sets[j][5])
            for j in range(C)]
    out = []
    for i in range(C):
        nAR = nAI = nBR = nBI = nZR = nZI = None
        for j in range(C):
            mr, mi = m(0, i, j), m(1, i, j)
            ml = m(2, i, j)
            AR, AI, BR, BI, _, _ = sets[j]
            ar, ai = _cmul(mr, mi, AR, AI)
            br, bi = _cmul(mr, mi, BR, BI)
            zr, zi = ml * devs[j][0], ml * devs[j][1]
            if j == 0:
                nAR, nAI, nBR, nBI, nZR, nZI = ar, ai, br, bi, zr, zi
            else:
                nAR, nAI = nAR + ar, nAI + ai
                nBR, nBI = nBR + br, nBI + bi
                nZR, nZI = nZR + zr, nZI + zi
        out.append((nAR, nAI, nBR, nBI,
                    nZR + dens(i) * rowmask, nZI))
    return out


def _store_set(st_ref, base, planes):
    """Store one folded plane set into VMEM unshifted (balanced trains:
    no gradient between TRs, the ladder never moves)."""
    for j in range(6):
        st_ref[base + j] = planes[j]


def _shift_store(st_ref, base, planes):
    """Unit ladder shift of one folded plane set into VMEM: A gains the
    reflected B(1) row at k=0, B drops it, Z is unshifted."""
    AR, AI, BR, BI, ZR, ZI = planes
    zrow = jnp.zeros_like(AR[:1])
    st_ref[base + 0] = jnp.concatenate([BR[1:2], AR[:-1]], axis=0)
    st_ref[base + 1] = jnp.concatenate([BI[1:2], AI[:-1]], axis=0)
    st_ref[base + 2] = jnp.concatenate([BR[1:], zrow], axis=0)
    st_ref[base + 3] = jnp.concatenate([BI[1:], zrow], axis=0)
    st_ref[base + 4] = ZR
    st_ref[base + 5] = ZI


def _pad_setup(FA, phi, TR, TE, T1s, T2s, B1s, dfs, btile, pchunk, nout):
    """Shared pad/chunk setup for the balanced-family kernels (bSSFP,
    DESS): ceil-pad atoms to btile / pulses to pchunk with no-op pulse
    fills (FA=0; TR fill keeps TR - TE > 0)."""
    f32 = jnp.float32
    FA = jnp.asarray(FA, f32)
    P = FA.shape[0]
    phi = jnp.broadcast_to(jnp.asarray(phi, f32), (P,))
    TR = jnp.broadcast_to(jnp.asarray(TR, f32), (P,))
    TE = jnp.asarray(TE, f32)
    var_te = TE.ndim == 1
    T1s = jnp.asarray(T1s, f32)
    T2s = jnp.asarray(T2s, f32)
    B1s = jnp.asarray(B1s, f32)
    DFs = jnp.zeros_like(T1s) if dfs is None else jnp.asarray(dfs, f32)
    B = T1s.shape[0]

    if pchunk is None:
        # chunked fallback bounded by output-window VMEM: blocks live
        # double-buffered, so cap the single-buffer footprint at 16 MB
        # (nout=16 jac kernels at pchunk=1024 would be 33 MB single /
        # 67 MB double -- too close to the 100 MB kernel limit);
        # rounded to TPU block divisibility
        pchunk = (P if nout * P * btile * 4 <= (1 << 25)
                  else _round_block(
                      min(1024, max((1 << 24) // (nout * btile * 4), 8))))
    Bp = -(-B // btile) * btile
    Pp = -(-P // pchunk) * pchunk

    def padb(x):
        return jnp.concatenate([x, jnp.ones((Bp - B,), f32)]) if Bp > B else x

    def padp(x, fill):
        return (jnp.concatenate([x, jnp.full((Pp - P,), fill, f32)])
                if Pp > P else x)

    FA_p, phi_p = padp(FA, 0.0), padp(phi, 0.0)
    # padded pulses are FA=0 no-ops; TR fill just needs TR - TE > 0
    TR_p = padp(TR, 2.0) if var_te else padp(TR, TE + 1.0)
    TE_arr = (padp(jnp.broadcast_to(TE, (P,)), 1.0).reshape(1, -1)
              if var_te else jnp.full((1, 1), TE, f32))
    T1p, T2p, B1p, DFp = (padb(T1s), padb(T2s), padb(B1s), padb(DFs))
    args = [x.reshape(1, -1) for x in (FA_p, phi_p, TR_p)]
    return (P, B, Pp, Bp, pchunk, var_te, args, TE_arr,
            [x.reshape(1, -1) for x in (T1p, T2p, B1p, DFp)])
