"""Pallas TPU kernel: composite EPG-X stage trains (MT-/exchange-
prepared arbitrary gradient-echo schedules).

The exact-pattern EPG-X kernel (models/pallas_xgre) covers the
canonical per-TR train ``[R?, T, X?, Adc, X?, S(1)?] * N`` with the
same structure every TR.  Segmented / prepared multi-compartment
schedules -- MT-prepped GRE (periodic saturation blocks + readout
segments + recovery delays), IR-MT (MP2RAGE-style inversions over a
bound pool), sat-recovery MT mapping -- change structure between
blocks and fall to the scan planner there.  This kernel generalizes
the composite-GRE stage grammar (models/pallas_composite) to C
exchanging compartments:

    stage = [ R(sat)?, T(alpha_c, phi_c)?, X(tau_a)*, Adc?,
              X(tau_b)*, S(+-1)? ]

with every element optional and per-stage host-known scalars in SMEM.
Relaxation/exchange/precession all live in the X mixing matrices; a
small TABLE of per-atom stage matrices (one per DISTINCT accumulated
tau; entry 0 is the identity) is precomputed by the closed-form
spectral expm (pallas_xgre._exchange_mats) and streamed in as packed
coefficient rows -- each stage indexes its pre-/post-ADC matrix by an
SMEM integer, so arbitrary prep/readout/recovery structure costs
nothing extra per stage.

State: one folded half-ladder plane set (A=F+(k), B=F+(-k), Z; re/im)
PER COMPARTMENT in VMEM (6C planes); outputs are per-compartment k=0
transverse states at each ADC row.

Reference semantics: epgpy applies R/T/X/S op-by-op
(/root/reference/epgpy/exchange.py:89-120, evolution.py, shift.py);
the reference has no fused path and crashes on its own batched
exchange_matrix output (see ops/exchange.py notes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pallas_common import (_cmul, _rot_coeffs, _apply_rot,
                            _mix_planes)
from .pallas_composite import _shift_sel

__all__ = ["xcomposite_pallas", "xcomposite_pallas_sharded",
           "xcomposite_jacobian_pallas", "xcomposite_stage_mat_tables"]


def _kernel_xcomp(alpha_ref, phi_ref, sfr_ref, sfi_ref, szr_ref, szi_ref,
                  adci_ref, shf_ref, aph_ref, mia_ref, mib_ref, b1u_ref,
                  dens_ref, b1_ref, coef_ref, *refs, nstages, nstate,
                  ncomp, has_up, has_down, has_adcph, has_sat,
                  has_b1u=False):
    """One atom tile: all stages with 6C planes VMEM-resident.

    coef_ref rows: ``mat*3CC + part*CC + i*C + j`` with part 0/1/2 =
    mT_re / mT_im / mL; mat 0 is the identity (stages without an X
    stage index it, so there is no in-kernel branch).
    """
    from jax.experimental import pallas as pl

    C = ncomp
    CC = C * C
    f32 = jnp.float32
    out_refs = refs[:2 * C]
    st_ref = refs[2 * C]
    H = nstate + 1
    btile = st_ref.shape[2]
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0
               ).astype(f32)

    st_ref[...] = jnp.zeros_like(st_ref)
    ones = jnp.ones((btile,), f32)
    for c in range(C):
        st_ref[6 * c + 4, 0, :] = ones          # Z_c(0) = 1

    B1 = b1_ref[0, :]
    rad = jnp.pi / 180.0
    MB = -(-3 * CC // 8) * 8      # 8-aligned per-mat block rows

    def mix(mat, sets):
        # ONE aligned dynamic-slice load of the stage's whole matrix
        # block; per-coefficient rows then index a loaded VALUE.
        # (24 separate dynamic-row reads per stage measured ~75x
        # slower than the equivalent static-row xgre kernel.)
        blk = coef_ref[pl.ds(mat * MB, MB), :]
        return _mix_planes(
            sets,
            lambda part, i, j: blk[part * CC + i * C + j, :],
            lambda j: dens_ref[0, j], rowmask, C)

    def step(i, _):
        sets = []
        for c in range(C):
            s = tuple(st_ref[6 * c + j] for j in range(6))
            if has_sat:
                # saturation diag: F+ states (A and B planes) scale by
                # conj(e^{-rT}), Z by e^{-rL} (identity rows = 1+0j)
                sfr, sfi = sfr_ref[i, c], sfi_ref[i, c]
                szr, szi = szr_ref[i, c], szi_ref[i, c]
                ar, ai = _cmul(sfr, sfi, s[0], s[1])
                br, bi = _cmul(sfr, sfi, s[2], s[3])
                zr, zi = _cmul(szr, szi, s[4], s[5])
                s = (ar, ai, br, bi, zr, zi)
            if has_b1u:
                # per-stage B1 sensitivity (r5, composite convention):
                # b1u=0 stages (scalar adiabatic preps) bypass B1
                eff = 1.0 + b1u_ref[0, i] * (B1 - 1.0)
            else:
                eff = B1
            rc = _rot_coeffs(alpha_ref[i, c] * rad * eff,
                             phi_ref[i, c] * rad)
            sets.append(_apply_rot(rc, s))

        sets = mix(mia_ref[0, i], sets)

        idx = adci_ref[0, i]
        if has_adcph:
            aph = aph_ref[0, i]
            pc_, ps_ = jnp.cos(aph), jnp.sin(aph)

        @pl.when(idx >= 0)
        def _write():
            for c in range(C):
                er, ei = sets[c][0][0, :], sets[c][1][0, :]
                if has_adcph:
                    er, ei = _cmul(pc_, ps_, er, ei)
                out_refs[2 * c][idx, :] = er
                out_refs[2 * c + 1][idx, :] = ei

        sets = mix(mib_ref[0, i], sets)
        s_dir = shf_ref[0, i]
        for c in range(C):
            sh = _shift_sel(sets[c], s_dir, has_up, has_down)
            for j in range(6):
                st_ref[6 * c + j] = sh[j]
        return 0

    jax.lax.fori_loop(0, nstages, step, 0)


@partial(jax.jit, static_argnames=("nadc", "nstate", "btile",
                                   "interpret", "has_up", "has_down",
                                   "has_adcph", "has_sat", "has_b1u"))
def xcomposite_pallas(alpha, phi, satf_re, satf_im, satz_re, satz_im,
                      adci, shift, aph, mia, mib, dens, taus,
                      khi, T1, T2, g, b1=None, b1u=None, *, nadc, nstate,
                      btile=512, interpret=False, has_up=True,
                      has_down=False, has_adcph=False, has_sat=False,
                      has_b1u=False):
    """Composite EPG-X stage train via the fused kernel.

    Args:
        alpha, phi: (N, C) per-stage per-compartment flips / phases
            (degrees).
        satf_re/im, satz_re/im: (N, C) saturation factors applied
            before the pulse (1+0j rows when absent).
        adci: (N,) int32 output-row index per stage (-1 = no readout).
        shift: (N,) int32 unit-shift direction in {-1, 0, +1}.
        aph: (N,) ADC phasor angle (rad; 0 when absent).
        mia, mib: (N,) int32 stage-matrix table indices for the pre- /
            post-ADC exchange stages (0 = identity).
        dens: (C,) equilibrium densities.
        taus: (nmat,) mixing times (ms); taus[0] MUST be 0 (identity).
        khi: (C, C) kinetic matrix; T1/T2/g: (C, B) per-compartment
            per-atom parameters shared by every X stage (the
            distinct-tau table assumes one generator).
        b1: optional (B,) per-atom flip scale.
        nadc, nstate: static output rows / ladder capacity.

    Returns (re, im): (nadc, C, B) float32 per-compartment F0 trains.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .pallas_xgre import _exchange_mats

    f32 = jnp.float32
    alpha = jnp.asarray(alpha, f32)
    N, C = alpha.shape
    T1 = jnp.asarray(T1, f32)
    B = T1.shape[1]
    CC = C * C
    taus = jnp.asarray(taus, f32)
    nmat = taus.shape[0]

    Bp = -(-B // btile) * btile
    if Bp > B:
        padv = jnp.ones((C, Bp - B), f32)
        T1 = jnp.concatenate([T1, padv], axis=1)
        T2 = jnp.concatenate([jnp.asarray(T2, f32), padv], axis=1)
        g = jnp.concatenate([jnp.asarray(g, f32),
                             jnp.zeros((C, Bp - B), f32)], axis=1)
    else:
        T2 = jnp.asarray(T2, f32)
        g = jnp.asarray(g, f32)
    khi = jnp.asarray(khi, f32)

    MB = -(-3 * CC // 8) * 8      # 8-aligned per-mat block rows

    def pack(tau):
        _, mr, mi, ml = _exchange_mats(khi, T1, T2, g, tau)
        to_rows = lambda m: jnp.moveaxis(m, 0, -1).reshape(CC, Bp)
        blk = jnp.concatenate([to_rows(mr), to_rows(mi), to_rows(ml)],
                              axis=0)
        # pad each block to MB rows so the kernel's dynamic-slice load
        # starts on an 8-aligned sublane offset (mat * MB)
        if MB > 3 * CC:
            blk = jnp.concatenate(
                [blk, jnp.zeros((MB - 3 * CC, Bp), f32)], axis=0)
        return blk

    # one packed (MB, Bp) block per distinct tau; nmat is small
    # (static) so a python-level stack is fine
    coef = jnp.concatenate([pack(taus[m]) for m in range(nmat)], axis=0)

    b1 = jnp.ones(B, f32) if b1 is None else jnp.asarray(b1, f32)
    if Bp > B:
        b1 = jnp.concatenate([b1, jnp.ones(Bp - B, f32)])

    row = lambda x: jnp.asarray(x, f32).reshape(1, N)
    irow = lambda x: jnp.asarray(x, jnp.int32).reshape(1, N)
    nc = lambda x: jnp.broadcast_to(jnp.asarray(x, f32), (N, C))
    b1u_row = (jnp.ones((1, N), f32) if b1u is None
               else jnp.asarray(b1u, f32).reshape(1, N))
    inputs = [
        nc(alpha), nc(phi), nc(satf_re), nc(satf_im), nc(satz_re),
        nc(satz_im), irow(adci), irow(shift), row(aph), irow(mia),
        irow(mib), b1u_row, jnp.asarray(dens, f32).reshape(1, C),
        b1.reshape(1, Bp), coef,
    ]
    kernel = partial(_kernel_xcomp, nstages=N, nstate=nstate, ncomp=C,
                     has_up=has_up, has_down=has_down,
                     has_adcph=has_adcph, has_sat=has_sat,
                     has_b1u=has_b1u)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 13 + [
            pl.BlockSpec((1, btile), lambda b: (0, b)),          # b1
            pl.BlockSpec((nmat * MB, btile), lambda b: (0, b)),
        ],
        out_specs=[pl.BlockSpec((nadc, btile), lambda b: (0, b))] * (2 * C),
        out_shape=[jax.ShapeDtypeStruct((nadc, Bp), f32)] * (2 * C),
        scratch_shapes=[pltpu.VMEM((6 * C, nstate + 1, btile), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    re = jnp.stack([outs[2 * c][:, :B] for c in range(C)], axis=1)
    im = jnp.stack([outs[2 * c + 1][:, :B] for c in range(C)], axis=1)
    return re, im


def xcomposite_pallas_sharded(alpha, phi, satf_re, satf_im, satz_re,
                              satz_im, adci, shift, aph, mia, mib, dens,
                              taus, khi, T1, T2, g, b1=None, *, mesh,
                              axis="atoms", **kw):
    """Atom-sharded composite EPG-X kernel over a device mesh.

    shard_map over the atom axis (axis 1 of the (C, B) parameter
    planes): each device runs the full VMEM-resident kernel on its
    local shard; per-stage SMEM rows, the kinetic matrix and the
    distinct-tau table replicate.  Call under jit on the axon TPU
    backend (eager shard_map is UNIMPLEMENTED there).  kw forwards to
    :func:`xcomposite_pallas`.
    """
    from jax.sharding import PartitionSpec as PS

    def local(t1, t2, gg, b1l):
        return xcomposite_pallas(
            alpha, phi, satf_re, satf_im, satz_re, satz_im, adci,
            shift, aph, mia, mib, dens, taus, khi, t1, t2, gg, b1l,
            **kw)

    cspec = PS(None, axis)
    ospec = PS(None, None, axis)
    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(cspec, cspec, cspec, PS(axis)),
                      out_specs=(ospec, ospec), check_vma=False)
    T1 = jnp.asarray(T1, jnp.float32)
    B = T1.shape[1]
    g = (jnp.zeros_like(T1) if g is None
         else jnp.broadcast_to(jnp.asarray(g, jnp.float32), T1.shape))
    b1 = (jnp.ones(B, jnp.float32) if b1 is None
          else jnp.asarray(b1, jnp.float32))
    return f(T1, jnp.asarray(T2, jnp.float32), g, b1)


def _kernel_xcomp_jac(alpha_ref, phi_ref, sfr_ref, sfi_ref, szr_ref,
                      szi_ref, adci_ref, shf_ref, aph_ref, mia_ref,
                      mib_ref, b1u_ref, dens_ref, b1_ref, coef_ref,
                      *refs, nstages, nstate, ncomp, nmat, nvar, has_up,
                      has_down, has_adcph, has_sat, has_b1u=False):
    """Fused composite EPG-X primal + tangent propagation.

    Plane groups g = 0 (primal), 1..nvar (one per fit variable), each
    holding the 6C planes of :func:`_kernel_xcomp`.  Saturation,
    rotation and the ladder shift are variable-independent (variables
    enter ONLY through the exchange stage matrices and the equilibrium
    densities -- the xgre_jacobian contract), so tangents ride the
    same per-stage operator; each exchange stage adds the product-rule
    term ``M (t - de) + dM (x - e) + de`` with the PER-VARIABLE
    distinct-tau matrix tables streamed in coef_ref (rows
    ``g*nmat*3CC + mat*3CC + part*CC + i*C + j``) and per-variable
    density tangents in dens_ref (rows ``g*C + c``).
    """
    from jax.experimental import pallas as pl

    C = ncomp
    CC = C * C
    G = nvar + 1
    f32 = jnp.float32
    out_refs = refs[:2 * C * G]
    st_ref = refs[2 * C * G]
    H = nstate + 1
    btile = st_ref.shape[2]
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == 0
               ).astype(f32)

    st_ref[...] = jnp.zeros_like(st_ref)
    ones = jnp.ones((btile,), f32)
    for c in range(C):
        st_ref[6 * c + 4, 0, :] = ones    # primal Z_c(0) = 1

    B1 = b1_ref[0, :]
    rad = jnp.pi / 180.0
    MB = -(-3 * CC // 8) * 8      # 8-aligned per-mat block rows

    def _blk(g, mat):
        # one aligned dynamic-slice load per (group, stage-matrix):
        # per-coefficient rows then index a loaded VALUE (separate
        # dynamic-row reads are ~75x slower -- see _kernel_xcomp)
        return coef_ref[pl.ds((g * nmat + mat) * MB, MB), :]

    def dens(g, c):
        return dens_ref[g * C + c, :]

    def mix_primal(mat, sets, pblk=None):
        blk = _blk(0, mat) if pblk is None else pblk
        return _mix_planes(
            sets,
            lambda part, i, j: blk[part * CC + i * C + j, :],
            lambda j: dens(0, j), rowmask, C)

    def mix_tangent(mat, g, tsets, xsets, pblk=None):
        """t'_i = sum_j [ M_ij (t_j - de_j) + dM_ij (x_j - e_j) ]
        + de_i (equilibrium on the k=0 Z row only)."""
        if pblk is None:
            pblk = _blk(0, mat)
        gblk = _blk(g, mat)
        xdevs = [(xsets[j][4] - dens(0, j) * rowmask, xsets[j][5])
                 for j in range(C)]
        tdevs = [(tsets[j][4] - dens(g, j) * rowmask, tsets[j][5])
                 for j in range(C)]
        out = []
        for i in range(C):
            nAR = nAI = nBR = nBI = nZR = nZI = None
            for j in range(C):
                mr, mi = pblk[0 * CC + i * C + j, :], \
                    pblk[1 * CC + i * C + j, :]
                ml = pblk[2 * CC + i * C + j, :]
                dmr, dmi = gblk[0 * CC + i * C + j, :], \
                    gblk[1 * CC + i * C + j, :]
                dml = gblk[2 * CC + i * C + j, :]
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
        if has_b1u:
            eff = 1.0 + b1u_ref[0, i] * (B1 - 1.0)
        else:
            eff = B1
        rotc = [_rot_coeffs(alpha_ref[i, c] * rad * eff,
                            phi_ref[i, c] * rad) for c in range(C)]
        groups = []
        for g in range(G):
            sets = []
            for c in range(C):
                s = tuple(st_ref[6 * (g * C + c) + j] for j in range(6))
                if has_sat:
                    sfr, sfi = sfr_ref[i, c], sfi_ref[i, c]
                    szr, szi = szr_ref[i, c], szi_ref[i, c]
                    ar, ai = _cmul(sfr, sfi, s[0], s[1])
                    br, bi = _cmul(sfr, sfi, s[2], s[3])
                    zr, zi = _cmul(szr, szi, s[4], s[5])
                    s = (ar, ai, br, bi, zr, zi)
                sets.append(_apply_rot(rotc[c], s))
            groups.append(sets)

        mia = mia_ref[0, i]
        pblk = _blk(0, mia)       # hoisted across all tangent groups
        groups = ([mix_primal(mia, groups[0], pblk)]
                  + [mix_tangent(mia, g, groups[g], groups[0], pblk)
                     for g in range(1, G)])

        idx = adci_ref[0, i]
        if has_adcph:
            aph = aph_ref[0, i]
            pc_, ps_ = jnp.cos(aph), jnp.sin(aph)

        @pl.when(idx >= 0)
        def _write():
            for g in range(G):
                for c in range(C):
                    er = groups[g][c][0][0, :]
                    ei = groups[g][c][1][0, :]
                    if has_adcph:
                        er, ei = _cmul(pc_, ps_, er, ei)
                    out_refs[2 * (g * C + c)][idx, :] = er
                    out_refs[2 * (g * C + c) + 1][idx, :] = ei

        mib = mib_ref[0, i]
        pblk = _blk(0, mib)
        groups = ([mix_primal(mib, groups[0], pblk)]
                  + [mix_tangent(mib, g, groups[g], groups[0], pblk)
                     for g in range(1, G)])
        s_dir = shf_ref[0, i]
        for g in range(G):
            for c in range(C):
                sh = _shift_sel(groups[g][c], s_dir, has_up, has_down)
                for j in range(6):
                    st_ref[6 * (g * C + c) + j] = sh[j]
        return 0

    jax.lax.fori_loop(0, nstages, step, 0)


def xcomposite_stage_mat_tables(khi, T1, T2, g, taus):
    """Differentiable distinct-tau stage-matrix tables.

    The map from physical parameters to the kernel's matrix table:
    run ``jax.jvp(lambda p: xcomposite_stage_mat_tables(...), ...)``
    once per fit variable to obtain the tangent tables for
    :func:`xcomposite_jacobian_pallas` (the xgre_jacobian pattern --
    variables may enter through khi, T1, T2, g; taus are host-static).

    Args:
        khi: (C, C) shared or (C, C, B) per-atom kinetic matrix.
        T1, T2: (C, B); g: (C, B) or None; taus: (nmat,) host array
            (taus[0] must be 0 -- the identity entry).

    Returns (mr, mi, ml): each (nmat, B, C, C) float32.

    NOTE: complex intermediates -- call inside jit on TPU (fact 1).
    """
    from .pallas_xgre import exchange_stage_mats

    outs = [exchange_stage_mats(khi, T1, T2, g, float(t)) for t in taus]
    return tuple(jnp.stack([o[k] for o in outs]) for k in range(3))


@partial(jax.jit, static_argnames=("nadc", "nstate", "btile",
                                   "interpret", "has_up", "has_down",
                                   "has_adcph", "has_sat", "has_b1u"))
def xcomposite_jacobian_pallas(alpha, phi, satf_re, satf_im, satz_re,
                               satz_im, adci, shift, aph, mia, mib,
                               dens, mats, dmats, ddens, b1=None,
                               b1u=None, *, nadc, nstate, btile=512,
                               interpret=False, has_up=True,
                               has_down=False, has_adcph=False,
                               has_sat=False, has_b1u=False):
    """Composite EPG-X stage train + per-variable tangents, one pass.

    BEYOND the reference: epgpy's X operator has no derivatives at
    all; here per-voxel qMT Gauss-Newton fits (bound-pool fraction,
    free-pool T2, exchange rate, ...) over arbitrary MT-prepped
    schedules run as one VMEM-resident pass.

    Args:
        alpha .. taus-less prefix: as :func:`xcomposite_pallas`.
        dens: (C, B) per-atom equilibrium densities (or (C,) shared).
        mats: ``(mr, mi, ml)`` distinct-tau tables, each
            (nmat, B, C, C) -- from :func:`xcomposite_stage_mat_tables`.
        dmats: per-variable tangent tables, each element a 3-tuple of
            (nmat, B, C, C) (jax.jvp of the table build).
        ddens: per-variable density tangents, (V, C, B) (zeros when
            the variable does not move the equilibrium).
        b1: optional (B,) flip scale.

    Returns ``(re, im)``: (nadc, G, C, B) float32 with G = 1 + nvar
    (primal first, then one tangent column per variable).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    alpha = jnp.asarray(alpha, f32)
    N, C = alpha.shape
    CC = C * C
    mr0 = jnp.asarray(mats[0], f32)
    nmat, B = mr0.shape[0], mr0.shape[1]
    nvar = len(dmats)
    G = nvar + 1
    MB = -(-3 * CC // 8) * 8      # 8-aligned per-mat block rows

    # explicit VMEM guard (this entry point is model-level, with no
    # engine dispatch gate in front of it): 6CG persistent planes +
    # double-buffered output windows + the streamed per-tile input
    # blocks -- the (G*nmat*MB, btile) coefficient-table slab and the
    # (G*C, btile) density rows, both double-buffered (ADVICE r4:
    # omitting them let a large C/nmat/nvar config pass the guard yet
    # still hit the opaque Mosaic allocation failure) -- must fit with
    # headroom
    persist = 4 * 6 * C * G * (nstate + 1) * btile
    outwin = 2 * 2 * C * G * nadc * btile * 4
    inwin = 2 * 4 * (G * nmat * MB + G * C + 2) * btile
    if persist + outwin + inwin > 80 * 1024 * 1024:
        raise ValueError(
            f"xcomposite_jacobian_pallas VMEM budget exceeded: "
            f"{(persist + outwin + inwin) / 2**20:.0f} MiB of planes+"
            f"windows+table blocks (C={C}, vars={nvar}, "
            f"nstate={nstate}, nadc={nadc}, nmat={nmat}, "
            f"btile={btile}); reduce nstate/btile or fit fewer "
            f"variables per pass")

    Bp = -(-B // btile) * btile

    def padb(x, fill=0.0):
        x = jnp.asarray(x, f32)
        if Bp > B:
            pad = jnp.full(x.shape[:1] + (Bp - B,) + x.shape[2:], fill,
                           f32)
            x = jnp.concatenate([x, pad], axis=1)
        return x

    def pack_tables(tabs, identity=False):
        mr, mi, ml = (jnp.asarray(t, f32) for t in tabs)
        if Bp > B:
            eye = (jnp.eye(C, dtype=f32) if identity
                   else jnp.zeros((C, C), f32))
            padm = jnp.broadcast_to(eye, (nmat, Bp - B, C, C))
            mr = jnp.concatenate([mr, padm], axis=1)
            mi = jnp.concatenate([mi, jnp.zeros_like(padm)], axis=1)
            ml = jnp.concatenate([ml, padm], axis=1)

        # rows per mat: [part0 CC rows, part1, part2] -> regroup
        def rows(t):
            # (nmat, Bp, C, C) -> per-mat (CC, Bp) blocks
            return jnp.moveaxis(t, 1, -1).reshape(nmat, CC, Bp)
        r_, i_, l_ = rows(mr), rows(mi), rows(ml)
        # concat parts per mat + pad each block to MB rows (8-aligned
        # dynamic-slice starts in the kernel): (nmat*MB, Bp)
        blk = jnp.concatenate([r_, i_, l_], axis=1)
        if MB > 3 * CC:
            blk = jnp.concatenate(
                [blk, jnp.zeros((nmat, MB - 3 * CC, Bp), f32)], axis=1)
        return blk.reshape(nmat * MB, Bp)

    coef = jnp.concatenate(
        [pack_tables(mats, identity=True)]
        + [pack_tables(dt) for dt in dmats], axis=0)

    dens = jnp.asarray(dens, f32)
    if dens.ndim == 1:
        dens = jnp.broadcast_to(dens[:, None], (C, B))
    dens_rows = [padb(dens, 1.0)]
    for v in range(nvar):
        dens_rows.append(padb(jnp.broadcast_to(
            jnp.asarray(ddens[v], f32), (C, B))))
    dens_all = jnp.concatenate(dens_rows, axis=0)        # (G*C, Bp)

    b1 = jnp.ones(B, f32) if b1 is None else jnp.asarray(b1, f32)
    if Bp > B:
        b1 = jnp.concatenate([b1, jnp.ones(Bp - B, f32)])

    row = lambda x: jnp.asarray(x, f32).reshape(1, N)
    irow = lambda x: jnp.asarray(x, jnp.int32).reshape(1, N)
    nc = lambda x: jnp.broadcast_to(jnp.asarray(x, f32), (N, C))
    b1u_row = (jnp.ones((1, N), f32) if b1u is None
               else jnp.asarray(b1u, f32).reshape(1, N))
    inputs = [
        nc(alpha), nc(phi), nc(satf_re), nc(satf_im), nc(satz_re),
        nc(satz_im), irow(adci), irow(shift), row(aph), irow(mia),
        irow(mib), b1u_row, dens_all, b1.reshape(1, Bp), coef,
    ]
    kernel = partial(_kernel_xcomp_jac, nstages=N, nstate=nstate,
                     ncomp=C, nmat=nmat, nvar=nvar, has_up=has_up,
                     has_down=has_down, has_adcph=has_adcph,
                     has_sat=has_sat, has_b1u=has_b1u)
    nout = 2 * C * G
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 12 + [
            pl.BlockSpec((G * C, btile), lambda b: (0, b)),      # dens
            pl.BlockSpec((1, btile), lambda b: (0, b)),          # b1
            pl.BlockSpec((G * nmat * MB, btile), lambda b: (0, b)),
        ],
        out_specs=[pl.BlockSpec((nadc, btile), lambda b: (0, b))] * nout,
        out_shape=[jax.ShapeDtypeStruct((nadc, Bp), f32)] * nout,
        scratch_shapes=[pltpu.VMEM((6 * C * G, nstate + 1, btile), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    re = jnp.stack([jnp.stack([outs[2 * (g * C + c)][:, :B]
                               for c in range(C)], axis=1)
                    for g in range(G)], axis=1)       # (nadc, G, C, B)
    im = jnp.stack([jnp.stack([outs[2 * (g * C + c) + 1][:, :B]
                               for c in range(C)], axis=1)
                    for g in range(G)], axis=1)
    return re, im
