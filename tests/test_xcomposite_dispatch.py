"""Composite EPG-X stage trains -> fused kernel (match_xcomposite).

MT-/exchange-prepared segmented schedules -- saturation prep blocks,
IR-MT inversions, recovery delays between readout segments -- break
the per-TR periodicity match_xgre requires; the composite-X family
folds them into per-stage SMEM rows + a distinct-tau stage-matrix
table.  Oracle: the f64 scan planner (itself golden-pinned for X in
tests/test_exchange_ops.py / test_xgre_dispatch.py).
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch


def _pools(B=4, C=2):
    dens = np.asarray([0.85, 0.15][:C])
    dens = dens / dens.sum()
    khi = epg.exchange_matrix(0.005, ncomp=C, densities=dens)
    T2f = np.linspace(40.0, 120.0, B)
    T2 = np.stack([T2f] + [np.full(B, 0.012 * (c + 1))
                           for c in range(C - 1)], axis=0)
    T1 = np.linspace(800.0, 1200.0, C)
    return dens, khi, T1, T2


def _mt_prep_train(nseg=3, nread=5, B=4, *, balanced=False, ir=False,
                   seed=11):
    """Segmented MT-GRE: per segment an off-resonant saturation block
    (R on the bound pool + recovery X), nread spoiled readouts, and an
    inter-segment recovery delay -- the structure match_xgre rejects."""
    dens, khi, T1, T2 = _pools(B)
    C = 2
    rng = np.random.default_rng(seed)
    Xte = epg.X(3.0, khi, axis=0, T1=T1, T2=T2)
    Xtr = epg.X(7.0, khi, axis=0, T1=T1, T2=T2)
    Xrec = epg.X(120.0, khi, axis=0, T1=T1, T2=T2)
    seq = []
    for s in range(nseg):
        if ir:
            seq += [epg.T(np.asarray([180.0, 0.0]), 0.0), Xrec]
        else:
            # MT saturation: raw bound-pool rate, then recovery
            seq += [epg.R(0, rL=np.asarray([0.0, 0.3 + 0.05 * s]),
                          r0=None), Xrec]
        for i in range(nread):
            seq += [epg.T(np.asarray([float(rng.uniform(8, 15)), 0.0]),
                          0.0), Xte, epg.ADC, Xtr]
            if not balanced:
                seq.append(epg.S(1))
        seq += [Xrec]
    return seq, dens


def _parity(seq, dens, *, max_nstate=5, tol=2e-6, shape=None):
    # guard: the fused path must actually ENGAGE (a non-match would
    # make force-vs-planner parity trivially true)
    if shape is not None:
        assert fisp_dispatch.match_xcomposite(
            list(seq), shape, list(dens)) is not None
    kw = dict(max_nstate=max_nstate, density=list(dens))
    ref = np.asarray(epg.simulate(list(seq), fisp_kernel=False, **kw))
    out = np.asarray(epg.simulate(list(seq), fisp_kernel="force", **kw))
    assert out.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-12)
    err = np.abs(out - ref).max() / scale
    assert err < tol, err
    return ref


def test_match_extracts_params():
    seq, dens = _mt_prep_train()
    shape = (2, 4)
    params = fisp_dispatch.match_xcomposite(list(seq), shape,
                                            list(dens))
    assert params is not None
    assert params["C"] == 2
    assert params["nadc"] == 15
    # distinct taus: 0 (identity), 120 (recovery), 3 (te), 7 (tr-te)
    assert sorted(params["taus"]) == [0.0, 3.0, 7.0, 120.0]
    assert params["has_sat"]
    # the exact-pattern xgre matcher must REJECT this train
    assert fisp_dispatch.match_xgre(list(seq), shape,
                                    list(dens)) is None


def test_mt_prep_parity():
    seq, dens = _mt_prep_train(nseg=3, nread=5, B=4)
    _parity(seq, dens, shape=(2, 4))


def test_ir_mt_parity():
    """IR-MT: the inversion flips the free pool only (per-compartment
    alpha [180, 0]); recovery through exchange during TI."""
    seq, dens = _mt_prep_train(nseg=2, nread=6, B=3, ir=True)
    _parity(seq, dens, shape=(2, 3))


def test_balanced_mt_prep_parity():
    """Shiftless (balanced) prepared train: whole ladder at k=0."""
    seq, dens = _mt_prep_train(nseg=2, nread=5, B=3, balanced=True)
    _parity(seq, dens, max_nstate=1, shape=(2, 3))


def test_sat_effect_is_real():
    """The saturation stages must change the signal (guard against a
    silently ignored has_sat path)."""
    seq, dens = _mt_prep_train(nseg=2, nread=5, B=3)
    nosat = [op for op in seq if not isinstance(op, type(epg.R(0)))]
    kw = dict(max_nstate=5, density=list(dens))
    a = np.asarray(epg.simulate(list(seq), fisp_kernel="force", **kw))
    b = np.asarray(epg.simulate(list(nosat), fisp_kernel="force", **kw))
    assert np.abs(a - b).max() > 1e-4


@pytest.mark.parametrize("mutate", [
    "mixed_generator",    # X ops with different khi leaves
    "weights_adc",        # exotic probe
    "batched_tau",        # non-scalar tau
])
def test_fall_through(mutate):
    seq, dens = _mt_prep_train(nseg=2, nread=4, B=3)
    shape = (2, 3)
    if mutate == "mixed_generator":
        _, khi2, T1, T2 = _pools(3)
        khi2 = epg.exchange_matrix(0.004, ncomp=2,
                                   densities=list(dens))
        i = next(j for j, op in enumerate(seq) if type(op) is epg.X)
        x = seq[i]
        seq[i] = epg.X(float(np.asarray(x.tau)), khi2, axis=0,
                       T1=np.asarray([800.0, 1200.0]), T2=x.T2)
    elif mutate == "weights_adc":
        i = next(j for j, op in enumerate(seq)
                 if isinstance(op, epg.Adc))
        seq[i] = epg.Adc(attr="Z0")
    elif mutate == "batched_tau":
        i = next(j for j, op in enumerate(seq) if type(op) is epg.X)
        x = seq[i]
        seq[i] = epg.X(np.asarray([3.0, 3.0]), x.khi, axis=0,
                       T1=x.T1, T2=x.T2)
        assert fisp_dispatch.match_xcomposite(list(seq), shape,
                                              list(dens)) is None
        return      # batched tau also trips the planner shape checks
    assert fisp_dispatch.match_xcomposite(list(seq), shape,
                                          list(dens)) is None
    # and the planner still handles the rejected train
    _ = np.asarray(epg.simulate(list(seq), fisp_kernel=False,
                                max_nstate=4, density=list(dens)))


def test_exact_xgre_still_wins():
    """A canonical per-TR EPG-X train keeps routing through the
    exact-pattern xgre family (dispatch priority), and the composite-X
    matcher agrees with it."""
    dens, khi, T1, T2 = _pools(3)
    X2 = epg.X(10.0, khi, axis=0, T1=T1, T2=T2)
    seq = []
    for i in range(6):
        seq += [epg.T(np.asarray([12.0, 0.0]), 0.0), epg.ADC, X2,
                epg.S(1)]
    shape = (2, 3)
    assert fisp_dispatch.match_xgre(list(seq), shape,
                                    list(dens)) is not None
    assert fisp_dispatch.match_xcomposite(list(seq), shape,
                                          list(dens)) is not None
    _parity(seq, dens)


def test_xcomposite_jacobian_fd():
    """Fused composite-X Jacobian (xcomposite_jacobian_pallas) vs f64
    planner finite differences, for per-atom free-pool T2 and the
    global exchange rate k.  BEYOND the reference: epgpy's X operator
    has no derivatives at all.  Variables enter only through the
    distinct-tau stage-matrix tables (tangents via jax.jvp of the
    table build -- the xgre_jacobian contract)."""
    import jax
    import jax.numpy as jnp
    from epgpy_tpu.models.pallas_xcomposite import (
        xcomposite_jacobian_pallas, xcomposite_stage_mat_tables)

    B = 5
    seq, dens = _mt_prep_train(nseg=2, nread=4, B=B)
    shape = (2, B)
    params = fisp_dispatch.match_xcomposite(list(seq), shape,
                                            list(dens))
    assert params is not None
    taus = params["taus"]
    T1c = np.asarray([800.0, 1200.0])
    T2f0 = np.linspace(40.0, 120.0, B)
    k0 = 0.005
    d = np.asarray(dens)
    kron = np.asarray([[1.0, -1.0], [-1.0, 1.0]]) / d   # col j / dens_j

    def tables(t2f, k):
        khi = k * jnp.asarray(kron)
        T2 = jnp.stack([jnp.asarray(t2f),
                        jnp.full((B,), 0.012)])
        T1m = jnp.broadcast_to(jnp.asarray(T1c)[:, None], (2, B))
        return xcomposite_stage_mat_tables(khi, T1m, T2, None, taus)

    mats = jax.jit(lambda: tables(T2f0, k0))()
    _, dm_t2 = jax.jvp(lambda t: tables(t, k0),
                       (jnp.asarray(T2f0, jnp.float32),),
                       (jnp.ones(B, jnp.float32),))
    _, dm_k = jax.jvp(lambda k: tables(T2f0, k),
                      (jnp.float32(k0),), (jnp.float32(1.0),))
    zeros_d = np.zeros((2, B), np.float32)

    args = (params["alpha"], params["phi"], params["satf_re"],
            params["satf_im"], params["satz_re"], params["satz_im"],
            params["adci"], params["shift"], params["aph"],
            params["mia"], params["mib"])
    kw = dict(nadc=int(params["nadc"]), nstate=5, btile=64,
              interpret=True, has_up=True, has_down=False,
              has_adcph=False, has_sat=bool(params["has_sat"]))
    re, im = xcomposite_jacobian_pallas(
        *args, d, mats, [dm_t2, dm_k], [zeros_d, zeros_d], **kw)
    assert re.shape == (params["nadc"], 3, 2, B)

    # oracle: f64 planner finite differences over the SAME op train
    def planner(t2f, k):
        khi = (np.zeros((2, 2)) if k == 0 else k * kron)
        T2 = np.stack([np.asarray(t2f, float), np.full(B, 0.012)])
        T1 = T1c
        Xte = epg.X(3.0, khi, axis=0, T1=T1, T2=T2)
        Xtr = epg.X(7.0, khi, axis=0, T1=T1, T2=T2)
        Xrec = epg.X(120.0, khi, axis=0, T1=T1, T2=T2)
        rng = np.random.default_rng(11)
        s2 = []
        for s in range(2):
            s2 += [epg.R(0, rL=np.asarray([0.0, 0.3 + 0.05 * s]),
                         r0=None), Xrec]
            for i in range(4):
                s2 += [epg.T(np.asarray([float(rng.uniform(8, 15)),
                                         0.0]), 0.0), Xte, epg.ADC,
                       Xtr, epg.S(1)]
            s2 += [Xrec]
        return np.asarray(epg.simulate(s2, max_nstate=5,
                                       density=list(dens),
                                       fisp_kernel=False))

    base = planner(T2f0, k0)
    prim = np.asarray(re[:, 0]) + 1j * np.asarray(im[:, 0])
    assert np.abs(prim - base).max() < 2e-6

    h = 1e-2
    fd_t2 = (planner(T2f0 + h, k0) - planner(T2f0 - h, k0)) / (2 * h)
    got_t2 = np.asarray(re[:, 1]) + 1j * np.asarray(im[:, 1])
    scale = max(np.abs(fd_t2).max(), 1e-12)
    assert np.abs(got_t2 - fd_t2).max() / scale < 2e-2, (
        np.abs(got_t2 - fd_t2).max() / scale)

    hk = 2e-4
    fd_k = (planner(T2f0, k0 + hk) - planner(T2f0, k0 - hk)) / (2 * hk)
    got_k = np.asarray(re[:, 2]) + 1j * np.asarray(im[:, 2])
    scale = max(np.abs(fd_k).max(), 1e-12)
    assert np.abs(got_k - fd_k).max() / scale < 2e-2, (
        np.abs(got_k - fd_k).max() / scale)


def test_rank1_b1_flip_batch():
    """B1-corrected MT train: every pulse's free-pool flip scales with
    a per-atom B1 row (rank-1 ``outer(alpha_c, B1)``); the matcher
    factors it and the kernel applies the per-atom scale."""
    B = 4
    dens, khi, T1, T2 = _pools(B)
    B1 = np.linspace(0.85, 1.15, B)
    Xte = epg.X(3.0, khi, axis=0, T1=T1, T2=T2)
    Xtr = epg.X(7.0, khi, axis=0, T1=T1, T2=T2)
    Xrec = epg.X(120.0, khi, axis=0, T1=T1, T2=T2)
    rng = np.random.default_rng(2)
    seq = []
    for s in range(2):
        seq += [epg.R(0, rL=np.asarray([0.0, 0.3]), r0=None), Xrec]
        for i in range(4):
            fa = float(rng.uniform(8, 15))
            alpha = np.stack([fa * B1, np.zeros(B)])   # (C, B)
            seq += [epg.T(alpha, 0.0), Xte, epg.ADC, Xtr, epg.S(1)]
        seq += [Xrec]
    shape = (2, B)
    params = fisp_dispatch.match_xcomposite(list(seq), shape,
                                            list(dens))
    assert params is not None and params["B1"] is not None
    _parity(seq, dens, shape=shape)

    # NON-rank-1 flips (independent per-atom rows) must fall through
    seq2 = list(seq)
    i = next(j for j, op in enumerate(seq2) if type(op) is epg.T
             and np.asarray(op.alpha).size > 2)
    bad = np.stack([np.asarray([9.0, 11.0, 8.0, 14.0]), np.zeros(B)])
    seq2[i] = epg.T(bad, 0.0)
    assert fisp_dispatch.match_xcomposite(list(seq2), shape,
                                          list(dens)) is None


def test_adiabatic_prep_with_b1_batched_readout():
    """r5 (ADVICE r4 closed): scalar adiabatic 180 inversions bypass
    B1 (b1u=0) while the readout pulses carry a per-atom B1 batch --
    previously the joint rank-1 factorization failed and the train
    fell to the planner."""
    B = 4
    dens, khi, T1, T2 = _pools(B)
    rng = np.random.default_rng(5)
    B1 = np.linspace(0.85, 1.15, B)
    Xte = epg.X(3.0, khi, axis=0, T1=T1, T2=T2)
    Xtr = epg.X(7.0, khi, axis=0, T1=T1, T2=T2)
    Xrec = epg.X(120.0, khi, axis=0, T1=T1, T2=T2)
    seq = []
    for s in range(2):
        # scalar per-compartment adiabatic inversion (no B1 batch)
        seq += [epg.T(np.asarray([180.0, 0.0]), 0.0), Xrec]
        for i in range(5):
            fa = float(rng.uniform(8, 15))
            # (C, B) flips: free pool B1-scaled, bound pool untouched
            al = np.stack([fa * B1, np.zeros(B)], axis=0)
            seq += [epg.T(al, 0.0), Xte, epg.ADC, Xtr, epg.S(1)]
        seq += [Xrec]
    params = fisp_dispatch.match_xcomposite(list(seq), (2, B),
                                            list(dens))
    assert params is not None
    b1u = np.asarray(params["b1u"])
    assert (b1u == 0.0).sum() >= 2      # the two adiabatic stages
    assert params["B1"] is not None
    _parity(seq, dens, shape=(2, B))


def test_all_scalar_train_keeps_b1u_ones():
    """Scalar-only trains must not regress: b1u stays all-ones and the
    kernel's has_b1u path stays off."""
    seq, dens = _mt_prep_train(nseg=2, nread=4, B=3)
    params = fisp_dispatch.match_xcomposite(list(seq), (2, 3),
                                            list(dens))
    assert params is not None
    assert np.all(np.asarray(params["b1u"]) == 1.0)
