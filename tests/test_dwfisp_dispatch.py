"""DW-FISP train -> fused Pallas kernel dispatch (match_dwfisp).

Diffusion-weighted FISP: [T, E, ADC, E, S(1), D] per TR with ONE D op
instance reused across the train (its device-resident Dcoef never
transfers host-side).  The kernel applies per-row Stejskal-Tanner
attenuation post-shift; `kvalue` sets physical b-values.
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch

KV = 2 * np.pi / 1e-3  # 1 mm voxel: 6283 rad/m per state index


def _dwtrain(P=16, B=3, *, D=1e-3, dkw=dict(k=1), tau=7.0, prep=None,
             d_per_tr=False):
    rng = np.random.default_rng(4)
    FA = 10 + 50 * np.abs(np.sin(np.arange(P) / 5.0))
    T1 = np.linspace(600, 1500, B)
    T2 = np.linspace(50, 120, B)
    d_op = epg.D(tau, D, **dkw)
    seq = []
    if prep is not None:
        seq += [epg.T(180, 0), epg.E(float(prep), T1, T2)]
    for i in range(P):
        seq += [epg.T(float(FA[i]), 90.0),
                epg.E(5.0, T1, T2), epg.ADC,
                epg.E(7.0 + (i % 2), T1, T2), epg.S(1),
                epg.D(tau, D, **dkw) if d_per_tr else d_op]
    return seq


def _parity(seq, tol=2e-5, kvalue=KV):
    sig_k = epg.simulate(list(seq), max_nstate=8, kvalue=kvalue,
                         fisp_kernel="force")
    sig_e = epg.simulate(list(seq), max_nstate=8, kvalue=kvalue,
                         fisp_kernel=False)
    assert sig_k.shape == sig_e.shape
    err = np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max()
    assert err < tol, err
    return np.asarray(sig_k)


def test_match_extracts_params():
    seq = _dwtrain(P=16, B=3, prep=15.0)
    params = fisp_dispatch.match_dwfisp(seq, KV)
    assert params is not None
    assert params["diffusion"]["ramp"] is True
    b = params["diffusion"]["bT"]
    assert np.isclose(b, 7.0e-3 * (KV * 1e-3) ** 2)
    assert params["TI"] == 15.0


def test_dispatch_matches_planner_ramp():
    sig = _parity(_dwtrain(P=16, B=3))
    # diffusion actually attenuates vs the D-free train
    free = np.asarray(epg.simulate(
        [op for op in _dwtrain(P=16, B=3) if not isinstance(op, epg.D)],
        max_nstate=8, fisp_kernel=False))
    assert np.abs(sig)[8:].max() < np.abs(free)[8:].max()


def test_dispatch_matches_planner_const_k():
    _parity(_dwtrain(P=16, B=3, dkw=dict()))


def test_dispatch_matches_planner_tensor():
    Dt = np.diag([1.2e-3, 0.4e-3, 0.2e-3])
    _parity(_dwtrain(P=14, B=3, D=Dt))


def test_dispatch_matches_planner_prep():
    _parity(_dwtrain(P=14, B=4, prep=18.0))


def test_plain_fisp_dispatches_with_kvalue():
    """kvalue != 1 no longer blocks the (kvalue-independent) FISP
    dispatch."""
    T1, T2 = np.array([900.0]), np.array([70.0])
    seq = []
    for i in range(12):
        seq += [epg.T(25 + i, 90), epg.E(4.0, T1, T2), epg.ADC,
                epg.E(8.0, T1, T2), epg.S(1)]
    sig_k = epg.simulate(list(seq), kvalue=123.0, fisp_kernel="force")
    sig_e = epg.simulate(list(seq), kvalue=123.0, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5


@pytest.mark.parametrize("mutate", [
    "per_tr_instances",    # fresh D op each TR (same values)
    "traced_tau",          # tau as an array
    "k2",                  # D at k=2 after S(1)
    "short",
])
def test_no_match_off_pattern(mutate):
    if mutate == "per_tr_instances":
        seq = _dwtrain(P=8, B=2, d_per_tr=True)
    elif mutate == "traced_tau":
        seq = _dwtrain(P=8, B=2, dkw=dict(k=1), tau=np.array([7.0, 7.0]))
    elif mutate == "k2":
        seq = _dwtrain(P=8, B=2, dkw=dict(k=2))
    else:
        seq = _dwtrain(P=1, B=2)
    assert fisp_dispatch.match_dwfisp(list(seq), KV) is None
    sig_k = epg.simulate(list(seq), max_nstate=6, kvalue=KV,
                         fisp_kernel="force")
    sig_e = epg.simulate(list(seq), max_nstate=6, kvalue=KV,
                         fisp_kernel=False)
    # r4: the generic composite family may legitimately claim some of
    # these trains (its D stages cover equal-value per-TR instances) --
    # then parity holds at f32 kernel tolerance, else bit-level
    tol = (2e-5 if fisp_dispatch.match_composite(list(seq), KV)
           is not None else 1e-10)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < tol


def test_fuzz_parity_or_fallthrough():
    rng = np.random.default_rng(17)
    for trial in range(6):
        P = int(rng.integers(2, 7))
        B = int(rng.integers(1, 4))
        T1 = rng.uniform(400, 1600, B)
        T2 = rng.uniform(40, 130, B)
        Dv = float(rng.uniform(0.2e-3, 2.5e-3))
        tau = float(rng.uniform(3, 9))
        ramp = bool(rng.random() < 0.5)
        d_op = epg.D(tau, Dv, k=1) if ramp else epg.D(tau, Dv)
        kv = float(rng.uniform(500, 8000))
        seq = []
        for i in range(P):
            seq += [epg.T(float(rng.uniform(10, 60)), 90.0),
                    epg.E(float(rng.uniform(2, 6)), T1, T2), epg.ADC,
                    epg.E(float(rng.uniform(4, 10)), T1, T2),
                    epg.S(1), d_op]
        if rng.random() < 0.3:
            seq.insert(int(rng.integers(0, len(seq))), epg.S(1))
        sig_k = epg.simulate(list(seq), max_nstate=6, kvalue=kv,
                             fisp_kernel="force")
        sig_e = epg.simulate(list(seq), max_nstate=6, kvalue=kv,
                             fisp_kernel=False)
        matched = (fisp_dispatch.match_dwfisp(list(seq), kv) is not None
                   or fisp_dispatch.match_composite(list(seq), kv) is not None)
        tol = 2e-5 if matched else 1e-10
        err = np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max()
        assert err < tol, (trial, matched, err)


def test_traced_d_leaves_fall_through():
    """D built under a trace (kshift / Dcoef are Tracers): the matcher
    must return None (planner handles traced leaves), never crash with
    TracerArrayConversionError or leak the Tracer through the cache."""
    import jax
    import jax.numpy as jnp

    got = {}

    def probe(kval, dval):
        seq = []
        d_op = epg.D(7.0, dval, k=kval)
        for i in range(4):
            seq += [epg.T(30.0, 90.0), epg.E(5.0, 800.0, 80.0), epg.ADC,
                    epg.E(7.0, 800.0, 80.0), epg.S(1), d_op]
        got["m"] = fisp_dispatch.match_dwfisp(seq, KV)
        return jnp.zeros(())

    jax.make_jaxpr(probe)(jnp.ones((1, 1)), jnp.ones(()))
    assert got["m"] is None


def test_sharded_dictionary_per_atom_diffusion():
    """A per-atom diffusion coefficient must shard WITH the atoms
    through fisp_dictionary_pallas_sharded (was: replicated closure
    constant -> broadcast shape mismatch inside each shard)."""
    import jax
    from jax.sharding import Mesh
    from epgpy_tpu.models.pallas_fisp import (
        fisp_dictionary_pallas, fisp_dictionary_pallas_sharded)

    devs = np.asarray(jax.devices("cpu")[:8])
    mesh = Mesh(devs, ("atoms",))
    B = 16
    T1 = np.linspace(600, 1500, B)
    T2 = np.linspace(50, 120, B)
    B1 = np.ones(B)
    Dc = np.linspace(0.5e-3, 2e-3, B)          # per-atom ADC
    FA = 10 + 30 * np.abs(np.sin(np.arange(12) / 3.0))
    diff = (2e-3, 2e-3, Dc)
    kw = dict(nstate=4, btile=128, interpret=True)
    re0, im0 = fisp_dictionary_pallas(FA, 90.0, 12.0, 5.0, T1, T2, B1,
                                      diffusion=diff, **kw)
    re1, im1 = fisp_dictionary_pallas_sharded(
        FA, 90.0, 12.0, 5.0, T1, T2, B1, mesh=mesh, diffusion=diff, **kw)
    assert np.array_equal(np.asarray(re0), np.asarray(re1))
    assert np.array_equal(np.asarray(im0), np.asarray(im1))

    # same plumbing for the Jacobian sibling (incl. the dD column)
    from epgpy_tpu.models.pallas_fisp import (
        fisp_jacobian_pallas, fisp_jacobian_pallas_sharded)

    (jr0, ji0), (dr0, di0) = fisp_jacobian_pallas(
        FA, 90.0, 12.0, 5.0, T1, T2, B1, diffusion=diff,
        track_diffusivity=True, **kw)
    (jr1, ji1), (dr1, di1) = fisp_jacobian_pallas_sharded(
        FA, 90.0, 12.0, 5.0, T1, T2, B1, mesh=mesh, diffusion=diff,
        track_diffusivity=True, **kw)
    assert np.array_equal(np.asarray(jr0), np.asarray(jr1))
    assert np.array_equal(np.asarray(dr0), np.asarray(dr1))
    assert np.array_equal(np.asarray(di0), np.asarray(di1))


def test_dw_jacobian_kernel_matches_planner_and_fd():
    """fisp_jacobian_pallas(diffusion=, track_diffusivity=True):
    (dT1, dT2, dB1) columns vs the f64 planner on the DW train (the
    attenuation is parameter-independent for those), the dD column vs
    central finite differences of the planner primal (the D op takes
    only scalar/tensor D -- reference semantics -- so per-atom D is
    checked by kernel self-consistency)."""
    from epgpy_tpu.models.pallas_fisp import fisp_jacobian_pallas

    P, B, NS = 12, 4, 6
    rng = np.random.default_rng(29)
    FA = rng.uniform(10, 50, P)
    T1 = rng.uniform(500, 1800, B)
    T2 = rng.uniform(40, 150, B)
    B1 = rng.uniform(0.85, 1.15, B)
    Dv = 1.2e-3
    tau = 7.0
    bT = tau * 1e-3 * (KV * 1e-3) ** 2
    bL = bT

    def train(D, order1=None):
        seq = []
        for i in range(P):
            seq += [epg.T(FA[i] * B1, 90.0,
                          order1=(None if order1 is None else
                                  {"B1": {"alpha": float(FA[i])}})),
                    epg.E(5.0, T1, T2, order1=order1), epg.ADC,
                    epg.E(7.0, T1, T2, order1=order1), epg.S(1),
                    epg.D(tau, D, k=1)]
        return seq

    o1 = ["T1", "T2"]
    sig, jac = epg.simulate(
        train(Dv, o1), max_nstate=NS, kvalue=KV, fisp_kernel=False,
        probe=[epg.ADC, epg.Jacobian(["T1", "T2", "B1"])])
    sig = np.asarray(sig)
    jac = np.asarray(jac)

    Dc = np.full(B, Dv)
    (re, im), (dre, dim) = fisp_jacobian_pallas(
        FA, 90.0, 12.0, 5.0, T1, T2, B1, nstate=NS, btile=128,
        pchunk=P, diffusion=(bT, bL, Dc), track_diffusivity=True,
        interpret=True)
    k = (np.asarray(re) + 1j * np.asarray(im)).T
    assert np.abs(k - sig).max() < 2e-5
    kj = np.moveaxis(np.asarray(dre) + 1j * np.asarray(dim), 0, 1)
    scale = np.array([1e3, 1e2, 1.0])
    err = np.abs((kj[..., :3] - jac) * scale).max()
    assert err < 2e-4, err

    # dD column vs central FD of the f64 planner primal (scalar D)
    h = 1e-6
    up = np.asarray(epg.simulate(train(Dv + h), max_nstate=NS,
                                 kvalue=KV, fisp_kernel=False))
    dn = np.asarray(epg.simulate(train(Dv - h), max_nstate=NS,
                                 kvalue=KV, fisp_kernel=False))
    fd = (up - dn) / (2 * h)                     # (P, B)
    errd = np.abs(kj[..., 3] - fd).max() / max(np.abs(fd).max(), 1e-30)
    assert errd < 1e-3, errd

    # per-atom D self-consistency: mixed-D columns == the matching
    # columns of two uniform-D runs
    d2 = 2.1e-3
    mixed = np.array([Dv, d2, Dv, d2])
    out_m = fisp_jacobian_pallas(
        FA, 90.0, 12.0, 5.0, T1, T2, B1, nstate=NS, btile=128,
        pchunk=P, diffusion=(bT, bL, mixed), track_diffusivity=True,
        interpret=True)
    out_2 = fisp_jacobian_pallas(
        FA, 90.0, 12.0, 5.0, T1, T2, B1, nstate=NS, btile=128,
        pchunk=P, diffusion=(bT, bL, np.full(B, d2)),
        track_diffusivity=True, interpret=True)
    for part in range(2):
        a = np.asarray(out_m[1][part])           # (B, P, 4)
        u1 = np.asarray((dre, dim)[part])
        u2 = np.asarray(out_2[1][part])
        assert np.array_equal(a[0], u1[0]) and np.array_equal(a[2], u1[2])
        assert np.array_equal(a[1], u2[1]) and np.array_equal(a[3], u2[3])


def test_dw_jacobian_dispatch_parity():
    """simulate() routes tracked DW-FISP trains with Adc/Jacobian
    probes to the fused kernel; force-vs-planner parity over the
    (magnitude, T1, T2) columns."""
    P, B, NS = 10, 3, 6
    rng = np.random.default_rng(41)
    FA = rng.uniform(10, 50, P)
    T1 = rng.uniform(500, 1600, B)
    T2 = rng.uniform(40, 130, B)
    d_op = epg.D(7.0, 1.1e-3, k=1)
    o1 = ["T1", "T2"]
    seq = []
    for i in range(P):
        seq += [epg.T(float(FA[i]), 90.0),
                epg.E(5.0, T1, T2, order1=o1), epg.ADC,
                epg.E(7.0, T1, T2, order1=o1), epg.S(1), d_op]
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    sig_k, jac_k = epg.simulate(list(seq), max_nstate=NS, kvalue=KV,
                                probe=probes, fisp_kernel="force")
    sig_e, jac_e = epg.simulate(list(seq), max_nstate=NS, kvalue=KV,
                                probe=probes, fisp_kernel=False)
    assert sig_k.shape == sig_e.shape == (P, B)
    assert jac_k.shape == jac_e.shape == (P, B, 3)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5
    scale = np.array([1.0, 1e3, 1e2])
    err = np.abs((np.asarray(jac_k) - np.asarray(jac_e)) * scale).max()
    assert err < 2e-4, err
