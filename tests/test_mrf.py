"""MRF dictionary model tests: parity with the generic engine and golden."""

import os

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu.models import mrf

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_fisp_matches_engine_golden():
    """Direct scan model == reference golden (generated with max_nstate=10)."""
    path = os.path.join(GOLDEN, "fisp_mrf.npz")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    g = np.load(path)
    FAs, T1s, T2s = g["FAs"], g["T1s"], g["T2s"]
    re, im = mrf.fisp_mrf_dictionary(
        FAs, 12.0, 5.0, T1s, T2s, nstate=10, phi=90.0)
    sig = np.asarray(re) + 1j * np.asarray(im)
    # golden layout: (P, natoms); ours: (natoms, P)
    assert np.abs(sig.T - g["signal"]).max() < 1e-10


def test_fisp_b1_and_inversion():
    FAs = np.full(32, 30.0)
    TI, T1 = 20.0, 800.0
    re, im = mrf.fisp_mrf_dictionary(
        FAs, 12.0, 5.0, [T1], [60.0], [1.0], nstate=5, inversion=TI)
    sig = np.asarray(re)[0] + 1j * np.asarray(im)[0]
    re2, im2 = mrf.fisp_mrf_dictionary(
        FAs, 12.0, 5.0, [T1], [60.0], [1.0], nstate=5)
    sig2 = np.asarray(re2)[0] + 1j * np.asarray(im2)[0]
    # perfect inversion: Z0 = 1 - 2 e^{-TI/T1}; first echo scales by it
    z = 1 - 2 * np.exp(-TI / T1)
    assert np.allclose(sig[0], z * sig2[0], atol=1e-10)
    # B1 scales the effective flip angle
    re3, im3 = mrf.fisp_mrf_dictionary(
        FAs / 2, 12.0, 5.0, [T1], [60.0], nstate=5)
    re4, im4 = mrf.fisp_mrf_dictionary(
        FAs, 12.0, 5.0, [T1], [60.0], [0.5], nstate=5)
    assert np.abs(np.asarray(re3) - np.asarray(re4)).max() < 1e-12


def test_fisp_demodulate():
    FAs = np.full(8, 40.0)
    r1, i1 = mrf.fisp_mrf_dictionary(FAs, 12.0, 5.0, [800.0], [60.0],
                                     nstate=4, phi=90.0, demodulate=True)
    r2, i2 = mrf.fisp_mrf_dictionary(FAs, 12.0, 5.0, [800.0], [60.0],
                                     nstate=4, phi=0.0, demodulate=True)
    s1 = np.asarray(r1) + 1j * np.asarray(i1)
    s2 = np.asarray(r2) + 1j * np.asarray(i2)
    # demodulated fingerprints are phase-invariant
    assert np.abs(s1 - s2).max() < 1e-10


def test_fisp_normalize():
    FAs = np.linspace(5, 60, 16)
    re, im = mrf.fisp_mrf_dictionary(
        FAs, 11.0, 4.0, [500.0, 1000.0], [50.0, 90.0], nstate=4,
        normalize=True)
    nrm = np.sqrt(np.sum(np.asarray(re) ** 2 + np.asarray(im) ** 2, axis=-1))
    assert np.allclose(nrm, 1.0)


def test_variable_tr():
    FAs = np.full(16, 25.0)
    TRs = 11.0 + 3.0 * np.sin(np.arange(16.0))
    re, im = mrf.fisp_mrf_dictionary(FAs, TRs, 4.0, [800.0], [70.0], nstate=4)
    assert np.asarray(re).shape == (1, 16)


def test_variable_te_matches_engine():
    """Per-pulse TE (canonical MRF-FISP varies TE with TR) == the
    general engine run on the equivalent operator train (f64, 1e-10)."""
    P = 16
    rng = np.random.default_rng(9)
    FA = np.linspace(15, 55, P)
    TRs = rng.uniform(11, 16, P)
    TEs = rng.uniform(2.0, 5.0, P)
    T1v, T2v = 900.0, 70.0
    re, im = mrf.fisp_mrf_dictionary(FA, TRs, TEs, [T1v], [T2v], nstate=6)
    sig = np.asarray(re)[0] + 1j * np.asarray(im)[0]
    seq = []
    for i in range(P):
        seq += [epg.T(FA[i], 90), epg.E(TEs[i], T1v, T2v), epg.ADC,
                epg.E(TRs[i] - TEs[i], T1v, T2v), epg.S(1)]
    ref = np.asarray(epg.simulate(seq, max_nstate=6, fisp_kernel=False))[:, 0]
    assert np.abs(sig - ref).max() < 1e-10
    # scalar TE and a constant TE vector are the same program output
    rc, ic = mrf.fisp_mrf_dictionary(FA, TRs, 4.0, [T1v], [T2v], nstate=6)
    rv, iv = mrf.fisp_mrf_dictionary(FA, TRs, np.full(P, 4.0), [T1v], [T2v],
                                     nstate=6)
    assert np.abs(np.asarray(rc) - np.asarray(rv)).max() < 1e-14
    assert np.abs(np.asarray(ic) - np.asarray(iv)).max() < 1e-14


def test_sharded_dictionary(cpu_devices):
    """Atom axis sharded over the 8-device CPU mesh == single device."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

    FAs = np.linspace(10, 60, 32)
    T1s = np.linspace(300, 1500, 16)
    T2s = np.linspace(30, 120, 16)

    re0, im0 = mrf.fisp_mrf_dictionary(FAs, 12.0, 5.0, T1s, T2s, nstate=4)

    mesh = Mesh(np.array(cpu_devices), ("atoms",))
    sh = NamedSharding(mesh, PS("atoms"))
    re1, im1 = mrf.fisp_mrf_dictionary(FAs, 12.0, 5.0, T1s, T2s, nstate=4,
                                       sharding=sh)
    assert np.abs(np.asarray(re0) - np.asarray(re1)).max() < 1e-12
    assert np.abs(np.asarray(im0) - np.asarray(im1)).max() < 1e-12


def test_fisp_jacobian_fd():
    """Fingerprint derivatives vs finite differences."""
    FA = np.linspace(10, 60, 12)
    T1s = np.asarray([800.0, 1200.0])
    T2s = np.asarray([60.0, 90.0])
    (re, im), (dre, dim) = mrf.fisp_mrf_jacobian(
        FA, 12.0, 5.0, T1s, T2s, variables=("T1", "T2"), nstate=4)
    eps = 1e-3
    rp, ip = mrf.fisp_mrf_dictionary(FA, 12.0, 5.0, T1s + eps, T2s, nstate=4)
    rm, imn = mrf.fisp_mrf_dictionary(FA, 12.0, 5.0, T1s - eps, T2s, nstate=4)
    fd_re = (np.asarray(rp) - np.asarray(rm)) / (2 * eps)
    assert np.abs(np.asarray(dre)[..., 0] - fd_re).max() < 1e-6


def test_fisp_off_resonance_matches_engine():
    """df axis == engine simulation with E(g=df)."""
    P = 16
    FA = np.linspace(15, 55, P)
    T1v, T2v, df = 900.0, 70.0, 0.03  # kHz
    re, im = mrf.fisp_mrf_dictionary(
        FA, 12.0, 5.0, [T1v], [T2v], dfs=[df], nstate=6)
    sig = np.asarray(re)[0] + 1j * np.asarray(im)[0]
    seq = []
    for i in range(P):
        seq += [epg.T(FA[i], 90), epg.E(5.0, T1v, T2v, g=df), epg.ADC,
                epg.E(7.0, T1v, T2v, g=df), epg.S(1)]
    ref = np.asarray(epg.simulate(seq, max_nstate=6))[:, 0]
    assert np.abs(sig - ref).max() < 1e-10


def test_inversion_with_off_resonance_phase():
    """The imperfect-inversion (B1 != 1) residual F+ must precess
    during TI: fisp_mrf_dictionary(dfs=, inversion=) equals the
    operator train whose prep E carries g=df (was: no TI phase, 0.82
    absolute error on the fingerprint)."""
    import epgpy_tpu as epg
    from epgpy_tpu.models.mrf import fisp_mrf_dictionary

    P, TI = 12, 20.0
    FA = 10 + 40 * np.abs(np.sin(np.arange(P) / 3.0))
    T1, T2, B1, df = 900.0, 70.0, 0.8, 0.025
    seq = [epg.T(180.0 * B1, 0), epg.E(TI, T1, T2, g=df)]
    for i in range(P):
        seq += [epg.T(FA[i] * B1, 90), epg.E(5.0, T1, T2, g=df), epg.ADC,
                epg.E(7.0, T1, T2, g=df), epg.S(1)]
    want = np.asarray(epg.simulate(seq, max_nstate=10,
                                   fisp_kernel=False))[:, 0]
    re, im = fisp_mrf_dictionary(FA, 12.0, 5.0, [T1], [T2], [B1],
                                 dfs=[df], inversion=TI, nstate=10,
                                 normalize=False)
    got = (np.asarray(re) + 1j * np.asarray(im))[0]
    assert np.abs(got - want).max() < 1e-12

    # the fused kernels agree (folded + full ladder + Jacobian primal)
    from epgpy_tpu.models.pallas_fisp import (fisp_dictionary_pallas,
                                              fisp_jacobian_pallas)
    for kw in (dict(), dict(half_ladder=False)):
        kre, kim = fisp_dictionary_pallas(
            FA, 90.0, 12.0, 5.0, [T1], [T2], [B1], [df], inversion=TI,
            nstate=10, interpret=True, **kw)
        kg = (np.asarray(kre) + 1j * np.asarray(kim))[0]
        assert np.abs(kg - got).max() < 1e-5
    (jre, jim), (jd_re, jd_im) = fisp_jacobian_pallas(
        FA, 90.0, 12.0, 5.0, [T1], [T2], [B1], [df], inversion=TI,
        nstate=10, interpret=True)
    jg = (np.asarray(jre) + 1j * np.asarray(jim))[0]
    assert np.abs(jg - got).max() < 1e-5
    # FD on T2 (its inversion tangent seed carries the TI phase)
    eps = 0.05
    rp, ip = fisp_dictionary_pallas(FA, 90.0, 12.0, 5.0, [T1], [T2 + eps],
                                    [B1], [df], inversion=TI, nstate=10,
                                    interpret=True)
    rm, imm = fisp_dictionary_pallas(FA, 90.0, 12.0, 5.0, [T1], [T2 - eps],
                                     [B1], [df], inversion=TI, nstate=10,
                                     interpret=True)
    fd = ((np.asarray(rp) + 1j * np.asarray(ip))
          - (np.asarray(rm) + 1j * np.asarray(imm)))[0] / (2 * eps)
    jac = (np.asarray(jd_re)[0, :, 1] + 1j * np.asarray(jd_im)[0, :, 1])
    assert np.abs(jac - fd).max() < 5e-4 * max(1e-12, np.abs(fd).max()) \
        + 1e-6


def test_evolution_g_none():
    """E(tau, T1, T2, g=None) behaves as g=0 (was a jnp.asarray(None)
    crash at plan-build time)."""
    import epgpy_tpu as epg

    seq = [epg.T(30, 90)] + [epg.E(5.0, 800.0, 80.0, g=None), epg.ADC,
                             epg.E(7.0, 800.0, 80.0, g=None),
                             epg.S(1)] * 6
    a = np.asarray(epg.simulate(list(seq), max_nstate=6,
                                fisp_kernel=False))
    seq0 = [epg.T(30, 90)] + [epg.E(5.0, 800.0, 80.0), epg.ADC,
                              epg.E(7.0, 800.0, 80.0), epg.S(1)] * 6
    b = np.asarray(epg.simulate(seq0, max_nstate=6, fisp_kernel=False))
    assert np.array_equal(a, b)
