"""Pallas FISP kernel: interpret-mode parity with the scan model."""

import numpy as np
import pytest

from epgpy_tpu.models.mrf import fisp_mrf_dictionary, fisp_mrf_jacobian
from epgpy_tpu.models.pallas_fisp import (fisp_dictionary_pallas,
                                          fisp_jacobian_pallas)


def test_pallas_interpret_parity():
    P, B = 96, 192
    rng = np.random.default_rng(0)
    FA = 10 + 50 * np.abs(np.sin(np.arange(P) * 0.07)) + rng.uniform(0, 2, P)
    TRs = 12.0 + 2.0 * np.sin(np.arange(P) * 0.2)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    B1 = np.linspace(0.8, 1.2, B)

    re0, im0 = fisp_mrf_dictionary(FA, TRs, 5.0, T1, T2, B1, nstate=6,
                                   phi=37.0, demodulate=True)
    re1, im1 = fisp_dictionary_pallas(FA, 37.0, TRs, 5.0, T1, T2, B1,
                                      nstate=6, btile=128, pchunk=128,
                                      demodulate=True, interpret=True)
    assert np.abs(np.asarray(re0, np.float32) - np.asarray(re1)).max() < 1e-5
    assert np.abs(np.asarray(im0, np.float32) - np.asarray(im1)).max() < 1e-5


def test_pallas_padding():
    """Non-multiple B and P are padded and cropped correctly."""
    P, B = 50, 100
    FA = np.full(P, 30.0)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    re0, im0 = fisp_mrf_dictionary(FA, 12.0, 5.0, T1, T2, nstate=4)
    re1, im1 = fisp_dictionary_pallas(FA, 90.0, 12.0, 5.0, T1, T2,
                                      np.ones(B), nstate=4, btile=128,
                                      pchunk=128, interpret=True)
    assert re1.shape == (B, P)
    assert np.abs(np.asarray(re0, np.float32) - np.asarray(re1)).max() < 1e-5


@pytest.mark.parametrize("half", [True, False])
def test_pallas_variable_te(half):
    """Per-pulse TE (canonical MRF-FISP) through both kernels: the
    var_te path reads TE from SMEM per step instead of hoisting the
    TE-decay factors."""
    P, B = 37, 96
    rng = np.random.default_rng(4)
    FA = rng.uniform(5, 70, P)
    TRs = rng.uniform(11, 16, P)
    TEs = rng.uniform(2.0, 5.0, P)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    dfs = np.linspace(-0.05, 0.05, B)
    re0, im0 = fisp_mrf_dictionary(FA, TRs, TEs, T1, T2, dfs=dfs, nstate=6,
                                   inversion=18.0)
    re1, im1 = fisp_dictionary_pallas(FA, 90.0, TRs, TEs, T1, T2, np.ones(B),
                                      dfs, nstate=6, btile=128,
                                      inversion=18.0, interpret=True,
                                      half_ladder=half)
    assert np.abs(np.asarray(re0, np.float32) - np.asarray(re1)).max() < 1e-5
    assert np.abs(np.asarray(im0, np.float32) - np.asarray(im1)).max() < 1e-5


def test_pallas_jacobian_variable_te():
    P, B = 24, 64
    rng = np.random.default_rng(6)
    FA = rng.uniform(10, 60, P)
    phi = (0.5 * 117.0 * np.arange(P) * (np.arange(P) + 1)) % 360
    TRs = rng.uniform(11, 16, P)
    TEs = rng.uniform(2.0, 5.0, P)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    (kr, ki), (kdr, kdi) = fisp_jacobian_pallas(
        FA, phi, TRs, TEs, T1, T2, np.ones(B), nstate=6, btile=64,
        interpret=True)
    (mr, mi), (mdr, mdi) = fisp_mrf_jacobian(
        FA, TRs, TEs, T1, T2, phi=phi, variables=("T1", "T2", "B1"),
        nstate=6)
    assert np.abs(np.asarray(kr) - np.asarray(mr, np.float32)).max() < 1e-5
    assert np.abs(np.asarray(ki) - np.asarray(mi, np.float32)).max() < 1e-5
    # one complex-magnitude scale per variable (re/im alone can be ~0)
    scale = np.maximum(np.abs(np.asarray(mdr)), np.abs(np.asarray(mdi))
                       ).max(axis=(0, 1))
    err = np.abs(np.asarray(kdr) - np.asarray(mdr, np.float32)).max(axis=(0, 1))
    erri = np.abs(np.asarray(kdi) - np.asarray(mdi, np.float32)).max(axis=(0, 1))
    assert (np.maximum(err, erri) / scale < 1e-4).all()


@pytest.mark.parametrize("use_df", [False, True])
@pytest.mark.parametrize("demod", [False, True])
def test_pallas_half_ladder_matches_full(use_df, demod):
    """Folded half-ladder kernel vs literal 2N+1-row kernel.

    The fold relies on the FISP conjugate symmetry F-(k)=conj(F+(-k));
    off-resonance and demodulation both preserve it.  On real TPU the
    two kernels are bitwise identical over 1000 TRs; interpret mode
    (this test) only guarantees f32-epsilon agreement.
    """
    P, B = 60, 128
    rng = np.random.default_rng(3)
    FA = rng.uniform(5, 70, P)
    phi = rng.uniform(0, 360, P)
    TRs = rng.uniform(11, 16, P)
    T1 = rng.uniform(300, 2000, B)
    T2 = rng.uniform(30, 300, B)
    B1 = rng.uniform(0.8, 1.2, B)
    dfs = rng.uniform(-50, 50, B) * 1e-3 if use_df else None
    kw = dict(nstate=7, btile=128, pchunk=128, demodulate=demod,
              interpret=True)
    re0, im0 = fisp_dictionary_pallas(FA, phi, TRs, 4.0, T1, T2, B1, dfs,
                                      half_ladder=False, **kw)
    re1, im1 = fisp_dictionary_pallas(FA, phi, TRs, 4.0, T1, T2, B1, dfs,
                                      half_ladder=True, **kw)
    assert np.abs(np.asarray(re0) - np.asarray(re1)).max() < 1e-6
    assert np.abs(np.asarray(im0) - np.asarray(im1)).max() < 1e-6


def test_pallas_off_resonance_parity():
    P, B = 64, 128
    FA = np.linspace(10, 60, P)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    dfs = np.linspace(-0.05, 0.05, B)
    re0, im0 = fisp_mrf_dictionary(FA, 12.0, 5.0, T1, T2, dfs=dfs, nstate=5)
    re1, im1 = fisp_dictionary_pallas(FA, 90.0, 12.0, 5.0, T1, T2,
                                      np.ones(B), dfs, nstate=5,
                                      btile=128, pchunk=128, interpret=True)
    assert np.abs(np.asarray(re0, np.float32) - np.asarray(re1)).max() < 1e-5
    assert np.abs(np.asarray(im0, np.float32) - np.asarray(im1)).max() < 1e-5


def test_pallas_jacobian_off_resonance_matches_jvp():
    """Jacobian kernel with dfs: the off-resonance phase multiplies the
    F coefficients and echo uniformly (parameter-independent), so every
    tangent plane must match autodiff of the df-aware scan program."""
    P, B, NS = 60, 16, 6
    rng = np.random.default_rng(11)
    FA = rng.uniform(5, 70, P)
    phi = (0.5 * 117.0 * np.arange(P) * (np.arange(P) + 1)) % 360.0
    TRs = rng.uniform(11, 16, P)
    T1 = rng.uniform(300, 2000, B)
    T2 = rng.uniform(30, 300, B)
    B1 = rng.uniform(0.8, 1.2, B)
    dfs = rng.uniform(-0.05, 0.05, B)
    (re0, im0), (dre0, dim0) = fisp_mrf_jacobian(
        FA, TRs, 4.0, T1, T2, B1, dfs, phi=phi,
        variables=("T1", "T2", "B1"), nstate=NS)
    (re1, im1), (dre1, dim1) = fisp_jacobian_pallas(
        FA, phi, TRs, 4.0, T1, T2, B1, dfs, nstate=NS, btile=128,
        pchunk=60, interpret=True)
    assert np.abs(np.asarray(re0, np.float32) - np.asarray(re1)).max() < 1e-5
    assert np.abs(np.asarray(im0, np.float32) - np.asarray(im1)).max() < 1e-5
    scale = np.array([1e3, 1e2, 1.0])
    for d0, d1 in ((dre0, dre1), (dim0, dim1)):
        err = np.abs(np.asarray(d0) * scale - np.asarray(d1) * scale).max()
        assert err < 1e-4, err


@pytest.mark.parametrize("demod", [False, True])
def test_pallas_jacobian_matches_jvp(demod):
    """Fused Pallas (primal + dT1/dT2/dB1 tangent) kernel vs vmap(jvp).

    The hand-derived tangent propagation must agree with autodiff of
    the XLA scan.  RF-spoiling phases keep both signal components (and
    all six derivative planes) nonzero.  The kernel is f32; the jvp
    model runs f64 under the test config, so tolerances are f32-eps
    relative to each derivative's magnitude.
    """
    P, B, NS = 80, 24, 8
    rng = np.random.default_rng(7)
    FA = rng.uniform(5, 70, P)
    phi = (0.5 * 117.0 * np.arange(P) * (np.arange(P) + 1)) % 360.0
    TRs = rng.uniform(11, 16, P)
    T1 = rng.uniform(300, 2000, B)
    T2 = rng.uniform(30, 300, B)
    B1 = rng.uniform(0.8, 1.2, B)
    (re0, im0), (dre0, dim0) = fisp_mrf_jacobian(
        FA, TRs, 4.0, T1, T2, B1, phi=phi, variables=("T1", "T2", "B1"),
        nstate=NS, demodulate=demod)
    (re1, im1), (dre1, dim1) = fisp_jacobian_pallas(
        FA, phi, TRs, 4.0, T1, T2, B1, nstate=NS, btile=128, pchunk=80,
        demodulate=demod, interpret=True)
    assert np.abs(np.asarray(re0, np.float32) - np.asarray(re1)).max() < 1e-5
    assert np.abs(np.asarray(im0, np.float32) - np.asarray(im1)).max() < 1e-5
    # scale T1/T2 columns by typical parameter size: d/dT1 ~ 1e-4
    scale = np.array([1e3, 1e2, 1.0])
    for d0, d1 in ((dre0, dre1), (dim0, dim1)):
        err = np.abs(np.asarray(d0) * scale - np.asarray(d1) * scale).max()
        assert err < 1e-4, err


@pytest.mark.parametrize("half", [False, True])
def test_pallas_inversion_prep(half):
    """Inversion prep (180*B1 pulse + TI relaxation) seeded in closed
    form in the kernel init matches the model's rotate+relax prep."""
    P, B, NS = 60, 16, 8
    rng = np.random.default_rng(5)
    FA = rng.uniform(5, 70, P)
    phi = (0.5 * 117.0 * np.arange(P) * (np.arange(P) + 1)) % 360.0
    TRs = rng.uniform(11, 16, P)
    T1 = rng.uniform(300, 2000, B)
    T2 = rng.uniform(30, 300, B)
    B1 = rng.uniform(0.8, 1.2, B)
    re0, im0 = fisp_mrf_dictionary(FA, TRs, 4.0, T1, T2, B1, phi=phi,
                                   nstate=NS, inversion=18.0)
    re1, im1 = fisp_dictionary_pallas(FA, phi, TRs, 4.0, T1, T2, B1,
                                      nstate=NS, btile=128, inversion=18.0,
                                      interpret=True, half_ladder=half)
    assert np.abs(np.asarray(re0, np.float32) - np.asarray(re1)).max() < 1e-5
    assert np.abs(np.asarray(im0, np.float32) - np.asarray(im1)).max() < 1e-5


def test_pallas_jacobian_inversion_tangents():
    """The closed-form inversion tangent seeds (dT1 recovery, dT2 decay,
    dB1 flip-angle) must agree with autodiff through the model's prep."""
    P, B, NS = 60, 16, 8
    rng = np.random.default_rng(5)
    FA = rng.uniform(5, 70, P)
    phi = (0.5 * 117.0 * np.arange(P) * (np.arange(P) + 1)) % 360.0
    TRs = rng.uniform(11, 16, P)
    T1 = rng.uniform(300, 2000, B)
    T2 = rng.uniform(30, 300, B)
    B1 = rng.uniform(0.8, 1.2, B)
    (_, _), (dre0, dim0) = fisp_mrf_jacobian(
        FA, TRs, 4.0, T1, T2, B1, phi=phi, variables=("T1", "T2", "B1"),
        nstate=NS, inversion=18.0)
    (_, _), (dre1, dim1) = fisp_jacobian_pallas(
        FA, phi, TRs, 4.0, T1, T2, B1, nstate=NS, btile=128,
        inversion=18.0, interpret=True)
    scale = np.array([1e3, 1e2, 1.0])
    for d0, d1 in ((dre0, dre1), (dim0, dim1)):
        err = np.abs(np.asarray(d0) * scale - np.asarray(d1) * scale).max()
        assert err < 1e-4, err


def test_pallas_normalize():
    """normalize=True returns unit-norm fingerprints, matching the model."""
    P, B = 50, 32
    FA = np.linspace(10, 60, P)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    re0, im0 = fisp_mrf_dictionary(FA, 12.0, 5.0, T1, T2, nstate=4,
                                   normalize=True)
    re1, im1 = fisp_dictionary_pallas(FA, 90.0, 12.0, 5.0, T1, T2,
                                      np.ones(B), nstate=4, btile=128,
                                      normalize=True, interpret=True)
    nrm = np.sqrt((np.asarray(re1) ** 2 + np.asarray(im1) ** 2).sum(-1))
    assert np.allclose(nrm, 1.0, atol=1e-5)
    assert np.abs(np.asarray(re0, np.float32) - np.asarray(re1)).max() < 1e-5
    assert np.abs(np.asarray(im0, np.float32) - np.asarray(im1)).max() < 1e-5


def test_pallas_sharded_dictionary_matches_single():
    """shard_map'd Pallas kernel over an 8-device atom mesh: each device
    runs the VMEM-resident kernel on its shard; result equals the
    single-device kernel bit-for-bit (no cross-atom math)."""
    import jax
    from jax.sharding import Mesh
    from epgpy_tpu.models.pallas_fisp import fisp_dictionary_pallas_sharded

    devs = np.array(jax.devices("cpu")[:8])
    mesh = Mesh(devs, ("atoms",))
    P, B = 40, 64
    FA = np.linspace(10, 60, P)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    B1 = np.linspace(0.8, 1.2, B)
    kw = dict(nstate=4, btile=128, interpret=True)
    re0, im0 = fisp_dictionary_pallas(FA, 90.0, 12.0, 5.0, T1, T2, B1, **kw)
    re1, im1 = fisp_dictionary_pallas_sharded(
        FA, 90.0, 12.0, 5.0, T1, T2, B1, mesh=mesh, **kw)
    assert re1.shape == (B, P)
    assert np.array_equal(np.asarray(re0), np.asarray(re1))
    assert np.array_equal(np.asarray(im0), np.asarray(im1))


def test_pallas_sharded_jacobian_matches_single():
    """shard_map'd Jacobian kernel over an 8-device atom mesh."""
    import jax
    from jax.sharding import Mesh
    from epgpy_tpu.models.pallas_fisp import (fisp_jacobian_pallas,
                                              fisp_jacobian_pallas_sharded)

    devs = np.array(jax.devices("cpu")[:8])
    mesh = Mesh(devs, ("atoms",))
    P, B = 40, 64
    FA = np.linspace(10, 60, P)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    B1 = np.linspace(0.8, 1.2, B)
    kw = dict(nstate=4, btile=128, interpret=True)
    (re0, im0), (dre0, dim0) = fisp_jacobian_pallas(
        FA, 90.0, 12.0, 5.0, T1, T2, B1, **kw)
    (re1, im1), (dre1, dim1) = fisp_jacobian_pallas_sharded(
        FA, 90.0, 12.0, 5.0, T1, T2, B1, mesh=mesh, **kw)
    assert dre1.shape == (B, P, 3)
    assert np.array_equal(np.asarray(re0), np.asarray(re1))
    assert np.array_equal(np.asarray(dre0), np.asarray(dre1))
    assert np.array_equal(np.asarray(dim0), np.asarray(dim1))


def test_pallas_fuzz_configs():
    """Randomized config sweep: (nstate, P, B, phi mode, TI, df, demod)
    against the scan model in interpret mode."""
    rng = np.random.default_rng(11)
    for trial in range(6):
        NS = int(rng.integers(1, 12))
        P = int(rng.integers(16, 90))
        B = int(rng.integers(3, 40))
        FA = rng.uniform(5, 80, P)
        phi = (rng.uniform(0, 360, P) if trial % 2 == 0
               else float(rng.uniform(0, 360)))
        TRs = rng.uniform(10, 18, P)
        TE = float(rng.uniform(2, 6))
        T1 = rng.uniform(200, 2500, B)
        T2 = rng.uniform(20, 400, B)
        B1 = rng.uniform(0.7, 1.3, B)
        inv = float(rng.uniform(5, 40)) if rng.random() < 0.5 else None
        dfs = rng.uniform(-0.05, 0.05, B) if rng.random() < 0.5 else None
        demod = bool(rng.random() < 0.5)
        re0, im0 = fisp_mrf_dictionary(FA, TRs, TE, T1, T2, B1, dfs=dfs,
                                       phi=phi, nstate=NS, inversion=inv,
                                       demodulate=demod)
        re1, im1 = fisp_dictionary_pallas(FA, phi, TRs, TE, T1, T2, B1, dfs,
                                          nstate=NS, btile=128,
                                          inversion=inv, demodulate=demod,
                                          interpret=True)
        err = max(np.abs(np.asarray(re0, np.float32) - np.asarray(re1)).max(),
                  np.abs(np.asarray(im0, np.float32) - np.asarray(im1)).max())
        assert err < 2e-5, (trial, NS, P, B, inv, demod, err)


def test_pallas_mse_jacobian():
    """Fused CPMG primal+tangent kernel vs the engine's jacfwd planner
    (dT1/dT2) and central finite differences on the primal kernel (dB1)."""
    import epgpy_tpu as epg
    from epgpy_tpu.models.pallas_mse import (cpmg_dictionary_pallas,
                                             cpmg_jacobian_pallas)

    rng = np.random.default_rng(5)
    necho, B = 10, 8
    T1v = 1400.0
    T2 = np.linspace(30, 120, B)
    att = np.linspace(0.6, 1.1, B)
    FAr, phr = 160.0, 20.0
    tau1 = rng.uniform(3, 6, necho)
    tau2 = rng.uniform(3, 6, necho)

    seq = [epg.T(90, 90)]
    for i in range(necho):
        seq += [epg.E(float(tau1[i]), T1v, T2, order1=["T1", "T2"]),
                epg.S(1), epg.T(FAr * att, phr),
                epg.E(float(tau2[i]), T1v, T2, order1=["T1", "T2"]),
                epg.S(1), epg.ADC]
    sig_e, jac_e = epg.simulate(
        seq, probe=[epg.ADC, epg.Jacobian(["T1", "T2"])], fisp_kernel=False)
    sig_e, jac_e = np.asarray(sig_e), np.asarray(jac_e)

    (kr, ki), (kdr, kdi) = cpmg_jacobian_pallas(
        (90.0, 90.0), np.full(necho, FAr), np.full(necho, phr), tau1, tau2,
        np.full(B, T1v), T2, att, nstate=2 * necho, btile=64, interpret=True)
    ks = np.asarray(kr).T + 1j * np.asarray(ki).T            # (E, B)
    assert np.abs(ks - sig_e).max() < 1e-5
    kj = np.asarray(kdr) + 1j * np.asarray(kdi)              # (B, E, 3)
    for c in range(2):                                       # T1, T2
        ek, ee = kj[..., c].T, jac_e[..., c]
        assert np.abs(ek - ee).max() / max(np.abs(ee).max(), 1e-12) < 1e-4

    # dB1 against central differences on the primal kernel
    eps = 1e-3

    def primal(b1):
        r, i = cpmg_dictionary_pallas(
            (90.0, 90.0), np.full(necho, FAr), np.full(necho, phr), tau1,
            tau2, np.full(B, T1v), T2, b1, nstate=2 * necho, btile=64,
            interpret=True)
        return np.asarray(r) + 1j * np.asarray(i)

    fd = (primal(att + eps) - primal(att - eps)) / (2 * eps)
    assert np.abs(kj[..., 2] - fd).max() / np.abs(fd).max() < 1e-3


def test_pallas_sharded_cpmg_matches_single():
    """shard_map'd CPMG kernels (primal + jacobian) over the 8-device
    atom mesh equal the single-device kernels bit-for-bit."""
    import jax
    from jax.sharding import Mesh
    from epgpy_tpu.models.pallas_mse import (
        cpmg_dictionary_pallas, cpmg_jacobian_pallas,
        cpmg_dictionary_pallas_sharded, cpmg_jacobian_pallas_sharded)

    devs = np.array(jax.devices("cpu")[:8])
    mesh = Mesh(devs, ("atoms",))
    necho, B = 8, 64
    rng = np.random.default_rng(3)
    FA = np.full(necho, 160.0)
    tau1 = rng.uniform(3, 6, necho)
    tau2 = rng.uniform(3, 6, necho)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    B1 = np.linspace(0.7, 1.1, B)
    args = ((90.0, 90.0), FA, 0.0, tau1, tau2, T1, T2, B1)
    kw = dict(nstate=2 * necho, btile=64, interpret=True)
    re0, im0 = cpmg_dictionary_pallas(*args, **kw)
    re1, im1 = cpmg_dictionary_pallas_sharded(*args, mesh=mesh, **kw)
    assert re1.shape == (B, necho)
    assert np.array_equal(np.asarray(re0), np.asarray(re1))
    assert np.array_equal(np.asarray(im0), np.asarray(im1))
    (jr0, ji0), (dr0, di0) = cpmg_jacobian_pallas(*args, **kw)
    (jr1, ji1), (dr1, di1) = cpmg_jacobian_pallas_sharded(
        *args, mesh=mesh, **kw)
    assert dr1.shape == (B, necho, 3)
    for x0, x1 in ((jr0, jr1), (ji0, ji1), (dr0, dr1), (di0, di1)):
        assert np.array_equal(np.asarray(x0), np.asarray(x1))
