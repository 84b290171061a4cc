"""Per-echo CPMG design Jacobian kernel (models/pallas_msedesign).

Oracle: the general engine's alias-tracked Jacobian probe (jacfwd over
the scanned planner, f64) on the identical CPMG train — per-echo alpha
aliases on the refocusing T ops and per-echo esp aliases with the 1/2
chain coefficient on BOTH half-spacing E ops (the reference's alias +
coefficient machinery, epgpy diff.py order1 specs).
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu.models.pallas_msedesign import (cpmg_design_pallas,
                                               cpmg_design_pallas_sharded)

NECHO = 8
RNG = np.random.default_rng(5)
FA = RNG.uniform(90, 170, NECHO)
ESP = RNG.uniform(7, 12, NECHO)
ALPS = [f"a_{i:02d}" for i in range(NECHO)]
ESPS = [f"e_{i:02d}" for i in range(NECHO)]

T1v = np.array([600.0, 1400.0])
T2v = np.array([45.0, 110.0])


def oracle():
    """Planner Jacobian over (T1, T2, alpha_i, esp_i) on the exact
    train the kernel models."""
    seq = [epg.T(90, 90)]
    for i in range(NECHO):
        o_e = {"T1": {"T1": 1.0}, "T2": {"T2": 1.0},
               ESPS[i]: {"tau": 0.5}}
        seq += [epg.E(ESP[i] / 2, T1v, T2v, order1=dict(o_e)), epg.S(1),
                epg.T(FA[i], 0.0, order1={ALPS[i]: "alpha"}),
                epg.E(ESP[i] / 2, T1v, T2v, order1=dict(o_e)), epg.S(1),
                epg.ADC]
    names = ["T1", "T2"] + ALPS + ESPS
    sig, jac = epg.simulate(
        seq, probe=[epg.ADC, epg.Jacobian(names)],
        max_nstate=2 * NECHO, fisp_kernel=False)
    return np.asarray(sig), np.asarray(jac)      # (E, B), (E, B, nvars)


@pytest.fixture(scope="module")
def results():
    sig, jac = oracle()
    out = cpmg_design_pallas((90.0, 90.0), FA, 0.0, ESP, T1v, T2v,
                             nstate=2 * NECHO, interpret=True)
    return sig, jac, out


def _c(pair):
    return np.asarray(pair[0]) + 1j * np.asarray(pair[1])


def _close(ref, got, tol=5e-6):
    scale = max(np.abs(ref).max(), 1e-9)
    assert np.abs(ref - got).max() / scale < tol, (
        np.abs(ref - got).max() / scale)


def test_signal(results):
    sig, _, out = results
    _close(sig, _c(out["sig"]).T)


def test_t1_t2_columns(results):
    _, jac, out = results
    _close(jac[:, :, 0], _c(out["dT1"]).T)
    _close(jac[:, :, 1], _c(out["dT2"]).T)


def test_alpha_columns(results):
    _, jac, out = results
    dalpha = _c(out["dalpha"])                    # (B, E, E)
    for i in range(NECHO):
        _close(jac[:, :, 2 + i], dalpha[:, :, i].T)


def test_esp_columns(results):
    _, jac, out = results
    desp = _c(out["desp"])
    for i in range(NECHO):
        _close(jac[:, :, 2 + NECHO + i], desp[:, :, i].T)


def test_causality(results):
    """Echo j cannot depend on later controls: i > j entries exact 0."""
    _, _, out = results
    for key in ("dalpha", "desp"):
        m = _c(out[key])
        for j in range(NECHO):
            assert np.all(m[:, j, j + 1:] == 0), key


def test_esp_fd_spot_check():
    """desp column 3 against a central finite difference of the f64
    planner primal (pins the 1/2 half-spacing chain coefficient)."""
    out = cpmg_design_pallas((90.0, 90.0), FA, 0.0, ESP, T1v, T2v,
                             nstate=2 * NECHO, interpret=True)
    eps = 1e-3

    def primal(esp3):
        esp = ESP.copy()
        esp[3] = esp3
        seq = [epg.T(90, 90)]
        for i in range(NECHO):
            seq += [epg.E(esp[i] / 2, T1v, T2v), epg.S(1),
                    epg.T(FA[i], 0.0),
                    epg.E(esp[i] / 2, T1v, T2v), epg.S(1), epg.ADC]
        return np.asarray(epg.simulate(seq, max_nstate=2 * NECHO,
                                       fisp_kernel=False))

    fd = (primal(ESP[3] + eps) - primal(ESP[3] - eps)) / (2 * eps)
    got = _c(out["desp"])[:, :, 3].T
    _close(fd, got, tol=2e-5)


def test_second_order_mixed_columns():
    """Mixed d2S/(dT_c dp_i) against the planner's Hessian probe
    (nested jacfwd over the alias-tracked train, f64)."""
    seq = [epg.T(90, 90)]
    for i in range(NECHO):
        o_e = {"T1": {"T1": 1.0}, "T2": {"T2": 1.0},
               ESPS[i]: {"tau": 0.5}}
        seq += [epg.E(ESP[i] / 2, T1v, T2v, order1=dict(o_e)), epg.S(1),
                epg.T(FA[i], 0.0, order1={ALPS[i]: "alpha"}),
                epg.E(ESP[i] / 2, T1v, T2v, order1=dict(o_e)), epg.S(1),
                epg.ADC]
    hess = np.asarray(epg.simulate(
        seq, probe=[epg.Hessian(["T1", "T2"], ALPS + ESPS)],
        max_nstate=2 * NECHO, fisp_kernel=False))   # (E, B, 2, 2E)
    out = cpmg_design_pallas((90.0, 90.0), FA, 0.0, ESP, T1v, T2v,
                             nstate=2 * NECHO, second_order=True,
                             interpret=True)
    pairs = {("dT1dalpha", 0, 0), ("dT2dalpha", 1, 0),
             ("dT1desp", 0, 1), ("dT2desp", 1, 1)}
    for key, c, blk in pairs:
        got = _c(out[key])                          # (B, E, E)
        ref = hess[:, :, c, blk * NECHO:(blk + 1) * NECHO]
        _close(ref, np.moveaxis(got, 0, 1), tol=1e-5)


def test_second_order_first_order_unchanged():
    """second_order=True must not perturb the order-1 outputs (up to
    f32 reassociation across the two compiled programs)."""
    kw = dict(nstate=2 * NECHO, interpret=True)
    d0 = cpmg_design_pallas((90.0, 90.0), FA, 0.0, ESP, T1v, T2v, **kw)
    d1 = cpmg_design_pallas((90.0, 90.0), FA, 0.0, ESP, T1v, T2v,
                            second_order=True, **kw)
    for k in d0:
        for a, b in zip(d0[k], d1[k]):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-9)
            assert np.abs(a - b).max() / scale < 1e-6, k


def test_design_loss_grad_fd():
    """mse_design_loss_grad_fused gradient vs central FD of the loss
    (pins the stats.crlb analytic-gradient contraction end-to-end).

    Tolerance note: the kernel computes in f32, so FD differences of
    the loss carry ~0.5% non-converging scatter (measured across eps
    0.01-0.1 the FD wobbles around the analytic value) — the bound
    checks the analytic gradient lands inside that scatter, not f64
    convergence."""
    from epgpy_tpu.parallel import mse_design_loss_grad_fused

    TOL = 1e-2
    kw = dict(nstate=2 * NECHO, interpret=True)
    v0, gfa, gesp = mse_design_loss_grad_fused(
        np.asarray(FA, np.float32), np.asarray(ESP, np.float32),
        T1v, T2v, **kw)
    eps = 0.05
    for i in (1, 5):
        fa = FA.copy()
        fa[i] += eps
        vp = mse_design_loss_grad_fused(
            np.asarray(fa, np.float32), np.asarray(ESP, np.float32),
            T1v, T2v, **kw)[0]
        fa[i] -= 2 * eps
        vm = mse_design_loss_grad_fused(
            np.asarray(fa, np.float32), np.asarray(ESP, np.float32),
            T1v, T2v, **kw)[0]
        fd = (float(vp) - float(vm)) / (2 * eps)
        assert abs(fd - float(gfa[i])) < TOL * max(abs(fd), 1e-3), (
            i, fd, float(gfa[i]))
    esp = ESP.copy()
    esp[3] += eps
    vp = mse_design_loss_grad_fused(
        np.asarray(FA, np.float32), np.asarray(esp, np.float32),
        T1v, T2v, **kw)[0]
    esp[3] -= 2 * eps
    vm = mse_design_loss_grad_fused(
        np.asarray(FA, np.float32), np.asarray(esp, np.float32),
        T1v, T2v, **kw)[0]
    fd = (float(vp) - float(vm)) / (2 * eps)
    assert abs(fd - float(gesp[3])) < TOL * max(abs(fd), 1e-3), (
        fd, float(gesp[3]))


def test_sharded_matches_single():
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices("cpu")[:8])
    mesh = Mesh(devs, ("atoms",))
    B = 16
    T1 = np.linspace(400, 1600, B)
    T2 = np.linspace(30, 130, B)
    kw = dict(nstate=2 * NECHO, interpret=True)
    d0 = cpmg_design_pallas((90.0, 90.0), FA, 0.0, ESP, T1, T2, **kw)
    d1 = cpmg_design_pallas_sharded((90.0, 90.0), FA, 0.0, ESP, T1, T2,
                                    mesh=mesh, **kw)
    for k in d0:
        for a, b in zip(d0[k], d1[k]):
            assert np.array_equal(np.asarray(a), np.asarray(b)), k
