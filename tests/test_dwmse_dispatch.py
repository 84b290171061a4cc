"""DW-TSE (diffusion-weighted CPMG) train -> fused Pallas kernel.

match_mse now folds optional D ops into the CPMG kernel:
``[T(exc)] + [E, S(1), D?, T(ref), E, S(1), D?, ADC] * E`` with one D
op instance per half position, reused across echoes, placed after the
half's shift.  This is the Weigel 2010 "diffusion trap" physics on the
unit-shift grid (the reference composes it op-by-op: epgpy
diffusion.py:126-147 placed after shift.py S ops; our planner path is
pinned to the reference by the rare_diffusion/ssfp_dwi goldens).
Kernel parity is checked against the scan planner.
"""

import os

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

KV = 2 * np.pi / 1e-3  # 1 mm voxel: 6283 rad/m per state index

T1 = np.array([800.0, 1200.0, 1600.0])
T2 = np.array([60.0, 90.0, 140.0])


def _train(necho=10, B=3, *, Dc=1.2e-3, d1=True, d2=True, ramp=True,
           att=None, order="ES", track=None, d_per_echo=False):
    t1, t2 = T1[:B], T2[:B]
    tau1, tau2 = 4.0, 4.5
    kw = dict(k=1) if ramp else {}
    dop1 = epg.D(tau1, Dc, **kw) if d1 else None
    dop2 = epg.D(tau2, Dc, **kw) if d2 else None
    okw = {} if track is None else {"order1": list(track)}
    seq = [epg.T(90, 90)]
    for i in range(necho):
        fa = 100.0 + 4.0 * (i % 5)
        if att is not None:
            fa = fa * np.asarray(att)[None, :]
        e1 = epg.E(tau1, t1, t2, **okw)
        e2 = epg.E(tau2, t1, t2, **okw)
        h1 = [e1, epg.S(1)] if order == "ES" else [epg.S(1), e1]
        h2 = [e2, epg.S(1)] if order == "ES" else [epg.S(1), e2]
        if d1:
            h1.append(epg.D(tau1, Dc, **kw) if d_per_echo else dop1)
        if d2:
            h2.append(epg.D(tau2, Dc, **kw) if d_per_echo else dop2)
        seq += h1 + [epg.T(fa, 0.0)] + h2 + [epg.ADC]
    return seq


def _parity(seq, tol=2e-5):
    sig_k = epg.simulate(list(seq), kvalue=KV, fisp_kernel="force")
    sig_e = epg.simulate(list(seq), kvalue=KV, fisp_kernel=False)
    assert sig_k.shape == sig_e.shape
    err = np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max()
    scale = max(np.abs(np.asarray(sig_e)).max(), 1e-12)
    assert err < tol * scale, err
    return np.asarray(sig_k)


def test_match_extracts_diffusion():
    seq = _train(necho=8)
    p = fisp_dispatch.match_mse(seq, KV)
    assert p is not None
    d = p["diffusion"]
    assert d is not None and d["ramp1"] is True and d["ramp2"] is True
    assert np.isclose(d["b1"], 4.0e-3 * (KV * 1e-3) ** 2)
    assert np.isclose(d["b2"], 4.5e-3 * (KV * 1e-3) ** 2)
    # kvalue enters the b-values: a different kvalue is a distinct match
    p2 = fisp_dispatch.match_mse(seq, KV / 2)
    assert np.isclose(p2["diffusion"]["b1"], d["b1"] / 4)


def test_dwmse_parity_ramp():
    sig = _parity(_train(necho=10))
    # diffusion actually attenuates the echo train
    free = np.asarray(epg.simulate(
        [op for op in _train(necho=10) if not isinstance(op, epg.D)],
        kvalue=KV, fisp_kernel=False))
    assert np.abs(sig)[3:].max() < np.abs(free)[3:].max()


def test_dwmse_parity_constant_k():
    _parity(_train(necho=9, ramp=False))


def test_dwmse_parity_se_order():
    _parity(_train(necho=9, order="SE"))


def test_dwmse_parity_single_half():
    _parity(_train(necho=9, d1=False))
    _parity(_train(necho=9, d2=False))


def test_dwmse_parity_tensor_d():
    Dt = np.diag([1.5e-3, 0.5e-3, 0.25e-3])
    _parity(_train(necho=9, Dc=Dt))


def test_dwmse_parity_b1_batch():
    att = np.linspace(0.6, 1.1, 4)
    seq = _train(necho=9, B=3, att=att)
    p = fisp_dispatch.match_mse(seq, KV)
    assert p is not None and p["shape"] == (3, 4)
    _parity(seq)


def test_plain_mse_unaffected():
    """The extended matcher still claims the plain train (diffusion
    None) and keeps parity."""
    seq = _train(necho=9, d1=False, d2=False)
    p = fisp_dispatch.match_mse(seq, KV)
    assert p is not None and p["diffusion"] is None
    _parity(seq)


def test_diffusion_trap_physics():
    """Weigel 2010: sub-180 refocusing angles trap magnetization in
    diffusion-sensitizing stimulated-echo pathways, RAISING the
    effective b-factor of late echoes (the rare_diffusion example on
    the unit grid, here through the fused kernel)."""
    Dc = 1e-3
    att = np.array([60.0 / 150.0, 1.0])   # FA 60 vs 150 via the B1 axis

    def train(with_d):
        tau = 3.0
        kw = dict(k=1)
        d1 = epg.D(tau, Dc, **kw)
        d2 = epg.D(tau, Dc, **kw)
        seq = [epg.T(90, 90)]
        for _ in range(12):
            h1 = [epg.E(tau, 1e3, 1e2), epg.S(1)]
            h2 = [epg.E(tau, 1e3, 1e2), epg.S(1)]
            if with_d:
                h1, h2 = h1 + [d1], h2 + [d2]
            seq += h1 + [epg.T(150.0 * att, 0.0)] + h2 + [epg.ADC]
        return seq

    sig_d = np.asarray(epg.simulate(train(True), kvalue=KV,
                                    fisp_kernel="force"))
    sig_0 = np.asarray(epg.simulate(train(False), kvalue=KV,
                                    fisp_kernel="force"))
    b = -np.log(np.abs(sig_d[-1] / sig_0[-1])) / Dc
    assert b[0] > b[1] > 0          # FA=60 b-factor exceeds FA=150


@pytest.mark.parametrize("mutate", [
    "d_per_echo", "d_before_s", "traced_tau", "batched_tensor",
    "nonunit_ramp", "two_d_in_half",
])
def test_no_match_off_pattern(mutate):
    if mutate == "d_per_echo":
        seq = _train(necho=8, d_per_echo=True)
    elif mutate == "d_before_s":
        seq = _train(necho=8)
        # move one D in front of its shift: pre-shift wavenumbers
        i = next(i for i, op in enumerate(seq) if isinstance(op, epg.D))
        seq[i - 2], seq[i - 1], seq[i] = seq[i], seq[i - 2], seq[i - 1]
    elif mutate == "traced_tau":
        import jax.numpy as jnp
        seq = _train(necho=8)
        i = next(i for i, op in enumerate(seq) if isinstance(op, epg.D))
        bad = epg.D(float(np.asarray(4.0)), 1e-3, k=1)
        bad.tau = jnp.asarray(4.0)     # device leaf, not a host float
        seq = [bad if op is seq[i] else op for op in seq]
    elif mutate == "batched_tensor":
        with pytest.raises(ValueError):
            epg.D(4.0, np.ones(3), k=1)
        return
    elif mutate == "nonunit_ramp":
        seq = _train(necho=8)
        i = next(i for i, op in enumerate(seq) if isinstance(op, epg.D))
        bad = epg.D(4.0, 1e-3, k=2)
        seq = [bad if op is seq[i] else op for op in seq]
    elif mutate == "two_d_in_half":
        seq = _train(necho=8)
        i = next(i for i, op in enumerate(seq) if isinstance(op, epg.D))
        seq = seq[:i + 1] + [epg.D(1.0, 1e-3, k=1)] + seq[i + 1:]
    assert fisp_dispatch.match_mse(list(seq), KV) is None
    # parity holds anyway through whatever engine claims the train
    sig_k = epg.simulate(list(seq), kvalue=KV, fisp_kernel="force")
    sig_e = epg.simulate(list(seq), kvalue=KV, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5


def test_dw_cpmg_golden():
    """The exact DW-CPMG family pinned against the reference
    (dw_cpmg.npz from tools/make_golden.py): planner at f64 precision,
    kernel at f32 tolerance; scalar and tensor D."""
    g = np.load(os.path.join(GOLDEN, "dw_cpmg.npz"))
    kv = float(g["kvalue"])
    for key, Dc in (("signal", 1.2e-3),
                    ("signal_tensor",
                     np.diag([1.5e-3, 0.5e-3, 0.25e-3]))):
        d1, d2 = epg.D(4.0, Dc, k=1), epg.D(4.5, Dc, k=1)
        seq = [epg.T(90, 90)]
        for i in range(10):
            fa = 100.0 + 4.0 * (i % 5)
            seq += [epg.E(4.0, g["T1s"], g["T2s"]), epg.S(1), d1,
                    epg.T(fa, 0.0),
                    epg.E(4.5, g["T1s"], g["T2s"]), epg.S(1), d2,
                    epg.ADC]
        sig_e = np.asarray(epg.simulate(list(seq), kvalue=kv,
                                        fisp_kernel=False))
        assert np.abs(sig_e - g[key]).max() < 1e-10
        assert fisp_dispatch.match_mse(list(seq), kv) is not None
        sig_k = np.asarray(epg.simulate(list(seq), kvalue=kv,
                                        fisp_kernel="force"))
        assert np.abs(sig_k - g[key]).max() < 2e-6


def test_dw_jacobian_dispatch_parity():
    """Tracked DW-TSE trains with Adc/Jacobian probes route to the
    fused primal+tangent kernel; force-vs-planner parity over the
    (magnitude, T1, T2) columns."""
    seq = _train(necho=8, track=("T1", "T2"))
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    sig_k, jac_k = epg.simulate(list(seq), kvalue=KV, probe=probes,
                                fisp_kernel="force")
    sig_e, jac_e = epg.simulate(list(seq), kvalue=KV, probe=probes,
                                fisp_kernel=False)
    assert sig_k.shape == sig_e.shape == (8, 3)
    assert jac_k.shape == jac_e.shape == (8, 3, 3)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5
    scale = np.array([1.0, 1e3, 1e2])
    err = np.abs((np.asarray(jac_k) - np.asarray(jac_e)) * scale).max()
    assert err < 2e-4, err
