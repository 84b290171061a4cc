"""End-to-end invariants + golden parity vs the reference implementation.

Golden .npz files are produced by tools/make_golden.py (runs the reference
epgpy on NumPy); the tests here never import the reference.
"""

import os

import numpy as np
import pytest

import epgpy_tpu as epg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(name):
    path = os.path.join(GOLDEN, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden file missing: {name}")
    return np.load(path)


def test_hyperecho():
    """After a +a... 180 ...-a train the echo returns to exactly 1."""
    alphas = [10, 25, 40, 55, 70]
    seq = [epg.T(90, 90)]
    for a in alphas:
        seq += [epg.S(1), epg.T(a, 0)]
    seq += [epg.S(1), epg.T(180, 0)]
    for a in reversed(alphas):
        seq += [epg.S(1), epg.T(-a, 0)]
    seq += [epg.S(1), epg.ADC]
    sig = np.asarray(epg.simulate(seq))
    assert np.allclose(np.abs(sig), 1.0, atol=1e-9)


def test_cpmg_golden():
    g = load_golden("cpmg")
    T2s = list(g["T2s"])
    necho = g["signal"].shape[0]
    seq = [epg.T(90, 90)] + [
        epg.E(4.5, 1400, T2s), epg.S(1), epg.T(150, 0),
        epg.E(4.5, 1400, T2s), epg.S(1), epg.ADC,
    ] * necho
    sig = np.asarray(epg.simulate(seq))
    assert sig.shape == g["signal"].shape
    assert np.abs(sig - g["signal"]).max() < 1e-12


def test_spgr_golden():
    g = load_golden("spgr")
    n, TR, TE = 50, 10.0, 3.0
    phases = np.cumsum(np.arange(n) * 117.0)
    seq = []
    for i in range(n):
        seq += [
            epg.T(15, phases[i] % 360),
            epg.E(TE, 1000, 80), epg.Adc(phase=-(phases[i] % 360)),
            epg.E(TR - TE, 1000, 80), epg.S(1),
        ]
    sig = np.asarray(epg.simulate(seq, max_nstate=20))
    assert np.abs(sig - g["signal"]).max() < 1e-12


def test_mse_b1_golden():
    g = load_golden("mse_b1")
    T2s, B1s = g["T2s"], g["B1s"]
    seq = [epg.T(90, 90)]
    for _ in range(g["signal"].shape[0]):
        seq += [
            epg.E(4.5, 1400, T2s), epg.S(1),
            epg.T(150 * B1s[None, :], 0),
            epg.E(4.5, 1400, T2s), epg.S(1), epg.ADC,
        ]
    sig = np.asarray(epg.simulate(seq))
    assert sig.shape == g["signal"].shape
    assert np.abs(sig - g["signal"]).max() < 1e-12


def test_fisp_mrf_golden():
    g = load_golden("fisp_mrf")
    FAs, T1s, T2s = g["FAs"], list(g["T1s"]), list(g["T2s"])
    TR, TE = 12.0, 5.0
    seq = []
    for i in range(len(FAs)):
        seq += [
            epg.T(FAs[i], 90),
            epg.E(TE, T1s, T2s), epg.ADC,
            epg.E(TR - TE, T1s, T2s), epg.S(1),
        ]
    sig = np.asarray(epg.simulate(seq, max_nstate=10))
    assert sig.shape == g["signal"].shape
    assert np.abs(sig - g["signal"]).max() < 1e-12


def test_scan_vs_unrolled():
    """Scan compilation and full unroll produce identical results."""
    T2s = [30.0, 60.0]
    seq = [epg.T(90, 90)] + [
        epg.E(5, 1000, T2s), epg.S(1), epg.T(120, 0),
        epg.E(5, 1000, T2s), epg.S(1), epg.ADC,
    ] * 12
    a = np.asarray(epg.simulate(seq, scan=True))
    b = np.asarray(epg.simulate(seq, scan=False))
    c = np.asarray(epg.simulate(seq, jit=False))
    assert np.abs(a - b).max() < 1e-12
    assert np.abs(a - c).max() < 1e-12


def test_spoiler_reset():
    sm = epg.T(90, 90)(epg.StateMatrix(nstate=2))
    spoiled = epg.SPOILER(sm)
    assert np.allclose(np.asarray(spoiled.F), 0)
    assert np.allclose(np.asarray(spoiled.Z0), np.asarray(sm.Z0))
    reset = epg.RESET(sm)
    assert np.allclose(np.asarray(reset.Z0), 1.0)
    assert np.allclose(np.asarray(reset.F0), 0.0)


def test_norm_conservation_under_T_S():
    """T and S conserve total state norm (reference test_statematrix.py:251)."""
    sm = epg.StateMatrix(nstate=4)
    sm = epg.T(90, 0)(sm)
    norm0 = np.asarray(sm.norm)
    for _ in range(3):
        sm = epg.S(1)(sm)
        sm = epg.T(35, 45)(sm)
        assert np.allclose(np.asarray(sm.norm), norm0)


def test_shift_truncation_cap():
    """max_nstate truncation: capped ladder == full ladder when cap suffices;
    truncation parity with the reference is covered by test_fisp_mrf_golden
    (the golden was generated with max_nstate=10 over 64 shifts)."""
    seq = [epg.T(90, 90)] + [
        epg.S(1), epg.T(150, 0), epg.S(1), epg.ADC,
    ] * 6
    full = np.asarray(epg.simulate(seq))
    roomy = np.asarray(epg.simulate(seq, max_nstate=50))
    assert np.abs(full - roomy).max() < 1e-12


def test_dess_golden():
    """DESS: two ADC slots per TR exercise scan-block probe interleaving."""
    g = load_golden("dess")
    from epgpy_tpu.models.ssfp import dess_sequence
    seq = dess_sequence(30, alpha=25.0, TR=20.0, TE=5.0, T1=1000.0, T2=80.0)
    sig = np.asarray(epg.simulate(seq, max_nstate=15))
    assert sig.shape == g["signal"].shape
    assert np.abs(sig - g["signal"]).max() < 1e-12


def test_reference_namespace_aliases():
    """Flat-namespace parity with the reference package (epgpy/__init__.py):
    submodule aliases, NAX, DiffOperator, check_states, array-module shims."""
    import numpy as np
    import epgpy_tpu as pkg
    from epgpy_tpu import epg

    for ns in (pkg, epg):
        assert ns.transition.T is ns.T
        assert ns.evolution.E is ns.E
        assert ns.opscalar.ScalarOp is ns.ScalarOp
        assert ns.NAX is None
        assert issubclass(ns.T, ns.DiffOperator)
        assert ns.check_states(np.asarray([[0.1 + 0.2j, 0.1 - 0.2j, 0.5]]))
        assert not ns.check_states(np.asarray([[0.1 + 0.2j, 0.3, 0.5]]))
        assert ns.get_array_module().__name__ == "jax.numpy"


def test_norm_conservation_scaled_equilibrium():
    """Norm conservation holds for a non-unit equilibrium too (reference
    test_statematrix.py:251-266, equilibrium=[0,0,10])."""
    sm = epg.StateMatrix(equilibrium=[0, 0, 10], nstate=10)
    assert np.allclose(np.asarray(sm.norm), 10.0)
    for _ in range(10):
        sm = epg.T(30, 30)(sm)
        sm = epg.S(1)(sm)
    assert np.allclose(np.asarray(sm.norm), 10.0)


def test_norm_conservation_nd_shifts():
    """T and n-D S conserve the norm on the coordinate table too."""
    from epgpy_tpu.ops.shiftnd import _intdtype

    sm = epg.StateMatrix(nstate=60)
    sm = sm.setup_coords(3)
    sm = sm.update(coords=sm.coords.astype(_intdtype()))
    sm = epg.T(90, 0)(sm)
    norm0 = np.asarray(sm.norm)
    ks = [np.array([[1, 0, 0]]), np.array([[0, 2, -1]]),
          np.array([[1, 1, 1]])]
    for k in ks:
        sm = epg.S(k)(sm)
        sm = epg.T(25, 130)(sm)
        assert np.allclose(np.asarray(sm.norm), norm0)
