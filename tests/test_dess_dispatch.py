"""DESS train -> fused Pallas kernel dispatch (match_dess).

Double-echo steady state: [T, E, ADC, E, S(1), E, ADC] * N, one FISP
echo and one PSIF echo per TR.  The PSIF echo is the post-shift k=0
row of the folded half-ladder kernel (full-TR decay of F+(-1)), so
the kernel is the FISP kernel plus one extra output read.
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch
from epgpy_tpu.models.ssfp import dess_sequence


def _dtrain(P=16, B=3, *, df=0.0, b1=None, phases=None, demod=False,
            te2_delta=0.0):
    rng = np.random.default_rng(5)
    T1 = np.linspace(600, 1500, B)
    T2 = np.linspace(50, 120, B)
    seq = []
    for i in range(P):
        te1 = 4.0 + (i % 3) * 0.5
        mid = 8.0 + rng.uniform(0, 2)
        te2 = 5.0 + te2_delta
        ph = 0.0 if phases is None else float(phases[i])
        alpha = (20.0 + i) if b1 is None else (20.0 + i) * b1
        adc = epg.Adc(phase=-ph) if demod else epg.ADC
        adc2 = epg.Adc(phase=-ph) if demod else epg.ADC
        seq += [epg.T(alpha, ph), epg.E(te1, T1, T2, df), adc,
                epg.E(mid, T1, T2, df), epg.S(1),
                epg.E(te2, T1, T2, df), adc2]
    return seq


def _parity(seq, tol=1e-5):
    sig_k = epg.simulate(list(seq), fisp_kernel="force")
    sig_e = epg.simulate(list(seq), fisp_kernel=False)
    assert sig_k.shape == sig_e.shape
    err = np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max()
    assert err < tol, err
    return np.asarray(sig_k)


def test_match_extracts_params():
    seq = dess_sequence(20, alpha=25.0, TR=20.0, TE=5.0)
    params = fisp_dispatch.match_dess(seq)
    assert params is not None
    assert params["FA"].shape == (20,)
    assert params["TE"] == 5.0
    assert np.allclose(params["TR"], 20.0)


def test_dispatch_matches_planner():
    _parity(dess_sequence(24, alpha=25.0, TR=20.0, TE=5.0,
                          T1=1000.0, T2=80.0))


def test_dispatch_matches_planner_loaded():
    """Batched atoms, off-resonance, rank-1 B1 flips, varying per-TR
    timing, RF-spoiling phases with demodulated readouts."""
    phases = (117.0 * np.arange(20) * (np.arange(20) + 1) / 2) % 360
    seq = _dtrain(P=20, B=4, df=np.linspace(-0.02, 0.02, 4),
                  b1=np.linspace(0.85, 1.15, 4), phases=phases,
                  demod=True)
    _parity(seq)


def test_golden_reference_parity():
    """Physics pinned against the reference (tests/golden/dess.npz)."""
    import os
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "dess.npz"))
    seq = dess_sequence(30, alpha=25.0, TR=20.0, TE=5.0,
                        T1=1000.0, T2=80.0)
    sig_e = np.asarray(epg.simulate(list(seq), fisp_kernel=False,
                                    max_nstate=15))
    assert np.abs(sig_e - g["signal"]).max() < 1e-10
    sig_k = np.asarray(epg.simulate(list(seq), fisp_kernel="force",
                                    max_nstate=15))
    assert np.abs(sig_k - g["signal"]).max() < 1e-6


@pytest.mark.parametrize("mutate", [
    "shift2",          # non-unit shift
    "adc_attr",        # Z-probe second ADC
    "g_mismatch",      # off-resonance only on one E
    "short",           # < 2 TRs
])
def test_no_match_off_pattern(mutate):
    seq = _dtrain(P=8, B=2)
    if mutate == "shift2":
        i = next(j for j, op in enumerate(seq) if type(op) is epg.S)
        seq[i] = epg.S(2)
    elif mutate == "adc_attr":
        idxs = [j for j, op in enumerate(seq)
                if isinstance(op, epg.Adc)]
        seq[idxs[1]] = epg.Adc(attr="Z0")
    elif mutate == "g_mismatch":
        e = seq[3]
        seq[3] = epg.E(e.tau, e.T1, e.T2, 0.03)
    elif mutate == "short":
        seq = seq[:7]
    assert fisp_dispatch.match_dess(list(seq)) is None
    # off-DESS trains may still be claimed by the generic composite
    # family (f32 kernel); otherwise "force" falls through bit-for-bit
    sig_k = epg.simulate(list(seq), fisp_kernel="force")
    sig_e = epg.simulate(list(seq), fisp_kernel=False)
    tol = (2e-5 if fisp_dispatch.match_composite(list(seq)) is not None
           else 1e-7)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < tol


def test_fuzz_parity_or_fallthrough():
    rng = np.random.default_rng(99)
    for trial in range(6):
        P = int(rng.integers(2, 8))
        B = int(rng.integers(1, 4))
        T1 = rng.uniform(400, 1600, B)
        T2 = rng.uniform(40, 130, B)
        df = (rng.uniform(-0.03, 0.03, B) if rng.random() < 0.5 else 0.0)
        demod = bool(rng.random() < 0.5)
        seq = []
        for i in range(P):
            ph = float(rng.uniform(0, 360)) if demod else 0.0
            adc = epg.Adc(phase=-ph) if demod else epg.ADC
            seq += [epg.T(float(rng.uniform(10, 60)), ph),
                    epg.E(float(rng.uniform(2, 6)), T1, T2, df), adc,
                    epg.E(float(rng.uniform(4, 10)), T1, T2, df),
                    epg.S(1),
                    epg.E(float(rng.uniform(2, 6)), T1, T2, df),
                    epg.Adc(phase=-ph) if demod else epg.ADC]
        if rng.random() < 0.3:
            seq.insert(int(rng.integers(0, len(seq))), epg.S(1))
        sig_k = epg.simulate(list(seq), fisp_kernel="force")
        sig_e = epg.simulate(list(seq), fisp_kernel=False)
        matched = (fisp_dispatch.match_dess(list(seq)) is not None
                   or fisp_dispatch.match_composite(list(seq)) is not None)
        tol = 2e-5 if matched else 1e-7
        err = np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max()
        assert err < tol, (trial, matched, err)


@pytest.mark.parametrize("use_df,demod", [(False, False), (True, True)])
def test_dess_jacobian_kernel_matches_planner(use_df, demod):
    """Fused DESS primal + (dT1, dT2, dB1) tangents vs the f64 engine
    planner with Jacobian probes (T carries the B1 chain-rule
    coefficient d(alpha)/dB1 = FA; E ops track T1/T2).  Both echoes'
    derivative columns must match -- the PSIF echo tangents flow
    through the post-shift k=0 row including the full-TR dcF term."""
    from epgpy_tpu.models.pallas_dess import dess_jacobian_pallas

    P, B, NS = 24, 5, 8
    rng = np.random.default_rng(21)
    FA = rng.uniform(15, 50, P)
    phi = ((117.0 * np.arange(P) * (np.arange(P) + 1) / 2) % 360.0
           if demod else np.zeros(P))
    TR, TE = 18.0, 5.0
    T1 = rng.uniform(500, 1800, B)
    T2 = rng.uniform(40, 150, B)
    B1 = rng.uniform(0.85, 1.15, B)
    df = np.linspace(-0.02, 0.02, B) if use_df else None

    seq = []
    for i in range(P):
        adc = epg.Adc(phase=-phi[i]) if demod else epg.ADC
        adc2 = epg.Adc(phase=-phi[i]) if demod else epg.ADC
        g = 0.0 if df is None else df
        seq += [epg.T(FA[i] * B1, phi[i],
                      order1={"B1": {"alpha": float(FA[i])}}),
                epg.E(TE, T1, T2, g, order1=["T1", "T2"]), adc,
                epg.E(TR - TE - 6.0, T1, T2, g, order1=["T1", "T2"]),
                epg.S(1),
                epg.E(6.0, T1, T2, g, order1=["T1", "T2"]), adc2]
    sig, jac = epg.simulate(
        seq, max_nstate=NS, fisp_kernel=False,
        probe=[epg.ADC, epg.Jacobian(["T1", "T2", "B1"])])
    sig = np.asarray(sig)                       # (2P, B)
    jac = np.asarray(jac)                       # (2P, B, 3)

    (e1, e2), (j1, j2) = dess_jacobian_pallas(
        FA, phi, TR, TE, T1, T2, B1, df, nstate=NS, btile=128,
        pchunk=P, demodulate=demod, interpret=True)
    k_sig1 = np.asarray(e1[0]) + 1j * np.asarray(e1[1])   # (B, P)
    k_sig2 = np.asarray(e2[0]) + 1j * np.asarray(e2[1])
    assert np.abs(k_sig1.T - sig[0::2]).max() < 2e-5
    assert np.abs(k_sig2.T - sig[1::2]).max() < 2e-5

    k_j1 = np.asarray(j1[0]) + 1j * np.asarray(j1[1])     # (B, P, 3)
    k_j2 = np.asarray(j2[0]) + 1j * np.asarray(j2[1])
    scale = np.array([1e3, 1e2, 1.0])           # typical param sizes
    err1 = np.abs((k_j1.transpose(1, 0, 2) - jac[0::2]) * scale).max()
    err2 = np.abs((k_j2.transpose(1, 0, 2) - jac[1::2]) * scale).max()
    assert err1 < 2e-4, err1
    assert err2 < 2e-4, err2


def test_dess_jacobian_dispatch_parity():
    """simulate() routes tracked DESS trains with Adc/Jacobian probes
    to the fused kernel; force-vs-planner parity on both the signal
    rows and the (magnitude, T1, T2) Jacobian columns (interleaved
    echo ADC order)."""
    P, B, NS = 12, 3, 8
    rng = np.random.default_rng(31)
    FA = rng.uniform(15, 50, P)
    T1 = rng.uniform(500, 1800, B)
    T2 = rng.uniform(40, 150, B)
    seq = []
    for i in range(P):
        seq += [epg.T(float(FA[i]), 0.0),
                epg.E(5.0, T1, T2, order1=["T1", "T2"]), epg.ADC,
                epg.E(7.0, T1, T2, order1=["T1", "T2"]), epg.S(1),
                epg.E(6.0, T1, T2, order1=["T1", "T2"]), epg.ADC]
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    sig_k, jac_k = epg.simulate(list(seq), max_nstate=NS,
                                probe=probes, fisp_kernel="force")
    sig_e, jac_e = epg.simulate(list(seq), max_nstate=NS,
                                probe=probes, fisp_kernel=False)
    assert sig_k.shape == sig_e.shape == (2 * P, B)
    assert jac_k.shape == jac_e.shape == (2 * P, B, 3)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5
    scale = np.array([1.0, 1e3, 1e2])
    err = np.abs((np.asarray(jac_k) - np.asarray(jac_e)) * scale).max()
    assert err < 2e-4, err

    # off-pattern diff spec (alias) falls through to the planner
    seq2 = list(seq)
    e = seq2[1]
    seq2[1] = epg.E(5.0, T1, T2, order1={"R1": "T1", "T2": "T2"})
    from epgpy_tpu import fisp_dispatch
    m = fisp_dispatch.match_dess(seq2)
    assert m is None or not m["vars"]
