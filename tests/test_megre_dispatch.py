"""Multi-echo GRE train -> fused Pallas kernel dispatch (match_megre).

ME-GRE reads m >= 2 echoes per TR before the spoiler (the T2*/B0
mapping acquisition): ``[T, (E, Adc) * m, E?, S(1)] * N``.  The kernel
evaluates the rotation once per TR and writes m decayed copies of the
k=0 row (k-independent relaxation commutes with everything between
pulse and shift).
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch


def _metrain(P=10, B=3, m=3, *, df=0.0, b1=None, demod=False,
             has_rest=True, vary_te=False):
    rng = np.random.default_rng(13)
    T1 = np.linspace(500, 1600, B)
    T2 = np.linspace(40, 130, B)
    seq = []
    for i in range(P):
        ph = float((117.0 * i * (i + 1) / 2) % 360) if demod else 0.0
        alpha = (15.0 + i) if b1 is None else (15.0 + i) * b1
        seq.append(epg.T(alpha, ph))
        prev = 0.0
        for j in range(m):
            te = 3.0 * (j + 1) + (0.4 * i if vary_te else 0.0)
            seq += [epg.E(te - prev, T1, T2, df),
                    epg.Adc(phase=-ph) if demod else epg.ADC]
            prev = te
        if has_rest:
            seq.append(epg.E(4.0 + (i % 2), T1, T2, df))
        seq.append(epg.S(1))
    return seq


def _parity(seq, tol=2e-5):
    sig_k = epg.simulate(list(seq), fisp_kernel="force")
    sig_e = epg.simulate(list(seq), fisp_kernel=False)
    assert sig_k.shape == sig_e.shape
    err = np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max()
    assert err < tol, err
    return np.asarray(sig_k)


def test_match_extracts_params():
    seq = _metrain(P=8, B=2, m=3)
    params = fisp_dispatch.match_megre(seq)
    assert params is not None
    assert params["nechoes"] == 3
    assert params["FA"].shape == (8,)
    assert params["TE"].shape == (3, 8)
    assert np.allclose(params["TE"][:, 0], [3.0, 6.0, 9.0])


def test_dispatch_matches_planner():
    _parity(_metrain(P=12, B=3, m=2))
    _parity(_metrain(P=8, B=2, m=4, has_rest=False))


def test_dispatch_matches_planner_loaded():
    """Batched atoms, off-resonance, rank-1 B1 flips, RF-spoiling
    demodulation, per-TR echo-time variation."""
    seq = _metrain(P=10, B=4, m=3, df=np.linspace(-0.03, 0.03, 4),
                   b1=np.linspace(0.85, 1.15, 4), demod=True,
                   vary_te=True)
    _parity(seq)


@pytest.mark.parametrize("mutate", [
    "shift2",          # non-unit shift
    "adc_attr",        # Z-probe echo
    "one_echo",        # m = 1 belongs to match_fisp
    "ragged",          # echo count changes mid-train
])
def test_no_match_off_pattern(mutate):
    seq = _metrain(P=6, B=2, m=2)
    if mutate == "shift2":
        i = next(j for j, op in enumerate(seq) if type(op) is epg.S)
        seq[i] = epg.S(2)
    elif mutate == "adc_attr":
        idxs = [j for j, op in enumerate(seq) if isinstance(op, epg.Adc)]
        seq[idxs[1]] = epg.Adc(attr="Z0")
    elif mutate == "one_echo":
        seq = _metrain(P=6, B=2, m=1)
    elif mutate == "ragged":
        # drop one echo from the second TR
        L = len(seq) // 6
        del seq[L + 3:L + 5]
    assert fisp_dispatch.match_megre(list(seq)) is None
    sig_k = epg.simulate(list(seq), fisp_kernel="force")
    sig_e = epg.simulate(list(seq), fisp_kernel=False)
    # the generic composite family may claim the mutated train (f32)
    tol = (2e-5 if fisp_dispatch.match_composite(list(seq)) is not None
           else 1e-7)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < tol


def test_fuzz_parity_or_fallthrough():
    rng = np.random.default_rng(47)
    for trial in range(6):
        P = int(rng.integers(2, 6))
        B = int(rng.integers(1, 4))
        m = int(rng.integers(2, 5))
        T1 = rng.uniform(400, 1600, B)
        T2 = rng.uniform(40, 130, B)
        df = (rng.uniform(-0.03, 0.03, B) if rng.random() < 0.5 else 0.0)
        demod = bool(rng.random() < 0.5)
        has_rest = bool(rng.random() < 0.7)
        seq = []
        for i in range(P):
            ph = float(rng.uniform(0, 360)) if demod else 0.0
            seq.append(epg.T(float(rng.uniform(10, 50)), ph))
            for _ in range(m):
                seq += [epg.E(float(rng.uniform(1, 5)), T1, T2, df),
                        epg.Adc(phase=-ph) if demod else epg.ADC]
            if has_rest:
                seq.append(epg.E(float(rng.uniform(2, 8)), T1, T2, df))
            seq.append(epg.S(1))
        if rng.random() < 0.3:
            seq.insert(int(rng.integers(0, len(seq))), epg.S(1))
        sig_k = epg.simulate(list(seq), fisp_kernel="force")
        sig_e = epg.simulate(list(seq), fisp_kernel=False)
        matched = (fisp_dispatch.match_megre(list(seq)) is not None
                   or fisp_dispatch.match_composite(list(seq)) is not None)
        tol = 2e-5 if matched else 1e-7
        err = np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max()
        assert err < tol, (trial, matched, err)


@pytest.mark.parametrize("use_df,demod", [(False, False), (True, True)])
def test_megre_jacobian_kernel_matches_planner(use_df, demod):
    """Fused ME-GRE primal + (dT1, dT2, dB1, ddf) tangents vs the f64
    planner (the E op has analytic dg, so all four columns have an
    exact oracle; the df tangent flows through BOTH the per-echo TE
    phasor and the carried full-TR phasor)."""
    from epgpy_tpu.models.pallas_megre import megre_jacobian_pallas

    P, B, NS, m = 10, 4, 8, 3
    rng = np.random.default_rng(23)
    FA = rng.uniform(10, 40, P)
    phi = ((117.0 * np.arange(P) * (np.arange(P) + 1) / 2) % 360.0
           if demod else np.zeros(P))
    tes = np.array([3.0, 7.5, 12.0])
    TR = 20.0
    T1 = rng.uniform(400, 1800, B)
    T2 = rng.uniform(30, 150, B)
    B1 = rng.uniform(0.85, 1.15, B)
    df = np.linspace(-0.03, 0.03, B) if use_df else None
    o1 = ["T1", "T2", "g"]
    seq = []
    for i in range(P):
        g = 0.0 if df is None else df
        seq.append(epg.T(FA[i] * B1, phi[i],
                         order1={"B1": {"alpha": float(FA[i])}}))
        prev = 0.0
        for te in tes:
            seq += [epg.E(te - prev, T1, T2, g, order1=o1),
                    epg.Adc(phase=-phi[i]) if demod else epg.ADC]
            prev = te
        seq += [epg.E(TR - prev, T1, T2, g, order1=o1), epg.S(1)]
    sig, jac = epg.simulate(
        seq, max_nstate=NS, fisp_kernel=False,
        probe=[epg.ADC, epg.Jacobian(["T1", "T2", "B1", "g"])])
    sig = np.asarray(sig)
    jac = np.asarray(jac)

    (re, im), (jre, jim) = megre_jacobian_pallas(
        FA, phi, TR, tes, T1, T2, B1, df, nstate=NS, btile=128,
        pchunk=P, demodulate=demod, interpret=True)
    k = (np.asarray(re) + 1j * np.asarray(im)).reshape(B, P * m).T
    assert np.abs(k - sig).max() < 2e-5
    kj = np.moveaxis((np.asarray(jre) + 1j * np.asarray(jim))
                     .reshape(B, P * m, 4), 0, 1)
    scale = np.array([1e3, 1e2, 1.0, 1e-2])      # typical param sizes
    err = np.abs((kj - jac) * scale).max()
    assert err < 2e-4, err


def test_megre_jacobian_dispatch_parity():
    """simulate() routes g-tracked ME-GRE trains with Adc/Jacobian
    probes to the fused kernel; force-vs-planner parity over the
    (magnitude, T2, g) columns -- the B0-mapping spec."""
    P, B, NS, m = 8, 3, 8, 2
    rng = np.random.default_rng(37)
    FA = rng.uniform(10, 40, P)
    T1 = rng.uniform(500, 1600, B)
    T2 = rng.uniform(40, 130, B)
    df = np.linspace(-0.02, 0.02, B)
    o1 = ["T1", "T2", "g"]
    seq = []
    for i in range(P):
        seq.append(epg.T(float(FA[i]), 0.0))
        prev = 0.0
        for te in (4.0, 9.0):
            seq += [epg.E(te - prev, T1, T2, df, order1=o1), epg.ADC]
            prev = te
        seq += [epg.E(6.0, T1, T2, df, order1=o1), epg.S(1)]
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T2", "g"])]
    sig_k, jac_k = epg.simulate(list(seq), max_nstate=NS,
                                probe=probes, fisp_kernel="force")
    sig_e, jac_e = epg.simulate(list(seq), max_nstate=NS,
                                probe=probes, fisp_kernel=False)
    assert sig_k.shape == sig_e.shape == (m * P, B)
    assert jac_k.shape == jac_e.shape == (m * P, B, 3)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5
    scale = np.array([1.0, 1e2, 1e-2])
    err = np.abs((np.asarray(jac_k) - np.asarray(jac_e)) * scale).max()
    assert err < 2e-4, err


def test_golden_reference_parity():
    """Physics pinned against the reference (tests/golden/megre.npz):
    the planner at 1e-10 and the fused kernel at f32 tolerance."""
    import os
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "megre.npz"))
    n, TR = 20, 22.0
    tes = [4.0, 9.0, 15.0]
    seq = []
    for i in range(n):
        seq.append(epg.T(15 + i, 0))
        prev = 0.0
        for te in tes:
            seq += [epg.E(te - prev, 900, 70, 0.02), epg.ADC]
            prev = te
        seq += [epg.E(TR - prev, 900, 70, 0.02), epg.S(1)]
    sig_e = np.asarray(epg.simulate(list(seq), fisp_kernel=False,
                                    max_nstate=12))
    assert np.abs(sig_e - g["signal"]).max() < 1e-10
    sig_k = np.asarray(epg.simulate(list(seq), fisp_kernel="force",
                                    max_nstate=12))
    assert np.abs(sig_k - g["signal"]).max() < 1e-6
