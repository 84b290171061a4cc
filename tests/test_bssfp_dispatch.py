"""bSSFP train -> fused k=0 Pallas kernel dispatch (match_bssfp).

Balanced (spoiler-free) trains keep the whole EPG ladder in the k=0
row; simulate() routes them to models/pallas_bssfp.  Tests force the
dispatch with fisp_kernel="force" (interpret-mode kernel on CPU) and
compare against the scan planner (fisp_kernel=False), which is itself
golden-pinned against the reference.
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch
from epgpy_tpu.models.ssfp import bssfp_sequence


def _btrain(P=24, B=4, *, df=None, b1=None, inversion=None, te=None,
            phase_cycle=180.0, demodulate=True, order1=None):
    rng = np.random.default_rng(7)
    FA = 10 + 50 * np.abs(np.sin(np.arange(P) / 5.0)) + rng.uniform(0, 2, P)
    TR = rng.uniform(11, 14, P)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    seq = bssfp_sequence(FA, TR, te, T1=T1, T2=T2, df=df,
                         phase_cycle=phase_cycle, demodulate=demodulate,
                         inversion=inversion, order1=order1)
    if b1 is not None:
        # rank-1 outer(FA, B1) flip batch: scale every train pulse
        out = []
        for op in seq:
            if type(op) is epg.T and np.ndim(op.alpha) == 0 \
                    and float(np.asarray(op.alpha)) != 180.0:
                out.append(epg.T(np.asarray(op.alpha) * b1, op.phi))
            else:
                out.append(op)
        seq = out
    return seq


def _parity(seq, tol=1e-5):
    sig_k = epg.simulate(list(seq), fisp_kernel="force")
    sig_e = epg.simulate(list(seq), fisp_kernel=False)
    assert sig_k.shape == sig_e.shape
    err = np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max()
    assert err < tol, err
    return np.asarray(sig_k)


def test_match_extracts_params():
    seq = _btrain(P=24, B=5, df=0.02, inversion=20.0)
    params = fisp_dispatch.match_bssfp(seq)
    assert params is not None
    assert params["FA"].shape == (24,)
    assert params["TI"] == 20.0
    assert params["demod"] is True
    assert np.allclose(params["df"], 0.02)
    # TE defaults to TR/2 (per-pulse since TR varies)
    assert np.allclose(params["TE"], params["TR"] / 2)


def test_dispatch_matches_planner():
    _parity(_btrain(P=24, B=5))


def test_dispatch_matches_planner_offres_prep():
    """Off-resonance + inversion prep: the kernel applies the TI phase
    to the prepped F+ (unlike FISP preps, which require g=0)."""
    dfv = np.linspace(-0.04, 0.04, 4)
    _parity(_btrain(P=24, B=4, df=dfv, inversion=18.0))


def test_dispatch_matches_planner_b1_batch():
    _parity(_btrain(P=20, B=5, b1=np.linspace(0.8, 1.2, 5),
                    df=0.01, inversion=15.0))


def test_dispatch_no_demod_explicit_te():
    _parity(_btrain(P=16, B=4, demodulate=False, te=3.0,
                    phase_cycle=117.0))


def test_dispatch_nd_batch_grid():
    """Outer T1 x T2 grids flatten to the kernel atom axis and the
    output restores the append-broadcast shape."""
    FA = 10 + 40 * np.abs(np.sin(np.arange(16) / 4.0))
    T1 = np.linspace(400, 1400, 3)[:, None]
    T2 = np.linspace(40, 110, 4)[None, :]
    seq = []
    for i in range(16):
        ph = (180.0 * (i + 1)) % 360.0
        seq += [epg.T(float(FA[i]), ph), epg.E(6.0, T1, T2),
                epg.Adc(phase=-ph), epg.E(6.0, T1, T2)]
    sig_k = epg.simulate(seq, fisp_kernel="force")
    sig_e = epg.simulate(seq, fisp_kernel=False)
    assert sig_k.shape == sig_e.shape == (16, 3, 4)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5


@pytest.mark.parametrize("mutate", [
    "adc_phase",        # ADC phase not -phi
    "g_mismatch",       # g on only one E of a TR
    "prep_g",           # prep g differs from the train's
    "diff_t",           # order1 on a T op
    "short",            # < 2 TRs
])
def test_no_match_off_pattern(mutate):
    seq = _btrain(P=12, B=3, df=0.01, inversion=12.0)
    if mutate == "adc_phase":
        i = next(j for j, op in enumerate(seq) if type(op) is epg.Adc)
        seq[i] = epg.Adc(phase=33.0)
    elif mutate == "g_mismatch":
        i = next(j for j, op in enumerate(seq[3:], 3)
                 if type(op) is epg.E)
        e = seq[i]
        seq[i] = epg.E(e.tau, e.T1, e.T2, 0.5)
    elif mutate == "prep_g":
        e = seq[1]
        seq[1] = epg.E(e.tau, e.T1, e.T2, 0.99)
    elif mutate == "diff_t":
        t = seq[2]
        seq[2] = epg.T(t.alpha, t.phi, order1=["alpha"])
    elif mutate == "short":
        seq = seq[:6]
    assert fisp_dispatch.match_bssfp(list(seq)) is None
    # and simulate still runs correctly through the planner (or the
    # generic composite family, at f32 tolerance)
    if mutate != "diff_t":
        sig_k = epg.simulate(list(seq), fisp_kernel="force")
        sig_e = epg.simulate(list(seq), fisp_kernel=False)
        tol = (2e-5 if fisp_dispatch.match_composite(list(seq)) is not None
               else 1e-7)
        assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < tol


def test_families_disjoint():
    """A spoiled FISP train never matches bssfp and vice versa."""
    bseq = _btrain(P=12, B=3)
    assert fisp_dispatch.match_fisp(list(bseq)) is None
    T1, T2 = np.array([800.0]), np.array([80.0])
    fseq = []
    for i in range(10):
        fseq += [epg.T(30, 0), epg.E(4.0, T1, T2), epg.ADC,
                 epg.E(8.0, T1, T2), epg.S(1)]
    assert fisp_dispatch.match_bssfp(list(fseq)) is None
    assert fisp_dispatch.match_fisp(list(fseq)) is not None


def test_jacobian_dispatch_matches_planner():
    dfv = np.linspace(-0.03, 0.03, 4)
    seq = _btrain(P=20, B=4, df=dfv, inversion=16.0,
                  order1=["T1", "T2"])
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    sig_k, jac_k = epg.simulate(list(seq), probe=probes,
                                fisp_kernel="force")
    sig_e, jac_e = epg.simulate(list(seq), probe=probes,
                                fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    je, jk = np.asarray(jac_e), np.asarray(jac_k)
    assert je.shape == jk.shape
    for c in range(3):
        err = (np.abs(jk[..., c] - je[..., c]).max()
               / max(np.abs(je[..., c]).max(), 1e-12))
        assert err < 2e-5, (c, err)


@pytest.mark.slow
def test_jacobian_dispatch_tracks_df():
    """bSSFP admits ``g`` tracking (ddf tangent group — off-resonance
    is a fitted parameter in MRF-bSSFP): the fused kernel's 4th column
    matches the planner's dS/dg, with and without an inversion prep
    and at df=0 (df=None)."""
    for df, inv in [(np.linspace(-0.03, 0.03, 4), 16.0),
                    (np.linspace(-0.03, 0.03, 4), None),
                    (None, 12.0)]:
        seq = _btrain(P=16, B=4, df=df, inversion=inv,
                      order1=["T1", "T2", "g"])
        params = fisp_dispatch.match_bssfp(list(seq))
        assert params is not None
        assert params["vars"] == ("T1", "T2", "g")
        probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2", "g"])]
        sig_k, jac_k = epg.simulate(list(seq), probe=probes,
                                    fisp_kernel="force")
        sig_e, jac_e = epg.simulate(list(seq), probe=probes,
                                    fisp_kernel=False)
        assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
        je, jk = np.asarray(jac_e), np.asarray(jac_k)
        assert je.shape == jk.shape
        for c in range(4):
            err = (np.abs(jk[..., c] - je[..., c]).max()
                   / max(np.abs(je[..., c]).max(), 1e-12))
            assert err < 2e-5, (df is None, inv, c, err)


def test_g_tracking_spoiled_routes_to_composite():
    """A g-tracked FISP (spoiled) train is rejected by the exact FISP
    matcher (its kernels carry no df tangent group) but is claimed --
    r4 -- by the generic composite family, whose Jacobian kernel has
    an exact df column; parity vs the planner at f32 tolerance."""
    T1, T2 = np.array([800.0, 1200.0]), np.array([60.0, 90.0])
    fseq = []
    for i in range(8):
        fseq += [epg.T(30 + i, 0),
                 epg.E(4.0, T1, T2, 0.01, order1=["T1", "T2", "g"]),
                 epg.ADC,
                 epg.E(8.0, T1, T2, 0.01, order1=["T1", "T2", "g"]),
                 epg.S(1)]
    assert fisp_dispatch.match_fisp(list(fseq)) is None
    assert fisp_dispatch.match_composite(list(fseq)) is not None
    probes = [epg.Jacobian(["T1", "g"])]
    out = epg.simulate(list(fseq), probe=probes, fisp_kernel="force")
    ref = epg.simulate(list(fseq), probe=probes, fisp_kernel=False)
    scale = np.array([1e3, 1e-2])
    assert np.abs((np.asarray(out) - np.asarray(ref)) * scale).max() < 3e-4


def test_jacobian_hessian_falls_through():
    seq = _btrain(P=12, B=3, order1=["T1", "T2"])
    out = epg.simulate(list(seq), fisp_kernel="force",
                       probe=[epg.Jacobian(["T1"]),
                              epg.Hessian(["T1"], ["T2"])])
    ref = epg.simulate(list(seq), fisp_kernel=False,
                       probe=[epg.Jacobian(["T1"]),
                              epg.Hessian(["T1"], ["T2"])])
    for a, b in zip(out, ref):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-7


def test_golden_reference_parity():
    """Physics pinned against the reference itself (tests/golden/
    bssfp.npz, generated by tools/make_golden.py: IR-prepped
    phase-alternating bSSFP with off-resonance + B1 batch): the
    planner matches at 1e-10 (x64) and the fused kernel at f32
    tolerance."""
    import os
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "bssfp.npz"))
    FAs, TRs, phases = g["FAs"], g["TRs"], g["phases"]
    T1s, T2s, dfs, B1s = g["T1s"], g["T2s"], g["dfs"], g["B1s"]
    seq = [epg.T(180 * B1s, 0), epg.E(18.0, T1s, T2s, dfs)]
    for i in range(len(FAs)):
        te = TRs[i] / 2
        seq += [
            epg.T(FAs[i] * B1s, phases[i]),
            epg.E(te, T1s, T2s, dfs), epg.Adc(phase=-phases[i]),
            epg.E(TRs[i] - te, T1s, T2s, dfs),
        ]
    sig_e = np.asarray(epg.simulate(list(seq), fisp_kernel=False))
    assert np.abs(sig_e - g["signal"]).max() < 1e-10
    sig_k = np.asarray(epg.simulate(list(seq), fisp_kernel="force"))
    assert np.abs(sig_k - g["signal"]).max() < 2e-5


def test_fuzz_parity_or_fallthrough():
    """Randomized bSSFP-family trains: dispatch either matches the
    planner at f32 tolerance, or (off-pattern) falls through bit-for-
    bit."""
    rng = np.random.default_rng(42)
    for trial in range(8):
        P = int(rng.integers(3, 12))
        B = int(rng.integers(1, 5))
        FA = rng.uniform(5, 70, P)
        TR = rng.uniform(8, 15, P)
        T1 = rng.uniform(300, 1600, B)
        T2 = rng.uniform(30, 130, B)
        df = rng.uniform(-0.05, 0.05, B) if rng.random() < 0.5 else None
        inv = float(rng.uniform(8, 25)) if rng.random() < 0.5 else None
        pc = float(rng.choice([0.0, 117.0, 180.0]))
        demod = bool(rng.random() < 0.7)
        te = float(rng.uniform(2, 4)) if rng.random() < 0.3 else None
        seq = bssfp_sequence(FA, TR, te, T1=T1, T2=T2, df=df,
                             phase_cycle=pc, demodulate=demod,
                             inversion=inv)
        if rng.random() < 0.25:
            # random off-pattern mutation
            i = int(rng.integers(0, len(seq)))
            seq.insert(i, epg.S(1))
        sig_k = epg.simulate(list(seq), fisp_kernel="force")
        sig_e = epg.simulate(list(seq), fisp_kernel=False)
        matched = (fisp_dispatch.match_bssfp(list(seq)) is not None
                   or fisp_dispatch.match_composite(list(seq)) is not None)
        tol = 2e-5 if matched else 1e-7
        err = np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max()
        assert err < tol, (trial, matched, err)
