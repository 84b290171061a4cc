"""B1-tracked Jacobian dispatch (r5, VERDICT #5).

B1 enters the physics only as the flip attenuation (reference `modify`
``att`` keyword, epgpy/functions.py:316-347): a B1-mapping train writes
``T(FA_i * B1, phi, order1={"B1": {"alpha": FA_i}})`` — the chain-rule
coefficient IS the nominal flip, d(alpha_i)/dB1 = FA_i.  The FISP /
CPMG / bSSFP / composite Jacobian kernels all carry a dB1 tangent
group (w.r.t. their internally re-normalized B1), so the matchers
validate the user's coefficients against the rank-1 factorization
(one shared ratio s = FA_kernel/c) and the runners rescale the column
by 1/s into physical-B1 units.

Oracle: the f64 scan planner, which handles the same order1 spec
analytically; plus one finite-difference pin of the spec semantics.
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch


def _b1_fisp_train(P=20, B=4, *, track=("T1", "T2"), coeff=None,
                   untrack_some=False, prep=False):
    """prep: False, "untracked" (vector 180*B1 prep, no B1 spec -- must
    fall through: the kernel's dB1 includes the prep) or "tracked"
    (order1={"B1": {"alpha": 180}} on the prep -> routes)."""
    rng = np.random.default_rng(11)
    FA = rng.uniform(10, 60, P)
    TRs = rng.uniform(11, 16, P)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    B1 = np.linspace(0.85, 1.15, B)
    seq = []
    if prep:
        o1p = ({"B1": {"alpha": 180.0}} if prep == "tracked" else None)
        seq += [epg.T(180 * B1, 0, order1=o1p),
                epg.E(18.0, T1, T2, order1=list(track))]
    for i in range(P):
        c = float(FA[i]) if coeff is None else coeff(i, FA)
        o1 = {"B1": {"alpha": c}}
        if untrack_some and i % 3 == 0:
            o1 = None
        seq += [
            epg.T(FA[i] * B1, 90.0, order1=o1),
            epg.E(4.0, T1, T2, order1=list(track)),
            epg.ADC,
            epg.E(float(TRs[i]) - 4.0, T1, T2, order1=list(track)),
            epg.S(1),
        ]
    return seq, B1


def _cols_match(jac_k, jac_e, names, tol=3e-5):
    jac_k, jac_e = np.asarray(jac_k), np.asarray(jac_e)
    assert jac_k.shape == jac_e.shape
    for c, name in enumerate(names):
        ek, ee = jac_k[..., c], jac_e[..., c]
        scale = max(np.abs(ee).max(), 1e-12)
        assert np.abs(ek - ee).max() / scale < tol, name


def test_fisp_b1_tracked_routes_and_matches_planner():
    seq, B1 = _b1_fisp_train()
    params = fisp_dispatch.match_fisp(list(seq))
    assert params is not None and "B1" in params["vars"]
    assert params["b1_scale"] is not None
    names = ["magnitude", "T1", "T2", "B1"]
    probes = [epg.ADC, epg.Jacobian(names)]
    before = fisp_dispatch.DISPATCH_COUNTS.get("jac:fisp", 0)
    sig_k, jac_k = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel="force")
    assert fisp_dispatch.DISPATCH_COUNTS.get("jac:fisp", 0) > before
    sig_e, jac_e = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    _cols_match(jac_k, jac_e, names)


def test_fisp_b1_planner_column_is_true_derivative():
    """FD pin of the SPEC semantics: with alpha_i = FA_i * B1 and
    coefficients c_i = FA_i, the tracked column is dS/dB1."""
    P, B = 12, 3
    r = np.random.default_rng(11)
    FA = r.uniform(10, 60, P)
    TRs = r.uniform(11, 16, P)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    B1v = np.linspace(0.85, 1.15, B)

    def build(b1v, tracked):
        s = []
        for i in range(P):
            o1 = {"B1": {"alpha": float(FA[i])}} if tracked else None
            s += [epg.T(FA[i] * b1v, 90.0, order1=o1),
                  epg.E(4.0, T1, T2), epg.ADC,
                  epg.E(float(TRs[i]) - 4.0, T1, T2), epg.S(1)]
        return s

    jac = np.asarray(epg.simulate(build(B1v, True), max_nstate=6,
                                  probe=epg.Jacobian(["B1"]),
                                  fisp_kernel=False))[..., 0]
    eps = 1e-4

    def signal(b1v):
        return np.asarray(epg.simulate(build(b1v, False), max_nstate=6,
                                       fisp_kernel=False))

    fd = (signal(B1v + eps) - signal(B1v - eps)) / (2 * eps)
    scale = max(np.abs(fd).max(), 1e-12)
    assert np.abs(jac - fd).max() / scale < 1e-6


def test_mse_b1_tracked_routes_and_matches_planner():
    necho, nt2, nb1 = 12, 5, 4
    T2 = np.linspace(20, 60, nt2)
    att = np.linspace(0.6, 1.0, nb1)
    o1b = {"B1": {"alpha": 180.0}}
    seq = [epg.T(90, 90)] + [
        epg.S(1), epg.E(4.75, 1400.0, [T2], order1=["T1", "T2"]),
        epg.T(180 * att, 0, order1=o1b),
        epg.S(1), epg.E(4.75, 1400.0, [T2], order1=["T1", "T2"]),
        epg.ADC] * necho
    params = fisp_dispatch.match_mse(list(seq), 1.0)
    assert params is not None and "B1" in params["vars"]
    names = ["magnitude", "T2", "B1"]
    probes = [epg.ADC, epg.Jacobian(names)]
    before = fisp_dispatch.DISPATCH_COUNTS.get("jac:mse", 0)
    sig_k, jac_k = epg.simulate(seq, probe=probes, fisp_kernel="force")
    assert fisp_dispatch.DISPATCH_COUNTS.get("jac:mse", 0) > before
    sig_e, jac_e = epg.simulate(seq, probe=probes, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    _cols_match(jac_k, jac_e, names)


def test_bssfp_b1_tracked_routes_and_matches_planner():
    P, B = 16, 4
    rng = np.random.default_rng(3)
    FA = rng.uniform(15, 55, P)
    T1 = np.linspace(400, 1600, B)
    T2 = np.linspace(40, 140, B)
    dfs = np.linspace(-0.02, 0.02, B)
    B1 = np.linspace(0.9, 1.1, B)
    seq = []
    for i in range(P):
        seq += [epg.T(FA[i] * B1, 180.0 * (i % 2),
                      order1={"B1": {"alpha": float(FA[i])}}),
                epg.E(6.0, T1, T2, dfs, order1=["T1", "T2"]),
                epg.ADC,
                epg.E(6.0, T1, T2, dfs, order1=["T1", "T2"])]
    params = fisp_dispatch.match_bssfp(list(seq))
    assert params is not None and "B1" in params["vars"]
    names = ["magnitude", "T1", "T2", "B1"]
    probes = [epg.ADC, epg.Jacobian(names)]
    before = fisp_dispatch.DISPATCH_COUNTS.get("jac:bssfp", 0)
    sig_k, jac_k = epg.simulate(seq, probe=probes, fisp_kernel="force")
    assert fisp_dispatch.DISPATCH_COUNTS.get("jac:bssfp", 0) > before
    sig_e, jac_e = epg.simulate(seq, probe=probes, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    _cols_match(jac_k, jac_e, names)


def test_composite_b1_tracked_adiabatic_prep_untracked():
    """MPRAGE-style segmented train: scalar adiabatic 180 preps bypass
    B1 (b1u=0, untracked); the B1-batched readout pulses carry the
    tracked spec.  The kernel's dB1 sums exactly the b1u=1 stages."""
    T1 = np.array([400.0, 800.0, 1200.0])
    T2 = np.array([40.0, 70.0, 100.0])
    B1 = np.array([0.85, 0.95, 1.05])
    o1 = ["T1", "T2"]
    seq = []
    for seg in range(2):
        seq += [epg.T(180, 0), epg.E(120.0, T1, T2, order1=o1)]
        for i in range(6):
            fa = 9.0 + 0.5 * i + seg
            seq += [epg.T(fa * B1, 30.0 * i,
                          order1={"B1": {"alpha": fa}}),
                    epg.E(3.0, T1, T2, order1=o1), epg.ADC,
                    epg.E(5.5, T1, T2, order1=o1), epg.S(1)]
        seq += [epg.E(250.0, T1, T2, order1=o1)]
    params = fisp_dispatch.match_composite(list(seq))
    assert params is not None and "B1" in params["vars"]
    names = ["magnitude", "T1", "T2", "B1"]
    probes = [epg.ADC, epg.Jacobian(names)]
    before = fisp_dispatch.DISPATCH_COUNTS.get("jac:comp", 0)
    sig_k, jac_k = epg.simulate(seq, probe=probes, fisp_kernel="force")
    assert fisp_dispatch.DISPATCH_COUNTS.get("jac:comp", 0) > before
    sig_e, jac_e = epg.simulate(seq, probe=probes, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    _cols_match(jac_k, jac_e, names)


def test_b1_fall_through_rows():
    """Off-pattern B1 specs fall through to the planner (never crash,
    never silently mis-route)."""
    # (a) partially tracked train: kernel dB1 sums all pulses
    seq, _ = _b1_fisp_train(untrack_some=True)
    assert fisp_dispatch.match_fisp(list(seq)) is None
    # (b) inconsistent coefficients (not proportional to the flips)
    seq_b, _ = _b1_fisp_train(coeff=lambda i, FA: float(FA[i]) * (1 + 0.1 * i))
    assert fisp_dispatch.match_fisp(list(seq_b)) is None
    # (c) B1-tracked + UNTRACKED inversion prep: the kernel's dB1
    # includes the 180*B1 prep the user did not track
    seq_c, _ = _b1_fisp_train(prep="untracked")
    assert fisp_dispatch.match_fisp(list(seq_c)) is None
    # (d) aliased/other-parameter specs on T disqualify
    T1 = np.linspace(300, 1500, 3)
    T2 = np.linspace(30, 120, 3)
    seq_d = []
    for i in range(12):
        seq_d += [epg.T(30.0, 90, order1={"B1": {"phi": 1.0}}),
                  epg.E(4.0, T1, T2), epg.ADC,
                  epg.E(8.0, T1, T2), epg.S(1)]
    assert fisp_dispatch.match_fisp(list(seq_d)) is None
    # (e) probing B1 on an untracked train raises (both paths; silent
    # zero columns would poison GN/CRLB fits -- reference parity)
    rng = np.random.default_rng(11)
    FA = rng.uniform(10, 60, 12)
    seq_g = []
    for i in range(12):
        seq_g += [epg.T(float(FA[i]), 90.0),
                  epg.E(4.0, T1, T2, order1=["T1", "T2"]), epg.ADC,
                  epg.E(8.0, T1, T2, order1=["T1", "T2"]), epg.S(1)]
    with pytest.raises(ValueError, match="not tracked"):
        epg.simulate(seq_g, max_nstate=6, fisp_kernel="force",
                     probe=epg.Jacobian(["B1"]))


def test_b1_scale_invariance():
    """The physical column must not depend on the internal rank-1
    normalization: scaling the B1 batch (and dividing the nominal FA)
    leaves alpha rows identical but changes the matcher's s -- the
    returned dB1 then differs by exactly the chain rule."""
    P, B = 12, 3
    rng = np.random.default_rng(4)
    FA = rng.uniform(10, 60, P)
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    B1 = np.linspace(0.8, 1.2, B)
    probes = [epg.Jacobian(["B1"])]

    def build(scale):
        s = []
        for i in range(P):
            c = float(FA[i]) / scale
            s += [epg.T((FA[i] / scale) * (B1 * scale), 90.0,
                        order1={"B1": {"alpha": c}}),
                  epg.E(4.0, T1, T2, order1=["T1", "T2"]), epg.ADC,
                  epg.E(8.0, T1, T2, order1=["T1", "T2"]), epg.S(1)]
        return s

    j1 = np.asarray(epg.simulate(build(1.0), max_nstate=6, probe=probes,
                                 fisp_kernel="force"))
    j2 = np.asarray(epg.simulate(build(2.0), max_nstate=6, probe=probes,
                                 fisp_kernel="force"))
    # d alpha/dB1_phys halves when B1_phys doubles at fixed alpha:
    # column w.r.t. the SCALED physical B1 is 1/scale of the original
    assert np.abs(j2 * 2.0 - j1).max() / np.abs(j1).max() < 2e-5


def test_fisp_b1_tracked_with_tracked_prep():
    """IR-prepped B1-tracked train routes when the prep pulse carries
    its own consistent spec (kernel pseudo-stage coefficient 180)."""
    seq, _ = _b1_fisp_train(prep="tracked")
    params = fisp_dispatch.match_fisp(list(seq))
    assert params is not None and "B1" in params["vars"]
    assert params["TI"] == 18.0
    names = ["magnitude", "T1", "T2", "B1"]
    probes = [epg.ADC, epg.Jacobian(names)]
    sig_k, jac_k = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel="force")
    sig_e, jac_e = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    _cols_match(jac_k, jac_e, names)


def test_dess_b1_tracked_routes_and_matches_planner():
    P, B = 14, 4
    rng = np.random.default_rng(6)
    FA = rng.uniform(15, 40, P)
    T1 = np.linspace(500, 1600, B)
    T2 = np.linspace(40, 140, B)
    B1 = np.linspace(0.9, 1.1, B)
    seq = []
    for i in range(P):
        seq += [epg.T(FA[i] * B1, 0,
                      order1={"B1": {"alpha": float(FA[i])}}),
                epg.E(5.0, T1, T2, order1=["T1", "T2"]), epg.ADC,
                epg.E(10.0, T1, T2, order1=["T1", "T2"]), epg.S(1),
                epg.E(5.0, T1, T2, order1=["T1", "T2"]), epg.ADC]
    params = fisp_dispatch.match_dess(list(seq))
    assert params is not None and "B1" in params["vars"]
    names = ["magnitude", "T1", "T2", "B1"]
    probes = [epg.ADC, epg.Jacobian(names)]
    before = fisp_dispatch.DISPATCH_COUNTS.get("jac:dess", 0)
    sig_k, jac_k = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel="force")
    assert fisp_dispatch.DISPATCH_COUNTS.get("jac:dess", 0) > before
    sig_e, jac_e = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    _cols_match(jac_k, jac_e, names)


def test_megre_b1_tracked_routes_and_matches_planner():
    P, B = 10, 4
    rng = np.random.default_rng(8)
    FA = rng.uniform(10, 30, P)
    T1 = np.linspace(500, 1600, B)
    T2 = np.linspace(40, 140, B)
    dfs = np.linspace(-0.02, 0.02, B)
    B1 = np.linspace(0.9, 1.1, B)
    tes = (3.0, 7.0, 11.0)
    o1 = ["T2", "g"]
    seq = []
    for i in range(P):
        seq.append(epg.T(FA[i] * B1, 0.0,
                         order1={"B1": {"alpha": float(FA[i])}}))
        prev = 0.0
        for te in tes:
            seq += [epg.E(te - prev, T1, T2, dfs, order1=o1), epg.ADC]
            prev = te
        seq += [epg.E(5.0, T1, T2, dfs, order1=o1), epg.S(1)]
    params = fisp_dispatch.match_megre(list(seq))
    assert params is not None and "B1" in params["vars"]
    names = ["magnitude", "T2", "g", "B1"]
    probes = [epg.ADC, epg.Jacobian(names)]
    before = fisp_dispatch.DISPATCH_COUNTS.get("jac:megre", 0)
    sig_k, jac_k = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel="force")
    assert fisp_dispatch.DISPATCH_COUNTS.get("jac:megre", 0) > before
    sig_e, jac_e = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    _cols_match(jac_k, jac_e, names)


def test_composite_b1_only_probe():
    """Probing ONLY B1 (untracked E ops) routes with a single tangent
    group -- the group-selectable composite kernel's smallest config."""
    T1 = np.array([400.0, 800.0, 1200.0])
    T2 = np.array([40.0, 70.0, 100.0])
    B1 = np.array([0.85, 0.95, 1.05])
    seq = []
    for seg in range(2):
        seq += [epg.T(180, 0), epg.E(120.0, T1, T2)]
        for i in range(5):
            fa = 9.0 + 0.5 * i + seg
            seq += [epg.T(fa * B1, 30.0 * i,
                          order1={"B1": {"alpha": fa}}),
                    epg.E(3.0, T1, T2), epg.ADC,
                    epg.E(5.5, T1, T2), epg.S(1)]
        seq += [epg.E(250.0, T1, T2)]
    params = fisp_dispatch.match_composite(list(seq))
    assert params is not None and params["vars"] == ("B1",)
    probes = [epg.Jacobian(["B1"])]
    before = fisp_dispatch.DISPATCH_COUNTS.get("jac:comp", 0)
    jac_k = epg.simulate(seq, probe=probes, fisp_kernel="force")
    assert fisp_dispatch.DISPATCH_COUNTS.get("jac:comp", 0) > before
    jac_e = epg.simulate(seq, probe=probes, fisp_kernel=False)
    _cols_match(jac_k, jac_e, ["B1"])
