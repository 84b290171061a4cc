"""FISP train -> fused Pallas kernel dispatch (fisp_dispatch module).

The general engine recognizes exact FISP trains and routes them to the
VMEM-resident kernel; anything off-pattern must fall through to the
scan planner.  Tests force the dispatch with fisp_kernel="force"
(interpret-mode kernel on CPU) and compare against fisp_kernel=False.
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch


def _train(P=40, B=6, *, b1=None, phi_var=True, te=4.0, g=0.0, adc_kw=None,
           shift=1, t2_mismatch=False):
    rng = np.random.default_rng(3)
    FA = rng.uniform(5, 70, P)
    phis = ((0.5 * 117.0 * np.arange(P) * (np.arange(P) + 1)) % 360
            if phi_var else np.full(P, 90.0))
    TRs = rng.uniform(11, 16, P)
    tes = np.broadcast_to(np.asarray(te, float), (P,))  # scalar or per-pulse
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    seq = []
    for i in range(P):
        alpha = FA[i] * b1 if b1 is not None else float(FA[i])
        T2b = T2 + (1.0 if t2_mismatch and i == P // 2 else 0.0)
        seq += [
            epg.T(alpha, float(phis[i])),
            epg.E(float(tes[i]), T1, T2, g),
            epg.ADC if adc_kw is None else epg.Adc(**adc_kw),
            epg.E(float(TRs[i]) - float(tes[i]), T1, T2b, g),
            epg.S(shift),
        ]
    return seq


def test_match_extracts_params():
    seq = _train(P=24, B=5)
    params = fisp_dispatch.match_fisp(seq)
    assert params is not None
    assert params["FA"].shape == (24,)
    assert params["TE"] == 4.0
    assert params["T1"].shape == (5,)
    assert np.all(params["B1"] == 1.0)


def test_match_rank1_b1_factorization():
    B1 = np.linspace(0.8, 1.2, 5)
    seq = _train(P=24, B=5, b1=B1)
    params = fisp_dispatch.match_fisp(seq)
    assert params is not None
    # only the product FA_i * B1_b is identified; check it round-trips
    outer = np.outer(params["FA"], params["B1"])
    rng = np.random.default_rng(3)
    FA = rng.uniform(5, 70, 24)
    assert np.allclose(outer, np.outer(FA, B1), rtol=1e-10)


@pytest.mark.parametrize("mutate", [
    dict(adc_kw=dict(phase=30.0)),      # phased ADC (not -phi demod)
    dict(shift=2),                      # non-unit shift
    dict(t2_mismatch=True),             # T2 changes mid-train
])
def test_no_match_off_pattern(mutate):
    assert fisp_dispatch.match_fisp(_train(P=16, B=4, **mutate)) is None


def test_off_resonance_matches_and_parity():
    """Constant per-atom (or scalar) E.g maps onto the kernel's dfs axis
    (B0-map dictionaries); mismatched g between E ops is off-pattern."""
    # scalar df
    seq = _train(P=24, B=4, g=0.03)
    params = fisp_dispatch.match_fisp(list(seq))
    assert params is not None and np.allclose(params["df"], 0.03)
    sig_k = epg.simulate(seq, max_nstate=8, fisp_kernel="force")
    sig_e = epg.simulate(seq, max_nstate=8, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    # per-atom df vector
    dfv = np.linspace(-0.05, 0.05, 4)
    seq2 = _train(P=24, B=4, g=dfv)
    params2 = fisp_dispatch.match_fisp(list(seq2))
    assert params2 is not None and np.allclose(params2["df"], dfv)
    sig_k2 = epg.simulate(seq2, max_nstate=8, fisp_kernel="force")
    sig_e2 = epg.simulate(seq2, max_nstate=8, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k2) - np.asarray(sig_e2)).max() < 1e-5
    # g on only one E of a TR -> off-pattern
    seq3 = _train(P=16, B=4)
    seq3[1] = epg.E(4.0, seq3[1].T1, seq3[1].T2, 0.01)
    assert fisp_dispatch.match_fisp(list(seq3)) is None
    # df trains with Jacobian probes dispatch too (kernel dfs support):
    # the off-resonance phase is parameter-independent, so tangent
    # columns rotate with the primal -- parity vs the jacfwd planner
    T1 = np.linspace(300, 1500, 4); T2 = np.linspace(30, 120, 4)
    seqd = []
    for i in range(16):
        seqd += [epg.T(30, 90),
                 epg.E(4.0, T1, T2, dfv, order1=["T1", "T2"]),
                 epg.ADC, epg.E(8.0, T1, T2, dfv, order1=["T1", "T2"]),
                 epg.S(1)]
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    _, jac_k = epg.simulate(seqd, max_nstate=6, fisp_kernel="force",
                            probe=probes)
    _, jac_e = epg.simulate(seqd, max_nstate=6, fisp_kernel=False,
                            probe=probes)
    for c in range(3):
        ek, ee = np.asarray(jac_k)[..., c], np.asarray(jac_e)[..., c]
        assert np.abs(ek - ee).max() / max(np.abs(ee).max(), 1e-12) < 2e-5


def test_no_match_extra_prep_or_reorder():
    seq = _train(P=16, B=4)
    assert fisp_dispatch.match_fisp([epg.T(180, 0)] + seq) is None
    swapped = seq[:5] + [seq[6], seq[5]] + seq[7:]
    assert fisp_dispatch.match_fisp(swapped) is None


def test_dispatch_matches_planner():
    seq = _train(P=40, B=6)
    sig_k = epg.simulate(seq, max_nstate=8, fisp_kernel="force")
    sig_e = epg.simulate(seq, max_nstate=8, fisp_kernel=False)
    assert sig_k.shape == sig_e.shape
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5


def test_dispatch_matches_planner_b1_batch():
    seq = _train(P=40, B=6, b1=np.linspace(0.8, 1.2, 6))
    sig_k = epg.simulate(seq, max_nstate=8, fisp_kernel="force")
    sig_e = epg.simulate(seq, max_nstate=8, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5


def test_variable_te_matches_planner():
    """Canonical MRF-FISP (Jiang 2015) varies TE alongside TR: the
    matcher maps per-pulse TE onto the kernels' var_te axis."""
    rng = np.random.default_rng(11)
    tev = rng.uniform(2.0, 5.5, 32)
    seq = _train(P=32, B=5, te=tev)
    params = fisp_dispatch.match_fisp(list(seq))
    assert params is not None and np.allclose(params["TE"], tev)
    sig_k = epg.simulate(seq, max_nstate=8, fisp_kernel="force")
    sig_e = epg.simulate(seq, max_nstate=8, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    # constant-TE trains still extract a scalar (hoisted kernel path)
    assert np.ndim(fisp_dispatch.match_fisp(_train(P=16, B=4))["TE"]) == 0


def test_variable_te_jacobian_dispatch():
    rng = np.random.default_rng(12)
    tev = rng.uniform(2.0, 5.0, 20)
    seq = _diff_train(P=20, B=4, te=tev)
    names = ["magnitude", "T1", "T2"]
    probes = [epg.ADC, epg.Jacobian(names)]
    sig_k, jac_k = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel="force")
    sig_e, jac_e = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    for c in range(len(names)):
        ek, ee = np.asarray(jac_k)[..., c], np.asarray(jac_e)[..., c]
        assert np.abs(ek - ee).max() / max(np.abs(ee).max(), 1e-12) < 2e-5


def test_dispatch_adc_time_and_device_outputs():
    seq = _train(P=16, B=4)
    t, sig = epg.simulate(seq, max_nstate=6, fisp_kernel="force",
                          adc_time=True)
    assert len(t) == 16 and sig.shape == (16, 4)
    enc = epg.simulate(seq, max_nstate=6, fisp_kernel="force", asarray=False)
    assert set(enc) == {"__c_re", "__c_im"}
    assert enc["__c_re"].shape == (16, 4)


def test_match_inversion_prep():
    seq = [epg.T(180, 90), epg.E(18.0, np.linspace(300, 1500, 4),
                                 np.linspace(30, 120, 4))] + _train(P=16, B=4)
    params = fisp_dispatch.match_fisp(seq)
    assert params is not None and params["TI"] == 18.0
    # no prep -> TI is None
    assert fisp_dispatch.match_fisp(_train(P=16, B=4))["TI"] is None


def test_inversion_prep_matches_planner():
    T1 = np.linspace(300, 1500, 4); T2 = np.linspace(30, 120, 4)
    seq = [epg.T(180, 90), epg.E(18.0, T1, T2)] + _train(P=30, B=4)
    sig_k = epg.simulate(seq, max_nstate=8, fisp_kernel="force")
    sig_e = epg.simulate(seq, max_nstate=8, fisp_kernel=False)
    assert sig_k.shape == (30, 4)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5


def test_inversion_prep_b1_scaled_matches_planner():
    """Vector prep 180*B1 about phi=0: kernel's B1-scaled inversion."""
    T1 = np.linspace(300, 1500, 4); T2 = np.linspace(30, 120, 4)
    B1 = np.linspace(0.85, 1.15, 4)
    seq = [epg.T(180.0 * B1, 0), epg.E(18.0, T1, T2)] + _train(
        P=30, B=4, b1=B1)
    params = fisp_dispatch.match_fisp(seq)
    assert params is not None and params["TI"] == 18.0
    sig_k = epg.simulate(seq, max_nstate=8, fisp_kernel="force")
    sig_e = epg.simulate(seq, max_nstate=8, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5


def test_inversion_prep_off_pattern_no_match():
    T1 = np.linspace(300, 1500, 4); T2 = np.linspace(30, 120, 4)
    B1 = np.linspace(0.85, 1.15, 4)
    train = _train(P=16, B=4, b1=B1)
    # vector prep about phi != 0: kernel prep axis is fixed at phi=0
    assert fisp_dispatch.match_fisp(
        [epg.T(180.0 * B1, 90), epg.E(18.0, T1, T2)] + train) is None
    # prep not proportional to the train's B1 direction
    assert fisp_dispatch.match_fisp(
        [epg.T(180.0 * B1[::-1], 0), epg.E(18.0, T1, T2)] + train) is None
    # prep relaxation with different T1
    assert fisp_dispatch.match_fisp(
        [epg.T(180, 90), epg.E(18.0, T1 + 1, T2)] + _train(P=16, B=4)) is None


@pytest.mark.parametrize("case", range(12))
def test_fuzz_dispatch_parity_or_fallthrough(case):
    """Random FISP-family trains: whatever the matcher decides, the
    user-visible signal must equal the planner's.  Half the cases are
    on-pattern variants (b1 batches, inversion preps, varying TR);
    half carry a random off-pattern mutation and must fall through."""
    rng = np.random.default_rng(100 + case)
    P = int(rng.integers(8, 30))
    B = int(rng.integers(2, 7))
    b1 = np.linspace(0.8, 1.2, B) if rng.random() < 0.5 else None
    te = (rng.uniform(2, 6, P) if rng.random() < 0.4
          else float(rng.uniform(2, 6)))
    kw = dict(phi_var=rng.random() < 0.5, te=te)
    seq = _train(P=P, B=B, b1=b1, **kw)
    T1 = np.linspace(300, 1500, B); T2 = np.linspace(30, 120, B)
    if rng.random() < 0.5:
        prep_a = 180.0 * b1 if (b1 is not None and rng.random() < 0.5) else 180.0
        prep_phi = 0.0 if np.ndim(prep_a) else float(rng.choice([0., 90.]))
        seq = [epg.T(prep_a, prep_phi),
               epg.E(float(rng.uniform(5, 30)), T1, T2)] + seq
    mutated = case % 2 == 1
    if mutated:
        mut = rng.integers(0, 4)
        if mut == 0:      # one E gets off-resonance
            j = [i for i, op in enumerate(seq) if type(op) is epg.E]
            k = int(rng.choice(j))
            seq[k] = epg.E(seq[k].tau, seq[k].T1, seq[k].T2, 0.013)
        elif mut == 1:    # one shift becomes 2
            j = [i for i, op in enumerate(seq) if type(op) is epg.S]
            seq[int(rng.choice(j))] = epg.S(2)
        elif mut == 2:    # a spoiler inserted mid-train
            seq.insert(len(seq) // 2 // 5 * 5, epg.SPOILER)
        else:             # one flip loses the rank-1 structure
            j = [i for i, op in enumerate(seq) if type(op) is epg.T
                 and np.ndim(op.alpha)]
            if j:
                k = int(rng.choice(j))
                a = np.asarray(seq[k].alpha).copy()
                a[0] *= 1.01
                seq[k] = epg.T(a, seq[k].phi)
            else:
                seq[int(rng.integers(0, len(seq) // 5)) * 5 + 2] = \
                    epg.Adc(phase=20.0)
    # a mutation may still be structurally on-pattern (e.g. mut==3 on a
    # scalar train re-phases one ADC instead); parity is the invariant,
    # not whether the matcher engaged
    sig_k = np.asarray(epg.simulate(list(seq), max_nstate=10,
                                    fisp_kernel="force"))
    sig_e = np.asarray(epg.simulate(list(seq), max_nstate=10,
                                    fisp_kernel=False))
    assert sig_k.shape == sig_e.shape
    assert np.abs(sig_k - sig_e).max() < 2e-5


def test_demodulated_adc_matches_planner():
    """Adc(phase=-phi_i) is the kernel's receiver demodulation; both the
    primal and the Jacobian dispatch must reproduce the planner."""
    rng = np.random.default_rng(5)
    P, B = 24, 4
    FA = rng.uniform(10, 60, P)
    phis = (0.5 * 117.0 * np.arange(P) * (np.arange(P) + 1)) % 360
    T1 = np.linspace(300, 1500, B); T2 = np.linspace(30, 120, B)
    seq, dseq = [], []
    for i in range(P):
        block = [epg.T(float(FA[i]), float(phis[i])),
                 epg.E(4.0, T1, T2),
                 epg.Adc(phase=-float(phis[i])),
                 epg.E(8.0, T1, T2), epg.S(1)]
        seq += block
        dseq += [block[0], epg.E(4.0, T1, T2, order1=["T1", "T2"]),
                 block[2], epg.E(8.0, T1, T2, order1=["T1", "T2"]),
                 epg.S(1)]
    assert fisp_dispatch.match_fisp(list(seq))["demod"] is True
    sig_k = epg.simulate(seq, max_nstate=8, fisp_kernel="force")
    sig_e = epg.simulate(seq, max_nstate=8, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    _, jac_k = epg.simulate(dseq, max_nstate=8, probe=probes,
                            fisp_kernel="force")
    _, jac_e = epg.simulate(dseq, max_nstate=8, probe=probes,
                            fisp_kernel=False)
    for c in range(3):
        ek, ee = np.asarray(jac_k)[..., c], np.asarray(jac_e)[..., c]
        assert np.abs(ek - ee).max() / max(np.abs(ee).max(), 1e-12) < 2e-5
    # a phase NOT equal to -phi is off-pattern
    seq[2] = epg.Adc(phase=-float(phis[0]) + 10.0)
    assert fisp_dispatch.match_fisp(list(seq)) is None


def _diff_train(P=24, B=4, *, order1=("T1", "T2"), b1=None, prep=False,
                prep_order1="same", te=4.0):
    rng = np.random.default_rng(7)
    FA = rng.uniform(10, 60, P)
    TRs = rng.uniform(11, 16, P)
    tes = np.broadcast_to(np.asarray(te, float), (P,))
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    o1 = list(order1)
    seq = []
    if prep:
        po = o1 if prep_order1 == "same" else prep_order1
        seq += [epg.T(180, 90), epg.E(18.0, T1, T2, order1=po)]
    for i in range(P):
        alpha = FA[i] * b1 if b1 is not None else float(FA[i])
        seq += [
            epg.T(alpha, 90.0),
            epg.E(float(tes[i]), T1, T2, order1=o1),
            epg.ADC,
            epg.E(float(TRs[i]) - float(tes[i]), T1, T2, order1=o1),
            epg.S(1),
        ]
    return seq


@pytest.mark.parametrize("cfg", [
    dict(),                                     # plain T1/T2 Jacobian
    dict(b1=np.linspace(0.85, 1.15, 4)),        # rank-1 B1 batch
    dict(prep=True),                            # inversion prep tracked
    dict(order1=("T1",)),                       # single variable
])
def test_jacobian_dispatch_matches_jacfwd(cfg):
    order1 = cfg.get("order1", ("T1", "T2"))
    names = ["magnitude"] + list(order1)
    seq = _diff_train(P=24, B=4, **cfg)
    assert fisp_dispatch.match_fisp(list(seq))["vars"] == tuple(sorted(order1))
    probes = [epg.ADC, epg.Jacobian(names)]
    sig_k, jac_k = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel="force")
    sig_e, jac_e = epg.simulate(seq, max_nstate=8, probe=probes,
                                fisp_kernel=False)
    assert jac_k.shape == jac_e.shape == sig_e.shape + (len(names),)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    for c in range(len(names)):
        ek, ee = np.asarray(jac_k)[..., c], np.asarray(jac_e)[..., c]
        scale = max(np.abs(ee).max(), 1e-12)
        assert np.abs(ek - ee).max() / scale < 2e-5, names[c]


def test_jacobian_dispatch_single_probe_and_device_outputs():
    seq = _diff_train(P=16, B=3)
    jac = epg.simulate(seq, max_nstate=6, fisp_kernel="force",
                       probe=epg.Jacobian(["T2", "magnitude"]))
    assert jac.shape == (16, 3, 2)
    enc = epg.simulate(seq, max_nstate=6, fisp_kernel="force",
                       probe=epg.Jacobian(["T1"]), asarray=False)
    assert enc["__c_re"].shape == (16, 3, 1)
    t, jac2 = epg.simulate(seq, max_nstate=6, fisp_kernel="force",
                           probe=epg.Jacobian(["T1"]), adc_time=True)
    assert len(t) == 16 and jac2.shape == (16, 3, 1)


def test_jacobian_dispatch_fall_through(monkeypatch):
    """Off-pattern diff specs must run the general jacfwd path even when
    forced: Hessians, aliased variables, inconsistent tracking, probed
    vars that aren't tracked."""
    boom = lambda *a, **k: (_ for _ in ()).throw(AssertionError("dispatched"))
    monkeypatch.setattr(fisp_dispatch, "run_fisp_jacobian", boom)
    T1 = np.linspace(300, 1500, 3); T2 = np.linspace(30, 120, 3)

    # Hessian probe
    seq = _diff_train(P=12, B=3)
    epg.simulate(seq, max_nstate=6, fisp_kernel="force",
                 probe=[epg.Jacobian(["T1"]), epg.Hessian(["T1"], ["T2"])])
    # aliased variable name
    seq2 = []
    for i in range(12):
        seq2 += [epg.T(30, 90), epg.E(4.0, T1, T2, order1={"t1v": "T1"}),
                 epg.ADC, epg.E(8.0, T1, T2, order1={"t1v": "T1"}), epg.S(1)]
    epg.simulate(seq2, max_nstate=6, fisp_kernel="force",
                 probe=epg.Jacobian(["t1v"]))
    # probed variable not tracked by the (matched) train: both paths
    # raise (reference parity: sm.order1[var] KeyError; silent zero
    # columns would poison CRLB/GN fits)
    seq3 = _diff_train(P=12, B=3, order1=("T1",))
    with pytest.raises(ValueError, match="not tracked"):
        epg.simulate(seq3, max_nstate=6, fisp_kernel="force",
                     probe=epg.Jacobian(["T2"]))
    # inconsistent tracking between the two E ops of one TR
    seq4 = _diff_train(P=12, B=3)
    seq4[1] = epg.E(4.0, T1, T2, order1=["T1"])
    assert fisp_dispatch.match_fisp(list(seq4)) is None
    epg.simulate(seq4, max_nstate=6, fisp_kernel="force",
                 probe=epg.Jacobian(["T1"]))
    # untracked inversion prep on a tracked train
    seq5 = _diff_train(P=12, B=3, prep=True, prep_order1=())
    assert fisp_dispatch.match_fisp(list(seq5)) is None


def test_array_chain_rule_coefficient_falls_through():
    """order1 chain-rule coefficients that are arrays must not crash the
    matcher (dict __eq__ on arrays raises) -- they fall through."""
    T1 = np.linspace(300, 1500, 3); T2 = np.linspace(30, 120, 3)
    o1 = {"T1": {"T1": np.ones(3)}}
    seq = []
    for i in range(12):
        seq += [epg.T(30, 90), epg.E(4.0, T1, T2, order1=o1), epg.ADC,
                epg.E(8.0, T1, T2, order1=o1), epg.S(1)]
    assert fisp_dispatch.match_fisp(list(seq)) is None
    sig = epg.simulate(seq, max_nstate=6, fisp_kernel="force")
    assert sig.shape == (12, 3)


def test_diffoperator_marker_hierarchy():
    """isinstance(op, DiffOperator) selects the reference's operator
    set: physics ops yes, probes/Wait/Spoiler no."""
    from epgpy_tpu import operators
    D = operators.DiffOperator
    for op in (epg.T(30, 0), epg.E(5.0, 1000, 80), epg.S(1),
               epg.ScalarOp([1, 1, 1]), epg.G(1.0, 10.0), epg.C(1.0)):
        assert isinstance(op, D), op
    for op in (epg.ADC, epg.Adc(phase=10.0), epg.SPOILER, epg.RESET,
               epg.NULL, epg.Wait(1.0), epg.Probe("F0")):
        assert not isinstance(op, D), op


def test_diff_annotations_do_not_break_primal_dispatch():
    """order1 tracking is value-neutral: the primal dispatch may engage
    on a diff-annotated train (no diff probes requested)."""
    seq = _diff_train(P=16, B=3)
    params = fisp_dispatch.match_fisp(list(seq))
    assert params is not None and params["vars"] == ("T1", "T2")
    sig_k = epg.simulate(seq, max_nstate=6, fisp_kernel="force")
    sig_e = epg.simulate(seq, max_nstate=6, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5


@pytest.mark.parametrize("case", range(8))
def test_fuzz_jacobian_dispatch_parity(case):
    """Random diff-annotated FISP-family trains with Jacobian probes:
    dispatch or planner, the outputs must agree.  Half the cases carry
    off-pattern mutations (aliased vars, mixed tracking, demod phases,
    Hessians) and must still return planner-exact results."""
    rng = np.random.default_rng(300 + case)
    P = int(rng.integers(8, 20))
    B = int(rng.integers(2, 6))
    FA = rng.uniform(10, 60, P)
    phis = ((0.5 * 117.0 * np.arange(P) * (np.arange(P) + 1)) % 360
            if rng.random() < 0.5 else np.full(P, 90.0))
    T1 = np.linspace(300, 1500, B); T2 = np.linspace(30, 120, B)
    b1 = np.linspace(0.85, 1.15, B) if rng.random() < 0.4 else None
    demod = rng.random() < 0.4
    o1 = [["T1", "T2"], ["T1"], ["T2"]][
        int(rng.choice(3, p=[0.6, 0.2, 0.2]))]
    seq = []
    for i in range(P):
        alpha = FA[i] * b1 if b1 is not None else float(FA[i])
        adc = (epg.Adc(phase=-float(phis[i])) if demod else epg.ADC)
        seq += [epg.T(alpha, float(phis[i])),
                epg.E(4.0, T1, T2, order1=o1), adc,
                epg.E(8.0, T1, T2, order1=o1), epg.S(1)]
    mutated = case % 2 == 1
    if mutated:
        mut = rng.integers(0, 3)
        if mut == 0:    # alias one E's variable name
            seq[1] = epg.E(4.0, T1, T2, order1={"x": "T1"})
        elif mut == 1:  # drop tracking on one E
            seq[3] = epg.E(float(seq[3].tau), T1, T2)
        else:           # perturb one demod/adc phase
            seq[2] = epg.Adc(phase=33.0)
    probe_vars = ["magnitude"] + o1 if rng.random() < 0.5 else list(o1)
    probes = [epg.ADC, epg.Jacobian(probe_vars)]
    try:
        sig_k, jac_k = epg.simulate(list(seq), max_nstate=8, probe=probes,
                                    fisp_kernel="force")
        sig_e, jac_e = epg.simulate(list(seq), max_nstate=8, probe=probes,
                                    fisp_kernel=False)
    except ValueError:
        # mutated diff specs may be invalid for BOTH paths equally
        with pytest.raises(ValueError):
            epg.simulate(list(seq), max_nstate=8, probe=probes,
                         fisp_kernel=False)
        return
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5
    for c in range(len(probe_vars)):
        ek, ee = np.asarray(jac_k)[..., c], np.asarray(jac_e)[..., c]
        assert np.abs(ek - ee).max() / max(np.abs(ee).max(), 1e-12) < 5e-5


def test_auto_mode_does_not_dispatch_on_cpu(monkeypatch):
    """Under the test config (CPU, x64) "auto" must use the planner."""
    called = []
    monkeypatch.setattr(fisp_dispatch, "run_fisp_kernel",
                        lambda *a, **k: called.append(1) or (_ for _ in ()).throw(
                            AssertionError("dispatched")))
    seq = _train(P=12, B=3)
    sig = epg.simulate(seq, max_nstate=6)
    assert not called and sig.shape == (12, 3)


def test_dispatch_conditions_fall_through(monkeypatch):
    """Custom probe / init / kgrid / diff must bypass the kernel even
    when forced."""
    boom = lambda *a, **k: (_ for _ in ()).throw(AssertionError("dispatched"))
    monkeypatch.setattr(fisp_dispatch, "run_fisp_kernel", boom)
    seq = _train(P=12, B=3)
    epg.simulate(seq, max_nstate=6, fisp_kernel="force", probe="F0")
    epg.simulate(seq, max_nstate=6, fisp_kernel="force",
                 init=[0.0, 0.0, 0.5])
    sm0 = epg.StateMatrix([0, 0, 1])
    epg.simulate(seq, max_nstate=6, fisp_kernel="force", init=sm0)


# ---- CPMG / multi-spin-echo dispatch (the reference's published
# benchmark family: docs/basics.md 18-echo MSE) ----


def _mse_train(necho=12, B=5, *, order="SE", esp=9.0, att=None,
               ref=(150.0, 0.0), exc=(90.0, 90.0), t1=1400.0,
               vary_esp=False, t2=None):
    rng = np.random.default_rng(21)
    T2 = np.linspace(30, 120, B) if t2 is None else t2
    alpha = ref[0] if att is None else ref[0] * att
    seq = [epg.T(*exc)]
    for i in range(necho):
        tau1 = float(rng.uniform(3, 6)) if vary_esp else esp / 2
        tau2 = float(rng.uniform(3, 6)) if vary_esp else esp / 2
        e1, e2 = epg.E(tau1, t1, T2), epg.E(tau2, t1, T2)
        t = epg.T(alpha, ref[1])
        if order == "SE":
            seq += [epg.S(1), e1, t, epg.S(1), e2, epg.ADC]
        else:
            seq += [e1, epg.S(1), t, e2, epg.S(1), epg.ADC]
    return seq


def test_mse_match_published_config():
    """The reference's one published benchmark: 18-echo MSE over a 2-D
    T2 x attenuation grid (reference docs/basics.md:250-267)."""
    necho, TE, T1v = 18, 9.5, 1400.0
    T2 = np.linspace(20, 60, 20)
    att = np.linspace(0.2, 1, 8)
    seq = [epg.T(90, 90)] + [
        epg.S(1), epg.E(TE / 2, T1v, [T2]), epg.T(180 * att, 0),
        epg.S(1), epg.E(TE / 2, T1v, [T2]), epg.ADC] * necho
    p = fisp_dispatch.match_mse(list(seq))
    assert p is not None
    assert p["shape"] == (8, 20) and p["T1"].shape == (160,)
    assert np.allclose(np.outer(p["FA"], p["B1"]).reshape(necho, 8, -1),
                       (180 * att)[None, :, None])
    sig_k = epg.simulate(seq, fisp_kernel="force")
    sig_e = epg.simulate(seq, fisp_kernel=False)
    assert sig_k.shape == sig_e.shape == (necho, 8, 20)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5


@pytest.mark.parametrize("order", ["SE", "ES"])
def test_mse_dispatch_matches_planner(order):
    """Both (S, E) and (E, S) halves match (they commute exactly) and
    reproduce the planner, incl. varying echo spacings."""
    seq = _mse_train(necho=14, B=5, order=order, vary_esp=True)
    sig_k = epg.simulate(seq, fisp_kernel="force")
    sig_e = epg.simulate(seq, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5


def test_mse_dispatch_b1_refocusing():
    att = np.linspace(0.5, 1.1, 6)
    seq = _mse_train(necho=12, B=6, att=att, ref=(180.0, 0.0))
    p = fisp_dispatch.match_mse(list(seq))
    assert p is not None
    sig_k = epg.simulate(seq, fisp_kernel="force")
    sig_e = epg.simulate(seq, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5


def test_mse_off_pattern_fall_through():
    base = _mse_train(necho=10, B=4)
    # non-unit shift
    s = list(base); s[1] = epg.S(2)
    assert fisp_dispatch.match_mse(s) is None
    # off-resonance on one E
    s = list(base); e = s[2]
    s[2] = epg.E(e.tau, e.T1, e.T2, 0.01)
    assert fisp_dispatch.match_mse(s) is None
    # diff tracking anywhere
    s = list(base); e = s[2]
    s[2] = epg.E(e.tau, e.T1, e.T2, order1=["T2"])
    assert fisp_dispatch.match_mse(s) is None
    # phased ADC
    s = list(base); s[6] = epg.Adc(phase=30.0)
    assert fisp_dispatch.match_mse(s) is None
    # vector excitation
    s = [epg.T(np.array([90.0, 85.0, 80.0, 75.0]), 90)] + base[1:]
    assert fisp_dispatch.match_mse(s) is None
    # T2 changing mid-train
    s = _mse_train(necho=10, B=4)
    e = s[2]
    s[8] = epg.E(e.tau, e.T1, np.asarray(e.T2) + 1.0)
    assert fisp_dispatch.match_mse(s) is None
    # FISP trains are not MSE and vice versa
    assert fisp_dispatch.match_mse(_train(P=16, B=4)) is None
    assert fisp_dispatch.match_fisp(base) is None
    # parity holds anyway on a mutated train (the generic composite
    # family claims it at f32 tolerance, else planner bit-exact)
    s = list(base); s[1] = epg.S(2)
    a = np.asarray(epg.simulate(s, fisp_kernel="force"))
    b = np.asarray(epg.simulate(s, fisp_kernel=False))
    tol = (2e-5 if fisp_dispatch.match_composite(list(s)) is not None
           else 2e-10)
    assert np.abs(a - b).max() < tol


def _mse_diff_train(necho=10, B=6, *, order1=("T1", "T2"), grid=False):
    rng = np.random.default_rng(25)
    T1v = 1400.0
    o1 = list(order1)
    if grid:
        T2 = [np.linspace(20, 60, 5)]       # (1, 5) -- 2-D batch grid
        att = np.linspace(0.2, 1, 4)        # (4,)
    else:
        T2 = np.linspace(30, 120, B)
        att = np.linspace(0.6, 1.1, B)
    seq = [epg.T(90, 90)]
    for i in range(necho):
        seq += [epg.E(float(rng.uniform(3, 6)), T1v, T2, order1=o1),
                epg.S(1), epg.T(160 * att, 20.0),
                epg.E(float(rng.uniform(3, 6)), T1v, T2, order1=o1),
                epg.S(1), epg.ADC]
    return seq


@pytest.mark.parametrize("grid", [False, True])
def test_mse_jacobian_dispatch(grid):
    """Adc/Jacobian probes on tracked CPMG trains route to the fused
    primal+tangent kernel; parity with the planner's jacfwd, incl. the
    2-D (attenuation x T2) batch grid of the published benchmark."""
    seq = _mse_diff_train(grid=grid)
    p = fisp_dispatch.match_mse(list(seq))
    assert p is not None and p["vars"] == ("T1", "T2")
    names = ["magnitude", "T1", "T2"]
    probes = [epg.ADC, epg.Jacobian(names)]
    sig_k, jac_k = epg.simulate(seq, probe=probes, fisp_kernel="force")
    sig_e, jac_e = epg.simulate(seq, probe=probes, fisp_kernel=False)
    assert np.asarray(jac_k).shape == np.asarray(jac_e).shape
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    for c in range(len(names)):
        ek, ee = np.asarray(jac_k)[..., c], np.asarray(jac_e)[..., c]
        assert np.abs(ek - ee).max() / max(np.abs(ee).max(), 1e-12) < 2e-5


def test_mse_jacobian_off_pattern_fall_through():
    # aliased variable name disqualifies the train
    T2 = np.linspace(30, 120, 4)
    seq = [epg.T(90, 90)] + [
        epg.S(1), epg.E(5.0, 1400.0, T2, order1={"tee2": {"T2": 1.0}}),
        epg.T(160, 0), epg.S(1),
        epg.E(5.0, 1400.0, T2, order1={"tee2": {"T2": 1.0}}),
        epg.ADC] * 6
    assert fisp_dispatch.match_mse(list(seq)) is None
    # tracking must be identical on every E
    seq = _mse_diff_train(necho=6, B=4)
    e = seq[1]
    seq[7] = epg.E(e.tau, e.T1, e.T2, order1=["T2"])
    assert fisp_dispatch.match_mse(list(seq)) is None
    # probe variables outside {magnitude} | tracked fall through to the
    # planner, which raises (reference parity: sm.order1[var] KeyError)
    seq = _mse_diff_train(necho=6, B=4, order1=("T2",))
    probes = [epg.Jacobian(["T1", "T2"])]
    with pytest.raises(ValueError, match="not tracked"):
        epg.simulate(seq, probe=probes, fisp_kernel="force")
    with pytest.raises(ValueError, match="not tracked"):
        epg.simulate(list(seq), probe=[epg.Jacobian(["T1", "T2"])],
                     fisp_kernel=False)


@pytest.mark.parametrize("case", range(20))
def test_fuzz_mse_dispatch_parity_or_fallthrough(case):
    """Random CPMG-family trains (mixed E/S half orders, varying echo
    spacings, rank-1 attenuation batches, optional T1/T2 tracking with
    Jacobian probes); half carry a random off-pattern mutation.  As in
    the FISP fuzz, parity with the planner is the invariant -- not
    whether the matcher engaged."""
    rng = np.random.default_rng(300 + case)
    necho = int(rng.integers(4, 14))
    B = int(rng.integers(2, 7))
    T1v = float(rng.uniform(800, 1800))
    T2 = np.linspace(30, 120, B)
    att = np.linspace(0.6, 1.05, B) if rng.random() < 0.5 else None
    alpha = float(rng.uniform(120, 180)) * (att if att is not None else 1.0)
    phr = float(rng.choice([0.0, 90.0]))
    tracked = rng.random() < 0.5
    o1 = ["T1", "T2"] if tracked else None
    seq = [epg.T(float(rng.uniform(60, 90)), 90)]
    for i in range(necho):
        e1 = epg.E(float(rng.uniform(3, 6)), T1v, T2, order1=o1)
        e2 = epg.E(float(rng.uniform(3, 6)), T1v, T2, order1=o1)
        t = epg.T(alpha, phr)
        if rng.random() < 0.5:
            seq += [epg.S(1), e1, t, epg.S(1), e2, epg.ADC]
        else:
            seq += [e1, epg.S(1), t, e2, epg.S(1), epg.ADC]
    if case % 2 == 1:
        mut = rng.integers(0, 5)
        if mut == 0:      # one shift becomes 2
            j = [i for i, op in enumerate(seq) if type(op) is epg.S]
            seq[int(rng.choice(j))] = epg.S(2)
        elif mut == 1:    # one E gets off-resonance
            j = [i for i, op in enumerate(seq) if type(op) is epg.E]
            k = int(rng.choice(j))
            seq[k] = epg.E(seq[k].tau, seq[k].T1, seq[k].T2, 0.013)
        elif mut == 2:    # spoiler inserted mid-train
            seq.insert(1 + (necho // 2) * 6, epg.SPOILER)
        elif mut == 3:    # one refocusing loses the rank-1 structure
            j = [i for i, op in enumerate(seq) if type(op) is epg.T
                 and np.ndim(op.alpha)]
            if j:
                k = int(rng.choice(j))
                a = np.asarray(seq[k].alpha).copy()
                a[0] *= 1.01
                seq[k] = epg.T(a, seq[k].phi)
            else:         # scalar train: re-phase one ADC instead
                seq[6] = epg.Adc(phase=20.0)
        else:             # vector excitation
            seq[0] = epg.T(np.full(B, 80.0), 90)
    probes = ([epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
              if tracked else None)
    cap = 2 * necho + 2
    if probes is None:
        sig_k = np.asarray(epg.simulate(list(seq), max_nstate=cap,
                                        fisp_kernel="force"))
        sig_e = np.asarray(epg.simulate(list(seq), max_nstate=cap,
                                        fisp_kernel=False))
        assert sig_k.shape == sig_e.shape
        assert np.abs(sig_k - sig_e).max() < 2e-5
    else:
        sig_k, jac_k = epg.simulate(list(seq), max_nstate=cap,
                                    probe=probes, fisp_kernel="force")
        sig_e, jac_e = epg.simulate(list(seq), max_nstate=cap,
                                    probe=probes, fisp_kernel=False)
        assert np.asarray(jac_k).shape == np.asarray(jac_e).shape
        assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5
        jk, je = np.asarray(jac_k), np.asarray(jac_e)
        for c in range(jk.shape[-1]):
            sc = max(np.abs(je[..., c]).max(), 1e-12)
            assert np.abs(jk[..., c] - je[..., c]).max() / sc < 5e-5


def test_mse_truncated_capacity_parity():
    """max_nstate below the exact 2*necho ladder: the kernel's edge
    truncation must reproduce the planner's static-capacity drop."""
    seq = _mse_train(necho=12, B=4, ref=(150.0, 0.0), exc=(80.0, 90.0))
    for cap in (3, 6):
        a = np.asarray(epg.simulate(list(seq), max_nstate=cap,
                                    fisp_kernel="force"))
        b = np.asarray(epg.simulate(list(seq), max_nstate=cap,
                                    fisp_kernel=False))
        assert np.abs(a - b).max() < 1e-5


def test_mse_jacobian_subset_and_multiprobe():
    """Jacobian over a subset of the tracked vars, and multiple probes
    (Adc + two Jacobians) in one simulate call."""
    seq = _mse_diff_train(necho=8, B=4)
    probes = [epg.ADC, epg.Jacobian(["T1"]), epg.Jacobian(["magnitude", "T2"])]
    outs_k = epg.simulate(seq, probe=probes, fisp_kernel="force")
    outs_e = epg.simulate(seq, probe=probes, fisp_kernel=False)
    assert np.asarray(outs_k[1]).shape == np.asarray(outs_e[1]).shape
    for ok, oe in zip(outs_k, outs_e):
        ok, oe = np.asarray(ok), np.asarray(oe)
        assert np.abs(ok - oe).max() / max(np.abs(oe).max(), 1e-12) < 2e-5


def test_fisp_nd_batch_grid():
    """n-D ([T2] / outer-grid idiom) batch grids on a FISP train flatten
    to the kernel atom axis (append-broadcast rule) and reshape on
    output -- primal, vector inversion prep, Jacobian probes, df grid."""
    T2 = np.linspace(30, 120, 5)
    att = np.linspace(0.8, 1.2, 4)
    seq = []
    for i in range(10):
        seq += [epg.T((30.0 + i) * att, 90), epg.E(4.0, 1000.0, [T2]),
                epg.ADC, epg.E(8.0, 1000.0, [T2]), epg.S(1)]
    p = fisp_dispatch.match_fisp(list(seq))
    assert p is not None and p["shape"] == (4, 5) and p["T1"].shape == (20,)
    a = np.asarray(epg.simulate(list(seq), max_nstate=8,
                                fisp_kernel="force"))
    b = np.asarray(epg.simulate(list(seq), max_nstate=8,
                                fisp_kernel=False))
    assert a.shape == (10, 4, 5) and np.abs(a - b).max() < 1e-5
    # vector 180*att inversion prep renormalizes (FA, B1) over the grid
    prep = [epg.T(180.0 * att, 0), epg.E(18.0, 1000.0, [T2])]
    ak = np.asarray(epg.simulate(prep + seq, max_nstate=8,
                                 fisp_kernel="force"))
    ae = np.asarray(epg.simulate(prep + seq, max_nstate=8,
                                 fisp_kernel=False))
    assert np.abs(ak - ae).max() < 1e-5
    # Jacobian probes over the grid
    seqd = []
    for i in range(8):
        seqd += [epg.T((30.0 + i) * att, 90),
                 epg.E(4.0, 1000.0, [T2], order1=["T1", "T2"]), epg.ADC,
                 epg.E(8.0, 1000.0, [T2], order1=["T1", "T2"]), epg.S(1)]
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    sk, jk = epg.simulate(seqd, probe=probes, fisp_kernel="force")
    se, je = epg.simulate(seqd, probe=probes, fisp_kernel=False)
    jk, je = np.asarray(jk), np.asarray(je)
    assert jk.shape == je.shape == (8, 4, 5, 3)
    assert np.abs(jk - je).max() / np.abs(je).max() < 2e-5


def test_prep_zero_mean_b1_no_crash():
    """A [T, E] prep whose rank-1 flip factorization carries a
    zero-mean signed B1 direction must fall through (None), not raise
    ZeroDivisionError in the prep renormalization."""
    P, FA = 8, 20.0 + np.arange(8.0)
    B1 = np.asarray([1.0, -1.0])
    T1 = np.asarray([800.0, 900.0])
    T2 = np.asarray([60.0, 70.0])
    seq = [epg.T(180.0 * B1, 0.0), epg.E(15.0, T1, T2)]
    for i in range(P):
        seq += [epg.T(FA[i] * B1, 90.0), epg.E(5.0, T1, T2), epg.ADC,
                epg.E(7.0, T1, T2), epg.S(1)]
    fisp_dispatch.match_fisp(seq)  # must not raise


def test_off_resonance_prep_dispatch():
    """A [T(180*B1), E(TI, g=df)] prep whose g equals the train's
    off-resonance matches (inv_df=True: kernel applies the TI phase to
    the prepped F+) -- parity vs the planner; a prep g different from
    the train df falls through."""
    P, B, TI = 12, 4, 18.0
    FA = 10 + 40 * np.abs(np.sin(np.arange(P) / 3.0))
    T1 = np.linspace(700, 1300, B)
    T2 = np.linspace(50, 110, B)
    B1 = np.linspace(0.8, 1.1, B)
    df = np.linspace(-0.03, 0.03, B)

    def train(prep_g):
        seq = [epg.T(180.0 * B1, 0.0), epg.E(TI, T1, T2, g=prep_g)]
        for i in range(P):
            seq += [epg.T(FA[i] * B1, 90.0), epg.E(5.0, T1, T2, g=df),
                    epg.ADC, epg.E(7.0, T1, T2, g=df), epg.S(1)]
        return seq

    p = fisp_dispatch.match_fisp(train(df))
    assert p is not None and p["inv_df"] is True
    a = np.asarray(epg.simulate(train(df), max_nstate=8,
                                fisp_kernel="force"))
    b = np.asarray(epg.simulate(train(df), max_nstate=8,
                                fisp_kernel=False))
    assert np.abs(a - b).max() < 2e-5, np.abs(a - b).max()

    # g=0 prep still matches with the phase-free convention
    p0 = fisp_dispatch.match_fisp(train(0.0))
    assert p0 is not None and p0["inv_df"] is False
    a0 = np.asarray(epg.simulate(train(0.0), max_nstate=8,
                                 fisp_kernel="force"))
    b0 = np.asarray(epg.simulate(train(0.0), max_nstate=8,
                                 fisp_kernel=False))
    assert np.abs(a0 - b0).max() < 2e-5

    # a prep g that is NOT the train's df falls through
    assert fisp_dispatch.match_fisp(train(2 * df + 0.01)) is None


@pytest.mark.parametrize("case", range(10))
def test_fuzz_df_prep_dispatch_parity(case):
    """Random off-resonance trains with/without inversion preps: a
    matching-g prep dispatches with inv_df, a mismatched one falls
    through -- parity with the planner is the invariant either way."""
    rng = np.random.default_rng(300 + case)
    P = int(rng.integers(8, 24))
    B = int(rng.integers(2, 6))
    T1 = np.linspace(300, 1500, B)
    T2 = np.linspace(30, 120, B)
    b1 = np.linspace(0.8, 1.2, B) if rng.random() < 0.5 else None
    df = rng.uniform(-0.04, 0.04, B)
    FA = 10 + 40 * np.abs(np.sin(np.arange(P) / 3.0))
    seq = []
    for i in range(P):
        a = FA[i] * b1 if b1 is not None else float(FA[i])
        seq += [epg.T(a, 90.0), epg.E(5.0, T1, T2, g=df), epg.ADC,
                epg.E(7.0, T1, T2, g=df), epg.S(1)]
    kind = case % 3
    if kind:
        a0 = 180.0 * b1 if b1 is not None else 180.0
        TI = float(rng.uniform(5, 30))
        gp = df if kind == 1 else df * 0.5 + 0.001
        seq = [epg.T(a0, 0.0), epg.E(TI, T1, T2, g=gp)] + seq
        p = fisp_dispatch.match_fisp(list(seq))
        if kind == 1:
            assert p is not None and p["inv_df"] is True
        else:
            assert p is None
    sig_k = np.asarray(epg.simulate(list(seq), max_nstate=10,
                                    fisp_kernel="force"))
    sig_e = np.asarray(epg.simulate(list(seq), max_nstate=10,
                                    fisp_kernel=False))
    assert sig_k.shape == sig_e.shape
    assert np.abs(sig_k - sig_e).max() < 2e-5


def test_fuzz_cross_family_concatenations():
    """Trains formed by CONCATENATING blocks of different kernel
    families (FISP TRs then DESS TRs, CPMG echoes after a GRE train,
    ME-GRE then FISP, ...) must never misfire a whole-train matcher:
    every matcher requires its pattern for the full sequence, so these
    must fall through to the planner -- and "force" must equal the
    planner bit-for-bit (no kernel engaged)."""
    import numpy as np
    import epgpy_tpu as epg
    from epgpy_tpu import fisp_dispatch as fd

    rng = np.random.default_rng(61)
    T1 = np.array([800.0, 1400.0])
    T2 = np.array([60.0, 110.0])

    def fisp_tr(i):
        return [epg.T(20.0 + i, 0.0), epg.E(5.0, T1, T2), epg.ADC,
                epg.E(7.0, T1, T2), epg.S(1)]

    def dess_tr(i):
        return [epg.T(25.0 + i, 0.0), epg.E(5.0, T1, T2), epg.ADC,
                epg.E(8.0, T1, T2), epg.S(1), epg.E(6.0, T1, T2),
                epg.ADC]

    def megre_tr(i):
        return [epg.T(15.0 + i, 0.0), epg.E(3.0, T1, T2), epg.ADC,
                epg.E(4.0, T1, T2), epg.ADC, epg.E(5.0, T1, T2),
                epg.S(1)]

    def mse_echo(i):
        return [epg.E(4.0, T1, T2), epg.S(1), epg.T(160.0, 0.0),
                epg.E(4.0, T1, T2), epg.S(1), epg.ADC]

    makers = [fisp_tr, dess_tr, megre_tr]
    for trial in range(8):
        kinds = rng.choice(len(makers), size=2, replace=False)
        na, nb = int(rng.integers(2, 4)), int(rng.integers(2, 4))
        seq = []
        for i in range(na):
            seq += makers[kinds[0]](i)
        for i in range(nb):
            seq += makers[kinds[1]](i)
        if trial == 0:
            seq = [epg.T(90.0, 90.0)] + seq + mse_echo(0) + mse_echo(1)
        # no SPECIALIZED whole-train matcher may claim a mixed train
        assert fd.match_fisp(list(seq)) is None
        assert fd.match_dess(list(seq)) is None
        assert fd.match_megre(list(seq)) is None
        assert fd.match_mse(list(seq)) is None
        assert fd.match_bssfp(list(seq)) is None
        # ... but the generic composite stage family DOES (by design:
        # T/E/Adc/S(1) blocks are its grammar), at f32 tolerance
        assert fd.match_composite(list(seq)) is not None
        sig_k = epg.simulate(list(seq), fisp_kernel="force")
        sig_e = epg.simulate(list(seq), fisp_kernel=False)
        assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5, \
            trial
