"""Cross-family dispatch fuzz: random trains from a unified grammar.

Every kernel family has its own fall-through fuzz; this suite attacks
the DISPATCH LAYER as a whole: random trains drawn from all family
grammars, concatenated, mutated, and salted with no-op ops must give
``simulate(fisp_kernel="force") == simulate(fisp_kernel=False)`` no
matter WHICH matcher (if any) claims them — the planner is the oracle
(itself pinned to the reference by goldens).  A wrongly-greedy matcher
that claims an off-pattern train is exactly the silent-wrongness bug
this hunts.
"""

import numpy as np
import pytest

import epgpy_tpu as epg

B = 3
T1 = np.array([600.0, 1100.0, 1700.0])
T2 = np.array([50.0, 90.0, 150.0])


def _fisp(rng, n):
    seq = []
    if rng.random() < 0.3:
        seq += [epg.T(180.0, 0.0), epg.E(float(rng.uniform(10, 40)),
                                         T1, T2)]
    for i in range(n):
        seq += [epg.T(float(rng.uniform(10, 60)), 90.0),
                epg.E(5.0, T1, T2), epg.ADC,
                epg.E(7.0, T1, T2), epg.S(1)]
    return seq


def _mse(rng, n):
    d = epg.D(4.0, 1e-3, k=1) if rng.random() < 0.5 else None
    seq = [epg.T(90, 90)]
    for i in range(n):
        h1 = [epg.E(4.0, T1, T2), epg.S(1)]
        h2 = [epg.E(4.0, T1, T2), epg.S(1)]
        if d is not None:
            h1, h2 = h1 + [d], h2 + [d]
        seq += h1 + [epg.T(float(rng.uniform(100, 175)), 0.0)] + h2 \
            + [epg.ADC]
    return seq


def _bssfp(rng, n):
    seq = []
    for i in range(n):
        seq += [epg.T(float(rng.uniform(20, 70)), 180.0 * (i % 2)),
                epg.E(6.0, T1, T2, -0.01), epg.ADC,
                epg.E(6.0, T1, T2, -0.01)]
    return seq


def _dess(rng, n):
    seq = []
    for i in range(n):
        seq += [epg.T(25.0, 0.0), epg.E(5.0, T1, T2), epg.ADC,
                epg.E(8.0, T1, T2), epg.S(1), epg.E(5.0, T1, T2),
                epg.ADC]
    return seq


def _megre(rng, n):
    seq = []
    for i in range(n):
        seq.append(epg.T(14.0, 0.0))
        prev = 0.0
        for te in (3.0, 7.0, 11.0):
            seq += [epg.E(te - prev, T1, T2), epg.ADC]
            prev = te
        seq += [epg.E(4.0, T1, T2), epg.S(1)]
    return seq


def _stages(rng, n):
    """Composite-ish random stage soup."""
    seq = []
    for i in range(n):
        r = rng.random()
        if r < 0.25:
            seq += [epg.T(180.0, 0.0), epg.E(float(rng.uniform(50, 200)),
                                             T1, T2)]
        elif r < 0.5:
            seq += [epg.T(float(rng.uniform(5, 20)), float(15 * i)),
                    epg.E(3.0, T1, T2), epg.Adc(),
                    epg.E(4.0, T1, T2),
                    epg.S(1) if rng.random() < 0.8 else epg.S(-1)]
        elif r < 0.75:
            seq += [epg.E(float(rng.uniform(20, 120)), T1, T2)]
        else:
            seq += [epg.T(90.0, float(rng.integers(0, 4)) * 90.0),
                    epg.E(6.0, T1, T2), epg.S(1)]
    return seq


def _dw_stages(rng, n):
    """Composite stage soup with D stages (r4): ramp crushers after
    readout spoilers, constant-k diffusion inside recovery delays."""
    d_cr = epg.D(5.0, 1.3e-3, k=1)
    d_free = epg.D(25.0, 1.3e-3)
    seq = []
    for i in range(n):
        r = rng.random()
        if r < 0.3:
            seq += [epg.T(180.0, 0.0),
                    epg.E(float(rng.uniform(30, 120)), T1, T2), d_free]
        else:
            seq += [epg.T(float(rng.uniform(6, 16)), 0.0),
                    epg.E(2.5, T1, T2), epg.Adc(),
                    epg.E(4.0, T1, T2), epg.S(1)]
            if rng.random() < 0.7:
                seq.append(d_cr)
    return seq


FAMS = [_fisp, _mse, _bssfp, _dess, _megre, _stages, _dw_stages]


def _salt(rng, seq):
    """Random benign/pattern-breaking inserts."""
    seq = list(seq)
    if rng.random() < 0.3:      # no-op ops (skipped by some matchers)
        pos = int(rng.integers(0, len(seq)))
        seq.insert(pos, epg.Wait(1.0) if rng.random() < 0.5 else epg.NULL)
    if rng.random() < 0.3:      # break one op
        idx = [i for i, op in enumerate(seq) if isinstance(op, epg.E)]
        if idx:
            i = int(rng.choice(idx))
            e = seq[i]
            seq[i] = epg.E(e.tau, np.asarray(e.T1) * 1.01, e.T2)
    return seq


@pytest.mark.parametrize("case", range(24))
def test_dispatch_parity_any_train(case):
    rng = np.random.default_rng(1000 + case)
    n = int(rng.integers(3, 9))
    seq = FAMS[case % len(FAMS)](rng, n)
    if rng.random() < 0.4:      # concatenate a second family block
        seq = seq + FAMS[int(rng.integers(0, len(FAMS)))](rng,
                                                          max(2, n // 2))
    seq = _salt(rng, seq)
    if not any(isinstance(op, (epg.Adc,)) for op in seq):
        seq.append(epg.ADC)
    # physical kvalue so the D-stage b-values are non-trivial (other
    # families' matchers are kvalue-independent)
    kw = {"max_nstate": 16, "kvalue": 2 * np.pi / 1e-3}
    got = np.asarray(epg.simulate(list(seq), fisp_kernel="force", **kw))
    ref = np.asarray(epg.simulate(list(seq), fisp_kernel=False, **kw))
    assert got.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-9)
    assert np.abs(got - ref).max() / scale < 3e-5, (
        case, np.abs(got - ref).max() / scale)


def test_fuzzer_exercises_kernels():
    """The grammar must actually hit fused kernels, not only the
    planner fall-through (else the parity checks prove nothing)."""
    from epgpy_tpu import fisp_dispatch as fd

    claimed = 0
    for case in range(24):
        rng = np.random.default_rng(1000 + case)
        n = int(rng.integers(3, 9))
        seq = FAMS[case % len(FAMS)](rng, n)
        matchers = [fd.match_fisp, lambda s: fd.match_mse(s, 1.0),
                    fd.match_bssfp, fd.match_dess, fd.match_megre,
                    lambda s: fd.match_dwfisp(s, 1.0),
                    lambda s: fd.match_composite(s, 1.0)]
        if any(m(list(seq)) is not None for m in matchers):
            claimed += 1
    assert claimed >= 12, claimed


@pytest.mark.parametrize("case", range(6))
def test_dispatch_parity_xstage_trains(case):
    """Composite EPG-X grammar rows (r4): random prepared/segmented
    two-pool schedules -- saturation or inversion preps, variable
    readout-block lengths, recovery delays, optional balanced blocks
    -- parity vs the planner whichever matcher claims them."""
    rng = np.random.default_rng(7000 + case)
    dens = np.asarray([0.85, 0.15])
    khi = epg.exchange_matrix(0.005, ncomp=2, densities=dens)
    T2x = np.stack([T2, np.full(B, 0.012)], axis=0)
    T1x = np.asarray([900.0, 1100.0])
    Xte = epg.X(3.0, khi, axis=0, T1=T1x, T2=T2x)
    Xtr = epg.X(float(rng.uniform(5, 9)), khi, axis=0, T1=T1x, T2=T2x)
    Xrec = epg.X(float(rng.uniform(80, 200)), khi, axis=0, T1=T1x,
                 T2=T2x)
    balanced = bool(rng.random() < 0.3)
    seq = []
    for seg in range(int(rng.integers(2, 4))):
        r = rng.random()
        if r < 0.4:
            seq += [epg.R(0, rL=np.asarray([0.0,
                                            float(rng.uniform(0.1, 0.5))]),
                          r0=None), Xrec]
        elif r < 0.7:
            seq += [epg.T(np.asarray([180.0, 0.0]), 0.0), Xrec]
        for i in range(int(rng.integers(2, 6))):
            seq += [epg.T(np.asarray([float(rng.uniform(8, 16)), 0.0]),
                          0.0), Xte, epg.ADC, Xtr]
            if not balanced:
                seq.append(epg.S(1))
        seq += [Xrec]
    kw = {"max_nstate": 1 if balanced else 6, "density": list(dens)}
    got = np.asarray(epg.simulate(list(seq), fisp_kernel="force", **kw))
    ref = np.asarray(epg.simulate(list(seq), fisp_kernel=False, **kw))
    assert got.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-9)
    assert np.abs(got - ref).max() / scale < 3e-5, (
        case, np.abs(got - ref).max() / scale)


def _tracked_train(rng, fam, n, *, track_b1, skew, track_d):
    """Random TRACKED train: (T1, T2) canonical E tracking everywhere,
    optional B1 chain-rule specs on the flips (``skew`` perturbs one
    coefficient so the shared-ratio validation must fall through), and
    optional canonical D tracking (dw family)."""
    B1v = np.linspace(0.85, 1.15, B)
    skew_i = int(rng.integers(0, n)) if skew else -1

    def tb1(i, fa):
        if not track_b1:
            return None
        c = float(fa) * (1.07 if i == skew_i else 1.0)
        return {"B1": {"alpha": c}}

    o1 = ["T1", "T2"]
    seq = []
    if fam == 0:                # FISP
        for i in range(n):
            fa = float(rng.uniform(10, 60))
            seq += [epg.T(fa * B1v, 90.0, order1=tb1(i, fa)),
                    epg.E(5.0, T1, T2, order1=o1), epg.ADC,
                    epg.E(7.0, T1, T2, order1=o1), epg.S(1)]
    elif fam == 1:              # CPMG/MSE
        seq = [epg.T(90, 90)]
        for i in range(n):
            fa = float(rng.uniform(100, 175))
            seq += [epg.E(4.0, T1, T2, order1=o1), epg.S(1),
                    epg.T(fa * B1v, 0.0, order1=tb1(i, fa)),
                    epg.E(4.0, T1, T2, order1=o1), epg.S(1), epg.ADC]
    elif fam == 2:              # bSSFP
        for i in range(n):
            fa = float(rng.uniform(20, 70))
            seq += [epg.T(fa * B1v, 180.0 * (i % 2), order1=tb1(i, fa)),
                    epg.E(6.0, T1, T2, -0.01, order1=o1), epg.ADC,
                    epg.E(6.0, T1, T2, -0.01, order1=o1)]
    else:                       # DW-FISP
        d = epg.D(4.0, 1.2e-3, k=1,
                  order1=["Dcoef"] if track_d else False)
        for i in range(n):
            fa = float(rng.uniform(10, 60))
            seq += [epg.T(fa * B1v, 90.0, order1=tb1(i, fa)),
                    epg.E(5.0, T1, T2, order1=o1), epg.ADC,
                    epg.E(7.0, T1, T2, order1=o1), epg.S(1), d]
    return seq


@pytest.mark.parametrize("case", range(16))
def test_jacobian_dispatch_parity_fuzz(case):
    """r5 B1/D tracked routing under fuzz: random tracked trains with
    Jacobian probes must give identical columns through the forced
    kernel dispatch and the planner -- including trains whose B1
    coefficients are deliberately skewed (shared-ratio validation must
    fall through to the planner, never mis-route)."""
    rng = np.random.default_rng(7000 + case)
    fam = case % 4
    n = int(rng.integers(5, 10))
    track_b1 = rng.random() < 0.7
    skew = track_b1 and rng.random() < 0.35
    track_d = fam == 3 and rng.random() < 0.7
    seq = _tracked_train(rng, fam, n, track_b1=track_b1, skew=skew,
                         track_d=track_d)
    from epgpy_tpu import fisp_dispatch
    names = ["magnitude", "T1", "T2"]
    if track_b1 and not skew:
        names.append("B1")
    if track_d:
        names.append("Dcoef")
    probes = [epg.ADC, epg.Jacobian(names)]
    kw = {"max_nstate": 10, "kvalue": 2 * np.pi / 1e-3}
    got = epg.simulate(list(seq), probe=probes, fisp_kernel="force",
                       **kw)
    ref = epg.simulate(list(seq), probe=probes, fisp_kernel=False, **kw)
    for out_k, out_r in zip(got, ref):
        a, b = np.asarray(out_k), np.asarray(out_r)
        assert a.shape == b.shape
        if a.ndim == 3:         # per-column tolerance (scales differ)
            for c in range(a.shape[-1]):
                scale = max(np.abs(b[..., c]).max(), 1e-12)
                assert np.abs(a[..., c] - b[..., c]).max() / scale \
                    < 3e-5, (case, names[c] if c < len(names) else c)
        else:
            scale = max(np.abs(b).max(), 1e-9)
            assert np.abs(a - b).max() / scale < 3e-5, case
    if skew:
        # the skewed train must NOT have matched with a B1 var
        for m, args in ((fisp_dispatch.match_fisp, (list(seq),)),
                        (fisp_dispatch.match_mse, (list(seq), 1.0)),
                        (fisp_dispatch.match_bssfp, (list(seq),))):
            p = m(*args)
            assert p is None or "B1" not in (p.get("vars") or ()), case
