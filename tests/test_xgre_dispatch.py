"""EPG-X GRE train -> fused Pallas kernel dispatch (match_xgre).

The engine recognizes per-TR blocks ``[R(sat)?, T, X?, Adc, X?, S(1)]``
(the canonical EPG-X spoiled-GRE / MT family, reference
epgpy/exchange.py:89-120 + magnettransfer.py usage sketch) and routes
them to models/pallas_xgre.  Tests force the dispatch with
fisp_kernel="force" (interpret-mode kernel on CPU) and compare against
the scan planner (fisp_kernel=False) in float64; off-pattern trains
must fall through.
"""

import os

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch


def load_golden(name):
    path = os.path.join(os.path.dirname(__file__), "golden", f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden file missing: {name}")
    return np.load(path)


def _mt_train(N=10, B=5, *, sat=True, order="adc_first", g=None, C=2,
              vary=False, two_stage=False, dens=(0.8, 0.2),
              balanced=False):
    """Reference-style two-pool MT-GRE train (bench workload family)."""
    dens = np.asarray(dens[:C]) / np.sum(dens[:C])
    khi = epg.exchange_matrix(0.005, ncomp=C, densities=dens)
    T2f = np.linspace(40.0, 120.0, B)
    T2 = np.stack([T2f] + [np.full(B, 0.012 * (c + 1))
                           for c in range(C - 1)], axis=0)
    T1 = np.linspace(800.0, 1200.0, C)
    gv = None if g is None else np.asarray(g)
    if two_stage:
        X1 = epg.X(3.0, khi, axis=0, T1=T1, T2=T2, g=gv)
        X2 = epg.X(7.0, khi, axis=0, T1=T1, T2=T2, g=gv)
    else:
        X1, X2 = None, epg.X(10.0, khi, axis=0, T1=T1, T2=T2, g=gv)
    seq = []
    rng = np.random.default_rng(7)
    for i in range(N):
        if sat:
            rL = np.zeros(C)
            rL[-1] = 0.25 + (0.1 * rng.uniform() if vary else 0.0)
            seq.append(epg.R(0, rL=rL, r0=None))
        alpha = np.asarray([12.0 + (3.0 * np.sin(i) if vary else 0.0)]
                           + [0.0] * (C - 1))
        phi = float((58.5 * i * (i + 1)) % 360) if vary else 0.0
        seq.append(epg.T(alpha, phi))
        blk = []
        if X1 is not None:
            blk.append(X1)
        blk.append(epg.ADC)
        blk.append(X2)
        if order == "adc_first":
            pass  # [X1?, ADC, X2]
        else:  # readout after the exchange stage
            blk = ([X1] if X1 is not None else []) + [X2, epg.ADC]
        seq += blk
        if not balanced:
            seq.append(epg.S(1))
    return seq, dens


def _parity(seq, dens, *, max_nstate=5, tol=2e-6):
    kw = dict(max_nstate=max_nstate, density=list(dens))
    ref = np.asarray(epg.simulate(seq, fisp_kernel=False, **kw))
    out = np.asarray(epg.simulate(seq, fisp_kernel="force", **kw))
    assert out.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-12)
    assert np.abs(out - ref).max() / scale < tol
    return ref


def _assert_match(seq, dens, shape):
    params = fisp_dispatch.match_xgre(seq, shape, list(dens))
    assert params is not None
    return params


def test_mt_gre_parity_bench_family():
    """[R, T, ADC, X, S] * N -- the bench/MT workload."""
    seq, dens = _mt_train(N=12, B=7)
    _assert_match(seq, dens, (2, 7))
    _parity(seq, dens)


def test_readout_after_exchange():
    seq, dens = _mt_train(N=10, B=4, order="adc_last")
    _parity(seq, dens)


def test_two_stage_exchange():
    """[R, T, X(TE), ADC, X(TR-TE), S] -- echo between two mixes."""
    seq, dens = _mt_train(N=10, B=4, two_stage=True)
    _assert_match(seq, dens, (2, 4))
    _parity(seq, dens)


def test_no_saturation_pure_exchange():
    seq, dens = _mt_train(N=10, B=5, sat=False)
    _assert_match(seq, dens, (2, 5))
    _parity(seq, dens)


def test_per_tr_varying_angles_and_sat():
    seq, dens = _mt_train(N=12, B=4, vary=True)
    _parity(seq, dens)


def test_off_resonance_complex_mixing():
    seq, dens = _mt_train(N=10, B=4, g=[0.05, -0.02])
    _assert_match(seq, dens, (2, 4))
    _parity(seq, dens)


def test_three_compartments():
    seq, dens = _mt_train(N=8, B=4, C=3, dens=(0.6, 0.25, 0.15))
    _assert_match(seq, dens, (3, 4))
    # looser tolerance: C > 2 mixes via the f32 Pade expm (the 2x2
    # closed form is exact to roundoff)
    _parity(seq, dens, tol=1e-5)


def test_default_density():
    """No density option: equilibrium Z = 1 in every compartment."""
    khi = epg.exchange_matrix(0.01, densities=[0.5, 0.5])
    X = epg.X(8.0, khi, axis=0, T1=np.asarray([900.0, 500.0]),
              T2=np.stack([np.linspace(50, 90, 4), np.full(4, 8.0)], 0))
    seq = []
    for i in range(10):
        seq += [epg.T(np.asarray([15.0, 15.0]), 0.0), epg.ADC, X, epg.S(1)]
    assert fisp_dispatch.match_xgre(seq, (2, 4), None) is not None
    ref = np.asarray(epg.simulate(seq, max_nstate=5, fisp_kernel=False))
    out = np.asarray(epg.simulate(seq, max_nstate=5, fisp_kernel="force"))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-6


def test_truncated_capacity():
    """max_nstate < N: ladder truncation must agree with the planner."""
    seq, dens = _mt_train(N=14, B=4)
    _parity(seq, dens, max_nstate=3)


def test_complex_saturation_rate():
    """Complex rT on the sat op (phase accrual on F states)."""
    khi = epg.exchange_matrix(0.004, densities=[0.7, 0.3])
    X = epg.X(9.0, khi, axis=0, T1=np.asarray([1000.0, 1000.0]),
              T2=np.stack([np.linspace(40, 100, 3), np.full(3, 0.02)], 0))
    sat = epg.R(np.asarray([0.02 + 0.3j, 0.0]), rL=np.asarray([0.0, 0.4]),
                r0=None)
    seq = []
    for _ in range(10):
        seq += [sat, epg.T(np.asarray([10.0, 0.0]), 0.0), epg.ADC, X,
                epg.S(1)]
    _parity(seq, [0.7, 0.3])


# ---- fall-through behavior -------------------------------------------------

def _bench_block(X, sat=None, s=None, adc=None):
    blk = [] if sat is None else [sat]
    return blk + [epg.T(np.asarray([10.0, 0.0]), 0.0), adc or epg.ADC, X,
                  s or epg.S(1)]


def _mk_x(khi=None, **kw):
    if khi is None:
        khi = epg.exchange_matrix(0.005, densities=[0.8, 0.2])
    kw.setdefault("T1", np.asarray([1000.0, 1000.0]))
    kw.setdefault("T2", np.stack([np.linspace(40, 120, 4),
                                  np.full(4, 0.012)], 0))
    axis = kw.pop("axis", 0)
    return epg.X(10.0, khi, axis=axis, **kw)


def test_fallthrough_distinct_x_instances():
    """Equal-valued but distinct X ops per TR: no match (the matcher
    requires the one-op-reused idiom), planner still runs."""
    seq = []
    for _ in range(6):
        seq += _bench_block(_mk_x())
    assert fisp_dispatch.match_xgre(seq, (2, 4), [0.8, 0.2]) is None
    out = epg.simulate(seq, max_nstate=4, density=[0.8, 0.2],
                       fisp_kernel="force")
    assert np.asarray(out).shape == (6, 2, 4)


def test_fallthrough_nonunit_shift():
    X = _mk_x()
    seq = []
    for _ in range(6):
        seq += _bench_block(X, s=epg.S(2))
    assert fisp_dispatch.match_xgre(seq, (2, 4), [0.8, 0.2]) is None


def test_fallthrough_adc_phase():
    X = _mk_x()
    seq = []
    for _ in range(6):
        seq += _bench_block(X, adc=epg.Adc(phase=30.0))
    assert fisp_dispatch.match_xgre(seq, (2, 4), [0.8, 0.2]) is None


def test_fallthrough_nonzero_axis():
    khi = epg.exchange_matrix(0.005, densities=[0.8, 0.2])[None]  # (1, 2, 2)
    X = _mk_x(khi=khi, axis=1, T2=np.stack([np.linspace(40, 120, 4),
                                            np.full(4, 0.012)], 1))
    seq = []
    for _ in range(6):
        seq += [epg.T(10.0, 0.0), epg.ADC, X, epg.S(1)]
    assert fisp_dispatch.match_xgre(seq, (4, 2), [0.8, 0.2]) is None


def test_fallthrough_nonconserving_density():
    """khi built without densities does not conserve a skewed density:
    the matcher must NOT take over (the engine's eager path raises)."""
    khi = epg.exchange_matrix(0.005)  # symmetric, conserves [.5, .5] only
    X = _mk_x(khi=khi)
    seq = []
    for _ in range(6):
        seq += _bench_block(X)
    assert fisp_dispatch.match_xgre(seq, (2, 4), [0.8, 0.2]) is None
    # the balanced density matches fine
    assert fisp_dispatch.match_xgre(seq, (2, 4), [0.5, 0.5]) is not None


def test_fallthrough_tracked_ops():
    X = _mk_x()
    sat = epg.R(0, rL=np.asarray([0.0, 0.3]), r0=None, order1="rL")
    seq = []
    for _ in range(6):
        seq += _bench_block(X, sat=sat)
    assert fisp_dispatch.match_xgre(seq, (2, 4), [0.8, 0.2]) is None


def test_fallthrough_sat_with_recovery():
    X = _mk_x()
    sat = epg.R(0, rL=np.asarray([0.0, 0.3]), r0=np.asarray([0.0, 0.1]))
    seq = []
    for _ in range(6):
        seq += _bench_block(X, sat=sat)
    assert fisp_dispatch.match_xgre(seq, (2, 4), [0.8, 0.2]) is None


def test_rank1_per_atom_alpha():
    """outer(alpha_ic, B1) flip batches: per-atom B1 rides the kernel."""
    X = _mk_x()
    B1 = np.linspace(0.85, 1.15, 4)
    seq = []
    for i in range(10):
        alpha = np.stack([(10.0 + 2.0 * np.sin(i)) * B1, np.zeros(4)], 0)
        seq += [epg.T(alpha, 0.0), epg.ADC, X, epg.S(1)]
    params = fisp_dispatch.match_xgre(seq, (2, 4), [0.8, 0.2])
    assert params is not None and params["B1"] is not None
    _parity(seq, [0.8, 0.2])


def test_fallthrough_non_rank1_alpha():
    """Per-atom flips that are NOT a common rank-1 factor fall through."""
    X = _mk_x()
    seq = []
    for i in range(6):
        row = (np.linspace(8, 12, 4) if i % 2 == 0
               else np.linspace(12, 8, 4))
        alpha = np.stack([row, np.zeros(4)], 0)
        seq += [epg.T(alpha, 0.0), epg.ADC, X, epg.S(1)]
    assert fisp_dispatch.match_xgre(seq, (2, 4), [0.8, 0.2]) is None


def test_fallthrough_complex_density():
    X = _mk_x()
    seq = []
    for _ in range(6):
        seq += _bench_block(X)
    assert fisp_dispatch.match_xgre(seq, (2, 4),
                                    [0.8 + 0.1j, 0.2 - 0.1j]) is None


def test_match_memoized():
    seq, dens = _mt_train(N=8, B=4)
    p1 = fisp_dispatch.match_xgre(seq, (2, 4), list(dens))
    p2 = fisp_dispatch.match_xgre(seq, (2, 4), list(dens))
    assert p1 is p2


@pytest.mark.slow
def test_fuzz_xgre_dispatch_parity_or_fallthrough():
    """Randomized trains: valid family members must match AND agree with
    the planner; mutated trains must fall through (match is None)."""
    rng = np.random.default_rng(42)
    for case in range(12):
        C = int(rng.choice([2, 3]))
        d = rng.uniform(0.1, 1.0, C)
        dens = d / d.sum()
        khi = epg.exchange_matrix(float(rng.uniform(0.001, 0.02)),
                                  ncomp=C, densities=dens)
        B = 4
        T2 = np.stack([np.linspace(30, 130, B)]
                      + [np.full(B, rng.uniform(0.01, 5.0))
                         for _ in range(C - 1)], 0)
        T1 = rng.uniform(500, 1500, C)
        g = rng.uniform(-0.05, 0.05, C) if rng.random() < 0.5 else None
        two = rng.random() < 0.4
        use_sat = rng.random() < 0.6
        if two:
            X1 = epg.X(float(rng.uniform(2, 6)), khi, axis=0, T1=T1, T2=T2,
                       g=g)
            X2 = epg.X(float(rng.uniform(4, 12)), khi, axis=0, T1=T1, T2=T2,
                       g=g)
        else:
            X1, X2 = None, epg.X(float(rng.uniform(4, 12)), khi, axis=0,
                                 T1=T1, T2=T2, g=g)
        N = 8
        b1 = np.linspace(0.9, 1.1, B) if rng.random() < 0.4 else None
        seq = []
        for i in range(N):
            if use_sat:
                rL = np.zeros(C)
                rL[-1] = rng.uniform(0.05, 0.5)
                seq.append(epg.R(0, rL=rL, r0=None))
            a = np.zeros(C)
            a[0] = rng.uniform(5, 40)
            alpha = np.outer(a, b1) if b1 is not None else a
            seq.append(epg.T(alpha, float(rng.uniform(0, 360))))
            blk = ([X1] if X1 is not None else []) + [epg.ADC, X2]
            seq += blk
            seq.append(epg.S(1))

        mutate = rng.random() < 0.4
        if mutate:
            kind = rng.integers(0, 4)
            if kind == 0:      # one non-unit shift
                seq[-1] = epg.S(2)
            elif kind == 1:    # one Adc with phase
                idx = next(i for i, op in enumerate(seq)
                           if getattr(op, "attr", None) == "F0")
                seq[idx] = epg.Adc(phase=12.0)
            elif kind == 2:    # a fresh (non-shared) X instance mid-train
                idx = next(i for i, op in enumerate(seq) if op is X2)
                seq[idx] = epg.X(X2.tau, khi, axis=0, T1=T1, T2=T2, g=g)
            else:              # tracked T op
                idx = next(i for i, op in enumerate(seq)
                           if type(op) is epg.T)
                t = seq[idx]
                seq[idx] = epg.T(t.alpha, t.phi, order1="alpha")

        shape = (C, B)
        params = fisp_dispatch.match_xgre(seq, shape, list(dens))
        if mutate:
            assert params is None, f"case {case}: mutated train matched"
            continue
        assert params is not None, f"case {case}: valid train fell through"
        _parity(seq, dens, max_nstate=4,
                tol=2e-6 if C == 2 else 2e-5)


def test_traced_x_leaves_fall_through():
    """X built under a trace (tau / T2 are Tracers; khi is host-
    converted in X.__init__ so it cannot be): the matcher must return
    None, never crash in np.asarray or cache the Tracer (the per-voxel
    qMT-fit idiom differentiates through relaxation/timing)."""
    import jax
    import jax.numpy as jnp

    khi = epg.exchange_matrix(0.005, densities=[0.8, 0.2])
    got = {}

    def probe(tau, t2f):
        T2 = jnp.stack([jnp.full((4,), t2f), jnp.full((4,), 0.012)])
        X = epg.X(tau, khi, axis=0,
                  T1=np.asarray([1000.0, 1000.0]), T2=T2)
        seq = []
        for _ in range(6):
            seq += [epg.T(np.asarray([10.0, 0.0]), 0.0), epg.ADC, X,
                    epg.S(1)]
        got["m"] = fisp_dispatch.match_xgre(seq, (2, 4), [0.8, 0.2])
        return jnp.zeros(())

    jax.make_jaxpr(probe)(jnp.float32(10.0), jnp.float32(80.0))
    assert got["m"] is None


# ---- balanced family (bSSFP-MT / exchange-bSSFP, no spoiler) ---------------

def test_balanced_exchange_parity():
    """[R, T, X(TE), ADC, X(TR-TE)] * N -- Gloor-2008 bSSFP-MT family:
    no unit shift anywhere, the kernel runs shiftless at nstate=0."""
    seq, dens = _mt_train(N=12, B=5, balanced=True, two_stage=True,
                          vary=True)
    params = _assert_match(seq, dens, (2, 5))
    assert params["balanced"] is True
    _parity(seq, dens)


def test_balanced_no_sat_off_resonance():
    seq, dens = _mt_train(N=10, B=4, balanced=True, sat=False,
                          g=[0.02, -0.01])
    params = _assert_match(seq, dens, (2, 4))
    assert params["balanced"] is True
    _parity(seq, dens)


def test_balanced_three_compartments():
    seq, dens = _mt_train(N=8, B=4, C=3, balanced=True,
                          dens=(0.6, 0.25, 0.15))
    _assert_match(seq, dens, (3, 4))
    # C > 2 mixes via the f32 Pade expm (~8e-6 per-stage error, vs the
    # roundoff-exact 2x2 closed form); a balanced train never spoils,
    # so 2 stages x 8 TRs accumulate ~2.5e-5 on the undamped k=0 row
    _parity(seq, dens, tol=1e-4)


def test_fallthrough_mixed_balanced_and_spoiled():
    """Some blocks with S(1), some without: no family matches."""
    X = _mk_x()
    seq = []
    for i in range(6):
        seq += _bench_block(X) if i % 2 == 0 else _bench_block(X)[:-1]
    assert fisp_dispatch.match_xgre(seq, (2, 4), [0.8, 0.2]) is None


def test_xbssfp_golden():
    """Reference-generated golden: phase-alternating two-pool balanced
    EPG-X train (tools/make_golden.py:xbssfp).  The planner must agree
    at 1e-9 (f64) and the fused shiftless kernel at f32 tolerance."""
    g = load_golden("xbssfp")
    dens = [0.85, 0.15]
    khi = epg.exchange_matrix(0.004, axis=0, ncomp=2, densities=dens)
    T1 = [900.0, 400.0]
    T2 = [70.0, 0.02]
    gg = [0.003, 0.0]
    n = 36
    TR, TE = 5.0, 2.3
    FAs, phases = g["FAs"], g["phases"]
    X1 = epg.X(TE, khi, axis=0, T1=T1, T2=T2, g=gg)
    X2 = epg.X(TR - TE, khi, axis=0, T1=T1, T2=T2, g=gg)
    seq = []
    for i in range(n):
        seq += [epg.R(0, rL=np.asarray([0.0, 0.3])),
                epg.T(np.array([FAs[i], 0.0]), float(phases[i])),
                X1, epg.ADC, X2]
    ref = np.asarray(epg.simulate(seq, density=dens, fisp_kernel=False))
    assert np.abs(ref - g["signal"]).max() < 1e-9
    assert fisp_dispatch.match_xgre(seq, (2,), dens) is not None
    out = np.asarray(epg.simulate(seq, density=dens, fisp_kernel="force"))
    assert np.abs(out - g["signal"]).max() / np.abs(g["signal"]).max() < 2e-6
