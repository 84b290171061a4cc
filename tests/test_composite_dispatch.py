"""Composite-GRE stage trains -> fused Pallas kernel (match_composite).

The generic stage family: ``[T?, E*, Adc?, E*, S(+-k)?]`` blocks cover
the segmented/prepared GRE sequences the exact-pattern matchers reject
-- MPRAGE/MP2RAGE segmented inversion recovery, cardiac-MRF T2prep
composites, saturation-recovery GRE, mixed-family concatenations.
Reference semantics: the epgpy operator chain (T transition.py, E
evolution.py, S shift.py, Adc probe.py); goldens mprage.npz /
cardiac_mrf.npz generated from the reference by tools/make_golden.py.
"""

import os

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

T1 = np.array([500.0, 1000.0, 1500.0])
T2 = np.array([50.0, 80.0, 120.0])


def _parity(seq, tol=2e-5):
    p = fisp_dispatch.match_composite(list(seq))
    assert p is not None
    sig_k = epg.simulate(list(seq), fisp_kernel="force")
    sig_e = epg.simulate(list(seq), fisp_kernel=False)
    assert sig_k.shape == sig_e.shape
    err = np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max()
    scale = max(np.abs(np.asarray(sig_e)).max(), 1e-12)
    assert err < tol * scale, err
    return p, np.asarray(sig_k)


def _mprage(nseg=3, nread=6, TI=120.0, TD=300.0):
    seq = []
    for seg in range(nseg):
        seq += [epg.T(180.0, 0.0), epg.E(TI, T1, T2)]
        for i in range(nread):
            seq += [epg.T(9.0 + seg + 0.5 * i, 50.0 * i),
                    epg.E(3.0, T1, T2), epg.Adc(),
                    epg.E(5.0, T1, T2), epg.S(1)]
        seq += [epg.E(TD, T1, T2)]
    return seq


def test_match_extracts_stages():
    seq = _mprage()
    p = fisp_dispatch.match_composite(seq)
    assert p is not None
    # 3 segments x (prep + 6 readouts + recovery) = 24 stages
    assert p["FA"].shape == (24,)
    assert p["nadc"] == 18
    assert (p["adci"] >= 0).sum() == 18
    # adiabatic 180s bypass B1 only when a nontrivial B1 exists; here
    # the train is scalar-flip so b1u stays trivial
    assert p["shift"].sum() == 18


def test_mprage_parity():
    _parity(_mprage())


def test_mprage_golden():
    """MPRAGE physics pinned against the reference (mprage.npz)."""
    g = np.load(os.path.join(GOLDEN, "mprage.npz"))
    T1s, T2s = g["T1s"], g["T2s"]
    seq = []
    for seg in range(4):
        seq += [epg.T(180, 0), epg.E(120.0, T1s, T2s)]
        for i in range(8):
            seq += [epg.T(9.0 + 0.5 * i + seg, 30.0 * i),
                    epg.E(3.0, T1s, T2s), epg.ADC,
                    epg.E(5.5, T1s, T2s), epg.S(1)]
        seq += [epg.E(250.0, T1s, T2s)]
    sig_e = np.asarray(epg.simulate(list(seq), fisp_kernel=False))
    assert np.abs(sig_e - g["signal"]).max() < 1e-10
    assert fisp_dispatch.match_composite(list(seq)) is not None
    sig_k = np.asarray(epg.simulate(list(seq), fisp_kernel="force"))
    assert np.abs(sig_k - g["signal"]).max() < 2e-6


def test_cardiac_mrf_golden():
    """T2prep + B1-scaled FISP blocks pinned against the reference."""
    g = np.load(os.path.join(GOLDEN, "cardiac_mrf.npz"))
    T1s, T2s, B1s = g["T1s"], g["T2s"], g["B1s"]
    # every block starts with a scalar-pulse T2prep whose E ops carry
    # the (T1, T2) batch (the batch axis must exist before the first
    # (1, B1) vector flip -- see tools/make_golden.py cardiac_mrf)
    eco = [12.0, 24.0, 12.0]
    seq = []
    for blk in range(3):
        scale = blk + 1.0
        seq += [epg.T(90, 0), epg.E(eco[0] * scale, T1s, T2s),
                epg.T(180, 90), epg.E(eco[1] * scale, T1s, T2s),
                epg.T(180, 90), epg.E(eco[2] * scale, T1s, T2s),
                epg.T(90, 180), epg.S(1)]
        for i in range(10):
            fa = (12.0 + i + 2.0 * blk) * B1s[None, :]
            seq += [epg.T(fa, 15.0 * i), epg.E(2.5, T1s, T2s), epg.ADC,
                    epg.E(6.0, T1s, T2s), epg.S(1)]
        seq += [epg.E(180.0, T1s, T2s)]
    p = fisp_dispatch.match_composite(list(seq))
    assert p is not None
    # the scalar-flip T2prep pulses are B1-insensitive (adiabatic
    # convention); the vector FISP flips ride outer(FA, B1)
    assert not np.asarray(p["b1u"]).all()
    assert p["shape"] == (3, 4)
    sig_e = np.asarray(epg.simulate(list(seq), fisp_kernel=False))
    assert np.abs(sig_e - g["signal"]).max() < 1e-10
    sig_k = np.asarray(epg.simulate(list(seq), fisp_kernel="force"))
    assert np.abs(sig_k - g["signal"]).max() < 2e-6


def test_mixed_shift_directions():
    seq = []
    for i in range(12):
        s = (epg.S(1) if i % 3 == 0
             else (epg.S(-1) if i % 3 == 1 else epg.S(2)))
        seq += [epg.T(25.0 + i, 7.0 * i), epg.E(4.0, T1, T2), epg.Adc(),
                epg.E(4.5, T1, T2), s]
    p, _ = _parity(seq)
    # S(2) expands into two unit-shift stages; every stage here shifts
    assert p["FA"].shape[0] == 12 + 4
    assert set(np.asarray(p["shift"]).tolist()) == {-1, 1}


def test_adc_phases_and_multiecho():
    seq = []
    for i in range(8):
        seq += [epg.T(20.0, 58.5 * i * i), epg.E(3.0, T1, T2),
                epg.Adc(phase=-58.5 * i * i + 13.0),
                epg.E(2.0, T1, T2), epg.Adc(phase=7.0 * i),
                epg.E(5.0, T1, T2), epg.S(1)]
    p, _ = _parity(seq)
    assert p["nadc"] == 16


def test_balanced_with_off_resonance():
    df = np.array([0.0, 0.01, -0.02])
    seq = [epg.T(30.0, 0.0), epg.E(40.0, T1, T2, g=df)]
    for i in range(9):
        seq += [epg.T(35.0, 180.0 * (i % 2)), epg.E(2.0, T1, T2, g=df),
                epg.Adc(), epg.E(2.0, T1, T2, g=df)]
    p, _ = _parity(seq)
    assert p["df"] is not None
    assert not p["shift"].any()


def test_wait_offset_skipped():
    from epgpy_tpu.ops.base import Wait, Offset
    seq = []
    for i in range(8):
        seq += [epg.T(15.0, 0.0), epg.E(2.0, T1, T2), epg.Adc(),
                Wait(1.0), epg.E(4.0, T1, T2), Offset(-0.5), epg.S(1)]
    _parity(seq)


def test_specialized_families_keep_priority():
    """An exact FISP train must route to the FISP family (which has
    the faster kernel and diff support), not composite."""
    seq = []
    for i in range(12):
        seq += [epg.T(14.0 + i, 0.0), epg.E(3.0, T1, T2), epg.Adc(),
                epg.E(5.0, T1, T2), epg.S(1)]
    assert fisp_dispatch.match_fisp(list(seq)) is not None
    # composite would also match -- priority is the engine table order
    assert fisp_dispatch.match_composite(list(seq)) is not None


@pytest.mark.parametrize("mutate", [
    "xop",            # exchange op in train
    "probe",          # non-Adc probe
    "g_mismatch",     # off-resonance on one E only
    "t2_change",      # T2 changes mid-train
    "big_shift",      # |k| > 8
    "diff_t",         # order1 tracking on a T
    "adc_weights",    # weighted ADC
    "short",          # < 8 ops
])
def test_no_match_off_pattern(mutate):
    seq = _mprage(nseg=2, nread=4)
    if mutate == "xop":
        seq.insert(5, epg.X(1.0, 0.5, T1=(500, 400), T2=(50, 40)))
    elif mutate == "probe":
        seq[4] = epg.Probe("F0")
    elif mutate == "g_mismatch":
        e = seq[3]
        seq[3] = epg.E(e.tau, e.T1, e.T2, 0.03)
    elif mutate == "t2_change":
        e = seq[3]
        seq[3] = epg.E(e.tau, e.T1, np.asarray(e.T2) + 1.0)
    elif mutate == "big_shift":
        i = next(j for j, op in enumerate(seq) if type(op) is epg.S)
        seq[i] = epg.S(9)
    elif mutate == "diff_t":
        t = seq[0]
        seq[0] = epg.T(t.alpha, t.phi, order1=["alpha"])
    elif mutate == "adc_weights":
        i = next(j for j, op in enumerate(seq) if type(op) is epg.Adc)
        seq[i] = epg.Adc(weights=[1.0, 2.0, 3.0])
    elif mutate == "short":
        seq = seq[:7]
    assert fisp_dispatch.match_composite(list(seq)) is None


def test_saturation_recovery():
    """Periodic 90-spoil saturation blocks between readouts."""
    seq = []
    for blk in range(3):
        seq += [epg.T(90.0, 0.0), epg.S(1), epg.E(50.0 + 20 * blk, T1, T2)]
        for i in range(5):
            seq += [epg.T(10.0, 0.0), epg.E(2.0, T1, T2), epg.Adc(),
                    epg.E(4.0, T1, T2), epg.S(1)]
    _parity(seq)


def test_fuzz_random_stage_trains():
    """Randomized stage soup: arbitrary T/E/Adc/S orderings must either
    match with planner parity at f32 tolerance or fall through."""
    rng = np.random.default_rng(7)
    for trial in range(8):
        B = int(rng.integers(1, 4))
        t1 = rng.uniform(300, 1600, B)
        t2 = rng.uniform(30, 140, B)
        seq = []
        nadc = 0
        for _ in range(int(rng.integers(12, 40))):
            r = rng.random()
            if r < 0.35:
                seq.append(epg.T(float(rng.uniform(5, 180)),
                                 float(rng.uniform(0, 360))))
            elif r < 0.65:
                seq.append(epg.E(float(rng.uniform(0.5, 80)), t1, t2))
            elif r < 0.85:
                seq.append(epg.Adc(phase=float(rng.uniform(-90, 90))
                                   if rng.random() < 0.3 else None))
                nadc += 1
            else:
                seq.append(epg.S(int(rng.choice([-2, -1, 1, 1, 2]))))
        if nadc == 0:
            seq.append(epg.Adc())
        p = fisp_dispatch.match_composite(list(seq))
        sig_k = epg.simulate(list(seq), fisp_kernel="force")
        sig_e = epg.simulate(list(seq), fisp_kernel=False)
        err = np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max()
        scale = max(np.abs(np.asarray(sig_e)).max(), 1e-9)
        tol = 2e-5 * scale if p is not None else 1e-12
        assert err < tol, (trial, p is not None, err, scale)
