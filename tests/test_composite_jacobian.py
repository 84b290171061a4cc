"""Composite-GRE fused Jacobian kernel (models/pallas_composite
composite_jacobian_pallas) + its simulate() dispatch.

The composite family covers arbitrary [T?, E*, Adc?, E*, S(+-1)?] stage
trains (MPRAGE / T2prep / saturation-recovery); its Jacobian kernel
propagates (dT1, dT2, dB1, ddf) tangent plane groups through the same
per-stage operator as the primal (EPG ops are affine), with the
coefficient-derivative terms applied to the primal planes.  Oracle: the
f64 planner's jacfwd (exact autodiff through every op), reference
chain-rule semantics /root/reference/epgpy/diff.py:119-139.
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch


def _mprage_ops(nseg=3, nread=6, *, B=4, track=None, track_b1=False,
                seed=11, df=None, adiabatic=True):
    """MPRAGE-like segmented train: per-segment [T(180), E(TI)]
    inversion + [T(fa*B1), E(ta), ADC, E(tb), S(1)] * nread readout +
    E(TD) recovery.  Returns (seq, FA, B1, T1, T2)."""
    rng = np.random.default_rng(seed)
    T1 = rng.uniform(400, 1800, B)
    T2 = rng.uniform(30, 150, B)
    B1 = rng.uniform(0.85, 1.15, B)
    g = 0.0 if df is None else df
    o1 = track or None
    seq = []
    FAs = []
    for s in range(nseg):
        inv = epg.T(180.0, 0.0) if adiabatic else epg.T(180.0 * B1, 0.0)
        seq += [inv, epg.E(12.0 + s, T1, T2, g, order1=o1)]
        for i in range(nread):
            fa = float(rng.uniform(6, 14))
            FAs.append(fa)
            t_kw = ({"order1": {"B1": {"alpha": fa}}} if track_b1 else {})
            seq += [epg.T(fa * B1, 0.0, **t_kw),
                    epg.E(2.2, T1, T2, g, order1=o1), epg.ADC,
                    epg.E(3.8, T1, T2, g, order1=o1), epg.S(1)]
        seq += [epg.E(80.0 + 5 * s, T1, T2, g, order1=o1)]
    return seq, np.asarray(FAs), B1, T1, T2


def test_composite_jacobian_kernel_matches_planner():
    """Direct kernel call vs the f64 planner over ALL four columns
    (T1, T2, B1, df) -- B1 via chain-rule-tracked T ops (the adiabatic
    inversion does NOT track B1, matching the kernel's b1u=0 flag)."""
    B, NS = 4, 10
    df = np.linspace(-0.02, 0.02, B)
    seq, FAs, B1, T1, T2 = _mprage_ops(
        nseg=2, nread=5, B=B, track=["T1", "T2", "g"], track_b1=True,
        df=df)
    sig, jac = epg.simulate(
        seq, max_nstate=NS, fisp_kernel=False,
        probe=[epg.ADC, epg.Jacobian(["T1", "T2", "B1", "g"])])
    sig = np.asarray(sig)                      # (nadc, B)
    jac = np.asarray(jac)                      # (nadc, B, 4)

    params = fisp_dispatch.match_composite(_strip_tracking(seq))
    assert params is not None
    from epgpy_tpu.models.pallas_composite import composite_jacobian_pallas
    (re, im), (jre, jim) = composite_jacobian_pallas(
        params["FA"], params["phi"], params["ta"], params["tb"],
        params["adci"], params["shift"], params["aph"], params["b1u"],
        params["T1"], params["T2"], params["B1"], params["df"],
        nadc=params["nadc"], nstate=NS, btile=128, interpret=True)
    k = np.asarray(re) + 1j * np.asarray(im)
    assert k.shape == sig.shape
    assert np.abs(k - sig).max() < 2e-5
    kj = np.asarray(jre) + 1j * np.asarray(jim)     # (nadc, B, 4)
    # the matcher's rank-1 factorization normalizes B1 to max() == 1
    # (scale absorbed into FA), so the kernel's dB1 column is w.r.t.
    # the normalized B1: d/dB1_norm = B1.max() * d/dB1_physical.
    # Model-level callers passing physical (FA, B1) get physical dB1.
    kj[..., 2] /= B1.max()
    scale = np.array([1e3, 1e2, 1.0, 1e-2])         # typical param sizes
    err = np.abs((kj - jac) * scale).max()
    assert err < 3e-4, err


def _strip_tracking(seq):
    """Clone the op list without order1 specs (the matcher memoizes on
    op ids; the tracked list must keep its own identity)."""
    out = []
    for op in seq:
        if type(op) is epg.E:
            out.append(epg.E(op.tau, op.T1, op.T2, op.g))
        elif type(op) is epg.T:
            out.append(epg.T(op.alpha, op.phi))
        else:
            out.append(op)
    return out


def test_composite_jacobian_dispatch_parity():
    """simulate() routes tracked composite trains with Adc/Jacobian
    probes to the fused kernel; force-vs-planner parity over
    (magnitude, T1, T2) columns -- the MPRAGE T1-fit spec."""
    B, NS = 3, 10
    seq, *_ = _mprage_ops(nseg=2, nread=5, B=B, track=["T1", "T2"])
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    sig_k, jac_k = epg.simulate(list(seq), max_nstate=NS, probe=probes,
                                fisp_kernel="force")
    sig_e, jac_e = epg.simulate(list(seq), max_nstate=NS, probe=probes,
                                fisp_kernel=False)
    assert sig_k.shape == sig_e.shape == (10, B)
    assert jac_k.shape == jac_e.shape == (10, B, 3)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5
    scale = np.array([1.0, 1e3, 1e2])
    err = np.abs((np.asarray(jac_k) - np.asarray(jac_e)) * scale).max()
    assert err < 3e-4, err


def test_composite_jacobian_dispatch_df_column():
    """g-tracked composite trains (IR with precessing TI) expose the
    df column through the dispatch."""
    B, NS = 3, 8
    df = np.linspace(-0.03, 0.03, B)
    seq, *_ = _mprage_ops(nseg=2, nread=4, B=B,
                          track=["T1", "T2", "g"], df=df)
    probes = [epg.Jacobian(["T2", "g"])]
    jac_k = epg.simulate(list(seq), max_nstate=NS, probe=probes,
                         fisp_kernel="force")
    jac_e = epg.simulate(list(seq), max_nstate=NS, probe=probes,
                         fisp_kernel=False)
    assert jac_k.shape == jac_e.shape == (8, B, 2)
    scale = np.array([1e2, 1e-2])
    err = np.abs((np.asarray(jac_k) - np.asarray(jac_e)) * scale).max()
    assert err < 3e-4, err


def test_t2prep_fisp_jacobian_dispatch():
    """Cardiac-MRF-style T2prep composite (90x-180y-90-x, no gradient)
    + FISP readout blocks: the composite Jacobian path must cover the
    prepared-train case the exact-FISP matcher rejects."""
    B, NS = 3, 8
    rng = np.random.default_rng(5)
    T1 = rng.uniform(400, 1600, B)
    T2 = rng.uniform(30, 150, B)
    o1 = ["T1", "T2"]
    seq = []
    for blk in range(2):
        # T2prep: 90x - E - 180y - E - 90-x (echo time 30 ms)
        seq += [epg.T(90.0, 0.0), epg.E(15.0, T1, T2, order1=o1),
                epg.T(180.0, 90.0), epg.E(15.0, T1, T2, order1=o1),
                epg.T(90.0, 180.0)]
        for i in range(5):
            seq += [epg.T(10.0 + i + 3 * blk, 0.0),
                    epg.E(2.0, T1, T2, order1=o1), epg.ADC,
                    epg.E(4.0, T1, T2, order1=o1), epg.S(1)]
        seq += [epg.E(50.0, T1, T2, order1=o1)]
    assert fisp_dispatch.match_fisp(_strip_tracking(seq)) is None
    assert fisp_dispatch.match_composite(list(seq)) is not None
    probes = [epg.ADC, epg.Jacobian(["T1", "T2"])]
    sig_k, jac_k = epg.simulate(list(seq), max_nstate=NS, probe=probes,
                                fisp_kernel="force")
    sig_e, jac_e = epg.simulate(list(seq), max_nstate=NS, probe=probes,
                                fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5
    scale = np.array([1e3, 1e2])
    err = np.abs((np.asarray(jac_k) - np.asarray(jac_e)) * scale).max()
    assert err < 3e-4, err


@pytest.mark.parametrize("mutate", [
    "hessian",         # order2 -> planner
    "alias",           # aliased variable -> planner
    "mixed",           # tracked sets differ between E ops -> no match
])
def test_fall_through_off_pattern(mutate):
    B, NS = 2, 8
    seq, *_ = _mprage_ops(nseg=2, nread=4, B=B, track=["T1", "T2"])
    probes = [epg.Jacobian(["T1", "T2"])]
    if mutate == "hessian":
        seq2, *_ = _mprage_ops(nseg=2, nread=4, B=B, track=None)
        seq = []
        for op in seq2:
            if type(op) is epg.E:
                seq.append(epg.E(op.tau, op.T1, op.T2, op.g,
                                 order1=["T1", "T2"],
                                 order2=[("T1", "T1")]))
            else:
                seq.append(op)
        assert fisp_dispatch.match_composite(list(seq)) is None
        return
    if mutate == "alias":
        seq2, *_ = _mprage_ops(nseg=2, nread=4, B=B, track=None)
        seq = []
        for op in seq2:
            if type(op) is epg.E:
                seq.append(epg.E(op.tau, op.T1, op.T2, op.g,
                                 order1={"R2": {"T2": 2.0}}))
            else:
                seq.append(op)
        assert fisp_dispatch.match_composite(list(seq)) is None
        return
    if mutate == "mixed":
        # first E tracks T1 only, the rest (T1, T2)
        i = next(j for j, op in enumerate(seq) if type(op) is epg.E)
        seq[i] = epg.E(seq[i].tau, seq[i].T1, seq[i].T2, seq[i].g,
                       order1=["T1"])
        assert fisp_dispatch.match_composite(list(seq)) is None
        return


def test_composite_jacobian_demodulated_train():
    """RF-spoiled (phase-cycled, demodulated-Adc) composite train: the
    probes inherit the in-train Adc phase through op.post, so the
    kernel must phase the tangent columns identically (the MPRAGE
    readout convention)."""
    B, NS = 3, 8
    rng = np.random.default_rng(9)
    T1 = rng.uniform(400, 1600, B)
    T2 = rng.uniform(30, 150, B)
    o1 = ["T1", "T2"]
    ph = np.cumsum(np.arange(8) * 117.0) % 360.0
    seq = []
    j = 0
    for s in range(2):
        seq += [epg.T(180.0, 0.0), epg.E(12.0, T1, T2, order1=o1)]
        for i in range(4):
            seq += [epg.T(9.0, float(ph[j])),
                    epg.E(2.2, T1, T2, order1=o1),
                    epg.Adc(phase=-float(ph[j])),
                    epg.E(3.8, T1, T2, order1=o1), epg.S(1)]
            j += 1
        seq += [epg.E(60.0, T1, T2, order1=o1)]
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    sig_k, jac_k = epg.simulate(list(seq), max_nstate=NS, probe=probes,
                                fisp_kernel="force")
    sig_e, jac_e = epg.simulate(list(seq), max_nstate=NS, probe=probes,
                                fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5
    scale = np.array([1.0, 1e3, 1e2])
    err = np.abs((np.asarray(jac_k) - np.asarray(jac_e)) * scale).max()
    assert err < 3e-4, err


KV = 2 * np.pi / 1e-3     # 1 mm voxel: rad/m per state index


def _dw_mprage(B=3, track=None, *, Dc=1.2e-3, dkw=None, nseg=2,
               nread=4, seed=3, shared_d=True):
    """MPRAGE-like train with diffusion: a crusher ``D(tau, D, k=1)``
    after every readout spoiler and a constant-k ``D`` inside each
    recovery delay (acts on the spread ladder)."""
    rng = np.random.default_rng(seed)
    T1 = rng.uniform(500, 1700, B)
    T2 = rng.uniform(40, 150, B)
    o1 = {"order1": track} if track else {}
    dkw = {"k": 1} if dkw is None else dkw
    d_cr = epg.D(6.0, Dc, **dkw)
    d_free = epg.D(30.0, Dc)
    seq = []
    for s in range(nseg):
        seq += [epg.T(180.0, 0.0), epg.E(14.0, T1, T2, **o1)]
        for i in range(nread):
            seq += [epg.T(float(rng.uniform(6, 14)), 0.0),
                    epg.E(2.2, T1, T2, **o1), epg.ADC,
                    epg.E(3.8, T1, T2, **o1), epg.S(1),
                    d_cr if shared_d else epg.D(6.0, Dc, **dkw)]
        seq += [epg.E(40.0, T1, T2, **o1), d_free,
                epg.E(40.0, T1, T2, **o1)]
    return seq


def test_dw_composite_primal_parity():
    """Crusher (ramp) + free-evolution (constant-k) D stages through
    the composite kernel vs the f64 planner; the D must MATTER (the
    attenuated train differs from the unweighted one)."""
    seq = _dw_mprage(B=3)
    params = fisp_dispatch.match_composite(list(seq), KV)
    assert params is not None and params["diffusion"] is not None
    sig_k = epg.simulate(list(seq), max_nstate=8, kvalue=KV,
                         fisp_kernel="force")
    sig_e = epg.simulate(list(seq), max_nstate=8, kvalue=KV,
                         fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5
    sig_0 = epg.simulate(_dw_mprage(B=3, Dc=0.0), max_nstate=8,
                         kvalue=KV, fisp_kernel=False)
    assert np.abs(np.asarray(sig_e) - np.asarray(sig_0)).max() > 1e-4


def test_dw_composite_distinct_instances():
    """Distinct D instances sharing one host-equal scalar coefficient
    still match (bounded one-time d2h comparisons)."""
    seq = _dw_mprage(B=2, shared_d=False)
    assert fisp_dispatch.match_composite(list(seq), KV) is not None


def test_dw_composite_jacobian_parity():
    """Tracked DW-composite trains route to the fused Jacobian kernel
    (attenuation multiplies every tangent group identically)."""
    seq = _dw_mprage(B=3, track=["T1", "T2"])
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    sig_k, jac_k = epg.simulate(list(seq), max_nstate=8, kvalue=KV,
                                probe=probes, fisp_kernel="force")
    sig_e, jac_e = epg.simulate(list(seq), max_nstate=8, kvalue=KV,
                                probe=probes, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 2e-5
    scale = np.array([1.0, 1e3, 1e2])
    err = np.abs((np.asarray(jac_k) - np.asarray(jac_e)) * scale).max()
    assert err < 3e-4, err


@pytest.mark.parametrize("mutate", ["tensor", "ramp_noshift", "dc_vary"])
def test_dw_composite_fall_through(mutate):
    if mutate == "tensor":
        seq = _dw_mprage(B=2, Dc=np.diag([1e-3, 1e-3, 1e-3]))
        assert fisp_dispatch.match_composite(list(seq), KV) is None
    elif mutate == "ramp_noshift":
        # a ramp D on a shiftless stage: attenuation would claim a
        # gradient the ladder never saw -> planner
        seq = _dw_mprage(B=2)
        i = next(j for j, op in enumerate(seq)
                 if type(op) is epg.D and op.kshift is None)
        seq[i] = epg.D(30.0, 1.2e-3, k=1)
        assert fisp_dispatch.match_composite(list(seq), KV) is None
    else:
        seq = _dw_mprage(B=2, shared_d=False)
        i = next(j for j, op in enumerate(seq) if type(op) is epg.D)
        seq[i] = epg.D(6.0, 2.5e-3, k=1)
        assert fisp_dispatch.match_composite(list(seq), KV) is None
    # planner parity still holds for the rejected train
    sig_k = epg.simulate(list(seq), max_nstate=6, kvalue=KV,
                         fisp_kernel="force")
    sig_e = epg.simulate(list(seq), max_nstate=6, kvalue=KV,
                         fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-7


def test_magnitude_only_jacobian_dispatch():
    """Jacobian(["magnitude"]) needs NO tangent groups: the kernel must
    run with an empty group set (r4 regression: jnp.stack([]) raised)."""
    B, NS = 2, 8
    seq, *_ = _mprage_ops(nseg=2, nread=4, B=B, track=["T1", "T2"])
    probes = [epg.Jacobian(["magnitude"])]
    jac_k = epg.simulate(list(seq), max_nstate=NS, probe=probes,
                         fisp_kernel="force")
    jac_e = epg.simulate(list(seq), max_nstate=NS, probe=probes,
                         fisp_kernel=False)
    assert jac_k.shape == jac_e.shape == (8, B, 1)
    assert np.abs(np.asarray(jac_k) - np.asarray(jac_e)).max() < 2e-5
