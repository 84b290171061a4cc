"""n-D / float shift, diffusion and exchange tests (strategy: reference
test/test_shift.py, test/test_diffusion.py, test/test_exchange.py)."""

import os

import numpy as np
import pytest

import epgpy_tpu as epg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(name):
    path = os.path.join(GOLDEN, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: {name}")
    return np.load(path)


# -- nd shifts --


def test_shiftnd_matches_shift1d():
    """1-column integer nd shift == plain 1-D shift (ref test_shift.py:34)."""
    seq1 = [epg.T(90, 90), epg.S(1), epg.T(120, 0), epg.S(1),
            epg.T(45, 45), epg.S(-1), epg.ADC]
    seqn = [epg.T(90, 90), epg.S(np.array([[1]])), epg.T(120, 0),
            epg.S(np.array([[1]])), epg.T(45, 45), epg.S(np.array([[-1]])),
            epg.ADC]
    s1 = np.asarray(epg.simulate(seq1, probe=["F0", "Z0"]))
    sn = np.asarray(epg.simulate(seqn, probe=["F0", "Z0"]))
    assert np.abs(s1 - sn).max() < 1e-12


def test_hyperecho_3d():
    """Hyperecho refocusing with 3-D shifts (ref test_shift.py:249)."""
    ks = [np.array([[1, 0, 0]]), np.array([[0, 1, 0]]),
          np.array([[1, 1, -1]]), np.array([[0, -1, 1]])]
    alphas = [20, 40, 60, 80]
    seq = [epg.T(90, 90)]
    for k, a in zip(ks, alphas):
        seq += [epg.S(k), epg.T(a, 0)]
    seq += [epg.S(np.array([[1, 1, 1]])), epg.T(180, 0),
            epg.S(np.array([[1, 1, 1]]))]
    for k, a in zip(reversed(ks), reversed(alphas)):
        seq += [epg.T(-a, 0), epg.S(k)]
    seq += [epg.ADC]
    sig = np.asarray(epg.simulate(seq))
    assert np.allclose(np.abs(sig), 1.0, atol=1e-8)


def test_shift3d_diffusion_golden():
    g = load_golden("shift3d_diffusion")
    Dtensor = np.diag([2e-3, 1e-3, 0.5e-3])
    k1 = np.array([[1, 0, 0]])
    k2 = np.array([[0, 1, 1]])
    tau = 5.0
    seq = [
        epg.T(90, 90),
        epg.S(k1), epg.D(tau, Dtensor, k=k1),
        epg.T(150, 0),
        epg.S(k2), epg.D(tau, Dtensor, k=k2),
        epg.T(60, 30),
        epg.S(-k2), epg.D(tau, Dtensor, k=-k2),
        epg.S(-k1), epg.D(tau, Dtensor, k=-k1),
        epg.ADC,
    ]
    sig = np.asarray(epg.simulate(seq, probe=["F0", "Z0"]))
    assert np.abs(sig - g["signal"]).max() < 1e-10


def test_diffusion_se_golden():
    """Stejskal-Tanner diffusion attenuation in spin echo vs reference +
    closed form b-value algebra (ref test_diffusion.py:107-199)."""
    g = load_golden("diffusion_se")
    Dc = 1e-3
    kvalue = 500.0
    for i, tau in enumerate((5.0, 10.0, 20.0)):
        seq = [
            epg.T(90, 90),
            epg.S(1, duration=tau), epg.D(tau, Dc, k=1),
            epg.T(180, 0),
            epg.S(1, duration=tau), epg.D(tau, Dc, k=1),
            epg.ADC,
        ]
        sig = np.asarray(epg.simulate(seq, kvalue=kvalue))
        assert np.abs(sig - g["signal"][i]).max() < 1e-10
        # closed form: echo attenuation exp(-b D), b = 2/3 k^2 tau (x2 lobes)
        b = 2.0 * (kvalue * 1e-3) ** 2 * (tau * 1e-3) / 3.0
        assert np.allclose(np.abs(sig), np.exp(-b * Dc), atol=1e-8)


def test_shift_merge_golden():
    g = load_golden("shift_merge")
    seq = [
        epg.T(90, 90),
        epg.S(np.array([[1.3]]), kgrid=0.5), epg.T(120, 0),
        epg.S(np.array([[0.9]]), kgrid=0.5), epg.T(45, 90),
        epg.S(np.array([[-1.3]]), kgrid=0.5), epg.T(30, 0),
        epg.ADC,
    ]
    sig = np.asarray(epg.simulate(seq, max_nstate=30, probe=["F0", "Z0"]))
    assert np.abs(sig - g["signal"]).max() < 1e-8


def _fail_if_called(*a, **k):
    raise AssertionError("dense engine ran while forced off")


def test_dense_engine_matches_table_engine(monkeypatch):
    """The dense-grid rows-are-cells merge (ops/shiftdense.py) must
    reproduce the coordinate-table engines exactly when eligible (1-D
    shared float shifts, capacity covering the full range)."""
    from epgpy_tpu import engine
    rng = np.random.default_rng(11)
    for trial in range(4):
        n = int(rng.integers(4, 8))
        seq = [epg.T(90, 90)]
        for i in range(n):
            seq += [epg.S(float(rng.uniform(0.5, 5.0))),
                    epg.T(float(rng.uniform(20, 70)), float(30 * i)),
                    epg.E(5.0, 1000.0, np.linspace(50.0, 120.0, 3)),
                    epg.ADC]
        flat = engine.flatten_sequence(seq)
        assert engine._dense_bound(flat, 0.5, 4096, 1.0) is not None
        a = np.asarray(epg.simulate(seq, kgrid=0.5, max_nstate=4096))
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(engine, "_dense_bound", lambda *a_, **k: None)
            # the preamble cache memoizes the dense decision by op
            # identity: clear it so the monkeypatch takes effect
            engine.clear_caches()
            from epgpy_tpu.ops import shiftdense
            mp.setattr(shiftdense, "shiftmerge_dense_lanes",
                       _fail_if_called)
            mp.setattr(shiftdense, "shiftmerge_dense", _fail_if_called)
            b = np.asarray(epg.simulate(seq, kgrid=0.5, max_nstate=4096))
        engine.clear_caches()
        assert np.abs(a - b).max() < 1e-12


def test_dense_engine_gating():
    """Ineligible configurations must stay on the table engines: small
    caps (trim possible), batch-varying shifts, n-D shifts, traced
    values."""
    from epgpy_tpu import engine
    F = engine.flatten_sequence
    base = [epg.T(90, 90), epg.S(3.7), epg.E(5, 1000, 80), epg.ADC]
    assert engine._dense_bound(F(base), 0.5, 4096, 1.0) is not None
    # cap below the range bound -> trim possible -> ineligible
    assert engine._dense_bound(F(base), 0.5, 4, 1.0) is None
    # no kgrid
    assert engine._dense_bound(F(base), None, 4096, 1.0) is None
    # batch-varying shift (shift-prune)
    bv = [epg.T(90, 90), epg.S(np.array([[0.7], [1.3]])), epg.ADC]
    assert engine._dense_bound(F(bv), 0.5, 4096, 1.0) is None
    # n-D shift
    nd = [epg.T(90, 90), epg.S(np.array([[1.2, 0.7]])), epg.ADC]
    assert engine._dense_bound(F(nd), 0.5, 4096, 1.0) is None
    # integer-only tables stay on the table engines
    iv = [epg.T(90, 90), epg.S(np.array([[2]])), epg.ADC]
    assert engine._dense_bound(F(iv), 0.5, 4096, 1.0) is None
    # array kvalue
    assert engine._dense_bound(F(base), 0.5, 4096, np.array([1.0, 2.0])) is None


@pytest.mark.parametrize("case", ["kvalue2", "kvalue03", "mixed", "gtrain"])
def test_dense_engine_kvalue_mixed_gtrain(case):
    """Dense engine parity vs the table engines across kvalue scaling,
    mixed int/float shift trains, and gradient-derived (G) trains."""
    from epgpy_tpu import engine
    rng = np.random.default_rng(3)
    opts = {"max_nstate": 4096}
    if case in ("kvalue2", "kvalue03"):
        seq = [epg.T(90, 90)]
        for i in range(6):
            seq += [epg.S(float(rng.uniform(1, 4))), epg.T(50, 20 * i),
                    epg.E(6.0, 900.0, 75.0), epg.ADC]
        opts["kgrid"] = 0.5 if case == "kvalue2" else 0.25
        opts["kvalue"] = 2.0 if case == "kvalue2" else 0.3
    elif case == "mixed":
        seq = [epg.T(90, 90)]
        for i in range(6):
            k = int(rng.integers(1, 4)) if i % 2 else float(rng.uniform(0.5, 3))
            seq += [epg.S(k), epg.T(45, 10 * i), epg.E(5.0, 1000.0, 80.0),
                    epg.ADC]
        opts["kgrid"] = 0.5
    else:
        seq = [epg.T(90, 90)]
        for i in range(5):
            seq += [epg.G(1.0 + 0.2 * i, 5.0), epg.T(40, 0),
                    epg.E(5.0, 1000.0, 80.0), epg.ADC]
        opts["kgrid"] = 50.0
    kv = opts.get("kvalue", 1.0)
    assert engine._dense_bound(engine.flatten_sequence(seq), opts["kgrid"],
                               opts["max_nstate"], kv) is not None
    a = np.asarray(epg.simulate(seq, **opts))
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(engine, "_dense_bound", lambda *a_, **k: None)
        engine.clear_caches()
        b = np.asarray(epg.simulate(seq, **opts))
    engine.clear_caches()
    assert np.abs(a - b).max() < 1e-12


@pytest.mark.parametrize("kernel", ["rolls", "gather"])
def test_dense_varying_matches_vmapped_sort(kernel, monkeypatch):
    """Batch-varying dense merge (both kernels: windowed masked rolls
    and per-atom base gathers) reproduces the vmapped sort engine (the
    reference's shift-prune) exactly when the capacity covers the full
    per-atom range."""
    from epgpy_tpu import engine
    from epgpy_tpu.ops import shiftdense
    monkeypatch.setattr(shiftdense, "_VARYING_ROLL_MAX_WINDOW",
                        99 if kernel == "rolls" else 0)
    rng = np.random.default_rng(21)
    ks = rng.uniform(0.5, 3.0, size=(4, 1))
    seq = [epg.T(90, 90)]
    for i in range(5):
        seq += [epg.S(ks * (1 + 0.1 * i)), epg.T(50, 20 * i),
                epg.E(6.0, 900.0, 75.0), epg.ADC]
    flat = engine.flatten_sequence(seq)
    assert engine._dense_varying_bound(flat, 0.25, 4096, 1.0) is not None
    engine.clear_caches()
    a = np.asarray(epg.simulate(seq, kgrid=0.25, max_nstate=4096))
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(engine, "_dense_varying_bound", lambda *a_, **k: None)
        engine.clear_caches()
        mp.setattr(shiftdense, "shiftmerge_dense_varying_lanes",
                   _fail_if_called)
        b = np.asarray(epg.simulate(seq, kgrid=0.25, max_nstate=4096))
    engine.clear_caches()
    assert np.abs(a - b).max() < 1e-12
    # trim-needing capacity falls back to the sort engine
    assert engine._dense_varying_bound(flat, 0.25, 8, 1.0) is None


def test_dense_varying_multidim_batch():
    """Batch-varying dense merge with a 2-D batch (per-atom shift block
    x appended T2 sweep) matches the vmapped sort engine."""
    from epgpy_tpu import engine
    rng = np.random.default_rng(5)
    ks = rng.uniform(0.5, 2.5, size=(3, 1, 1))   # op.shape (3, 1)
    T2s = np.linspace(50.0, 110.0, 4)[None, :]   # (1, 4)
    seq = [epg.T(90, 90)]
    for i in range(4):
        seq += [epg.S(ks * (1 + 0.1 * i)), epg.T(50, 15 * i),
                epg.E(6.0, 900.0, T2s), epg.ADC]
    flat = engine.flatten_sequence(seq)
    assert engine._dense_varying_bound(flat, 0.25, 4096, 1.0) is not None
    engine.clear_caches()
    a = np.asarray(epg.simulate(seq, kgrid=0.25, max_nstate=4096))
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(engine, "_dense_varying_bound", lambda *a_, **k: None)
        engine.clear_caches()
        b = np.asarray(epg.simulate(seq, kgrid=0.25, max_nstate=4096))
    engine.clear_caches()
    assert a.shape == (4, 3, 4)
    assert np.abs(a - b).max() < 1e-12


def test_dense_engine_disabled_for_asymmetric_ops(monkeypatch):
    """A symmetry-breaking check=False op in a float-shift train must
    fall back to the table engines (the dense roll windows assume exact
    ladder symmetry)."""
    from epgpy_tpu.ops import shiftdense
    calls = {"dense": 0}
    orig = shiftdense.shiftmerge_dense_lanes
    orig2 = shiftdense.shiftmerge_dense
    monkeypatch.setattr(
        shiftdense, "shiftmerge_dense_lanes",
        lambda *a, **k: calls.__setitem__("dense", calls["dense"] + 1)
        or orig(*a, **k))
    monkeypatch.setattr(
        shiftdense, "shiftmerge_dense",
        lambda *a, **k: calls.__setitem__("dense", calls["dense"] + 1)
        or orig2(*a, **k))

    asym = epg.ScalarOp(np.array([0.5, 0.25, 1.0]), check=False)
    seq = [epg.T(60, 30), epg.S(2.3), asym, epg.E(5.0, 1000, 80),
           epg.S(1.7), epg.ADC]
    sig_asym = np.asarray(epg.simulate(seq, kgrid=0.5, max_nstate=512))
    assert calls["dense"] == 0, "dense engine ran on asymmetric train"
    assert np.all(np.isfinite(sig_asym))

    # the same train without the asymmetric op DOES use dense
    seq2 = [epg.T(60, 30), epg.S(2.3), epg.E(5.0, 1000, 80),
            epg.S(1.7), epg.ADC]
    epg.simulate(seq2, kgrid=0.5, max_nstate=512)
    assert calls["dense"] > 0


def test_dense_engine_diffusion_coords(monkeypatch):
    """Weighted-mean wavenumbers feed diffusion b-factors identically
    through the dense engine (coords consumers see the same means)."""
    from epgpy_tpu import engine
    seq = [epg.T(90, 90)]
    rng = np.random.default_rng(5)
    for i in range(5):
        seq += [epg.S(float(rng.uniform(1, 6))), epg.D(5.0, 2e-3),
                epg.T(40, 0), epg.E(5.0, 1000.0, 80.0), epg.ADC]
    a = np.asarray(epg.simulate(seq, kgrid=0.5, max_nstate=2048))
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(engine, "_dense_bound", lambda *a_, **k: None)
        engine.clear_caches()  # preamble cache would defeat the patch
        from epgpy_tpu.ops import shiftdense
        mp.setattr(shiftdense, "shiftmerge_dense_lanes", _fail_if_called)
        mp.setattr(shiftdense, "shiftmerge_dense", _fail_if_called)
        b = np.asarray(epg.simulate(seq, kgrid=0.5, max_nstate=2048))
    engine.clear_caches()
    assert np.abs(a - b).max() < 1e-12


def test_press_golden():
    """PRESS voxel localization (Gao 2021 part 3.3): 3-D crushers + static
    gradient + DFT imaging at 4 ADCs matches the reference bit-near-exactly
    (examples/press_mrs.py; reference examples/gradient/point_resolved_mrs.py)."""
    import runpy
    g = load_golden("press")
    ns = runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "press_mrs.py"))
    kc = 2 * np.pi * 50.0
    images = ns["press_images"]([[kc] * 3] * 4)
    assert np.abs(images - g["images"]).max() < 1e-10


def test_gre2d_golden():
    """2-D spatially-resolved gradient-echo imaging (reference
    isochromats_vs_epg_2d_vec.py structure): per-line phase encodes,
    batched readout axis, T2' modulation through the accumulated-time
    coordinate, Imaging probe with System weights -- k-space matches the
    reference at prune=1e-4 (residual: the reference zeroes sub-tolerance
    states per batch element, we keep them)."""
    import runpy
    g = load_golden("gre2d")
    ns = runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "gradient_echo_2d.py"))
    n, fov = 16, 200e-3
    pds, pixels, mask, (T1, T2, T2p) = ns["phantom_setup"](n, fov)
    ks = ns["epg_kspace"](pds, pixels, fov, 30.0, 10.0, T1, T2, T2p, n,
                          prune=1e-4, max_nstate=256)
    scale = np.abs(g["kspace"]).max()
    assert np.abs(ks - g["kspace"]).max() < 1e-4 * scale


def test_merge_matches_int_on_integer_floats():
    """shift-merge on integer-valued floats == shift-nd (ref test_shift.py:75)."""
    seqf = [epg.T(90, 90), epg.S(np.array([[1.0]]), kgrid=1.0),
            epg.T(120, 0), epg.S(np.array([[1.0]]), kgrid=1.0), epg.ADC]
    seqi = [epg.T(90, 90), epg.S(1), epg.T(120, 0), epg.S(1), epg.ADC]
    sf = np.asarray(epg.simulate(seqf, max_nstate=10, probe=["F0", "Z0"]))
    si = np.asarray(epg.simulate(seqi, probe=["F0", "Z0"]))
    assert np.abs(sf - si).max() < 1e-10


def test_ladder_symmetry_after_nd_shift():
    sm = epg.StateMatrix(nstate=4)
    sm = epg.T(70, 25)(sm)
    sm = epg.S(np.array([[1, -1]]))(sm)
    sm = epg.T(50, 10)(sm)
    sm = epg.S(np.array([[0, 1]]))(sm)
    assert sm.check()


# -- exchange --


def test_exchange_identity():
    """expm(x tau) expm(-x tau) == identity behavior: zero exchange = E."""
    T1, T2 = [1000.0, 500.0], [80.0, 40.0]
    sm = epg.StateMatrix(shape=(2,))
    sm = epg.T(90, 90)(sm)
    out_x = epg.X(10.0, 0.0, axis=-1, T1=T1, T2=T2)(sm)
    out_e = epg.E(10.0, T1, T2)(sm)
    assert np.abs(np.asarray(out_x.states) - np.asarray(out_e.states)).max() < 1e-9


def test_exchange_fast_limit():
    """Infinitely fast exchange -> mean relaxation (ref test_exchange.py:52)."""
    T1, T2 = [1000.0, 500.0], [80.0, 40.0]
    tau = 10.0
    sm = epg.StateMatrix(shape=(2,), density=[0.5, 0.5])
    sm = epg.T(90, 90)(sm)
    fast = epg.X(tau, 100.0, axis=-1, T1=T1, T2=T2)(sm)
    # transverse decays toward the mean rate; both compartments equalize
    # (khi=100/ms is fast but finite: residual split ~1e-5)
    F = np.asarray(fast.F0)
    assert np.allclose(F[0], F[1], atol=1e-4)
    mean_rate = 0.5 * (1 / 80.0 + 1 / 40.0)
    assert np.allclose(np.abs(F[0]), 0.5 * np.exp(-tau * mean_rate), rtol=1e-2)


def test_exchange_nonconserving_raises():
    khi = np.array([[0.01, 0.0], [-0.01, 0.0]])  # columns don't sum to 0
    with pytest.raises(ValueError):
        epg.X(10.0, khi.T * 0 + np.array([[1.0, 2.0], [3.0, 4.0]]))


def test_exchange_atom_batch_after_compartments():
    """X with an atom sweep appended after the compartment axis: the op
    shape must keep the atom axis (r3 fix: the old shape property
    dropped it, breaking the scan carry), and the GRE train must match
    the per-atom loop."""
    B = 3
    T2f = np.linspace(40.0, 120.0, B)
    T2 = np.stack([T2f, np.full(B, 0.012)], axis=0)      # (2, B)
    khi = epg.exchange_matrix(0.005, densities=[0.8, 0.2])
    Xb = epg.X(10.0, khi, axis=0, T1=np.asarray([1000.0, 1000.0]), T2=T2)
    assert Xb.shape == (2, B)

    def train(xop):
        seq = []
        for _ in range(12):
            seq += [epg.T(np.asarray([10.0, 0.0]), 0), epg.ADC, xop,
                    epg.S(1)]
        return np.asarray(epg.simulate(seq, max_nstate=5,
                                       density=[0.8, 0.2]))

    batched = train(Xb)
    for b in range(B):
        Xi = epg.X(10.0, khi, axis=0, T1=np.asarray([1000.0, 1000.0]),
                   T2=T2[:, b])
        single = train(Xi)
        assert np.abs(batched[:, :, b] - single).max() < 1e-10


def test_exchange_gre_golden():
    g = load_golden("exchange_gre")
    T1 = [1000.0, 500.0]
    T2 = [80.0, 20.0]
    gshift = [0.0, 0.02]
    TR, alpha, n = 10.0, 15.0, 40
    Xop = epg.X(TR, 0.01, axis=-1, T1=T1, T2=T2, g=gshift)
    seq = []
    for i in range(n):
        seq += [epg.T(alpha, 0), epg.ADC, Xop, epg.S(1)]
    sig = np.asarray(epg.simulate(
        seq, max_nstate=12,
        init=np.array([0, 0, 0.5]) * np.ones((2, 1, 1)),
        density=[0.5, 0.5]))
    assert np.abs(sig - g["signal"]).max() < 1e-9


# -- C operator (accumulated-time dephasing, kdim=4) --


def test_t2star_golden():
    g = load_golden("t2star")
    seq = [epg.T(90, 90)]
    for _ in range(6):
        seq += [epg.C(2.0, 0.3), epg.ADC]
    fid = np.asarray(epg.simulate(seq, max_nstate=20, kgrid=0.1))
    assert np.abs(fid - g["fid"]).max() < 1e-8
    # FID decays like exp(-t) of the accumulated time
    expected = np.exp(-0.3 * 2.0 * np.arange(1, 7))
    assert np.allclose(np.abs(fid[:, 0]), expected, atol=1e-8)

    seq3 = [epg.T(90, 90), epg.C(2.0, 0.3), epg.T(150, 0), epg.C(2.0, 0.3),
            epg.ADC]
    echo = np.asarray(epg.simulate(seq3, max_nstate=20, kgrid=0.1))
    assert np.abs(echo - g["echo"]).max() < 1e-8


def test_shift_prune_batch_varying():
    """Batch-varying float shifts (the reference's shift-prune method):
    each batch element evolves with its own wavenumber increment and must
    match an independent single-element simulation."""
    ks = np.array([[0.7], [1.3], [2.1]])  # (3, 1): 3 batch elements
    seq = [epg.T(90, 90),
           epg.S(ks, kgrid=0.25), epg.T(120, 0),
           epg.S(ks, kgrid=0.25), epg.T(60, 45),
           epg.S(-ks, kgrid=0.25), epg.ADC]
    sig = np.asarray(epg.simulate(seq, max_nstate=20, probe=["F0", "Z0"]))
    for i in range(3):
        ki = np.array([[ks[i, 0]]])
        seqi = [epg.T(90, 90),
                epg.S(ki, kgrid=0.25), epg.T(120, 0),
                epg.S(ki, kgrid=0.25), epg.T(60, 45),
                epg.S(-ki, kgrid=0.25), epg.ADC]
        sigi = np.asarray(epg.simulate(seqi, max_nstate=20, probe=["F0", "Z0"]))
        assert np.abs(sig[:, :, i] - sigi[:, :, 0]).max() < 1e-10


def test_shift_prune_golden():
    g = load_golden("shift_prune")
    ks = g["ks"]
    seq = [epg.T(90, 90),
           epg.S(ks, kgrid=0.25), epg.T(120, 0),
           epg.S(ks, kgrid=0.25), epg.T(60, 45),
           epg.S(-ks, kgrid=0.25), epg.ADC]
    sig = np.asarray(epg.simulate(seq, max_nstate=20, probe=["F0", "Z0"]))
    assert np.abs(sig - g["signal"]).max() < 1e-8


def test_exchange_tau_sweep():
    """Mixing-time sweep through X (relaxation-exchange / ILT workflow):
    analytically, Z-magnetization exchanges toward equilibrium."""
    taus = np.asarray([5.0, 20.0, 80.0])
    X = epg.X(taus[None, :], 0.02, axis=-1, T1=[1500.0, 300.0],
              T2=[80.0, 20.0])
    sm = epg.StateMatrix(shape=(2, 1), density=[[0.5], [0.5]])
    out = np.asarray(epg.simulate([epg.T(90, 90), X, epg.ADC], init=sm))
    assert out.shape == (1, 2, 3)
    # transverse decays monotonically with mixing time in both pools
    mags = np.abs(out[0])
    assert np.all(np.diff(mags, axis=-1) < 0)


@pytest.mark.slow
def test_exchange_scanned_lanes_precomputed():
    """A long EPG-X GRE train scan-compiles with the expm matrix
    precomputed at plan time (no per-step Pade expm, no compat-layout
    restack) and matches the eager per-op path exactly."""
    from epgpy_tpu.engine import _plan_and_payload, _Const
    from epgpy_tpu.ops.exchange import PrecomputedExchange

    T1 = [1000.0, 500.0]
    T2 = [80.0, 20.0]
    TR, alpha, n = 10.0, 15.0, 500
    Xop = epg.X(TR, 0.005, axis=-1, T1=T1, T2=T2, g=[0.0, 0.02])
    seq = []
    for i in range(n):
        seq += [epg.T(alpha, 0), epg.ADC, Xop, epg.S(1)]

    kinds, payload = _plan_and_payload(seq, cache=False)
    assert kinds[0][0] == "scan"
    _, slots = payload[0]
    xslots = [s for s in slots
              if isinstance(s, _Const) and isinstance(s.op, PrecomputedExchange)]
    assert xslots, "scan-constant X was not precomputed"

    init = np.array([0, 0, 0.5]) * np.ones((2, 1, 1))
    kw = dict(max_nstate=12, init=init, density=[0.5, 0.5])
    sig_scan = np.asarray(epg.simulate(seq, **kw))          # scan + lanes
    sig_eager = np.asarray(epg.simulate(seq, jit=False, scan=False, **kw))
    assert sig_scan.shape[0] == n
    assert np.abs(sig_scan - sig_eager).max() < 1e-11


def test_exchange_lanes_apply_matches_compat():
    """X.apply on a lanes-layout state == compat layout (all components)."""
    T1, T2 = [1000.0, 500.0], [80.0, 40.0]
    sm = epg.StateMatrix(shape=(2, 3), nstate=4, density=[[0.5], [0.5]])
    sm = epg.T(40, 30)(sm)
    sm = epg.S(1)(sm)
    sm = epg.T(70, 110)(sm)
    Xop = epg.X(12.0, 0.02, axis=0, T1=T1, T2=T2, g=[0.0, 0.05])

    out_compat = Xop(sm)
    out_lanes = Xop(sm.to_lanes()).from_lanes()
    assert np.abs(np.asarray(out_compat.states)
                  - np.asarray(out_lanes.states)).max() < 1e-12


def test_exchange_density_weighted_equilibria():
    """Recovery targets the per-compartment density; density-weighted
    exchange matrices leave a proportional state fixed
    (reference test_exchange.py:66-78)."""
    # fast recovery, no exchange: each compartment recovers to its density
    sm0 = epg.StateMatrix([[[1, 1, 0]], [[3, 3, 0]]], density=[1.0, 3.0])
    out = epg.X(10.0, 0.0, axis=0, T1=1e-10, T2=1e-10)(sm0)
    assert np.allclose(np.asarray(out.states),
                       [[[0, 0, 1]], [[0, 0, 3]]], atol=1e-8)
    # fast density-weighted exchange, no relaxation: the proportional
    # state is the fixed point
    khi = np.array([[3e2, -1e2], [-3e2, 1e2]])
    out = epg.X(10.0, khi, axis=0)(sm0)
    assert np.allclose(np.asarray(out.states), np.asarray(sm0.states),
                       atol=1e-8)


def test_exchange_pure_t1_recovery():
    """X with khi=0 reduces to independent per-compartment T1 recovery."""
    sm0 = epg.StateMatrix([0, 0, 0], shape=(2,), density=[1.0, 1.0])
    out = epg.X(10.0, 0.0, axis=0, T1=[1e10, 1e-10])(sm0)
    states = np.asarray(out.states)
    assert np.allclose(states[0], 0, atol=1e-9)         # no recovery
    assert np.allclose(states[1], [0, 0, 1], atol=1e-9)  # full recovery


def test_exchange_mixing_t1():
    """Fast exchange averages the longitudinal rates."""
    sm0 = epg.StateMatrix([0, 0, 0], shape=(2,), density=[0.5, 0.5])
    tau, T1 = 10.0, np.array([20.0, 70.0])
    out = epg.X(tau, 1e3, axis=0, T1=T1)(sm0)
    mean_relax = 1 - np.exp(-np.mean(tau / T1))
    # equilibrium density is 0.5 per compartment
    assert np.allclose(np.asarray(out.states)[..., 2], 0.5 * mean_relax,
                       atol=1e-4)


def test_exchange_matrix_builder_ndim():
    """exchange_matrix broadcasts rate arrays to (ncomp, ..., ncomp)."""
    khi = epg.exchange_matrix([1.0, 1.0])
    op = epg.X(1.0, khi)
    assert op.shape == (2, 2)
    assert np.allclose(np.asarray(khi).sum(axis=-2), 0)  # columns conserve


def test_expm2_matches_pade():
    """Closed-form 2x2 expm == Pade on well-conditioned random matrices,
    and stays finite in the huge-rate regime where Pade NaNs."""
    from jax.scipy.linalg import expm as pade
    import jax.numpy as jnp
    from epgpy_tpu.ops.exchange import _expm2

    rng = np.random.default_rng(0)
    m = rng.normal(size=(20, 2, 2)) + 1j * rng.normal(size=(20, 2, 2))
    ours = np.asarray(_expm2(jnp.asarray(m)))
    ref = np.asarray(pade(jnp.asarray(m)))
    assert np.abs(ours - ref).max() < 1e-10
    # degenerate (equal eigenvalues) branch
    m_deg = np.array([[(-2.0 + 0j), 1.0], [0.0, -2.0]])
    ours = np.asarray(_expm2(jnp.asarray(m_deg)))
    assert np.allclose(ours, np.exp(-2.0) * np.array([[1, 1], [0, 1]]))
    # extreme rates underflow cleanly
    m_big = np.array([[-1e12 + 0j, 0.0], [0.0, -1e-3]])
    ours = np.asarray(_expm2(jnp.asarray(m_big)))
    assert np.isfinite(ours).all()
    assert np.allclose(np.diag(ours), [0.0, np.exp(-1e-3)])


def test_encode_keys_no_host_callbacks_off_cpu(monkeypatch):
    """The int32 key-capacity runtime warning must lower to a host
    callback ONLY on CPU: the tunneled TPU backend rejects any program
    containing callback custom-calls at execution (UNIMPLEMENTED) even
    when the warning predicate is false -- this crashed every kdim>1
    f32 table merge on TPU (caught by bench diff3d).  The TPU-side
    guard is host-side at plan time instead (engine._capacity)."""
    import jax
    from epgpy_tpu.ops import shiftnd

    monkeypatch.setattr(shiftnd.config, "x64_enabled", lambda: False)
    q = np.array([[0, 0], [1, 2], [-3, 4]], np.int32)

    # NB fresh lambda per trace: make_jaxpr memoizes on function
    # identity, so re-tracing the same function after the monkeypatch
    # would return the stale jaxpr
    monkeypatch.setattr(shiftnd, "_callbacks_ok", lambda: False)
    jx = jax.make_jaxpr(lambda x: shiftnd._encode_keys(x))(q)
    assert "debug_print" not in str(jx)

    monkeypatch.setattr(shiftnd, "_callbacks_ok", lambda: True)
    jx = jax.make_jaxpr(lambda x: shiftnd._encode_keys(x))(q)
    assert "debug_print" in str(jx)
    monkeypatch.undo()

    # the gate itself: the conftest steers jax_default_device to CPU,
    # where callbacks are safe -- default_backend() alone says "tpu"
    # here (plugin registration priority) and would wrongly disable it
    assert shiftnd._callbacks_ok() is True


def test_capacity_warns_on_int32_key_overflow(monkeypatch, caplog):
    """Host-side plan-time guard: a kdim>1 f32 sequence whose lattice
    bound exceeds the int32 key space warns at capacity analysis."""
    import logging
    from epgpy_tpu import config as cfg
    from epgpy_tpu import engine as eng

    monkeypatch.setattr(cfg, "x64_enabled", lambda: False)
    seq = [epg.S(np.array([60000.5, 60000.5])), epg.ADC]
    with caplog.at_level(logging.WARNING, logger="epgpy_tpu.engine"):
        eng._capacity(seq, 1, 64, kgrid=1e-3)
    assert any("int32 merge key space" in r.message for r in caplog.records)
