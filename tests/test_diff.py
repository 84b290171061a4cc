"""Differentiation tests: finite-difference validation of Jacobians and
Hessians (the reference's dominant test pattern, test/test_diff.py)."""

import numpy as np
import pytest

import epgpy_tpu as epg


def mse_seq(T2, order1=(), order2=(), necho=3):
    """Small MSE train with tracked refocusing alpha and T2."""
    seq = [epg.T(90, 90, name="exc")]
    for _ in range(necho):
        seq += [
            epg.E(5.0, 1000.0, T2, order1=[v for v in order1 if v in ("tau", "T2")]
                  or False,
                  order2=[p for p in order2 if set(p) <= {"tau", "T2"}] or False),
            epg.S(1),
            epg.T(150.0, 0.0, order1=[v for v in order1 if v == "alpha"] or False,
                  order2=[p for p in order2 if set(p) <= {"alpha", "phi"}] or False),
            epg.E(5.0, 1000.0, T2, order1=[v for v in order1 if v in ("tau", "T2")]
                  or False,
                  order2=[p for p in order2 if set(p) <= {"tau", "T2"}] or False),
            epg.S(1), epg.ADC,
        ]
    return seq


def simulate_signal(alpha, T2, necho=3):
    seq = [epg.T(90, 90)]
    for _ in range(necho):
        seq += [epg.E(5.0, 1000.0, T2), epg.S(1), epg.T(alpha, 0.0),
                epg.E(5.0, 1000.0, T2), epg.S(1), epg.ADC]
    return np.asarray(epg.simulate(seq))


def test_jacobian_alpha_fd():
    """d(signal)/d(alpha) vs central finite differences."""
    T2 = 35.0
    seq = mse_seq(T2, order1=("alpha",))
    sig, jac = epg.simulate(seq, probe=[epg.ADC, epg.Jacobian(["alpha"])])
    eps = 1e-5
    fd = (simulate_signal(150 + eps, T2) - simulate_signal(150 - eps, T2)) / (2 * eps)
    assert jac.shape == sig.shape + (1,)
    assert np.abs(jac[..., 0] - fd).max() < 1e-7


def test_jacobian_T2_fd():
    T2 = 35.0
    seq = mse_seq(T2, order1=("T2",))
    sig, jac = epg.simulate(seq, probe=[epg.ADC, epg.Jacobian(["T2"])])
    eps = 1e-4
    fd = (simulate_signal(150.0, T2 + eps) - simulate_signal(150.0, T2 - eps)) / (2 * eps)
    assert np.abs(jac[..., 0] - fd).max() < 1e-7


def test_jacobian_magnitude_column():
    T2 = 35.0
    seq = mse_seq(T2, order1=("T2",))
    sig, jac = epg.simulate(
        seq, probe=[epg.ADC, epg.Jacobian(["magnitude", "T2"])])
    assert jac.shape[-1] == 2
    assert np.allclose(jac[..., 0], sig)


def test_hessian_fd():
    """d2(signal)/d(alpha)d(T2) vs finite differences of the Jacobian."""
    T2 = 35.0
    seq = mse_seq(T2, order1=("alpha", "T2"), order2=(("alpha", "T2"),
                                                     ("alpha", "alpha")))
    sig, hess = epg.simulate(
        seq, probe=[epg.ADC, epg.Hessian(["alpha"], ["alpha", "T2"])])
    assert hess.shape == sig.shape + (1, 2)

    # FD of d/dalpha w.r.t. T2
    eps = 1e-4

    def jac_alpha(T2v):
        seqv = mse_seq(T2v, order1=("alpha",))
        _, j = epg.simulate(seqv, probe=[epg.ADC, epg.Jacobian(["alpha"])])
        return j[..., 0]

    fd_cross = (jac_alpha(T2 + eps) - jac_alpha(T2 - eps)) / (2 * eps)
    assert np.abs(hess[..., 0, 1] - fd_cross).max() < 1e-6

    # FD of d/dalpha w.r.t. alpha
    def jac_alpha2(da):
        seqv = [epg.T(90, 90)]
        for _ in range(3):
            seqv += [epg.E(5.0, 1000.0, T2), epg.S(1),
                     epg.T(150.0 + da, 0.0, order1=["alpha"]),
                     epg.E(5.0, 1000.0, T2), epg.S(1), epg.ADC]
        _, j = epg.simulate(seqv, probe=[epg.ADC, epg.Jacobian(["alpha"])])
        return j[..., 0]

    fd_aa = (jac_alpha2(eps) - jac_alpha2(-eps)) / (2 * eps)
    assert np.abs(hess[..., 0, 0] - fd_aa).max() < 1e-6


def test_alias_variables():
    """Per-pulse aliases: distinct variables for each pulse's alpha."""
    T2 = 40.0
    seq = [epg.T(90, 90)]
    for i in range(3):
        seq += [epg.E(5.0, 1000.0, T2), epg.S(1),
                epg.T(150.0, 0.0, order1={f"alpha_{i:03d}": "alpha"}),
                epg.E(5.0, 1000.0, T2), epg.S(1), epg.ADC]
    names = [f"alpha_{i:03d}" for i in range(3)]
    sig, jac = epg.simulate(seq, probe=[epg.ADC, epg.Jacobian(names)])
    assert jac.shape == sig.shape + (3,)
    # causality: echo e cannot depend on later pulses
    for e in range(3):
        for i in range(3):
            dep = np.abs(jac[e, :, i]).max()
            if i > e:
                assert dep < 1e-12
            elif i == e:
                assert dep > 1e-5


def test_coefficient_chain_rule():
    """order1={var: {param: coeff}} scales derivatives (inner chain rule)."""
    T2 = 40.0

    def build(coeff):
        seq = [epg.T(90, 90)]
        for _ in range(2):
            seq += [epg.E(5.0, 1000.0, T2), epg.S(1),
                    epg.T(150.0, 0.0, order1={"x": {"alpha": coeff}}),
                    epg.E(5.0, 1000.0, T2), epg.S(1), epg.ADC]
        return seq

    _, j1 = epg.simulate(build(1.0), probe=[epg.ADC, epg.Jacobian(["x"])])
    _, j3 = epg.simulate(build(3.0), probe=[epg.ADC, epg.Jacobian(["x"])])
    assert np.abs(j3 - 3 * j1).max() < 1e-10


def test_derivative_through_shift_and_diffusion():
    """Derivatives flow through S and D (reference raises there)."""
    seq = [epg.T(90, 90),
           epg.S(1, duration=5.0), epg.D(5.0, 1e-3, k=1),
           epg.T(180.0, 0.0, order1=["alpha"]),
           epg.S(1, duration=5.0), epg.D(5.0, 1e-3, k=1),
           epg.ADC]
    sig, jac = epg.simulate(seq, probe=[epg.ADC, epg.Jacobian(["alpha"])],
                            kvalue=500.0)
    eps = 1e-5

    def s(alpha):
        seqv = [epg.T(90, 90), epg.S(1, duration=5.0), epg.D(5.0, 1e-3, k=1),
                epg.T(alpha, 0.0), epg.S(1, duration=5.0), epg.D(5.0, 1e-3, k=1),
                epg.ADC]
        return np.asarray(epg.simulate(seqv, kvalue=500.0))

    fd = (s(180 + eps) - s(180 - eps)) / (2 * eps)
    assert np.abs(jac[..., 0] - fd).max() < 1e-7


def test_crlb_from_jacobian():
    """CRLB cost on an MRF-like Jacobian (stats integration)."""
    T2 = 50.0
    seq = [epg.T(90, 90)]
    for _ in range(5):
        seq += [epg.E(5.0, 1000.0, T2, order1={"T2": "T2", "T1": "T1"}),
                epg.S(1), epg.T(150.0, 0.0),
                epg.E(5.0, 1000.0, T2, order1={"T2": "T2", "T1": "T1"}),
                epg.S(1), epg.ADC]
    jac = epg.simulate(seq, probe=epg.Jacobian(["T1", "T2"]))
    crb = epg.stats.crlb(jac.reshape(-1, 2)[None])
    assert np.isfinite(np.asarray(crb)).all()


def test_mrf_hessian_profile():
    """Scaled-down reference profiling case (differentiation_mrf.py):
    Hessian of (magnitude, T1, T2) x per-pulse alpha aliases."""
    P = 24
    FAs = 15 + 30 * np.abs(np.sin(np.arange(P) * 0.4))
    T1v, T2v = 800.0, 60.0
    names = [f"alpha_{i:03d}" for i in range(P)]
    seq = []
    for i in range(P):
        seq += [
            epg.T(FAs[i], 90, order1={names[i]: "alpha"}),
            epg.E(5.0, T1v, T2v, order1={"T1": "T1", "T2": "T2"}), epg.ADC,
            epg.E(7.0, T1v, T2v, order1={"T1": "T1", "T2": "T2"}),
            epg.S(1),
        ]
    sig, jac, hess = epg.simulate(
        seq, max_nstate=10,
        probe=[epg.ADC,
               epg.Jacobian(["magnitude", "T1", "T2"]),
               epg.Hessian(["magnitude", "T1", "T2"], names)])
    assert jac.shape == sig.shape + (3,)
    assert hess.shape == sig.shape + (3, P)
    # magnitude row of the Hessian = d(signal)/d(alpha_i)
    _, jac_a = epg.simulate(
        seq, max_nstate=10, probe=[epg.ADC, epg.Jacobian(names)])
    assert np.abs(hess[..., 0, :] - jac_a).max() < 1e-10
    # FD check one cross entry: d2 signal / dT2 dalpha_5
    eps = 1e-4

    def jac_alpha5(T2x):
        seqv = []
        for i in range(P):
            seqv += [
                epg.T(FAs[i], 90, order1={names[i]: "alpha"}),
                epg.E(5.0, T1v, T2x), epg.ADC, epg.E(7.0, T1v, T2x), epg.S(1),
            ]
        _, j = epg.simulate(seqv, max_nstate=10,
                            probe=[epg.ADC, epg.Jacobian([names[5]])])
        return j[..., 0]

    fd = (jac_alpha5(T2v + eps) - jac_alpha5(T2v - eps)) / (2 * eps)
    assert np.abs(hess[..., 2, 5] - fd).max() < 1e-6


def test_crlb_gradient_matches_autodiff():
    """stats.crlb's analytic gradient (Hessian contraction) == jax.grad."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    J = jnp.asarray(rng.normal(size=(12, 3)) + 1j * rng.normal(size=(12, 3)))
    H = jnp.asarray(rng.normal(size=(12, 3, 4)) + 1j * rng.normal(size=(12, 3, 4)))

    cost, grad = epg.stats.crlb(J, H)
    # autodiff reference: d cost / d theta_x with dJ/dtheta_x = H[..., x]
    def cost_of(theta):
        Jt = J + jnp.einsum("npx,x->np", H, theta)
        return epg.stats.crlb(Jt)
    g = jax.grad(lambda th: jnp.real(cost_of(th)))(jnp.zeros(4))
    assert np.allclose(np.asarray(grad), np.asarray(g), rtol=1e-6)


def test_crlb_split():
    rng = np.random.default_rng(2)
    J = rng.normal(size=(20, 2)) + 1j * rng.normal(size=(20, 2))
    crb = np.asarray(epg.stats.crlb_split(J, W=[1.0, 2.0]))
    assert crb.shape == (2,)
    total = np.asarray(epg.stats.crlb(J, W=[1.0, 2.0]))
    assert np.isclose(crb.sum(), total)


def test_custom_derivative_arrays():
    """Synthetic chain-rule algebra with user darrs (ref test_diff.py:114-279):
    identity ops with d/dx factors 2 and 3 accumulate to 5 (order1) and
    2*2*3=12 (order2 cross product)."""
    one = np.asarray([1.0, 1.0, 1.0])
    A = epg.ScalarOp(one, darrs={"x": 2.0 * one[None]}, order1={"x": {"x": 1.0}})
    B = epg.ScalarOp(one, darrs={"x": 3.0 * one[None]}, order1={"x": {"x": 1.0}})
    seq = [epg.T(90, 90), A, B, epg.ADC]
    sig, jac, hess = epg.simulate(
        seq, probe=[epg.ADC, epg.Jacobian(["x"]), epg.Hessian(["x"])])
    assert np.allclose(sig, 1.0)
    assert np.allclose(jac[..., 0], 5.0)
    assert np.allclose(hess[..., 0, 0], 12.0)


def test_custom_derivative_matrix():
    """MatrixOp dmats: derivative of a z-rotation w.r.t. its angle."""
    phi = 30.0
    p = np.deg2rad(phi)
    mat = np.diag([np.exp(1j * p), np.exp(-1j * p), 1.0])
    dmat = np.diag([1j * np.exp(1j * p), -1j * np.exp(-1j * p), 0.0]) * np.pi / 180
    op = epg.MatrixOp(mat[None], dmats={"phi": dmat[None]}, order1=["phi"])
    seq = [epg.T(90, 90), op, epg.ADC]
    sig, jac = epg.simulate(seq, probe=[epg.ADC, epg.Jacobian(["phi"])])
    # compare against the built-in Phi operator's autodiff
    seq2 = [epg.T(90, 90), epg.Phi(phi, order1=["phi"]), epg.ADC]
    sig2, jac2 = epg.simulate(seq2, probe=[epg.ADC, epg.Jacobian(["phi"])])
    assert np.abs(sig - sig2).max() < 1e-12
    assert np.abs(jac - jac2).max() < 1e-10


def test_jacobian_chunked_matches_unchunked():
    """jacobian_chunk=N yields bitwise-identical Jacobians (incl. padding:
    5 variables in chunks of 2 -> one padded dummy column cropped)."""
    T2 = 40.0
    P = 5
    names = [f"a_{i}" for i in range(P)]
    seq = [epg.T(90, 90)]
    for i in range(P):
        seq += [epg.E(5.0, 1000.0, T2), epg.S(1),
                epg.T(140.0 + i, 0.0, order1={names[i]: "alpha"}),
                epg.E(5.0, 1000.0, T2), epg.S(1), epg.ADC]
    probes = [epg.ADC, epg.Jacobian(["magnitude"] + names)]
    sig_u, jac_u = epg.simulate(seq, probe=probes)
    for chunk in (1, 2, 3, P, P + 3):
        sig_c, jac_c = epg.simulate(seq, probe=probes, jacobian_chunk=chunk)
        assert np.abs(sig_c - sig_u).max() < 1e-13
        assert np.abs(jac_c - jac_u).max() < 1e-12, f"chunk={chunk}"


def test_hessian_chunked_matches_unchunked():
    """Hessian blocks assembled from jacobian_chunk tiles == dense result."""
    T2 = 40.0
    P = 4
    names = [f"a_{i}" for i in range(P)]
    seq = [epg.T(90, 90)]
    for i in range(P):
        seq += [epg.E(5.0, 1000.0, T2, order1={"T1": "T1", "T2": "T2"}),
                epg.S(1),
                epg.T(140.0 + i, 0.0, order1={names[i]: "alpha"}),
                epg.E(5.0, 1000.0, T2, order1={"T1": "T1", "T2": "T2"}),
                epg.S(1), epg.ADC]
    probes = [epg.ADC, epg.Hessian(["magnitude", "T1", "T2"], names)]
    sig_u, hess_u = epg.simulate(seq, probe=probes)
    assert hess_u.shape == sig_u.shape + (3, P)
    for chunk in (1, 3):
        sig_c, hess_c = epg.simulate(seq, probe=probes, jacobian_chunk=chunk)
        assert np.abs(hess_c - hess_u).max() < 1e-12, f"chunk={chunk}"


def test_diff_asarray_false_device_outputs():
    """asarray=False keeps Jacobian/Hessian outputs on device as
    {"__c_re","__c_im"} dicts (the regular simulate encoding; complex
    cannot cross the program boundary on TPU) and skips the internal
    device->host copy; decoded values match the asarray=True path
    bitwise.  Covers fused and chunked programs."""
    import jax

    T2 = 40.0
    P = 3
    names = [f"a_{i}" for i in range(P)]
    seq = [epg.T(90, 90)]
    for i in range(P):
        seq += [epg.E(5.0, 1000.0, T2, order1={"T2": "T2"}),
                epg.S(1),
                epg.T(140.0 + i, 0.0, order1={names[i]: "alpha"}),
                epg.E(5.0, 1000.0, T2, order1={"T2": "T2"}),
                epg.S(1), epg.ADC]
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T2"] + names),
              epg.Hessian(["magnitude", "T2"], names)]
    host = epg.simulate(seq, probe=probes)
    for chunk in (None, 2):
        dev = epg.simulate(seq, probe=probes, asarray=False,
                           jacobian_chunk=chunk)
        assert len(dev) == len(host) == 3
        for h, d in zip(host, dev):
            assert isinstance(d, dict) and set(d) == {"__c_re", "__c_im"}
            assert isinstance(d["__c_re"], jax.Array)
            dec = np.asarray(d["__c_re"]) + 1j * np.asarray(d["__c_im"])
            assert dec.shape == h.shape
            assert np.abs(dec - h).max() == 0.0, f"chunk={chunk}"


def test_jacobian_probe_tuple_and_unknown_variable():
    """Tuples spell variable lists like lists; an untracked variable
    raises instead of emitting a silent zero column (which would poison
    CRLB / Gauss-Newton fits downstream)."""
    import epgpy_tpu as epg

    seq = [epg.T(30, 90, order1="alpha"),
           epg.E(5.0, 800.0, 80.0, order1=["T1", "T2"]), epg.ADC] * 3
    jl = np.asarray(epg.simulate(
        [epg.T(30, 90, order1="alpha"),
         epg.E(5.0, 800.0, 80.0, order1=["T1", "T2"]), epg.ADC] * 3,
        probe=epg.Jacobian(["T1", "T2"])))
    jt = np.asarray(epg.simulate(seq, probe=epg.Jacobian(("T1", "T2"))))
    assert jt.shape == jl.shape and np.array_equal(jt, jl)

    with pytest.raises(ValueError, match="not tracked"):
        epg.simulate(
            [epg.T(30, 90, order1="alpha"),
             epg.E(5.0, 800.0, 80.0, order1=["T1", "T2"]), epg.ADC] * 3,
            probe=epg.Jacobian(["T2 "]))   # typo: trailing space


def test_partials_pruner_warns_once(caplog):
    """PartialsPruner is a documented no-op; instantiation must warn
    (once) so reference users are not silently surprised (VERDICT r3)."""
    import logging

    from epgpy_tpu import diff as diff_mod

    diff_mod.PartialsPruner._warned = False
    with caplog.at_level(logging.WARNING, logger="epgpy_tpu.diff"):
        diff_mod.PartialsPruner(condition=1e-4)
        diff_mod.PartialsPruner()
    msgs = [r for r in caplog.records if "no-op" in r.message]
    assert len(msgs) == 1
    assert "jacobian_chunk" in msgs[0].message
