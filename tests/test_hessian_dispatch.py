"""Per-pulse Hessian train -> fused Pallas kernel dispatch.

The flagship differentiation workload (reference examples/profiling/
differentiation_mrf.py:18-67): ``[T(a_i, order1={alias: "alpha"}),
E(tau_i, T1, T2, order1={"T1", "T2", alias: "tau"}), ADC, S(1)] * N``
with Jacobian/Hessian probes over (magnitude, T1, T2) x per-pulse
aliases.  simulate(fisp_kernel="force") routes to the interpret-mode
kernel (models/pallas_hessian); parity is pinned against the general
nested-jacfwd planner path (fisp_kernel=False) in f64.
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch

NTR = 10
RNG = np.random.default_rng(7)
FA = RNG.uniform(10, 60, NTR)
TAU = RNG.uniform(11, 16, NTR)
ALPHAS = [f"alpha_{i:03d}" for i in range(NTR)]
TAUS = [f"tau_{i:03d}" for i in range(NTR)]


def build(T1=1380.0, T2=80.0, *, track_tau=True, phi=90.0):
    seq = []
    for i in range(NTR):
        o1 = {"T1": "T1", "T2": "T2"}
        if track_tau:
            o1[TAUS[i]] = "tau"
        seq += [epg.T(FA[i], phi, order1={ALPHAS[i]: "alpha"}),
                epg.E(TAU[i], T1, T2, order1=o1),
                epg.ADC, epg.S(1)]
    return seq


def both(seq_builder, probes):
    ref = epg.simulate(seq_builder(), probe=probes, max_nstate=10,
                       fisp_kernel=False)
    got = epg.simulate(seq_builder(), probe=probes, max_nstate=10,
                       fisp_kernel="force")
    if not isinstance(ref, tuple):
        ref, got = (ref,), (got,)
    return ref, got


def assert_close(ref, got, tol=5e-6):
    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, (r.shape, g.shape)
        scale = max(np.abs(r).max(), 1e-9)
        assert np.abs(r - g).max() / scale < tol


def test_flagship_probes_parity():
    """Full flagship probe set: ADC + Jacobian(mag,T1,T2) +
    Hessian((mag,T1,T2) x (alphas + taus))."""
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"]),
              epg.Hessian(["magnitude", "T1", "T2"], ALPHAS + TAUS)]
    ref, got = both(build, probes)
    assert np.asarray(ref[2]).shape == (NTR, 1, 3, 2 * NTR)
    assert_close(ref, got)


def test_scrambled_subset_columns():
    """vars2 subsets in arbitrary order; Jacobian over alias vars."""
    probes = [epg.Jacobian([ALPHAS[3], "T2", TAUS[7], "magnitude"]),
              epg.Hessian(["T2", "magnitude"],
                          [TAUS[2], ALPHAS[5], ALPHAS[0]])]
    ref, got = both(build, probes)
    assert_close(ref, got)


def test_atom_vector_t1t2():
    T1v = np.array([800.0, 1380.0, 2000.0])
    probes = [epg.ADC, epg.Hessian(["T1", "T2"], ALPHAS)]
    ref, got = both(lambda: build(T1=T1v), probes)
    assert np.asarray(ref[1]).shape == (NTR, 3, 2, NTR)
    assert_close(ref, got)


def test_no_tau_tracking_first_order():
    """alpha aliases only (no tau tracking): Jacobian dispatch engages
    with the order-1 kernel variant."""
    probes = [epg.Jacobian(["magnitude"] + ALPHAS)]
    ref, got = both(lambda: build(track_tau=False), probes)
    assert_close(ref, got)


def test_fd_spot_check():
    """d2S/dT2 dalpha_5 against a finite difference of the
    alpha_5-Jacobian (the flagship example's own check)."""
    probes = [epg.Hessian(["T2"], [ALPHAS[5]])]
    got = epg.simulate(build(), probe=probes, max_nstate=10,
                       fisp_kernel="force")
    eps = 1e-4

    def jac5(T2x):
        j = epg.simulate(build(T2=T2x), max_nstate=10, fisp_kernel=False,
                         probe=[epg.Jacobian([ALPHAS[5]])])
        return np.asarray(j)[..., 0]

    fd = (jac5(80.0 + eps) - jac5(80.0 - eps)) / (2 * eps)
    assert np.abs(np.asarray(got)[..., 0, 0] - fd).max() < 1e-6


def test_matcher_accepts_flagship():
    params = fisp_dispatch.match_fisp_hessian(build())
    assert params is not None
    assert len(params["amap"]) == 2 * NTR
    assert params["shape"] == (1,)


@pytest.mark.parametrize("mutate", [
    "dup_alias", "coeff", "order2", "g", "shift2", "adc_phase",
    "alias_reserved", "tau_partial", "no_alpha_alias",
])
def test_matcher_fallthrough(mutate):
    """Off-pattern trains must not match (and still simulate right)."""
    seq = build()
    if mutate == "dup_alias":
        seq[4] = epg.T(FA[1], 90, order1={ALPHAS[0]: "alpha"})
    elif mutate == "coeff":
        seq[0] = epg.T(FA[0], 90, order1={ALPHAS[0]: {"alpha": 2.0}})
    elif mutate == "order2":
        seq[0] = epg.T(FA[0], 90, order1={ALPHAS[0]: "alpha"},
                       order2=[(ALPHAS[0], ALPHAS[0])])
    elif mutate == "g":
        seq[1] = epg.E(TAU[0], 1380., 80., g=0.01,
                       order1={"T1": "T1", "T2": "T2", TAUS[0]: "tau"})
    elif mutate == "shift2":
        seq[3] = epg.S(2)
    elif mutate == "adc_phase":
        seq[2] = epg.Adc(phase=30.0)
    elif mutate == "alias_reserved":
        seq[0] = epg.T(FA[0], 90, order1={"T1": "alpha"})
    elif mutate == "tau_partial":
        seq[1] = epg.E(TAU[0], 1380., 80.,
                       order1={"T1": "T1", "T2": "T2"})
    elif mutate == "no_alpha_alias":
        seq[0] = epg.T(FA[0], 90)
    assert fisp_dispatch.match_fisp_hessian(seq) is None


def test_probe_fallthrough_global_vars2():
    """Hessian vars2 containing a global variable falls through to the
    planner (and the planner still answers)."""
    probes = [epg.Hessian(["T1"], ["T1", ALPHAS[0]])]
    ref, got = both(build, probes)
    assert_close(ref, got, tol=1e-12)  # identical path on both sides


def test_probe_fallthrough_eval_probe():
    assert fisp_dispatch.match_hessian_probes(
        (epg.Probe("Z0"), epg.Hessian(["T1"], [ALPHAS[0]])),
        fisp_dispatch.match_fisp_hessian(build())) is None


def test_kernel_second_order_consistency():
    """order-1 and order-2 kernel variants agree on shared outputs."""
    from epgpy_tpu.models.pallas_hessian import fisp_hessian_pallas

    o1 = fisp_hessian_pallas(FA, 90.0, TAU, [1380.0], [80.0], nstate=6,
                             second_order=False, interpret=True)
    o2 = fisp_hessian_pallas(FA, 90.0, TAU, [1380.0], [80.0], nstate=6,
                             second_order=True, interpret=True)
    for k in o1:
        np.testing.assert_array_equal(o1[k][0], o2[k][0])
        np.testing.assert_array_equal(o1[k][1], o2[k][1])
    # causality: columns i > echo j are exactly zero
    assert np.abs(np.triu(o2["dT1dalpha"][0][0], k=1)).max() == 0.0


def test_te_sep_inversion_kernel():
    """5-op MRF/design form: echo at fixed TE, tracked tail TR-TE, and
    an inversion prep with closed-form dT1 seeding -- against the
    general planner on the equivalent op train."""
    from epgpy_tpu.models.pallas_hessian import fisp_hessian_pallas

    TE, TI = 5.0, 20.0
    TR = RNG.uniform(11, 16, NTR)
    seq = [epg.T(180, 0), epg.E(TI, 1380., 80.,
                                order1={"T1": "T1", "T2": "T2"})]
    for i in range(NTR):
        seq += [epg.T(FA[i], 90, order1={ALPHAS[i]: "alpha"}),
                epg.E(TE, 1380., 80., order1={"T1": "T1", "T2": "T2"}),
                epg.ADC,
                epg.E(TR[i] - TE, 1380., 80.,
                      order1={"T1": "T1", "T2": "T2", TAUS[i]: "tau"}),
                epg.S(1)]
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"]),
              epg.Hessian(["magnitude", "T1", "T2"], ALPHAS + TAUS)]
    sig, jac, hes = epg.simulate(seq, probe=probes, max_nstate=10,
                                 fisp_kernel=False)
    sig = np.asarray(sig)[:, 0]
    jac = np.asarray(jac)[:, 0]
    hes = np.asarray(hes)[:, 0]
    out = fisp_hessian_pallas(FA, 90.0, TR - TE, [1380.0], [80.0], te=TE,
                              inversion=TI, nstate=10, interpret=True)

    def cplx(n):
        return out[n][0][0] + 1j * out[n][1][0]

    def check(a, b):
        assert np.abs(a - b).max() / max(np.abs(b).max(), 1e-12) < 5e-6

    check(cplx("sig"), sig)
    check(cplx("dT1"), jac[:, 1])
    check(cplx("dT2"), jac[:, 2])
    check(cplx("dalpha"), hes[:, 0, :NTR])
    check(cplx("dtau"), hes[:, 0, NTR:])
    check(cplx("dT1dalpha"), hes[:, 1, :NTR])
    check(cplx("dT2dalpha"), hes[:, 2, :NTR])
    check(cplx("dT1dtau"), hes[:, 1, NTR:])
    check(cplx("dT2dtau"), hes[:, 2, NTR:])


@pytest.mark.slow
def test_fused_design_loss_grad():
    """mrf_design_loss_grad_fused == value_and_grad(mrf_design_loss)
    (the CRLB sequence-design objective), sharded and unsharded."""
    import jax
    import jax.numpy as jnp
    from epgpy_tpu.parallel import (mrf_design_loss,
                                    mrf_design_loss_grad_fused, make_mesh)

    B = 8
    FAj = jnp.asarray(RNG.uniform(12, 58, NTR))
    TRj = jnp.asarray(RNG.uniform(11.5, 15.5, NTR))
    T1s = jnp.asarray(RNG.uniform(400.0, 1600.0, B))
    T2s = jnp.asarray(RNG.uniform(40.0, 120.0, B))
    mesh = make_mesh(jax.devices("cpu")[:8], axes=("atoms",))
    kw = dict(TE=5.0, nstate=6, inversion=20.0, sigma2=10.0,
              smooth_weight=1e-3)
    loss_ref, (gfa_ref, gtr_ref) = jax.value_and_grad(
        lambda fa, tr: mrf_design_loss(fa, tr, T1s, T2s, mesh, ridge=0.0,
                                       **kw), argnums=(0, 1))(FAj, TRj)
    loss_f, gfa_f, gtr_f = jax.jit(
        lambda fa, tr: mrf_design_loss_grad_fused(
            fa, tr, T1s, T2s, mesh, interpret=True, **kw))(
        jnp.asarray(FAj, jnp.float32), jnp.asarray(TRj, jnp.float32))

    def rel(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)

    assert rel(loss_f, loss_ref) < 2e-5
    assert rel(gfa_f, gfa_ref) < 2e-5
    assert rel(gtr_f, gtr_ref) < 2e-5


TR5 = np.random.default_rng(11).uniform(11, 16, NTR)


def build5(TE=5.0, TI=None, T1=1380.0, T2=80.0):
    TR = TR5
    seq = [] if TI is None else [
        epg.T(180, 0), epg.E(TI, T1, T2, order1={"T1": "T1", "T2": "T2"})]
    for i in range(NTR):
        seq += [epg.T(FA[i], 90, order1={ALPHAS[i]: "alpha"}),
                epg.E(TE, T1, T2, order1={"T1": "T1", "T2": "T2"}),
                epg.ADC,
                epg.E(TR[i] - TE, T1, T2,
                      order1={"T1": "T1", "T2": "T2", TAUS[i]: "tau"}),
                epg.S(1)]
    return seq


def test_dispatch_5op_form():
    """5-op constant-TE train routes through simulate()."""
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"]),
              epg.Hessian(["magnitude", "T1", "T2"], ALPHAS + TAUS)]
    ref, got = both(lambda: build5(), probes)
    assert fisp_dispatch.match_fisp_hessian(build5()) is not None
    assert_close(ref, got)


def test_dispatch_5op_inversion_prep():
    """5-op train with a tracked [T(180), E(TI)] inversion prep."""
    probes = [epg.Hessian(["magnitude", "T1", "T2"], ALPHAS + TAUS)]
    ref, got = both(lambda: build5(TI=20.0), probes)
    assert_close(ref, got)


def test_dispatch_4op_inversion_prep():
    """Flagship 4-op train with an inversion prep."""
    probes = [epg.ADC, epg.Hessian(["T1", "T2"], ALPHAS)]
    seq0 = [epg.T(180, 0),
            epg.E(25.0, 1380., 80., order1={"T1": "T1", "T2": "T2"})]
    ref, got = both(lambda: seq0 + build(), probes)
    assert_close(ref, got)


def test_prep_fallthrough_untracked_e():
    """An UNTRACKED prep E must fall through (the kernel always
    differentiates the prep; the planner would not)."""
    seq = [epg.T(180, 0), epg.E(25.0, 1380., 80.)] + build()
    assert fisp_dispatch.match_fisp_hessian(seq) is None


def test_prep_fallthrough_non180():
    seq = [epg.T(90, 0),
           epg.E(25.0, 1380., 80., order1={"T1": "T1", "T2": "T2"})] \
        + build()
    assert fisp_dispatch.match_fisp_hessian(seq) is None
