"""Sequence DSL tests (strategy: reference test/test_sequence.py)."""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu.sequence import (
    Sequence, Variable, Constant, operators, functions, repeat,
)


def test_expression_algebra():
    x, y = Variable("x"), Variable("y")
    e = 2 * x + y ** 2 - 1
    assert np.allclose(e(x=3, y=4), 2 * 3 + 16 - 1)
    assert {str(v) for v in e.variables} == {"x", "y"}
    # substitution
    e2 = e.map(y=5)
    assert np.allclose(e2(x=1), 2 + 25 - 1)
    # function nodes
    f = functions.exp(-x / 10.0)
    assert np.allclose(f(x=10.0), np.exp(-1.0))


def test_expression_derive():
    x, y = Variable("x"), Variable("y")
    e = x ** 2 * y + 3 * x
    # de/dx = 2xy + 3
    assert np.allclose(e.derive("x")(x=2.0, y=5.0), 2 * 2 * 5 + 3)
    # de/dy = x^2
    assert np.allclose(e.derive("y")(x=2.0, y=5.0), 4.0)
    # second derivative d2e/dxdy = 2x
    assert np.allclose(e.derive("x").derive("y")(x=2.0, y=5.0), 4.0)
    # derivative of an unrelated variable is 0
    assert np.allclose(e.derive("z")(x=1.0, y=1.0), 0.0)


def test_sequence_signal():
    T2 = Variable("T2")
    necho = 4
    seq = Sequence(
        [operators.T(90, 90)]
        + [operators.E(4.5, 1400.0, T2), operators.S(1), operators.T(150, 0),
           operators.E(4.5, 1400.0, T2), operators.S(1), "ADC"] * necho
    )
    assert {str(v) for v in seq.variables} == {"T2"}
    sig = seq.signal(T2=35.0)
    # direct simulation comparison
    ref = np.asarray(epg.simulate(
        [epg.T(90, 90)] + [epg.E(4.5, 1400.0, 35.0), epg.S(1), epg.T(150, 0),
                           epg.E(4.5, 1400.0, 35.0), epg.S(1), epg.ADC] * necho))
    assert np.abs(sig - np.moveaxis(ref, 0, -1)).max() < 1e-12


def test_sequence_jacobian_fd():
    T2 = Variable("T2")
    seq = Sequence(
        [operators.T(90, 90)]
        + [operators.E(4.5, 1400.0, T2), operators.S(1), operators.T(150, 0),
           operators.E(4.5, 1400.0, T2), operators.S(1), "ADC"] * 3
    )
    sig, jac = seq.jacobian(["T2"])(T2=35.0)
    eps = 1e-4
    fd = (seq.signal(T2=35.0 + eps) - seq.signal(T2=35.0 - eps)) / (2 * eps)
    assert np.abs(jac[..., 0] - fd).max() < 1e-7


def test_sequence_expression_chain_rule():
    """Variable feeding an expression: d(signal)/d(R2) with T2 = 1/R2."""
    R2 = Variable("R2")
    seq = Sequence(
        [operators.T(90, 90)]
        + [operators.E(4.5, 1400.0, 1.0 / R2), operators.S(1),
           operators.T(150, 0),
           operators.E(4.5, 1400.0, 1.0 / R2), operators.S(1), "ADC"] * 3
    )
    r2 = 1.0 / 35.0
    sig, jac = seq.jacobian(["R2"])(R2=r2)
    eps = 1e-7
    fd = (seq.signal(R2=r2 + eps) - seq.signal(R2=r2 - eps)) / (2 * eps)
    assert np.abs(jac[..., 0] - fd).max() < 1e-4 * max(1, np.abs(fd).max())


def test_sequence_hessian_shapes():
    T2, B1 = Variable("T2"), Variable("B1")
    seq = Sequence(
        [operators.T(90, 90)]
        + [operators.E(4.5, 1400.0, T2), operators.S(1),
           operators.T(150 * B1, 0), operators.E(4.5, 1400.0, T2),
           operators.S(1), "ADC"] * 2
    )
    sig, jac, hes = seq.hessian(["T2", "B1"])(T2=35.0, B1=0.9)
    assert jac.shape[-1] == 2
    assert hes.shape[-2:] == (2, 2)
    # Hessian symmetry
    assert np.allclose(hes[..., 0, 1], hes[..., 1, 0], atol=1e-10)


def test_sequence_crlb():
    T2 = Variable("T2")
    seq = Sequence(
        [operators.T(90, 90)]
        + [operators.E(4.5, 1400.0, T2), operators.S(1), operators.T(150, 0),
           operators.E(4.5, 1400.0, T2), operators.S(1), "ADC"] * 5
    )
    crb = seq.crlb(["T2"])(T2=35.0)
    assert np.isfinite(np.asarray(crb)).all()
    # more echoes (information) later: compare to shorter train
    seq2 = Sequence(seq.operators[:1 + 6 * 2])
    crb2 = seq2.crlb(["T2"])(T2=35.0)
    assert np.asarray(crb) < np.asarray(crb2)


def test_repeat_mrf_builder():
    """repeat() clones blocks with per-repetition variable names."""
    alpha = Variable("alpha")
    block = [operators.T(alpha, 90), operators.E(5.0, 1000.0, 80.0),
             "ADC", operators.S(1)]
    train = repeat(block, alpha=[20.0, 40.0, 60.0])
    seq = Sequence(train)
    sig = seq.signal()()  # no free variables: evaluate the closure
    assert sig.shape[-1] == 3

    # named per-repetition variables
    train2 = repeat(block, nrep=3, alpha="fa{:02d}")
    seq2 = Sequence(train2)
    assert {str(v) for v in seq2.variables} == {"fa01", "fa02", "fa03"}
    sig2, jac2 = seq2.jacobian(["fa01", "fa02", "fa03"])(
        fa01=20.0, fa02=40.0, fa03=60.0)
    assert np.abs(sig2 - sig).max() < 1e-12
    assert jac2.shape[-1] == 3


def test_string_variable_args():
    """Bare strings name variables: operators.T("alpha", 90) (reference
    sequence.py:598-606, used by examples/profiling/differentiation_mrf_seq)."""
    seq = Sequence([operators.T("alpha", 90), operators.E(10.0, "T1", 80.0),
                    "ADC"])
    assert {str(v) for v in seq.variables} == {"alpha", "T1"}
    sig = seq.signal()(alpha=90.0, T1=1000.0)
    ref = Sequence([operators.T(Variable("alpha"), 90),
                    operators.E(10.0, Variable("T1"), 80.0), "ADC"]
                   ).signal()(alpha=90.0, T1=1000.0)
    assert np.abs(np.asarray(sig) - np.asarray(ref)).max() == 0


def test_sequence_adc_times():
    seq = Sequence([operators.T(90, 90), operators.Wait(5.0), "ADC",
                    operators.Wait(3.0), "ADC"])
    times = seq.adc_times()
    assert np.allclose(times, [5.0, 8.0])


def test_confint():
    T2 = Variable("T2")
    seq = Sequence(
        [operators.T(90, 90)]
        + [operators.E(4.5, 1400.0, T2), operators.S(1), operators.T(150, 0),
           operators.E(4.5, 1400.0, T2), operators.S(1), "ADC"] * 6
    )
    truth = seq.signal(T2=35.0)
    rng = np.random.default_rng(0)
    obs = truth + 1e-3 * rng.normal(size=truth.shape)
    cints = seq.confint(obs, ["T2"])(T2=35.0)
    assert np.asarray(cints).shape[-1] == 1
    assert np.isfinite(np.asarray(cints)).all()


def test_sequence_pickling():
    """DSL objects pickle (reference test_sequence.py:421)."""
    import pickle
    T2 = Variable("T2")
    seq = Sequence([operators.T(90, 90), operators.E(5, 1000, T2 + 1.0),
                    operators.S(1), "ADC"])
    seq2 = pickle.loads(pickle.dumps(seq))
    a = seq.signal(T2=49.0)
    b = seq2.signal(T2=49.0)
    assert np.abs(a - b).max() < 1e-12


@pytest.mark.slow
def test_sequence_crlb_gradient_fd():
    """crlb(variables, gradient=params): the analytic CRLB gradient
    (Hessian contraction, reference epgpy/stats.py:6-36) matches finite
    differences of the CRLB value."""
    a1, a2 = Variable("a1"), Variable("a2")
    T2 = Variable("T2")

    def build(seq_vars):
        return Sequence([operators.T(90, 90)] + [
            operators.E(5.0, 1000.0, T2), operators.S(1),
            operators.T(seq_vars[0], 0),
            operators.E(5.0, 1000.0, T2), operators.S(1), "ADC",
            operators.E(5.0, 1000.0, T2), operators.S(1),
            operators.T(seq_vars[1], 0),
            operators.E(5.0, 1000.0, T2), operators.S(1), "ADC",
        ])

    seq = build([a1, a2])
    vals = {"T2": 45.0, "a1": 120.0, "a2": 100.0}
    crb, grad = seq.crlb(["T2"], gradient=["a1", "a2"])(**vals)
    crb0 = seq.crlb(["T2"])(**vals)
    assert np.allclose(np.asarray(crb), np.asarray(crb0))

    eps = 1e-3
    for j, name in enumerate(("a1", "a2")):
        up = dict(vals); up[name] += eps
        dn = dict(vals); dn[name] -= eps
        fd = (np.asarray(seq.crlb(["T2"])(**up))
              - np.asarray(seq.crlb(["T2"])(**dn))) / (2 * eps)
        assert np.allclose(np.asarray(grad)[..., j], fd, rtol=1e-4), name


def test_confint_cband():
    """confint(return_cband=True) also returns the prediction confidence
    band (reference epgpy/stats.py:57-101 delta method)."""
    T2 = Variable("T2")
    seq = Sequence(
        [operators.T(90, 90)]
        + [operators.E(4.5, 1400.0, T2), operators.S(1), operators.T(150, 0),
           operators.E(4.5, 1400.0, T2), operators.S(1), "ADC"] * 6
    )
    truth = seq.signal(T2=35.0)
    rng = np.random.default_rng(1)
    obs = truth + 1e-3 * rng.normal(size=truth.shape)
    cints, cband = seq.confint(obs, ["T2"], return_cband=True)(T2=35.0)
    assert np.isfinite(np.asarray(cints)).all()
    cband = np.asarray(cband)
    assert cband.shape[-1] == truth.shape[-1]
    assert np.all(np.asarray(cband) >= 0)


def test_dsl_null_operator():
    """operators.Null() (reference sequence.py:578): a DSL no-op."""
    from epgpy_tpu import sequence as sq

    s = sq.Sequence([sq.operators.T(90, 90), sq.operators.Null(),
                     sq.operators.ADC])
    s2 = sq.Sequence([sq.operators.T(90, 90), sq.operators.ADC])
    assert np.allclose(np.asarray(s.signal()()), np.asarray(s2.signal()()))


def test_confint_observed_information_sign():
    """With res = obs - pred, the observed information is
    J^H J - Re(conj(H) res) (the + sign biased intervals and came from
    the reference's never-validated einsum): pin against the
    finite-difference Hessian of the actual SSE."""
    from epgpy_tpu import stats

    t = np.linspace(0.1, 3.0, 12)
    theta0 = np.asarray([1.3, 0.7])

    def pred(th):
        return th[0] * np.exp(-t * th[1])

    rng = np.random.default_rng(3)
    obs = pred(theta0) + 0.05 * rng.standard_normal(t.size)

    def sse(th):
        r = obs - pred(th)
        return float(np.sum(r * r))

    # FD Hessian of SSE at theta0; observed information = H_sse / 2
    eps = 1e-5
    H_sse = np.zeros((2, 2))
    for i in range(2):
        for j in range(2):
            pp = theta0.copy(); pp[i] += eps; pp[j] += eps
            pm = theta0.copy(); pm[i] += eps; pm[j] -= eps
            mp = theta0.copy(); mp[i] -= eps; mp[j] += eps
            mm = theta0.copy(); mm[i] -= eps; mm[j] -= eps
            H_sse[i, j] = (sse(pp) - sse(pm) - sse(mp) + sse(mm)) / (4 * eps**2)
    info_fd = H_sse / 2

    # analytic jac/hess of the MODEL at theta0
    e = np.exp(-t * theta0[1])
    jac = np.stack([e, -theta0[0] * t * e], axis=-1)           # (n, 2)
    hess = np.zeros((t.size, 2, 2))
    hess[:, 0, 1] = hess[:, 1, 0] = -t * e
    hess[:, 1, 1] = theta0[0] * t * t * e
    res = obs - pred(theta0)
    info = jac.T @ jac - np.einsum("nqp,n->pq", hess, res)
    assert np.abs(info - info_fd).max() < 1e-4 * np.abs(info_fd).max()

    # and confint's cints match the FD-information covariance
    cints, _ = stats.confint(obs, pred(theta0), jac, hess)
    dof = t.size - 2
    cov_fd = np.linalg.inv(info_fd) * sse(theta0) / dof
    tval = stats.get_tstat_interval(0.95, dof)
    want = tval * np.sqrt(np.diag(cov_fd))
    assert np.abs(np.asarray(cints) - want).max() < 1e-3 * want.max()


def test_repeat_zero_and_negative_setitem():
    from epgpy_tpu import sequence as seqm

    v = seqm.Variable("T2")
    blk = [seqm.E(5.0, 1400.0, v), "ADC"]
    assert seqm.repeat(blk, 0) == []
    s = seqm.Sequence([seqm.T(90, 90), seqm.E(5.0, 1400.0, v), "ADC"])
    s[-1] = "SPOILER"
    assert len(s) == 3


def test_hessian_cross_pair_order():
    """seq.hessian(v1, v2) with v1 > v2 lexically must keep the cross
    pair (a `v1 <= v2` filter drops it and loses the quadratic
    chain-rule term for expression-mapped parameters)."""
    from epgpy_tpu import sequence as seqm

    T2v, B1v = seqm.Variable("T2"), seqm.Variable("B1")
    seq = seqm.Sequence([seqm.T(90 * B1v, 90),
                         seqm.E(5.0, 1400.0, T2v * T2v / 50.0), "ADC"])
    h12 = np.asarray(seq.hessian(["T2"], ["B1"])(T2=50.0, B1=1.0)[2])
    h21 = np.asarray(seq.hessian(["B1"], ["T2"])(T2=50.0, B1=1.0)[2])
    assert np.abs(h12).max() > 0
    assert np.allclose(h12, np.swapaxes(h21, -1, -2), atol=1e-10)


def test_setitem_numpy_integer_index():
    from epgpy_tpu import sequence as seqm

    v = seqm.Variable("T2")
    s = seqm.Sequence([seqm.T(90, 90), seqm.E(5.0, 1400.0, v), "ADC"])
    s[np.int64(0)] = seqm.T(45, 0)          # was: wrapped list stored
    assert len(s) == 3
    sig = s.signal()(T2=50.0)               # build() must not crash
    assert np.isfinite(np.asarray(sig)).all()
