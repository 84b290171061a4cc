"""Finite-difference sweeps of EVERY tracked parameter and order2 pair of
the physics operators (the reference's dominant per-op test pattern,
reference test/test_evolution.py:120-312 and test/test_transition.py:74-147).

Each case embeds the op in a small echo train, reads the Jacobian /
Hessian probes, and checks every first derivative and every (p1, p2)
second-derivative pair against central finite differences of the signal.
"""

import itertools

import numpy as np
import pytest

import epgpy_tpu as epg


#: (op name, factory(overrides) -> op with order1/order2 specs attached,
#:  base parameter values, FD epsilon per parameter)
CASES = {
    "E": (lambda v, o1, o2: epg.E(v["tau"], v["T1"], v["T2"], v["g"],
                                  order1=o1, order2=o2),
          {"tau": 8.0, "T1": 900.0, "T2": 55.0, "g": 0.01},
          {"tau": 1e-5, "T1": 1e-2, "T2": 1e-3, "g": 1e-7}),
    "P": (lambda v, o1, o2: epg.P(v["tau"], v["g"], order1=o1, order2=o2),
          {"tau": 8.0, "g": 0.013},
          {"tau": 1e-5, "g": 1e-7}),
    "T": (lambda v, o1, o2: epg.T(v["alpha"], v["phi"], order1=o1, order2=o2),
          {"alpha": 37.0, "phi": 65.0},
          {"alpha": 1e-4, "phi": 1e-4}),
    "Phi": (lambda v, o1, o2: epg.Phi(v["phi"], order1=o1, order2=o2),
            {"phi": 49.0},
            {"phi": 1e-4}),
    "R": (lambda v, o1, o2: epg.R(v["rT"], v["rL"], order1=o1, order2=o2),
          {"rT": 0.02, "rL": 0.008},
          {"rT": 1e-7, "rL": 1e-7}),
}


def _signal(name, values):
    """Signal of the embedding train at the given op parameter values."""
    build = CASES[name][0]
    op = build(values, False, False)
    seq = [epg.T(90, 90), epg.E(3.0, 1200.0, 70.0), epg.S(1),
           op, epg.T(140, 0), epg.S(1), op, epg.ADC,
           epg.S(1), op, epg.ADC]
    return np.asarray(epg.simulate(seq, max_nstate=8))


def _probe(name, order2=False):
    build, base, _ = CASES[name]
    variables = sorted(base)
    pairs = list(itertools.combinations_with_replacement(variables, 2))
    op = build(base, variables, pairs if order2 else False)
    seq = [epg.T(90, 90), epg.E(3.0, 1200.0, 70.0), epg.S(1),
           op, epg.T(140, 0), epg.S(1), op, epg.ADC,
           epg.S(1), op, epg.ADC]
    probes = [epg.ADC, epg.Jacobian(variables)]
    if order2:
        probes.append(epg.Hessian(variables, variables))
    return variables, epg.simulate(seq, max_nstate=8, probe=probes)


@pytest.mark.parametrize("name", sorted(CASES))
def test_order1_fd_sweep(name):
    """d(signal)/dp vs central FD, every tracked parameter."""
    _, base, eps = CASES[name]
    variables, (sig, jac) = _probe(name)
    for i, p in enumerate(variables):
        e = eps[p]
        up = dict(base, **{p: base[p] + e})
        dn = dict(base, **{p: base[p] - e})
        fd = (_signal(name, up) - _signal(name, dn)) / (2 * e)
        err = np.abs(jac[..., i] - fd).max()
        scale = max(np.abs(fd).max(), 1.0)
        assert err < 1e-6 * scale, f"{name}.{p}: {err}"


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(CASES))
def test_order2_fd_sweep_all_pairs(name):
    """d2(signal)/dp1 dp2 vs FD of the analytic Jacobian, ALL pairs."""
    _, base, eps = CASES[name]
    variables, (sig, jac, hess) = _probe(name, order2=True)
    n = len(variables)
    assert hess.shape[-2:] == (n, n)
    # Hessian symmetry
    assert np.abs(hess - np.swapaxes(hess, -1, -2)).max() < 1e-10

    def jac_at(values):
        build = CASES[name][0]
        op = build(values, variables, False)
        seq = [epg.T(90, 90), epg.E(3.0, 1200.0, 70.0), epg.S(1),
               op, epg.T(140, 0), epg.S(1), op, epg.ADC,
               epg.S(1), op, epg.ADC]
        _, j = epg.simulate(seq, max_nstate=8,
                            probe=[epg.ADC, epg.Jacobian(variables)])
        return j

    for i, p1 in enumerate(variables):
        e = eps[p1]
        up = dict(base, **{p1: base[p1] + e})
        dn = dict(base, **{p1: base[p1] - e})
        fd_row = (jac_at(up) - jac_at(dn)) / (2 * e)  # (..., n)
        for j, p2 in enumerate(variables):
            err = np.abs(hess[..., i, j] - fd_row[..., j]).max()
            scale = max(np.abs(fd_row[..., j]).max(), 1.0)
            assert err < 2e-5 * scale, f"{name}.({p1},{p2}): {err}"
