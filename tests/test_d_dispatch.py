"""Diffusivity-tracked DW-FISP Jacobian dispatch (r5, VERDICT #6).

Beyond reference: epgpy's D op has no derivatives at all (its
diffusion_operator is applied value-only).  Here ``D(tau, Dc, k=1,
order1=["Dcoef"])`` (or the alias ``order1={"D": "Dcoef"}``) tracks
dS/dD through the planner's generic substitution AND routes
``simulate()`` probes to the fused DW-FISP Jacobian kernel's dD
column (models/pallas_fisp track_diffusivity).  Oracle: the f64
planner, itself FD-pinned here.
"""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import fisp_dispatch

KV = 2 * np.pi / 1e-3          # 1 mm voxel


def _dw_train(P=12, B=3, *, dc=1.2e-3, d_order1=("Dcoef",), b1=None,
              track=("T1", "T2")):
    rng = np.random.default_rng(9)
    FA = rng.uniform(10, 60, P)
    T1 = np.linspace(400, 1500, B)
    T2 = np.linspace(40, 120, B)
    d = epg.D(4.0, dc, k=1,
              order1=list(d_order1) if isinstance(d_order1, tuple)
              else d_order1)
    seq = []
    for i in range(P):
        alpha = FA[i] * b1 if b1 is not None else float(FA[i])
        o1b = ({"B1": {"alpha": float(FA[i])}} if b1 is not None
               else None)
        seq += [epg.T(alpha, 90.0, order1=o1b),
                epg.E(5.0, T1, T2, order1=list(track)), epg.ADC,
                epg.E(7.0, T1, T2, order1=list(track)), epg.S(1), d]
    return seq


def _cols_match(jac_k, jac_e, names, tol=3e-5):
    jac_k, jac_e = np.asarray(jac_k), np.asarray(jac_e)
    assert jac_k.shape == jac_e.shape
    for c, name in enumerate(names):
        ek, ee = jac_k[..., c], jac_e[..., c]
        scale = max(np.abs(ee).max(), 1e-12)
        assert np.abs(ek - ee).max() / scale < tol, name


def test_tracked_d_routes_and_matches_planner():
    seq = _dw_train()
    params = fisp_dispatch.match_dwfisp(list(seq), KV)
    assert params is not None and "Dcoef" in params["vars"]
    assert params["d_var"] == "Dcoef"
    names = ["magnitude", "T1", "T2", "Dcoef"]
    probes = [epg.ADC, epg.Jacobian(names)]
    before = fisp_dispatch.DISPATCH_COUNTS.get("jac:dw", 0)
    sig_k, jac_k = epg.simulate(seq, kvalue=KV, max_nstate=6,
                                probe=probes, fisp_kernel="force")
    assert fisp_dispatch.DISPATCH_COUNTS.get("jac:dw", 0) > before
    sig_e, jac_e = epg.simulate(seq, kvalue=KV, max_nstate=6,
                                probe=probes, fisp_kernel=False)
    assert np.abs(np.asarray(sig_k) - np.asarray(sig_e)).max() < 1e-5
    # dD-column values span decades vs T1/T2 cols: compare per column
    _cols_match(jac_k, jac_e, names)


def test_tracked_d_alias_name():
    seq = _dw_train(d_order1={"D": "Dcoef"})
    params = fisp_dispatch.match_dwfisp(list(seq), KV)
    assert params is not None and "D" in params["vars"]
    probes = [epg.Jacobian(["D"])]
    jac_k = epg.simulate(seq, kvalue=KV, max_nstate=6, probe=probes,
                         fisp_kernel="force")
    jac_e = epg.simulate(seq, kvalue=KV, max_nstate=6, probe=probes,
                         fisp_kernel=False)
    _cols_match(jac_k, jac_e, ["D"])


def test_tracked_d_with_tracked_b1():
    """Joint (T1, T2, B1, D) tracking: all four fused columns."""
    B1 = np.linspace(0.85, 1.15, 3)
    seq = _dw_train(b1=B1)
    params = fisp_dispatch.match_dwfisp(list(seq), KV)
    assert params is not None
    assert set(params["vars"]) == {"T1", "T2", "B1", "Dcoef"}
    names = ["magnitude", "T1", "T2", "B1", "Dcoef"]
    probes = [epg.ADC, epg.Jacobian(names)]
    sig_k, jac_k = epg.simulate(seq, kvalue=KV, max_nstate=6,
                                probe=probes, fisp_kernel="force")
    sig_e, jac_e = epg.simulate(seq, kvalue=KV, max_nstate=6,
                                probe=probes, fisp_kernel=False)
    _cols_match(jac_k, jac_e, names)


def test_planner_d_column_is_true_derivative():
    """FD pin of the planner's dD column (the oracle above)."""
    dc = 1.2e-3
    probes = [epg.Jacobian(["Dcoef"])]
    jac = np.asarray(epg.simulate(_dw_train(dc=dc), kvalue=KV,
                                  max_nstate=6, probe=probes,
                                  fisp_kernel=False))[..., 0]
    eps = 1e-6
    sp = np.asarray(epg.simulate(_dw_train(dc=dc + eps, d_order1=False,
                                           track=()),
                                 kvalue=KV, max_nstate=6,
                                 fisp_kernel=False))
    sm = np.asarray(epg.simulate(_dw_train(dc=dc - eps, d_order1=False,
                                           track=()),
                                 kvalue=KV, max_nstate=6,
                                 fisp_kernel=False))
    fd = (sp - sm) / (2 * eps)
    assert np.abs(jac - fd).max() / max(np.abs(fd).max(), 1e-12) < 1e-6


def test_tracked_d_fall_through_rows():
    # tensor D tracked -> planner (the kernel dD is scalar-diffusivity)
    Dt = np.diag([1.5e-3, 0.5e-3, 0.25e-3])
    seq = _dw_train(dc=Dt)
    assert fisp_dispatch.match_dwfisp(list(seq), KV) is None
    sig = epg.simulate(seq, kvalue=KV, max_nstate=6,
                       probe=[epg.Jacobian(["Dcoef"])],
                       fisp_kernel="force")
    assert np.isfinite(np.asarray(sig)).all()
    # non-unit chain-rule coefficient -> planner
    seq2 = _dw_train(d_order1={"adc_um": {"Dcoef": 1e-3}})
    assert fisp_dispatch.match_dwfisp(list(seq2), KV) is None
    # order2 on the D op -> planner
    d = epg.D(4.0, 1.2e-3, k=1, order1=["Dcoef"], order2=True)
    T1 = np.linspace(400, 1500, 3)
    T2 = np.linspace(40, 120, 3)
    seq3 = []
    for i in range(12):
        seq3 += [epg.T(30.0, 90.0), epg.E(5.0, T1, T2), epg.ADC,
                 epg.E(7.0, T1, T2), epg.S(1), d]
    assert fisp_dispatch.match_dwfisp(list(seq3), KV) is None
    # untracked-D train probed for D raises (both paths)
    seq4 = _dw_train(d_order1=False)
    with pytest.raises(ValueError, match="not tracked"):
        epg.simulate(seq4, kvalue=KV, max_nstate=6,
                     probe=epg.Jacobian(["Dcoef"]), fisp_kernel="force")
