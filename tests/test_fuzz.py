"""Randomized mixed-operator parity fuzz vs the reference.

tests/golden/fuzz.npz holds 24 seeded random sequences over
T/Phi/E/P/R/S(int)/SPOILER with scalar or batched parameters -- op specs
as JSON plus the reference's signals.  Rebuilding each sequence here and
matching at 1e-10 exercises operator COMBINATIONS (orderings, sweeps,
spoilers mid-train, shifts beyond capacity) that the targeted tests
don't enumerate.  Regenerate with `python tools/make_golden.py fuzz`.
"""

import json
import os

import numpy as np
import pytest

import epgpy_tpu as epg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "fuzz.npz")


def _load():
    g = np.load(GOLDEN)
    specs = json.loads(bytes(g["specs_json"]).decode())
    return g, specs


def _build(specs):
    seq = []
    for sp in specs:
        k = sp["k"]
        if k == "T":
            seq.append(epg.T(np.asarray(sp["alpha"]), sp["phi"]))
        elif k == "E":
            seq.append(epg.E(sp["tau"], sp["T1"], np.asarray(sp["T2"]),
                             g=sp["g"]))
        elif k == "P":
            seq.append(epg.P(sp["tau"], sp["g"]))
        elif k == "R":
            seq.append(epg.R(sp["rT"], sp["rL"], r0=sp["r0"]))
        elif k == "Phi":
            seq.append(epg.Phi(sp["phi"]))
        elif k == "S":
            seq.append(epg.S(sp["kint"]))
        elif k == "SPOILER":
            seq.append(epg.SPOILER)
        elif k == "ADC":
            seq.append(epg.ADC)
        else:  # pragma: no cover
            raise ValueError(k)
    return seq


_G, _SPECS = _load()


@pytest.mark.parametrize("i", range(len(_SPECS)))
def test_fuzz_sequence_parity(i):
    sig = np.asarray(epg.simulate(_build(_SPECS[i]), max_nstate=12))
    ref = _G[f"sig_re_{i:02d}"] + 1j * _G[f"sig_im_{i:02d}"]
    assert np.abs(sig.ravel() - ref).max() < 1e-10, f"sequence {i}"


_GD = np.load(os.path.join(os.path.dirname(__file__), "golden",
                           "fuzz_diff.npz"))
_DSPECS = json.loads(bytes(_GD["specs_json"]).decode())


@pytest.mark.parametrize("i", range(len(_DSPECS)))
def test_fuzz_diff_parity(i):
    """Random tracked-variable trains: our jacfwd Jacobians match the
    reference's hand-derived operator chain rule at 1e-8."""
    sp = _DSPECS[i]
    seq = []
    for n in range(sp["ntr"]):
        if sp["alias"]:
            o1 = {f"a{n}": "alpha"} if n < 3 else False
        else:
            o1 = "alpha" if n < 3 else False
        seq += [
            epg.T(sp["alphas"][n], sp["phi"], order1=o1),
            epg.E(sp["taus"][n], sp["T1"], sp["T2"], order1=["T1", "T2"]),
            epg.ADC, epg.S(1),
        ]
    jac = np.asarray(epg.simulate(
        seq, max_nstate=6, probe=epg.Jacobian(sp["vars"])))
    ref = _GD[f"jac_re_{i:02d}"] + 1j * _GD[f"jac_im_{i:02d}"]
    assert np.abs(jac - ref).max() < 1e-8, f"sequence {i}"


_GS = np.load(os.path.join(os.path.dirname(__file__), "golden",
                           "fuzz_shift.npz"))
_SSPECS = json.loads(bytes(_GS["specs_json"]).decode())


@pytest.mark.parametrize("i", range(len(_SSPECS)))
def test_fuzz_shift_parity(i):
    """Random n-D / float shift-merge trains (the coordinate-table path:
    scan-grouped kleaf shifts, pow2-padded sort, re/im-split payloads)
    match the reference at 1e-8."""
    sp = _SSPECS[i]
    seq = [epg.T(90, 90)]
    for it in sp["items"]:
        kv = np.asarray(it["kv"])
        if not sp["float"]:
            kv = kv.astype(int)
        seq += [epg.S(kv), epg.T(it["alpha"], it["phi"]),
                epg.E(it["tau"], 1000.0, it["T2"]), epg.ADC]
    sig = np.asarray(epg.simulate(
        seq, max_nstate=200, kgrid=sp["kgrid"], probe=["F0", "Z0"]))
    ref = _GS[f"sig_re_{i:02d}"] + 1j * _GS[f"sig_im_{i:02d}"]
    assert np.abs(sig.ravel() - ref).max() < 1e-8, f"sequence {i}"


_GP = np.load(os.path.join(os.path.dirname(__file__), "golden",
                           "fuzz_physics.npz"))
_PSPECS = json.loads(bytes(_GP["specs_json"]).decode())


@pytest.mark.parametrize("i", range(len(_PSPECS)))
def test_fuzz_physics_parity(i):
    """Random diffusion (scalar + tensor) and EPG-X (2-compartment)
    trains match the reference at 1e-8."""
    sp = _PSPECS[i]
    if sp["kind"] == "D":
        Dv = np.asarray(sp["D"])
        if not sp["aniso"]:
            Dv = float(Dv)
        seq = [epg.T(90, 90)]
        for it in sp["items"]:
            seq += [epg.S(it["kint"]), epg.D(it["tau"], Dv, k=it["kint"]),
                    epg.T(it["alpha"], 0), epg.ADC]
        sig = np.asarray(epg.simulate(seq, kvalue=sp["kvalue"],
                                      probe=["F0", "Z0"]))
    else:
        khi = epg.exchange_matrix(sp["k12"], axis=-1, ncomp=2,
                                  densities=sp["densities"])
        X = epg.X(sp["TR"], khi, axis=-1, T1=sp["T1"], T2=sp["T2"],
                  g=sp["g"])
        seq = []
        for _ in range(sp["ntr"]):
            seq += [epg.T(sp["alpha"], 0), epg.ADC, X, epg.S(1)]
        init = (np.array([0, 0, 1.0])
                * np.array(sp["densities"])[:, None, None])
        sig = np.asarray(epg.simulate(seq, max_nstate=8, init=init,
                                      density=sp["densities"]))
    ref = _GP[f"sig_re_{i:02d}"] + 1j * _GP[f"sig_im_{i:02d}"]
    assert np.abs(sig.ravel() - ref).max() < 1e-8, f"sequence {i}"


_GM = np.load(os.path.join(os.path.dirname(__file__), "golden",
                           "fuzz_modify.npz"))
_MSPECS = json.loads(bytes(_GM["specs_json"]).decode())


@pytest.mark.parametrize("i", range(len(_MSPECS)))
def test_fuzz_modify_parity(i):
    """Random trains rewritten by modify() (T1/T2 sweeps, off-resonance,
    B1 attenuation) match the reference at 1e-10."""
    sp = _MSPECS[i]
    seq = [epg.T(90, 90)]
    for n in range(sp["ntr"]):
        seq += [epg.S(1, duration=sp["durs"][n]),
                epg.T(sp["alphas"][n], sp["phis"][n]), epg.ADC]
    kw = {"T1": sp["T1"], "T2": np.asarray(sp["T2"])}
    if sp["g"] is not None:
        kw["g"] = np.asarray(sp["g"])[None, :]
    if sp["att"] is not None:
        kw["att"] = sp["att"]
    sig = np.asarray(epg.simulate(epg.modify(seq, **kw)))
    ref = _GM[f"sig_re_{i:02d}"] + 1j * _GM[f"sig_im_{i:02d}"]
    assert np.abs(sig.ravel() - ref).max() < 1e-10, f"sequence {i}"


_GT = np.load(os.path.join(os.path.dirname(__file__), "golden",
                           "fuzz_time.npz"))
_TSPECS = json.loads(bytes(_GT["specs_json"]).decode())


@pytest.mark.parametrize("i", range(len(_TSPECS)))
def test_fuzz_time_parity(i):
    """Random accumulated-time (C) trains with shifts/rotations mixed in
    (4th-coordinate T2' bookkeeping) match the reference at 1e-8."""
    sp = _TSPECS[i]
    seq = [epg.T(90, 90)]
    for it in sp["items"]:
        seq += [epg.C(it["tau"], it["r2"])]
        if it["kind"] == "CS":
            seq += [epg.S(it["kint"])]
        elif it["kind"] == "CT":
            seq += [epg.T(it["alpha"], 0)]
        seq += [epg.E(2.0, 1000.0, 80.0), epg.ADC]
    sig = np.asarray(epg.simulate(seq, max_nstate=40, kgrid=0.05,
                                  probe="F0"))
    ref = _GT[f"sig_re_{i:02d}"] + 1j * _GT[f"sig_im_{i:02d}"]
    assert np.abs(sig.ravel() - ref).max() < 1e-8, f"sequence {i}"


_GE = np.load(os.path.join(os.path.dirname(__file__), "golden",
                           "fuzz_expr.npz"))
_ESPECS = json.loads(bytes(_GE["specs_json"]).decode())


def _expr_build(node, V, M):
    """Mirror of tools/make_golden.py:_expr_build (shared tree spec)."""
    op = node[0]
    if op == "var":
        return V[node[1]]
    if op == "const":
        return node[1]
    a = _expr_build(node[1], V, M)
    if op == "exp":
        return M.exp(a * (-0.2))
    if op == "sqr":
        return a * a
    b = _expr_build(node[2], V, M)
    if op == "add":
        return a + b
    if op == "sub":
        return a - b
    if op == "mul":
        return a * b
    return a / (b * b + 0.5)


@pytest.mark.parametrize("i", range(len(_ESPECS)))
def test_fuzz_expr_parity(i):
    """Random expression-tree operator arguments: the reference's
    symbolic chain rule and our jvp-backed Expression.derive produce the
    same sequence Jacobians (1e-8)."""
    from epgpy_tpu.sequence import Sequence, Variable, math, operators

    sp = _ESPECS[i]
    V = {"x": Variable("x"), "y": Variable("y")}
    seq = []
    for n in range(sp["ntr"]):
        alpha = _expr_build(sp["trees_a"][n], V, math) * 10 + 20
        tau = _expr_build(sp["trees_t"][n], V, math) * 0.5 + 2
        seq += [operators.T(alpha, 90), operators.E(tau, 1000.0, 80.0),
                "ADC", operators.S(1)]
    sig, jac = Sequence(seq).jacobian(["x", "y"])(**sp["vals"])
    ref = _GE[f"jac_re_{i:02d}"] + 1j * _GE[f"jac_im_{i:02d}"]
    assert np.abs(np.asarray(jac) - ref).max() < 1e-8, f"sequence {i}"


_GR = np.load(os.path.join(os.path.dirname(__file__), "golden",
                           "fuzz_rfpulse.npz"))
_RSPECS = json.loads(bytes(_GR["specs_json"]).decode())


@pytest.mark.parametrize("i", range(len(_RSPECS)))
def test_fuzz_rfpulse_parity(i):
    """Random shaped pulses (real and complex envelopes, explicit rf):
    hard-pulse trains + modify(g=...) slice profiles match the reference
    at 1e-8."""
    sp = _RSPECS[i]
    env = np.asarray(sp["env_re"]) + 1j * np.asarray(sp["env_im"])
    pulse = epg.RFPulse(env, sp["dur"], rf=sp["rf"])
    seq = epg.modify([pulse], g=np.asarray(sp["freqs"]), expand=False)
    sig = np.asarray(epg.simulate(list(seq) + [epg.ADC]))
    ref = _GR[f"sig_re_{i:02d}"] + 1j * _GR[f"sig_im_{i:02d}"]
    assert np.abs(sig.ravel() - ref).max() < 1e-8, f"sequence {i}"


_GH = np.load(os.path.join(os.path.dirname(__file__), "golden",
                           "fuzz_hessian.npz"))
_HSPECS = json.loads(bytes(_GH["specs_json"]).decode())


@pytest.mark.parametrize("i", range(len(_HSPECS)))
def test_fuzz_hessian_parity(i):
    """Random order2 trains: restricted (magnitude, T1, T2) x (per-pulse
    alpha aliases + T1 + T2) Hessian blocks match the reference's
    hand-derived second-order chain rule at 1e-7."""
    sp = _HSPECS[i]
    avars = [f"a{n}" for n in range(sp["ntr"])]
    cross = [(a, p) for a in avars for p in ("T1", "T2")]
    seq = []
    for n in range(sp["ntr"]):
        aname = avars[n]
        seq += [
            epg.T(sp["alphas"][n], sp["phi"],
                  order1={aname: "alpha"},
                  order2=[(aname, "T1"), (aname, "T2"),
                          (aname, aname)]),
            epg.E(sp["taus"][n], sp["T1"], sp["T2"],
                  order1=["T1", "T2"],
                  order2=[("T1", "T1"), ("T2", "T2"), ("T1", "T2")]
                  + cross),
            epg.ADC, epg.S(1),
        ]
    _, hess = epg.simulate(
        seq, max_nstate=6,
        probe=[epg.Jacobian(["T1"]), epg.Hessian(sp["vars1"], sp["vars2"])])
    ref = _GH[f"hes_re_{i:02d}"] + 1j * _GH[f"hes_im_{i:02d}"]
    assert np.abs(np.asarray(hess) - ref).max() < 1e-7, f"sequence {i}"


_GPR = np.load(os.path.join(os.path.dirname(__file__), "golden",
                            "fuzz_prune.npz"))
_PRSPECS = json.loads(bytes(_GPR["specs_json"]).decode())


@pytest.mark.parametrize("i", range(len(_PRSPECS)))
def test_fuzz_prune_parity(i):
    """Random BATCH-VARYING float-shift trains (per-atom shifts, the
    reference's shift-prune path / our batch-varying dense merge) match
    the reference at 1e-8."""
    sp = _PRSPECS[i]
    ks = np.asarray(sp["ks"])
    seq = [epg.T(90, 90)]
    for it in sp["items"]:
        seq += [epg.S(ks * it["scale"]), epg.T(it["alpha"], it["phi"]),
                epg.E(it["tau"], 1000.0, it["T2"]), epg.ADC]
    sig = np.asarray(epg.simulate(
        seq, max_nstate=256, kgrid=sp["kgrid"], probe=["F0", "Z0"]))
    ref = _GPR[f"sig_re_{i:02d}"] + 1j * _GPR[f"sig_im_{i:02d}"]
    assert np.abs(sig.ravel() - ref).max() < 1e-8, f"sequence {i}"
