"""Engine tests: planning, probes, modify, combine (strategy: reference
test/test_functions.py)."""

import numpy as np
import pytest

import epgpy_tpu as epg
from epgpy_tpu import engine


def _cpmg(necho=10, T2s=(30.0, 60.0)):
    return [epg.T(90, 90)] + [
        epg.E(4.5, 1400, list(T2s)), epg.S(1), epg.T(150, 0),
        epg.E(4.5, 1400, list(T2s)), epg.S(1), epg.ADC,
    ] * necho


def test_plan_detects_period():
    seq = engine.flatten_sequence(_cpmg(10))
    plan = engine._build_plan(seq)
    kinds = ["scan" if isinstance(p, engine._ScanBlock) else "unroll" for p in plan]
    assert "scan" in kinds
    block = [p for p in plan if isinstance(p, engine._ScanBlock)][0]
    assert block.period == 6
    assert block.reps == 10


def test_plan_no_false_positive():
    seq = [epg.T(90, 90), epg.S(1), epg.ADC]
    plan = engine._build_plan(engine.flatten_sequence(seq))
    assert all(isinstance(p, list) for p in plan)


def test_float_shift_trains_scan_group():
    """Float shift values are traced leaves: a train of table shifts with
    varying k scan-groups into one block (compile-time critical for
    spatially-resolved sequences; see ops/shift.py S.kleaf)."""
    rng = np.random.default_rng(0)
    seq = []
    for i in range(8):
        seq += [epg.S(float(rng.uniform(2, 10))), epg.T(40, 0),
                epg.E(5.0, 1000, 80), epg.ADC]
    plan = engine._build_plan(engine.flatten_sequence(seq))
    blocks = [p for p in plan if isinstance(p, engine._ScanBlock)]
    assert blocks and blocks[0].reps == 8

    # 2-D G trains (varying gradient + timing) group too
    seq = []
    for i in range(8):
        seq += [epg.G(1.0 + 0.1 * i, [1.0, 0.5 * i]), epg.T(30, 0), epg.ADC]
    plan = engine._build_plan(engine.flatten_sequence(seq))
    blocks = [p for p in plan if isinstance(p, engine._ScanBlock)]
    assert blocks and blocks[0].reps == 8


def test_scanned_float_shifts_match_unrolled():
    """Scan-grouped table shifts produce bit-identical results to the
    unrolled program (carry structure + merge numerics)."""
    rng = np.random.default_rng(3)
    seq = [epg.T(90, 90)]
    for i in range(6):
        seq += [epg.S(float(rng.uniform(1, 5))), epg.T(45, 30 * i),
                epg.E(8.0, 900, 70), epg.ADC]
    a = np.asarray(epg.simulate(seq, kgrid=0.5, max_nstate=48))
    b = np.asarray(epg.simulate(seq, kgrid=0.5, max_nstate=48, scan=False))
    assert np.array_equal(a, b)


def test_asymmetric_op_disables_half_lanes():
    """ScalarOp(check=False) with asymmetric coefficients must NOT take
    the half-ladder lanes path (which assumes F-(k) == conj(F+(-k)));
    the engine falls back to the compat layout and applies the
    asymmetric F- coefficient faithfully."""
    asym = epg.ScalarOp(np.array([0.5, 0.25, 1.0]), check=False)
    assert not asym.preserves_ladder_symmetry
    seq = [epg.T(60, 30), epg.S(1), asym, epg.ADC, epg.Probe("states")]
    _, states = epg.simulate(seq, probe=["F0", "states"])
    # eager reference: direct op application in the compat layout
    sm = epg.StateMatrix(nstate=1)
    for op in (epg.T(60, 30), epg.S(1), asym):
        sm = op(sm)
    assert np.allclose(np.asarray(states)[0], np.asarray(sm.states),
                       atol=1e-12)
    # sanity: the asymmetric coefficient really was applied to F-
    assert not np.allclose(np.asarray(sm.states),
                           np.conj(np.asarray(sm.states)[..., ::-1, :]
                                   [..., (1, 0, 2)]))


def test_asymmetric_combined_op_disables_half_lanes():
    """combine()/@ must propagate preserves_ladder_symmetry from the
    constituents (ADVICE r2 high): an asymmetric check=False ScalarOp
    merged with E must not enable the lanes layout."""
    asym = epg.ScalarOp(np.array([0.5, 0.25, 1.0]), check=False)
    merged = epg.combine(asym, epg.E(5.0, 1000, 80))
    assert not merged.preserves_ladder_symmetry
    seq = [epg.T(60, 30), epg.S(1), merged, epg.Probe("states")]
    (states,) = epg.simulate(seq, probe=["states"])
    sm = epg.StateMatrix(nstate=1)
    for op in (epg.T(60, 30), epg.S(1), asym, epg.E(5.0, 1000, 80)):
        sm = op(sm)
    assert np.allclose(np.asarray(states)[0], np.asarray(sm.states),
                       atol=1e-12)
    # @-composition takes the same path
    assert not (asym @ epg.E(5.0, 1000, 80)).preserves_ladder_symmetry
    # and a fully symmetric product keeps the fast path
    assert (epg.E(5.0, 1000, 80) @ epg.T(30, 0)).preserves_ladder_symmetry


def test_asymmetric_init_disables_half_lanes():
    """StateMatrix(check=False) skips the F-/Z symmetry validation, so
    the engine must not symmetrize such an init via the lanes layout
    (ADVICE r2 medium)."""
    init = np.array([[0.3 + 0.1j, 0.05, 0.2], [0, 0, 1.0], [0.4, 0.7j, 0.1]])
    sm0 = epg.StateMatrix(init, check=False, nstate=2)
    assert not sm0.options["_sym_verified"]
    seq = [epg.T(45, 0), epg.E(5.0, 1000, 80), epg.Probe("states")]
    (states,) = epg.simulate(seq, init=sm0, probe=["states"])
    sm = sm0
    for op in (epg.T(45, 0), epg.E(5.0, 1000, 80)):
        sm = op(sm)
    assert np.allclose(np.asarray(states)[0], np.asarray(sm.states),
                       atol=1e-12)
    # verified inits keep the hint
    assert epg.StateMatrix(nstate=2).options["_sym_verified"]


def test_padded_device_init_disables_half_lanes():
    """A device-array init whose ladder is padded (nstate > given rows)
    used to be converted to NumPy by the padding and then marked
    _sym_verified; the lanes layout would silently symmetrize it."""
    import jax.numpy as jnp

    init = np.array([[0.3 + 0.1j, 0.05, 0.2], [0, 0, 1.0],
                     [0.4, 0.7j, 0.1]])
    sm0 = epg.StateMatrix(jnp.asarray(init), nstate=2)   # pads 3 -> 5 rows
    assert not sm0.options["_sym_verified"]
    seq = [epg.T(45, 0), epg.E(5.0, 1000, 80), epg.Probe("states")]
    (states,) = epg.simulate(seq, init=sm0, probe=["states"])
    sm = epg.StateMatrix(init, check=False, nstate=2)
    for op in (epg.T(45, 0), epg.E(5.0, 1000, 80)):
        sm = op(sm)
    assert np.allclose(np.asarray(states)[0], np.asarray(sm.states),
                       atol=1e-12)


def test_default_device_string_form(monkeypatch):
    """jax_default_device may legally be a platform string; the FISP
    dispatch gate must not assume a Device object."""
    import jax

    jax.config.update("jax_default_device", "cpu")
    try:
        seq = [epg.T(30, 90), epg.E(4.0, 1000, 80), epg.ADC,
               epg.E(8.0, 1000, 80), epg.S(1)] * 2
        sig = epg.simulate(seq, max_nstate=4)
        assert sig.shape[0] == 2 and np.all(np.isfinite(np.abs(sig)))
    finally:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])


def test_asymmetric_recovery_disables_half_lanes():
    """check=False symmetry sniffing must include arr0/mat0 (ADVICE r2
    low): symmetric coefficients with an asymmetric recovery term must
    not report preserves_ladder_symmetry."""
    arr = np.array([0.5, 0.5, 0.8])
    arr0 = np.array([0.1 + 0.2j, 0.3, 0.2])  # asymmetric recovery
    op = epg.ScalarOp(arr, arr0, check=False)
    assert not op.preserves_ladder_symmetry
    # symmetric recovery keeps the fast path
    arr0_sym = np.array([0.1 + 0.2j, 0.1 - 0.2j, 0.2])
    assert epg.ScalarOp(arr, arr0_sym, check=False).preserves_ladder_symmetry
    mat = np.diag([0.5, 0.5, 0.8]).astype(complex)
    mat0 = np.zeros((3, 3), complex)
    mat0[0, 2] = 0.3  # F+ <- Z recovery with no conjugate mirror
    mop = epg.MatrixOp(mat, mat0, check=False)
    assert not mop.preserves_ladder_symmetry


def test_scanned_batch_varying_shifts_match_unrolled():
    """Batch-varying (shift-prune) trains: the coords table pre-expands
    to the full batch shape so the scan carry is invariant."""
    ks = np.array([[0.7], [1.3], [2.1]])
    seq = [epg.T(90, 90)]
    for i in range(5):
        seq += [epg.S(ks * (1 + 0.1 * i)), epg.T(60, 0),
                epg.E(5.0, 1000, 80), epg.ADC]
    a = np.asarray(epg.simulate(seq, kgrid=0.25, max_nstate=32))
    b = np.asarray(epg.simulate(seq, kgrid=0.25, max_nstate=32, scan=False))
    assert a.shape == (5, 3)
    assert np.array_equal(a, b)


def test_getshape_getnshift():
    seq = _cpmg(4)
    assert engine.getnshift(seq) == 8
    assert engine.getshape(seq) == (2,)


def test_adc_times():
    seq = [epg.T(90, 90), epg.Wait(5.0), epg.ADC, epg.Wait(3.0), epg.ADC]
    times, values = epg.simulate(seq, adc_time=True)
    assert np.allclose(times, [5.0, 8.0])


def test_probe_strings():
    seq = [epg.T(90, 90), epg.ADC]
    z = epg.simulate(seq, probe="Z0")
    f = epg.simulate(seq, probe="F0")
    assert np.allclose(z, 0.0)
    assert np.allclose(f, 1.0)


def test_multiple_probes():
    seq = [epg.T(30, 90), epg.ADC]
    f0, z0 = epg.simulate(seq, probe=["F0", "Z0"])
    assert np.allclose(f0, np.sin(np.pi / 6))
    assert np.allclose(z0, np.cos(np.pi / 6))


def test_probe_tuple_expression():
    seq = [epg.T(90, 0), epg.ADC]
    out = epg.simulate(seq, probe="(real(F0), imag(F0))")
    assert out.shape[:2] == (1, 2)
    assert np.allclose(out[0, 0], 0.0)
    assert np.allclose(out[0, 1], -1.0)


def test_adc_attr_weights_reduce():
    T2s = [30.0, 60.0]
    seq = [epg.T(90, 90), epg.E(10, 1000, T2s),
           epg.Adc(weights=[0.25, 0.75], reduce=0)]
    out = epg.simulate(seq)
    expected = 0.25 * np.exp(-10 / 30) + 0.75 * np.exp(-10 / 60)
    assert np.allclose(out, expected)


def test_adc_phase():
    seq = [epg.T(90, 0), epg.Adc(phase=90)]
    out = epg.simulate(seq)
    # F0 = -i, phase +90 multiplies by i -> 1
    assert np.allclose(out, 1.0)


def test_callback_eager():
    norms = []
    seq = [epg.T(90, 90), epg.S(1), epg.T(120, 0), epg.S(1), epg.ADC]
    epg.simulate(seq, callback=lambda sm: norms.append(float(np.asarray(sm.norm)[0])),
                 jit=False)
    assert len(norms) == 4  # every non-probe op
    assert np.allclose(norms, 1.0)


def test_modify():
    seq = [epg.T(90, 90), epg.S(1, duration=2.0), epg.T(180, 0),
           epg.S(1, duration=2.0), epg.ADC]
    seq2 = epg.modify(seq, T1=1000.0, T2=50.0)
    sig = np.asarray(epg.simulate(seq2))
    assert np.allclose(np.abs(sig), np.exp(-4.0 / 50.0))


def test_modify_att():
    seq = [epg.T(90, 0, duration=0.0), epg.ADC]
    seq2 = epg.modify(seq, att=0.5)
    sig = np.asarray(epg.simulate(seq2))
    assert np.allclose(np.abs(sig), np.sin(np.pi / 4))


def test_modify_B1_sweep_expands():
    B1 = np.linspace(0.5, 1.0, 4)
    seq = [epg.T(90, 0, duration=0.0), epg.ADC]
    seq2 = epg.modify(seq, att=B1)
    sig = np.asarray(epg.simulate(seq2))
    assert sig.shape[-1] == 4


def test_combined_matches_sequential():
    """op1 @ op2 equals applying op1 then op2 (reference test_diff.py:504)."""
    sm0 = epg.T(90, 90)(epg.StateMatrix(nstate=1))
    e = epg.E(5, 800, 40, g=0.05)
    t = epg.T(35, 20)
    seq_out = t(e(sm0))
    comb_out = (e @ t)(sm0)
    assert np.allclose(np.asarray(seq_out.states), np.asarray(comb_out.states))


def test_scalar_scalar_combine():
    sm0 = epg.T(90, 90)(epg.StateMatrix())
    e1 = epg.E(5, 800, 40)
    e2 = epg.E(3, 600, 30)
    a = e2(e1(sm0))
    b = (e1 @ e2)(sm0)
    assert np.allclose(np.asarray(a.states), np.asarray(b.states))


def test_multioperator():
    T2s = [30.0, 60.0]
    block = epg.E(4.5, 1400, T2s) * epg.S(1) * epg.T(150, 0)
    assert isinstance(block, epg.MultiOperator)
    assert block.nshift == 1
    seq = [epg.T(90, 90)] + [block, epg.E(4.5, 1400, T2s), epg.S(1), epg.ADC] * 3
    out = np.asarray(epg.simulate(seq))
    assert out.shape == (3, 2)


def test_no_probe_raises():
    with pytest.raises(ValueError):
        epg.simulate([epg.T(90, 90)])


def test_squeeze_sequence():
    """simulate(squeeze=True): adjacent linear ops fold into CombinedOps."""
    from epgpy_tpu import engine
    T2s = [30.0, 60.0]
    seq = [epg.T(90, 90)] + [
        epg.E(4.5, 1400, T2s), epg.S(1), epg.T(150, 0),
        epg.E(4.5, 1400, T2s), epg.S(1), epg.ADC,
    ] * 6
    squeezed = engine.squeeze_sequence(seq)
    assert len(squeezed) < len(engine.flatten_sequence(seq))
    a = np.asarray(epg.simulate(seq))
    b = np.asarray(epg.simulate(seq, squeeze=True))
    assert np.abs(a - b).max() < 1e-12


def test_axes_pinning():
    """axes= places an operator's sweep on a chosen batch axis
    (reference test_functions.py:79-107)."""
    T2s = np.linspace(20, 100, 5)
    out0 = epg.simulate([epg.T(90, 90), epg.E(10, 1000, T2s), epg.ADC])
    out1 = epg.simulate([epg.T(90, 90), epg.E(10, 1000, T2s, axes=1), epg.ADC])
    assert out0.shape[-2:] != out1.shape[-2:] or out0.ndim != out1.ndim
    assert out1.shape[-1] == 5
    assert np.allclose(np.squeeze(out0), np.squeeze(out1))


def test_axes_pinning_multiaxis_scan():
    """axes= on one op composes with an axis-0 sweep on another, through
    the scan-planned lanes path (regression: axes shape collapsed under
    the lanes layout when a coeff's rank exceeded sm.ndim)."""
    alpha = np.linspace(10, 80, 5)
    T2s = np.linspace(30, 120, 4)
    seq = [epg.T(alpha, 90), epg.S(1), epg.E(5.0, 1000.0, T2s, axes=1),
           epg.ADC] * 6
    out = np.asarray(epg.simulate(seq))
    assert out.shape == (6, 5, 4)
    # each T2 column must match an independent 1-axis run at that T2
    ref = np.asarray(epg.simulate(
        [epg.T(alpha, 90), epg.S(1), epg.E(5.0, 1000.0, T2s[2]), epg.ADC] * 6))
    assert np.abs(out[:, :, 2] - ref[:, :]).max() < 1e-12


def test_mixed_batched_scalar_coefficients():
    """E with batched T2 + scalar T1 broadcasts element-form coefficients
    (regression: jnp.stack of unequal component shapes)."""
    T2s = np.asarray([20.0, 40.0, 80.0])
    sm = epg.T(90, 90)(epg.StateMatrix())
    out = epg.E(5.0, 1000.0, T2s)(sm)
    assert np.allclose(np.asarray(out.F0), np.exp(-5.0 / T2s))
    # same through the compiled scan (lanes layout)
    sig = np.asarray(epg.simulate(
        [epg.T(90, 90), epg.E(5.0, 1000.0, T2s), epg.ADC, epg.S(1)] * 4))
    assert sig.shape == (4, 3)
    assert np.allclose(sig[0], np.exp(-5.0 / T2s))


def test_scan_precomputes_relaxation():
    """The planner converts concrete E ops in a scanned block into
    precomputed element coefficients (per-step exp() hoisted out)."""
    from epgpy_tpu.engine import _plan_and_payload, _Const
    from epgpy_tpu.ops.scalarop import PrecomputedDiagonal

    def unwrap(slot):
        return slot.op if isinstance(slot, _Const) else slot

    T2s = np.linspace(30, 120, 4)
    seq = [epg.T(35, 90), epg.E(5.0, 1000.0, T2s), epg.ADC, epg.S(1)] * 6
    kinds, payload = _plan_and_payload(seq, cache=False)
    assert kinds[0][0] == "scan"
    template, stacked = payload[0]
    assert any(isinstance(unwrap(s), PrecomputedDiagonal) for s in stacked)
    # `seq * 6` reuses the same op objects: every slot is rep-invariant and
    # must be hoisted out of the scanned pytree as a constant
    assert all(isinstance(s, _Const) for s in stacked)
    # per-rep varying parameters must stay scanned (stacked leaves)
    seq_var = []
    for i in range(6):
        seq_var += [epg.T(35 + i, 90), epg.E(5.0, 1000.0, T2s),
                    epg.ADC, epg.S(1)]
    _, payload_var = _plan_and_payload(seq_var, cache=False)
    _, stacked_var = payload_var[0]
    assert not isinstance(stacked_var[0], _Const)  # T varies
    assert isinstance(stacked_var[1], _Const)      # E identical every rep
    # tracked (diff) E ops must keep the parameter form
    seq2 = [epg.T(35, 90), epg.E(5.0, 1000.0, T2s, order1=["T2"]),
            epg.ADC, epg.S(1)] * 6
    from epgpy_tpu.diff import substitute
    import jax

    def traced(eps):
        sub = [substitute(op, {"T2": eps}) for op in seq2]
        _, payload2 = _plan_and_payload(sub, cache=False)
        _, stacked2 = payload2[0]
        assert not any(isinstance(unwrap(op), PrecomputedDiagonal)
                       for op in stacked2)
        return eps

    jax.jacfwd(traced)(0.0)


def test_pd_spoiler_reset_in_scan():
    """PD/SPOILER/RESET inside a scanned block (regression: PD's traced
    equilibrium cleared the static _eq_center hint, changing the scan
    carry structure)."""
    seq = [epg.T(50, 0), epg.E(5, 800, 80), epg.SPOILER, epg.ADC,
           epg.PD(0.7), epg.T(30, 0), epg.ADC,
           epg.RESET, epg.T(10, 0), epg.ADC] * 3
    a = np.asarray(epg.simulate(seq))
    b = np.asarray(epg.simulate(seq, scan=False))
    assert np.abs(a - b).max() < 1e-12
    # per block: spoiled echo == 0; PD(0.7)+T(30) echo; RESET+T(10) echo
    assert np.allclose(np.abs(a[0]), 0.0, atol=1e-7)
    assert np.allclose(np.abs(a[1]), 0.7 * np.sin(np.deg2rad(30)), atol=1e-6)
    assert np.allclose(np.abs(a[2]), 0.7 * np.sin(np.deg2rad(10)), atol=1e-6)


def test_system_imaging_flow():
    """System(coords=...) feeds the Imaging probe (reference operator.py:348)."""
    positions = np.linspace(-0.01, 0.01, 7)[:, None]
    seq = [epg.System(coords=positions),
           epg.T(90, 90), epg.S(1, duration=1.0),
           epg.Imaging(reduce=False, voxel_size=2e-3)]
    sig = np.asarray(epg.simulate(seq, kvalue=400.0))
    seq2 = [epg.T(90, 90), epg.S(1, duration=1.0),
            epg.Imaging(positions, reduce=False, voxel_size=2e-3)]
    sig2 = np.asarray(epg.simulate(seq2, kvalue=400.0))
    assert np.abs(sig - sig2).max() < 1e-12


def test_probe_callable():
    seq = [epg.T(30, 90), epg.Probe(lambda sm: sm.Z0 * 2.0)]
    out = epg.simulate(seq)
    assert np.allclose(out, 2 * np.cos(np.pi / 6))


def test_system_kvalue():
    """System can set kvalue mid-sequence."""
    seq = [epg.System(kvalue=123.0), epg.T(90, 90), epg.S(1),
           epg.Probe("k")]
    k = epg.simulate(seq)
    assert np.allclose(np.asarray(k)[0, ..., 0],
                       123.0 * np.arange(-1, 2))


def test_dictionary_io(tmp_path):
    from epgpy_tpu.models.mrf import (fisp_mrf_dictionary, save_dictionary,
                                      load_dictionary)
    FA = np.full(8, 30.0)
    T1s, T2s = np.asarray([500.0, 900.0]), np.asarray([50.0, 80.0])
    re, im = fisp_mrf_dictionary(FA, 12.0, 5.0, T1s, T2s, nstate=4)
    p = tmp_path / "dict.npz"
    save_dictionary(p, re, im, T1s, T2s, FA=FA)
    d = load_dictionary(p)
    assert np.allclose(d["re"], np.asarray(re))
    assert np.allclose(d["FA"], FA)


def test_spgr_scan_groups():
    """RF-spoiled readouts (per-step T phase + Adc phase) scan-compile."""
    n = 24
    phases = np.cumsum(np.arange(n) * 117.0) % 360.0
    seq = []
    for i in range(n):
        seq += [epg.T(15, phases[i]), epg.E(3, 1000, 80),
                epg.Adc(phase=-phases[i]), epg.E(7, 1000, 80), epg.S(1)]
    plan = engine._build_plan(engine.flatten_sequence(seq))
    assert any(isinstance(p, engine._ScanBlock) for p in plan)
    block = [p for p in plan if isinstance(p, engine._ScanBlock)][0]
    assert block.period == 5 and block.reps == n


def test_squeeze_preserves_tracked_ops():
    """squeeze must not merge ops carrying order1 specs (derivatives)."""
    seq = [epg.T(90, 90), epg.E(5, 1000, 50, order1=["T2"]),
           epg.E(3, 1000, 50), epg.ADC]
    squeezed = engine.squeeze_sequence(seq)
    tracked = [op for op in squeezed if getattr(op, "order1", None)]
    assert len(tracked) == 1
    sig, jac = epg.simulate(squeezed, probe=[epg.ADC, epg.Jacobian(["T2"])])
    assert np.abs(jac).max() > 0


def test_modify_semantics_matrix():
    """Reference modify() behavior matrix (reference
    test/test_functions.py:110-193): instance dedup, timing preservation,
    multi-dim expansion, chained modify, expand=False, custom modifiers."""
    import pytest

    pulse = epg.T(90, 0, duration=1.0)
    grad = epg.S(1, duration=5.0)
    seq = [pulse, grad, pulse, epg.ADC]
    assert seq[0] is seq[2]

    # identity modifier returns the ops unchanged
    newseq = epg.modify(seq, lambda op: op)
    assert all(a is b for a, b in zip(newseq, seq))

    # T2-only modifier: shared instances stay shared; timing unchanged
    newseq = epg.modify(seq, T2=100.0)
    assert len(newseq) == len(seq)
    assert newseq[0] is newseq[2]
    assert np.allclose(epg.get_adc_times(seq), epg.get_adc_times(newseq))
    flat = epg.flatten_sequence(newseq)
    # every positive-duration op gains a duration-matched zero-time E
    from epgpy_tpu.ops.evolution import E as Eop
    assert isinstance(flat[1], Eop)
    assert float(np.asarray(flat[1].tau)) == 1.0      # matches T duration
    assert float(np.asarray(flat[1].duration)) == 0.0  # no time added
    assert isinstance(flat[3], Eop)
    assert float(np.asarray(flat[3].tau)) == 5.0      # matches S duration

    # multi-dim expansion: g on axis 1, att on axis 0
    seq1 = [epg.T(90, 90), epg.Wait(1.0), epg.T(90, 90), epg.ADC]
    newseq = epg.modify(seq1, g=[[0.0, 0.25, 0.5]], att=[1.0, 0.5])
    assert epg.getshape(newseq) == (2, 3)
    sig = np.asarray(epg.simulate(newseq))[0]
    assert sig.shape == (2, 3)
    assert np.isclose(sig[0, 0], 0.0, atol=1e-12)   # full inversion
    assert np.isclose(sig[0, 1], 1j)                # saturated on y
    assert np.isclose(sig[0, 2], 0.0, atol=1e-12)
    assert np.isclose(sig[1, 0], 1.0)               # saturated on x
    half = np.asarray(epg.simulate(
        [epg.T(45, 180), epg.T(45, 90), epg.ADC]))
    assert np.isclose(sig[1, 1], half.ravel()[0])

    # chained modify appends axes; expand=False requires matching shape
    seq2 = epg.modify(seq1, T2=[30.0, 40.0])
    assert epg.getshape(seq2) == (2,)
    seq3 = epg.modify(seq2, att=[1.0, 0.9, 0.7])
    assert epg.getshape(seq3) == (2, 3)
    seq4 = epg.modify(seq2, T2=[50.0, 60.0], expand=False)
    assert epg.getshape(seq4) == (2,)
    with pytest.raises(ValueError):
        epg.simulate(epg.modify(seq2, att=[1.0, 0.9, 0.7], expand=False))

    # custom modifier with extra kwargs
    def modifier(op, x):
        from epgpy_tpu.ops.transition import T as Top
        if not isinstance(op, Top):
            return op
        return epg.T(op.alpha, op.phi * np.asarray(x))

    seqc = epg.modify(seq1, modifier, x=0.1)
    assert np.allclose(np.asarray(seqc[0].phi), 9.0)
    seqc = epg.modify(seq1, modifier, x=[0.1, 0.2])
    assert np.allclose(np.asarray(seqc[0].phi), [9.0, 18.0])


def test_simulate_simple_matches_planned():
    """Plain eager loop (reference functions.py:173-192 contract):
    nested [probe values] lists + times; parity with simulate()."""
    import epgpy_tpu as epg

    T2 = np.linspace(30, 90, 3)
    seq = [epg.T(90, 90)] + [epg.S(1, duration=4.5), epg.T(150, 0),
                             epg.S(1, duration=4.5), epg.ADC] * 6
    seq = epg.modify(seq, T1=1400, T2=T2)
    vals, times = epg.simulate_simple(epg.StateMatrix(), seq)
    planned = np.asarray(epg.simulate(seq))
    simple = np.asarray([v[0] for v in vals])
    assert np.abs(simple - planned).max() < 1e-12
    assert np.allclose(np.asarray(times, float), 9.0 * np.arange(1, 7))
    # explicit probes + callback
    calls = []
    vals2, _ = epg.simulate_simple(epg.StateMatrix(), seq,
                                   probes=[epg.ADC, epg.Probe("Z0")],
                                   callback=lambda s: calls.append(1))
    assert len(vals2[0]) == 2 and np.shape(vals2[0][1]) == (3,)
    assert len(calls) == len(epg.flatten_sequence(seq)) - 6


def test_simulate_simple_float_shift_capacity():
    """simulate_simple must size float-shift (table/merge) trains from
    the state's options (kgrid/max_nstate counted in grid cells), not
    the bare shift count -- otherwise the eager oracle truncates far
    below simulate() and silently diverges (r3 review finding)."""
    import epgpy_tpu as epg

    seq = []
    for _ in range(8):
        seq += [epg.T(30, 90), epg.S(0.31), epg.ADC]
    planned = np.asarray(epg.simulate(seq, kgrid=0.01, max_nstate=300))
    sm = epg.StateMatrix(kgrid=0.01, max_nstate=300)
    vals, _ = epg.simulate_simple(sm, seq)
    simple = np.asarray([v[0] for v in vals]).reshape(-1)
    assert np.abs(simple - planned.reshape(-1)).max() < 1e-10


def test_negative_kvalue_capacity():
    """kvalue's sign must not produce a negative dense-grid capacity
    (r3 review finding: the dense gate passed a nonpositive bound
    through and StateMatrix blew up on a negative nstate)."""
    import epgpy_tpu as epg

    seq = []
    for _ in range(6):
        seq += [epg.T(30, 90), epg.S(0.31), epg.ADC]
    pos = np.asarray(epg.simulate(seq, kgrid=0.01, max_nstate=300,
                                  kvalue=1.0))
    neg = np.asarray(epg.simulate(seq, kgrid=0.01, max_nstate=300,
                                  kvalue=-1.0))
    # mirrored wavenumbers: same magnitudes at readout
    assert np.abs(np.abs(neg) - np.abs(pos)).max() < 1e-10


def test_capacity_scales_with_kvalue():
    """The lattice bound counts grid cells of |k * kvalue| / kgrid
    (physical wavenumbers), so kvalue rescales the float-shift bound."""
    from epgpy_tpu import engine
    import epgpy_tpu as epg

    seq = [epg.S(0.5) for _ in range(20)]
    small = engine._capacity(seq, 20, 4096, kgrid=0.1, kvalue=1.0)
    big = engine._capacity(seq, 20, 4096, kgrid=0.1, kvalue=10.0)
    negated = engine._capacity(seq, 20, 4096, kgrid=0.1, kvalue=-10.0)
    assert small == 101 and big == 1001 and negated == big


def test_batch_varying_int_shifts_scan():
    """Batch-varying INTEGER shifts run the vmapped float-merge path:
    the coords carry must be float from op 0 so scan planning works
    (was: int table installed, merge output float, carry dtype flip).
    Exact parity vs the unrolled engine."""
    import epgpy_tpu as epg

    kv = np.array([[1], [2], [3]])
    seq = []
    for _ in range(8):                    # >= 3 reps so the train scans
        seq += [epg.T(30, 90), epg.E(5.0, 800.0, 80.0), epg.S(kv.copy()),
                epg.ADC]
    planned = np.asarray(epg.simulate(seq, max_nstate=30))
    unrolled = np.asarray(epg.simulate(seq, max_nstate=30, scan=False))
    assert planned.shape == (8, 3)
    assert np.allclose(planned, unrolled, atol=1e-12)


def test_nstate_option_capacity_floor():
    """simulate(nstate=N) is a capacity floor (reference StateMatrix
    kwarg), not a duplicate-keyword crash."""
    import epgpy_tpu as epg

    seq = [epg.T(90, 90)] + [epg.S(1), epg.T(150, 0), epg.S(1),
                             epg.ADC] * 4
    lo = np.asarray(epg.simulate(list(seq)))
    hi = np.asarray(epg.simulate(list(seq), nstate=32))
    assert np.allclose(lo, hi, atol=1e-12)


def test_kernel_vmem_gate():
    """Oversized ladders decline the fused kernels (Mosaic would fail
    at the 100 MB vmem limit) and the train falls through to the
    planner with identical results."""
    import epgpy_tpu as epg
    from epgpy_tpu import fisp_dispatch

    assert fisp_dispatch.kernel_fits_vmem(6, 10)
    assert fisp_dispatch.kernel_fits_vmem(24, 1000)
    assert not fisp_dispatch.kernel_fits_vmem(24, 10000)
    assert not fisp_dispatch.kernel_fits_vmem(54, 100, lanes=131072)

    # integration: shrink the budget so even a small train is "too big"
    T2s = np.linspace(40.0, 120.0, 4)
    def train():
        seq = []
        for i in range(12):
            seq += [epg.T(30.0 + i, 90), epg.E(5.0, 800.0, T2s), epg.ADC,
                    epg.E(7.0, 800.0, T2s), epg.S(1)]
        return seq
    want = np.asarray(epg.simulate(train(), max_nstate=8,
                                   fisp_kernel=False))
    old = fisp_dispatch._KERNEL_VMEM_BUDGET
    try:
        fisp_dispatch._KERNEL_VMEM_BUDGET = 1
        got = np.asarray(epg.simulate(train(), max_nstate=8,
                                      fisp_kernel="force"))
    finally:
        fisp_dispatch._KERNEL_VMEM_BUDGET = old
    assert np.allclose(got, want, atol=1e-10)


def test_adc_time_type_consistent_across_paths():
    """simulate(adc_time=True) returns the same times type (list when
    asarray=False, ndarray otherwise) whether the train routes to a
    fused kernel or the planner."""
    import epgpy_tpu as epg

    def train():
        seq = []
        for i in range(8):
            seq += [epg.T(30.0 + i, 90, duration=0.1),
                    epg.E(5.0, 800.0, 80.0, duration=True), epg.ADC,
                    epg.E(7.0, 800.0, 80.0, duration=True), epg.S(1)]
        return seq

    for fk in ("force", False):
        t_arr, _ = epg.simulate(train(), max_nstate=8, adc_time=True,
                                fisp_kernel=fk)
        assert isinstance(t_arr, np.ndarray), fk
        t_raw, _ = epg.simulate(train(), max_nstate=8, adc_time=True,
                                asarray=False, fisp_kernel=fk)
        assert isinstance(t_raw, list), fk
    assert np.allclose(t_arr, [0.1 + 5.0 + 12.1 * i for i in range(8)])


def test_batch_varying_2d_int_shifts_reference_parity():
    """kdim=2 batch-varying integer shifts through the vmapped merge,
    with capacity truncation active, against the reference."""
    import sys
    import epgpy_tpu as epg
    sys.path.insert(0, "/root/reference")
    import epgpy as ref

    kv = np.array([[1, 0], [2, 1], [3, -1]])

    def build(mod):
        seq = []
        for _ in range(6):
            seq += [mod.T(30, 90), mod.E(5.0, 800.0, 80.0),
                    mod.S(kv.copy()), mod.ADC]
        return seq

    ours = np.asarray(epg.simulate(build(epg), max_nstate=40))
    theirs = np.asarray(ref.simulate(build(ref), max_nstate=40))
    assert ours.shape == theirs.shape == (6, 3)
    assert np.abs(ours - theirs).max() < 1e-12
