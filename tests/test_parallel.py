"""Multi-device tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from epgpy_tpu.parallel import (
    make_mesh, atom_sharding, crlb_train_step, fingerprint_crlb_loss,
    dictionary_match,
)
from epgpy_tpu.models import mrf


def test_make_mesh(cpu_devices):
    mesh = make_mesh(cpu_devices, axes=("atoms", "tangents"), shape=(4, 2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("atoms", "tangents")


def test_crlb_loss_sharded_equals_single(cpu_devices):
    FA = jnp.asarray(np.linspace(20, 60, 8), jnp.float64)
    T1s = jnp.asarray(np.linspace(400, 1400, 8))
    T2s = jnp.asarray(np.linspace(40, 110, 8))

    mesh1 = make_mesh(cpu_devices[:1], axes=("atoms",))
    mesh8 = make_mesh(cpu_devices, axes=("atoms", "tangents"), shape=(4, 2))

    l1 = fingerprint_crlb_loss(FA, T1s, T2s, mesh1, nstate=3, fa_weight=0.0)
    l8 = fingerprint_crlb_loss(FA, T1s, T2s, mesh8, nstate=3, fa_weight=0.0)
    assert np.allclose(np.asarray(l1), np.asarray(l8), rtol=1e-9)


def test_crlb_fa_block_nondivisible_train(cpu_devices):
    """Train length not divisible by the tangents axis: the tangent
    chunks zero-pad + trim, so the FA-train CRLB term must equal the
    single-device (unsharded-tangent) value."""
    FA = jnp.asarray(np.linspace(20, 60, 7), jnp.float64)   # 7 % 2 != 0
    T1s = jnp.asarray(np.linspace(400, 1400, 8))
    T2s = jnp.asarray(np.linspace(40, 110, 8))

    mesh2 = make_mesh(cpu_devices, axes=("atoms", "tangents"), shape=(4, 2))
    mesh1 = make_mesh(cpu_devices[:4].reshape(4, 1)
                      if hasattr(cpu_devices, "reshape") else
                      cpu_devices[:4], axes=("atoms", "tangents"),
                      shape=(4, 1))

    l2 = fingerprint_crlb_loss(FA, T1s, T2s, mesh2, nstate=3, fa_weight=1.0)
    l1 = fingerprint_crlb_loss(FA, T1s, T2s, mesh1, nstate=3, fa_weight=1.0)
    assert np.allclose(np.asarray(l1), np.asarray(l2), rtol=1e-9)


def test_crlb_train_step(cpu_devices):
    mesh = make_mesh(cpu_devices, axes=("atoms", "tangents"), shape=(4, 2))
    FA = jnp.asarray(np.linspace(20, 60, 8))
    T1s = jnp.asarray(np.linspace(400, 1400, 8))
    T2s = jnp.asarray(np.linspace(40, 110, 8))
    new_FA, loss = jax.jit(
        lambda fa, t1, t2: crlb_train_step(fa, t1, t2, mesh, lr=0.1, nstate=3)
    )(FA, T1s, T2s)
    assert np.isfinite(np.asarray(loss))
    assert not np.allclose(np.asarray(new_FA), np.asarray(FA))
    # gradient descent: a small step along -grad must not increase the loss
    l2 = fingerprint_crlb_loss(new_FA, T1s, T2s, mesh, nstate=3)
    assert np.asarray(l2) <= np.asarray(loss) * (1 + 1e-6)


def test_sharded_shift_prune_matches_single(cpu_devices):
    """Spatially-resolved (batch-varying float shift) trains shard over
    the atom axis: per-atom coordinate tables are independent, so the
    shard_mapped program needs no collectives and matches the
    single-device result bit-exactly."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    import epgpy_tpu as epg

    natoms = 16
    ks = np.linspace(0.6, 2.2, natoms)[:, None]  # per-atom shift (rad/m)

    def train(kvals):
        seq = [epg.T(90, 90)]
        for i in range(4):
            seq += [epg.S(kvals * (1 + 0.2 * i)), epg.T(50, 30 * i),
                    epg.E(8.0, 900, 70), epg.ADC]
        out = epg.simulate(seq, kgrid=0.25, max_nstate=24, asarray=False)
        return out["__c_re"], out["__c_im"]

    ref_re, ref_im = jax.jit(lambda: train(ks))()

    mesh = make_mesh(cpu_devices, axes=("atoms",))
    # check_vma=False: the scan carry starts unvarying (equilibrium
    # constants) and becomes atoms-varying at the first per-atom shift,
    # which the static varying-axes checker cannot express
    sharded = jax.jit(shard_map(
        train, mesh=mesh, in_specs=(P("atoms"),),
        out_specs=(P(None, "atoms"), P(None, "atoms")),
        check_vma=False,
    ))
    out_re, out_im = sharded(jnp.asarray(ks))
    assert np.array_equal(np.asarray(out_re), np.asarray(ref_re))
    assert np.array_equal(np.asarray(out_im), np.asarray(ref_im))


def test_dictionary_match(cpu_devices):
    FA = np.linspace(10, 60, 24)
    T1s = np.linspace(300, 1500, 16)
    T2s = np.linspace(30, 120, 16)
    re, im = mrf.fisp_mrf_dictionary(FA, 12.0, 5.0, T1s, T2s, nstate=4,
                                     normalize=True)
    re, im = jnp.asarray(re), jnp.asarray(im)
    # query with noisy copies of atoms 3 and 11
    rng = np.random.default_rng(0)
    sig_re = np.stack([re[3], re[11]]) + 1e-4 * rng.normal(size=(2, 24))
    sig_im = np.stack([im[3], im[11]]) + 1e-4 * rng.normal(size=(2, 24))

    idx0, val0 = dictionary_match(re, im, jnp.asarray(sig_re), jnp.asarray(sig_im))
    assert list(np.asarray(idx0)) == [3, 11]

    mesh = make_mesh(cpu_devices, axes=("atoms",))
    idx1, val1 = dictionary_match(re, im, jnp.asarray(sig_re),
                                  jnp.asarray(sig_im), mesh)
    assert list(np.asarray(idx1)) == [3, 11]
    assert np.allclose(np.asarray(val0), np.asarray(val1))


def test_compressed_dictionary_match(cpu_devices):
    """SVD compression (McGivney 2014): rank-r matching recovers the
    same atoms as the full-length match, and the captured singular
    energy bounds the correlation error."""
    from epgpy_tpu.parallel import compress_dictionary, project_signals

    FA = np.linspace(10, 60, 48)
    T1g, T2g = np.meshgrid(np.linspace(300, 1500, 12),
                           np.linspace(30, 120, 12))
    re, im = mrf.fisp_mrf_dictionary(FA, 12.0, 5.0, T1g.ravel(), T2g.ravel(),
                                     nstate=4, normalize=True)
    re, im = jnp.asarray(re), jnp.asarray(im)
    rng = np.random.default_rng(1)
    picks = [7, 55, 101]
    sig_re = np.asarray(re)[picks] + 1e-4 * rng.normal(size=(3, 48))
    sig_im = np.asarray(im)[picks] + 1e-4 * rng.normal(size=(3, 48))

    idx0, val0 = dictionary_match(re, im, jnp.asarray(sig_re),
                                  jnp.asarray(sig_im))
    comp = compress_dictionary(re, im, 12)
    assert comp["energy"] > 0.9999
    assert comp["cdict_re"].shape == (144, 12)
    cs = project_signals(comp["basis_re"], comp["basis_im"],
                         jnp.asarray(sig_re), jnp.asarray(sig_im))
    idx1, val1 = dictionary_match(comp["cdict_re"], comp["cdict_im"],
                                  cs[0], cs[1])
    assert list(np.asarray(idx1)) == list(np.asarray(idx0)) == picks
    # inner products preserved up to the discarded energy
    assert np.allclose(np.asarray(val1), np.asarray(val0), atol=5e-3)

    # full-rank compression is exact (up to roundoff)
    full = compress_dictionary(re, im, 48)
    csf = project_signals(full["basis_re"], full["basis_im"],
                          jnp.asarray(sig_re), jnp.asarray(sig_im))
    _, valf = dictionary_match(full["cdict_re"], full["cdict_im"],
                               csf[0], csf[1])
    assert np.allclose(np.asarray(valf), np.asarray(val0), atol=1e-10)

    # sharded match over the compressed dictionary == single device
    mesh = make_mesh(cpu_devices, axes=("atoms",))
    idx2, val2 = dictionary_match(comp["cdict_re"], comp["cdict_im"],
                                  cs[0], cs[1], mesh)
    assert list(np.asarray(idx2)) == picks
    assert np.allclose(np.asarray(val2), np.asarray(val1))


def test_graft_entry():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    re, im = out
    assert re.shape == (16, 32)

    ge.dryrun_multichip(8)


def test_general_engine_sharding_propagates(cpu_devices):
    """simulate() is SPMD-transparent: sharded op parameters shard the
    whole program (GSPMD propagation), bit-identical to single device."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

    T2s = np.linspace(20.0, 100.0, 64)
    import epgpy_tpu as epg

    seq_plain = [epg.T(90, 90)] + [
        epg.E(4.5, 1400, T2s), epg.S(1), epg.T(150, 0),
        epg.E(4.5, 1400, T2s), epg.S(1), epg.ADC] * 8
    ref = np.asarray(epg.simulate(seq_plain))

    mesh = Mesh(np.array(cpu_devices), ("atoms",))
    sh = NamedSharding(mesh, PS("atoms"))
    T2sh = jax.device_put(jnp.asarray(T2s), sh)
    seq_sh = [epg.T(90, 90)] + [
        epg.E(4.5, 1400, T2sh), epg.S(1), epg.T(150, 0),
        epg.E(4.5, 1400, T2sh), epg.S(1), epg.ADC] * 8
    out = epg.simulate(seq_sh, asarray=False)
    # output stays sharded over the atom axis (GSPMD propagated)
    leaf = jax.tree.leaves(out)[0]
    assert not leaf.sharding.is_fully_replicated
    dec = epg.simulate(seq_sh)
    assert np.abs(dec - ref).max() < 1e-12


@pytest.mark.slow
def test_mrf_design_slsqp_hard_constraints(cpu_devices):
    """SLSQP-driven design (reference optim_mrf.py:119-156 fidelity):
    the |dFA| <= 1 smoothness constraint and the box bounds must hold
    EXACTLY on the converged train (not softly), and the CRLB must not
    increase."""
    from epgpy_tpu.parallel import mrf_design_slsqp, mrf_design_loss
    from epgpy_tpu.parallel.crlb import FA_BOUNDS, TR_BOUNDS

    nTR = 48
    mesh = make_mesh(cpu_devices, axes=("atoms",))
    rng = np.random.default_rng(7)
    # deliberately rough init: large FA jumps that SLSQP must smooth
    FA0 = np.clip(30 + 25 * np.sin(np.arange(nTR) * 1.7)
                  + rng.uniform(-5, 5, nTR), *FA_BOUNDS)
    TR0 = np.clip(rng.uniform(11.5, 14.5, nTR), *TR_BOUNDS)
    T1s = jnp.asarray(rng.uniform(400, 1600, 8))
    T2s = jnp.asarray(rng.uniform(40, 120, 8))

    loss0 = float(mrf_design_loss(jnp.asarray(FA0), jnp.asarray(TR0),
                                  T1s, T2s, mesh, nstate=5))
    FA, TR, res = mrf_design_slsqp(FA0, TR0, T1s, T2s, mesh,
                                   maxiter=60, nstate=5)
    if res.status != 0:
        # SLSQP only guarantees feasibility at convergence; a different
        # scipy/platform trajectory may stop early on maxiter
        pytest.skip(f"SLSQP did not converge in 60 iters: {res.message}")
    dFA = np.diff(FA, prepend=FA[0])
    assert np.abs(dFA).max() <= 1.0 + 1e-9, np.abs(dFA).max()
    assert FA.min() >= FA_BOUNDS[0] - 1e-9
    assert FA.max() <= FA_BOUNDS[1] + 1e-9
    assert TR.min() >= TR_BOUNDS[0] - 1e-9
    assert TR.max() <= TR_BOUNDS[1] + 1e-9
    loss1 = float(mrf_design_loss(jnp.asarray(FA), jnp.asarray(TR),
                                  T1s, T2s, mesh, nstate=5))
    assert np.isfinite(loss1) and loss1 <= loss0 * (1 + 1e-9)


def test_mrf_design_400tr(cpu_devices):
    """Reference-scale constrained CRLB design: 400 TRs, 800 parameters
    (FA + TR with box constraints), sharded over the atom mesh
    (reference examples/sequence/optim_mrf.py:39-156).  Three projected-
    gradient steps must decrease the CRLB monotonically and keep every
    parameter inside its bounds."""
    from epgpy_tpu.parallel import mrf_design_step
    from epgpy_tpu.parallel.crlb import FA_BOUNDS, TR_BOUNDS

    nTR = 400
    mesh = make_mesh(cpu_devices, axes=("atoms",))
    rng = np.random.default_rng(3)
    FA = jnp.asarray(np.clip(
        np.sin(np.arange(1, nTR + 1) * np.pi / 300) * 50 + 10, 10, 60))
    TR = jnp.asarray(rng.uniform(11.5, 14.5, nTR))
    T1s = jnp.asarray(rng.uniform(400, 1600, 8))
    T2s = jnp.asarray(rng.uniform(40, 120, 8))

    step = jax.jit(lambda fa, tr: mrf_design_step(
        fa, tr, T1s, T2s, mesh, nstate=10, smooth_weight=1e-3,
        lr_fa=2.0, lr_tr=0.1))
    losses = []
    for _ in range(3):
        FA, TR, loss = step(FA, TR)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[0] > losses[1] > losses[2], losses
    FA_h, TR_h = np.asarray(FA), np.asarray(TR)
    assert FA_h.shape == (nTR,) and TR_h.shape == (nTR,)
    assert FA_h.min() >= FA_BOUNDS[0] and FA_h.max() <= FA_BOUNDS[1]
    assert TR_h.min() >= TR_BOUNDS[0] and TR_h.max() <= TR_BOUNDS[1]


def test_diff_path_sharding_propagates(cpu_devices):
    """The Jacobian/Hessian path is SPMD-transparent too: sharded op
    parameters shard the jacfwd program (GSPMD propagation through
    simulate_diff), bit-identical to the single-device result.  The
    scaled-CRLB product surface: dS/d(T1,T2) over a sharded atom grid
    with asarray=False keeps the Jacobian sharded on device."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

    T2s = np.linspace(20.0, 100.0, 64)
    import epgpy_tpu as epg

    def build(T2arr):
        return [epg.T(90, 90)] + [
            epg.E(4.5, 1400, T2arr, order1=["T1", "T2"]), epg.S(1),
            epg.T(150, 0), epg.E(4.5, 1400, T2arr, order1=["T1", "T2"]),
            epg.S(1), epg.ADC] * 8

    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    ref_sig, ref_jac = epg.simulate(build(T2s), probe=probes)

    mesh = Mesh(np.array(cpu_devices), ("atoms",))
    sh = NamedSharding(mesh, PS("atoms"))
    T2sh = jax.device_put(jnp.asarray(T2s), sh)
    seq_sh = build(T2sh)
    out = epg.simulate(seq_sh, probe=probes, asarray=False)
    # Jacobian output stays sharded over the atom axis
    jleaf = out[1]["__c_re"]
    assert not jleaf.sharding.is_fully_replicated
    sig, jac = epg.simulate(seq_sh, probe=probes)
    assert np.abs(sig - ref_sig).max() < 1e-12
    assert np.abs(jac - ref_jac).max() < 1e-12


def test_warm_serving_tool_dictionary_stage():
    """tools/warm_serving must stay importable and runnable at toy
    shapes (the dictionary stage is backend-agnostic; the Pallas
    stages are TPU-only and exercised by the serving docs flow)."""
    import importlib.util
    import os
    import sys

    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "warm_serving.py")
    spec = importlib.util.spec_from_file_location("warm_serving_t", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["warm_serving_t"] = mod
    spec.loader.exec_module(mod)
    out = mod.warm_serving(natoms=64, npulse=16, nstate=4, nvox=32,
                           rank=4, stages=("dictionary", "recon"),
                           steady_repeats=1)
    assert set(out) == {"dictionary", "compress", "recon"}
    assert out["dictionary"]["cold_seconds"] > 0
