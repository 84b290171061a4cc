"""End-to-end MRF reconstruction pipeline (parallel/recon.py).

The serving step the reference never had: normalize -> [compress] ->
match -> PD scale -> [Gauss-Newton refine], sharded over the mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import epgpy_tpu as epg
from epgpy_tpu.models.mrf import fisp_mrf_dictionary
from epgpy_tpu.parallel import (compress_dictionary, gauss_newton_refine,
                                make_mesh, mrf_reconstruct,
                                streamed_compress_dictionary)

P = 60
FA = 10 + 50 * np.abs(np.sin(np.arange(P) * 2 * np.pi / 250))
TRv, TEv = 12.0, 5.0


@pytest.fixture(scope="module")
def dict_and_grid():
    T1g = np.linspace(300, 1800, 12)
    T2g = np.linspace(30, 180, 10)
    grid = np.stack(np.meshgrid(T1g, T2g, indexing="ij"), -1).reshape(-1, 2)
    grid = grid[grid[:, 1] < 0.8 * grid[:, 0]]
    dre, dim = fisp_mrf_dictionary(FA, TRv, TEv, grid[:, 0], grid[:, 1])
    return np.asarray(dre), np.asarray(dim), grid


def _observations(dre, dim, grid, nvox, rng, noise=1e-4):
    """On-grid voxels with random complex PD scales + noise."""
    pick = rng.integers(0, len(grid), nvox)
    pd = rng.uniform(0.5, 2.0, nvox) * np.exp(2j * np.pi * rng.random(nvox))
    d = dre[pick] + 1j * dim[pick]
    sig = pd[:, None] * d
    sig += noise * (rng.normal(size=sig.shape)
                    + 1j * rng.normal(size=sig.shape))
    return pick, pd, sig.real.copy(), sig.imag.copy()


def test_reconstruct_recovers_maps_and_pd(dict_and_grid):
    dre, dim, grid = dict_and_grid
    rng = np.random.default_rng(3)
    pick, pd, sre, sim = _observations(dre, dim, grid, 40, rng)

    out = mrf_reconstruct(sre, sim, dre, dim, grid)
    assert np.array_equal(np.asarray(out["index"]), pick)
    assert np.allclose(np.asarray(out["maps"]), grid[pick])
    assert np.all(np.asarray(out["corr"]) > 0.999)
    pd_hat = np.asarray(out["pd_re"]) + 1j * np.asarray(out["pd_im"])
    assert np.allclose(pd_hat, pd, rtol=1e-2, atol=1e-3)


def test_reconstruct_compressed_matches_full(dict_and_grid):
    dre, dim, grid = dict_and_grid
    rng = np.random.default_rng(4)
    pick, _, sre, sim = _observations(dre, dim, grid, 32, rng)

    full = mrf_reconstruct(sre, sim, dre, dim, grid)
    comp = mrf_reconstruct(sre, sim, dre, dim, grid, rank=24)
    assert comp["energy"] > 0.9999
    assert np.array_equal(np.asarray(comp["index"]),
                          np.asarray(full["index"]))
    assert np.allclose(np.asarray(comp["pd_re"]),
                       np.asarray(full["pd_re"]), atol=1e-10)


def test_reconstruct_compression_reuse_under_jit(dict_and_grid):
    """Serving idiom: compress once, then jit steady-state batches."""
    dre, dim, grid = dict_and_grid
    rng = np.random.default_rng(7)
    pick, _, sre, sim = _observations(dre, dim, grid, 16, rng)

    first = mrf_reconstruct(sre, sim, dre, dim, grid, rank=24)
    comp = first["compression"]

    run = jax.jit(lambda a, b: mrf_reconstruct(
        a, b, jnp.asarray(dre), jnp.asarray(dim), grid, compression=comp))
    out = run(sre, sim)
    assert np.array_equal(np.asarray(out["index"]),
                          np.asarray(first["index"]))
    assert np.allclose(np.asarray(out["maps"]), np.asarray(first["maps"]))
    assert np.allclose(np.asarray(out["pd_re"]),
                       np.asarray(first["pd_re"]), atol=1e-12)


def test_reconstruct_sharded_bit_exact(dict_and_grid):
    dre, dim, grid = dict_and_grid
    cpus = jax.devices("cpu")[:8]
    mesh = make_mesh(cpus, axes=("atoms",))
    rng = np.random.default_rng(5)
    # pad the dictionary to a multiple of the mesh size
    B = dre.shape[0]
    Bpad = -(-B // 8) * 8
    padre = np.concatenate([dre, np.zeros((Bpad - B, P))])
    padim = np.concatenate([dim, np.zeros((Bpad - B, P))])
    gridp = np.concatenate([grid, np.zeros((Bpad - B, 2))])
    pick, _, sre, sim = _observations(dre, dim, grid, 24, rng)

    single = mrf_reconstruct(sre, sim, padre, padim, gridp)
    sharded = mrf_reconstruct(sre, sim, padre, padim, gridp, mesh=mesh)
    assert np.array_equal(np.asarray(single["index"]),
                          np.asarray(sharded["index"]))
    # corr values may differ in final ulps (the sharded program fuses
    # differently); the decision -- the matched index -- must not
    assert np.allclose(np.asarray(single["corr"]),
                       np.asarray(sharded["corr"]), rtol=0, atol=1e-12)


def test_gauss_newton_refine_off_grid(dict_and_grid):
    dre, dim, grid = dict_and_grid
    rng = np.random.default_rng(6)
    nvox = 12
    T1t = rng.uniform(400, 1600, nvox)
    T2t = np.minimum(rng.uniform(40, 160, nvox), 0.6 * T1t)

    def signal(T1, T2):
        r, i = fisp_mrf_dictionary(FA, TRv, TEv, T1, T2)
        return np.asarray(r).T, np.asarray(i).T          # (P, V)

    tre, tim = signal(T1t, T2t)

    out = mrf_reconstruct(tre.T, tim.T, dre, dim, grid)
    theta0 = np.asarray(out["maps"]).T                   # (2, V)
    err0 = np.hypot(theta0[0] - T1t, theta0[1] - T2t)

    def signal_and_jac(theta):
        T1, T2 = theta
        seq = []
        for k in range(P):
            seq += [epg.T(float(FA[k]), 90.0),
                    epg.E(TEv, T1, T2, order1=["T1", "T2"]),
                    epg.ADC,
                    epg.E(TRv - TEv, T1, T2, order1=["T1", "T2"]),
                    epg.S(1)]
        sig, jac = epg.simulate(
            seq, max_nstate=10,
            probe=[epg.ADC, epg.Jacobian(["T1", "T2"])])
        sig, jac = np.asarray(sig), np.asarray(jac)
        return (sig.real, sig.imag), (jac.real, jac.imag)

    theta = gauss_newton_refine(
        signal_and_jac, theta0, tre, tim, iters=5,
        bounds=[(200, 2000), (20, 250)])
    err1 = np.hypot(theta[0] - T1t, theta[1] - T2t)
    assert err1.mean() < 0.2 * err0.mean(), (err0.mean(), err1.mean())
    assert np.abs(theta[0] - T1t).max() < 5.0
    assert np.abs(theta[1] - T2t).max() < 1.0

    # unknown complex proton density: scale the observations and fit
    # with the per-iteration closed-form scale (variable projection)
    rng2 = np.random.default_rng(8)
    pd = (rng2.uniform(0.5, 2.0, nvox)
          * np.exp(2j * np.pi * rng2.random(nvox)))
    scaled = (tre + 1j * tim) * pd[None, :]
    theta2 = gauss_newton_refine(
        signal_and_jac, theta0, scaled.real, scaled.imag, iters=5,
        bounds=[(200, 2000), (20, 250)], solve_scale=True)
    err2 = np.hypot(theta2[0] - T1t, theta2[1] - T2t)
    assert err2.mean() < 0.2 * err0.mean(), (err0.mean(), err2.mean())


def test_streamed_compression_matches_full(dict_and_grid):
    """Blockwise two-pass compression == one-shot compression of the
    normalized full dictionary (same Gram, same subspace), and the
    dictionary-free reconstruction path recovers index/maps/PD."""
    dre, dim, grid = dict_and_grid
    B = dre.shape[0]
    cuts = [0, B // 3, B // 3 + B // 4, B]          # uneven blocks

    def generate(i):
        a, b = cuts[i], cuts[i + 1]
        return dre[a:b], dim[a:b]

    comp = streamed_compress_dictionary(generate, 3, 24)

    norms = np.sqrt((dre ** 2 + dim ** 2).sum(-1))
    assert np.allclose(np.asarray(comp["norms"]), norms, rtol=1e-12)

    ref = compress_dictionary(dre / norms[:, None], dim / norms[:, None], 24)
    assert abs(comp["energy"] - ref["energy"]) < 1e-9

    # bases agree up to intra-subspace rotation: compare the projected
    # atoms' pairwise Gram (rotation-invariant) instead of the basis
    cd = np.asarray(comp["cdict_re"]) + 1j * np.asarray(comp["cdict_im"])
    rd = np.asarray(ref["cdict_re"]) + 1j * np.asarray(ref["cdict_im"])
    assert np.allclose(cd @ cd.conj().T, rd @ rd.conj().T, atol=1e-8)

    # dictionary-free serving: match + maps + PD without the (B, P) dict
    rng = np.random.default_rng(11)
    pick, pd, sre, sim = _observations(dre, dim, grid, 32, rng)
    free = mrf_reconstruct(sre, sim, None, None, grid, compression=comp)
    full = mrf_reconstruct(sre, sim, dre, dim, grid)
    assert np.array_equal(np.asarray(free["index"]),
                          np.asarray(full["index"]))
    assert np.allclose(np.asarray(free["maps"]), np.asarray(full["maps"]))
    pd_free = np.asarray(free["pd_re"]) + 1j * np.asarray(free["pd_im"])
    # exact up to the discarded singular energy (1 - energy ~ 1e-5)
    assert np.allclose(pd_free, pd, rtol=2e-2, atol=1e-3)

    # single block == multi block
    one = streamed_compress_dictionary(lambda i: (dre, dim), 1, 24)
    assert abs(one["energy"] - comp["energy"]) < 1e-9

    with pytest.raises(ValueError):
        mrf_reconstruct(sre, sim, None, None, grid)
    with pytest.raises(ValueError):
        streamed_compress_dictionary(generate, 0, 24)


def test_compression_save_load_roundtrip(dict_and_grid, tmp_path):
    """The compression artifact round-trips through one .npz and
    serves identically (index/maps/PD bit-equal)."""
    from epgpy_tpu.parallel import load_compression, save_compression

    dre, dim, grid = dict_and_grid
    comp = streamed_compress_dictionary(lambda i: (dre, dim), 1, 24)
    path = tmp_path / "comp.npz"
    save_compression(path, comp)
    comp2 = load_compression(path)
    assert set(comp2) == set(comp)
    assert abs(comp2["energy"] - comp["energy"]) < 1e-15

    rng = np.random.default_rng(13)
    _, _, sre, sim = _observations(dre, dim, grid, 16, rng)
    a = mrf_reconstruct(sre, sim, None, None, grid, compression=comp)
    b = mrf_reconstruct(sre, sim, None, None, grid, compression=comp2)
    assert np.array_equal(np.asarray(a["index"]), np.asarray(b["index"]))
    assert np.array_equal(np.asarray(a["pd_re"]), np.asarray(b["pd_re"]))
    assert np.array_equal(np.asarray(a["maps"]), np.asarray(b["maps"]))


@pytest.mark.parametrize("case", range(6))
def test_fuzz_serving_pipeline(case):
    """Random dictionary shapes / ranks / noise: the compressed match
    must agree with full-length matching at sufficient rank, the
    sharded serve must agree with single-device, and the recovered PD
    must reconstruct the observation."""
    rng = np.random.default_rng(500 + case)
    B = int(rng.integers(60, 300))
    P = int(rng.integers(40, 160))
    V = int(rng.integers(5, 40))
    rank = int(rng.integers(P // 3, P // 2))
    dre = rng.standard_normal((B, P)).astype(np.float32)
    dim = rng.standard_normal((B, P)).astype(np.float32)
    grid = rng.uniform(10, 2000, (B, 2)).astype(np.float32)
    pick = rng.integers(0, B, V)
    pd = (rng.uniform(0.5, 2.0, V)
          * np.exp(2j * np.pi * rng.random(V))).astype(np.complex64)
    obs = (dre[pick] + 1j * dim[pick]) * pd[:, None]
    obs += 1e-4 * (rng.standard_normal((V, P))
                   + 1j * rng.standard_normal((V, P))).astype(np.complex64)

    full = mrf_reconstruct(obs.real, obs.imag, dre, dim, grid)
    comp = mrf_reconstruct(obs.real, obs.imag, dre, dim, grid, rank=rank)
    # random gaussian rows are near-orthogonal: matches are unambiguous
    assert np.array_equal(np.asarray(full["index"]), pick)
    assert np.array_equal(np.asarray(comp["index"]), pick)

    pd_hat = np.asarray(full["pd_re"]) + 1j * np.asarray(full["pd_im"])
    recon = (dre[pick] + 1j * dim[pick]) * pd_hat[:, None]
    rel = np.abs(recon - obs).max() / np.abs(obs).max()
    assert rel < 1e-3, rel

    cpus = jax.devices("cpu")[:4]
    mesh = Mesh(np.asarray(cpus), ("atoms",))
    pad = (-B) % 4
    dre_p = np.concatenate([dre, np.zeros((pad, P), np.float32)])
    dim_p = np.concatenate([dim, np.zeros((pad, P), np.float32)])
    grid_p = np.concatenate([grid, np.zeros((pad, 2), np.float32)])
    sharded = jax.jit(lambda a, b: mrf_reconstruct(
        a, b, jnp.asarray(dre_p), jnp.asarray(dim_p),
        jnp.asarray(grid_p), mesh=mesh))(obs.real, obs.imag)
    assert np.array_equal(np.asarray(sharded["index"]), pick)


def test_atom_chunked_match_exact(dict_and_grid):
    """lax.scan atom-chunked matching == one-shot matching exactly
    (indices, correlations, PD), incl. non-divisible chunk sizes and
    under jit + compression."""
    from epgpy_tpu.parallel import dictionary_match

    dre, dim, grid = dict_and_grid
    rng = np.random.default_rng(17)
    pick, _, sre, sim = _observations(dre, dim, grid, 24, rng)

    i0, v0 = dictionary_match(dre, dim, sre, sim)
    for chunk in (7, 16, len(dre) - 1, len(dre) + 5):
        i1, v1 = dictionary_match(dre, dim, sre, sim, atom_chunk=chunk)
        assert np.array_equal(np.asarray(i0), np.asarray(i1)), chunk
        assert np.allclose(np.asarray(v0), np.asarray(v1), rtol=0,
                           atol=1e-12), chunk

    full = mrf_reconstruct(sre, sim, dre, dim, grid, rank=24)
    chunked = mrf_reconstruct(sre, sim, dre, dim, grid, rank=24,
                              atom_chunk=13)
    assert np.array_equal(np.asarray(full["index"]),
                          np.asarray(chunked["index"]))
    assert np.allclose(np.asarray(full["pd_re"]),
                       np.asarray(chunked["pd_re"]), atol=1e-12)
