"""EPG-NNLS T2-spectrum / MWF mapping (parallel/t2spectrum.py).

Oracle: scipy.optimize.nnls for the batched FISTA solver; synthetic
multi-component CPMG decays built from the library's own EPG basis for
the mapping pipeline (self-consistency: the fit must recover the mixing
weights, the B1 candidate and the myelin-water fraction).
"""

import numpy as np
import pytest

from epgpy_tpu.parallel import t2_basis, nnls, t2_spectrum_map


def test_nnls_matches_scipy():
    scipy_opt = pytest.importorskip("scipy.optimize")
    rng = np.random.default_rng(0)
    m, n = 24, 8
    for _ in range(5):
        A = np.abs(rng.normal(size=(m, n))) + 0.1
        y = rng.normal(size=m) + A @ np.abs(rng.normal(size=n))
        x = np.asarray(nnls(A, y, iters=3000))
        x_ref, _ = scipy_opt.nnls(A, y)
        # compare objective values (solutions may tie in flat directions)
        f = np.sum((A @ x - y) ** 2)
        f_ref = np.sum((A @ x_ref - y) ** 2)
        assert f <= f_ref * (1 + 1e-6) + 1e-10
        assert np.all(x >= 0)


def test_nnls_batched_and_regularized():
    rng = np.random.default_rng(1)
    A = np.abs(rng.normal(size=(3, 10, 4))) + 0.1
    y = np.einsum("bmn,bn->bm", A, np.abs(rng.normal(size=(3, 4))))
    x = np.asarray(nnls(A, y, iters=2000))
    assert x.shape == (3, 4)
    resid = np.linalg.norm(np.einsum("bmn,bn->bm", A, x) - y)
    assert resid < 1e-4
    # Tikhonov shrinks the solution
    x_reg = np.asarray(nnls(A, y, reg=10.0, iters=2000))
    assert np.sum(x_reg) < np.sum(x)


def test_t2_basis_shapes_and_decay():
    t2grid = np.array([20.0, 80.0, 300.0])
    basis = t2_basis(8, 10.0, t2grid, [0.8, 1.0], T1=1000.0)
    assert basis.shape == (2, 8, 3)
    # echoes decay monotonically for an ideal 180 train
    assert np.all(np.diff(basis[1], axis=0) < 0)
    # longer T2 decays slower: later-echo ratio increases with T2
    ratio = basis[1, -1] / basis[1, 0]
    assert np.all(np.diff(ratio) > 0)
    # B1 < 1 loses signal into stimulated pathways at the first echo
    assert basis[0, 0, 0] < basis[1, 0, 0]


def test_mwf_mapping_recovers_components():
    necho, esp = 32, 10.0
    t2grid = np.geomspace(15.0, 2000.0, 40)
    b1grid = np.array([0.85, 1.0])
    basis = t2_basis(necho, esp, t2grid, b1grid, T1=1000.0)

    # two-pool voxels: myelin water (T2=20 ms, fraction f) + IE water
    # (T2=80 ms), simulated from the same EPG basis columns at B1=0.85
    i_my = int(np.argmin(np.abs(t2grid - 20.0)))
    i_ie = int(np.argmin(np.abs(t2grid - 80.0)))
    fracs = np.array([0.0, 0.15, 0.3])
    signals = np.stack([
        f * basis[0, :, i_my] + (1 - f) * basis[0, :, i_ie]
        for f in fracs
    ])

    # small explicit Tikhonov: the default (1e-3 x gram) is the robust
    # noisy-data choice but smears the 20 ms peak past the 40 ms cutoff
    # (regularized-NNLS MWF underestimation, expected behavior)
    reg = 1e-5 * float(np.mean(np.sum(basis ** 2, axis=1)))
    out = t2_spectrum_map(signals, basis, t2grid, b1grid=b1grid,
                          mwf_cutoff=40.0, reg=reg, iters=3000)
    assert out["spectrum"].shape == (3, 40)
    assert np.all(out["b1"] == 0.85)          # residual picks the true B1
    assert np.allclose(out["mwf"], fracs, atol=0.05)
    assert np.all(np.diff(out["mwf"]) > 0)    # monotone in true fraction
    # pure-IE voxel: geometric-mean T2 near 80 ms
    assert 55.0 < out["gm_t2"][0] < 115.0
    assert np.all(out["resid"] < 1e-2)


def test_t2_spectrum_map_validation():
    t2grid = np.geomspace(15.0, 2000.0, 10)
    basis = t2_basis(6, 10.0, t2grid, 1.0)
    with pytest.raises(ValueError):
        t2_spectrum_map(np.ones((2, 5)), basis, t2grid)   # wrong necho
    with pytest.raises(ValueError):
        t2_spectrum_map(np.ones((2, 6)), basis[:, :, :4], t2grid)
