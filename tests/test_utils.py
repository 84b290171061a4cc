"""Utility-layer tests: ILT, plotting, conversions."""

import numpy as np
import pytest

import epgpy_tpu as epg
import epgpy_tpu.utils.ilt1d as ilt
from epgpy_tpu.utils import helpers


def test_ilt1d_two_components():
    t = np.linspace(0, 200, 120)
    y = 0.7 * np.exp(-t / 25) + 0.3 * np.exp(-t / 90)
    r, a = ilt.ilt1d(t, y)
    assert len(r) == 2
    assert np.allclose(np.sort(1 / r), [25.0, 90.0], rtol=1e-4)
    assert np.allclose(np.sort(a), [0.3, 0.7], rtol=1e-4)


def test_ilt1d_forward_roundtrip():
    t = np.linspace(0, 100, 80)
    r0, a0 = np.asarray([0.05, 0.01]), np.asarray([0.4, 0.6])
    y = ilt.flt1d(t, r0, a0)
    r, a = ilt.ilt1d(t, y)
    assert np.abs(ilt.flt1d(t, r, a) - y).max() < 1e-8


def test_ilt1d_crb_and_spectrum():
    t = np.linspace(0, 150, 100)
    y = np.exp(-t / 40)
    r, a = ilt.ilt1d(t, y)
    sd_r, sd_a = ilt.ilt1d_crb(t, y + 1e-6, r, a)
    assert np.all(np.isfinite(sd_r)) and np.all(np.isfinite(sd_a))
    grid, spec = ilt.quasi_continuous(r, a)
    assert spec.max() > 0
    assert np.isclose(grid[np.argmax(spec)], r[0], rtol=0.1)


def test_ilt1d_kernel_sizing_matches_reference():
    """get_bounds / get_resolution / get_kernel reproduce the reference's
    sampling-window sizing (reference epgpy/utilities/ilt1d.py:21-58),
    incl. a short/coarse window where the old hardcoded defaults
    disagreed."""
    import importlib.util as _ilu
    spec = _ilu.spec_from_file_location(
        "ref_ilt1d", "/root/reference/epgpy/utilities/ilt1d.py")
    ref = _ilu.module_from_spec(spec)
    spec.loader.exec_module(ref)

    for t in (np.linspace(0, 200, 120),      # well-sampled
              np.linspace(0, 12, 9),         # short window
              np.linspace(0, 400, 14)):      # coarse sampling
        b = ilt.get_bounds(t)
        rb = ref.get_bounds(t)
        assert np.allclose(b, rb, rtol=1e-12), (b, rb)
        res, num = ilt.get_resolution(t, b)
        rres, rnum = ref.get_resolution(t, rb)
        assert num == rnum and np.isclose(res, rres, rtol=1e-9)
        rates, K = ilt.get_kernel(t, b, num)
        rrates, rK = ref.get_kernel(t, rb, rnum)
        assert np.allclose(rates, rrates) and np.allclose(K, rK)


def test_ilt1d_custom_kernel_sizes_pencil():
    """A user kernel with fewer time rows shrinks the Hankel pencil
    window (reference: L = kernel.shape[0] // 2)."""
    t = np.linspace(0, 200, 120)
    y = 0.7 * np.exp(-t / 25) + 0.3 * np.exp(-t / 90)
    _, kernel = ilt.get_kernel(t[:40], ilt.get_bounds(t), 12)
    r, a = ilt.ilt1d(t, y, kernel=kernel)
    # the shortened window still recovers both components
    assert np.allclose(np.sort(1 / r), [25.0, 90.0], rtol=1e-3)


def test_ilt1d_irregular_raises():
    t = np.asarray([0.0, 1.0, 3.0, 4.0])
    with pytest.raises(ValueError):
        ilt.ilt1d(t, np.exp(-t))


def test_plot_epg_headless(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from epgpy_tpu.utils.plotting import plot_epg

    seq = [epg.T(90, 90)] + [epg.S(1, duration=2), epg.T(150, 0),
                             epg.S(1, duration=2), epg.ADC] * 3
    fig = plot_epg(seq, title="CPMG")
    out = tmp_path / "epg.png"
    fig.savefig(out)
    assert out.stat().st_size > 1000


def test_unit_conversions():
    # wavenumber of 10 mT/m over 1 ms (1H)
    k = helpers.get_wavenumber(10.0, 1.0)
    assert np.isclose(k, 2 * np.pi * 42.576e3 * 10e-3 * 1.0)
    # space <-> freq roundtrip
    pos = np.linspace(-10, 10, 5)
    f = helpers.space_to_freq(20.0, pos)
    back = helpers.freq_to_space(20.0, f)
    assert np.allclose(back, pos)


def test_axes_enum():
    ax = helpers.Axes("T2", "B1")
    assert ax.T2 == 0 and ax.B1 == 1


def test_k_colors_maps():
    """Off-axis k colormaps: shape, range, and origin behavior."""
    from epgpy_tpu.utils.plotting import k_colors_1d, k_colors_2d

    c1 = k_colors_1d(np.linspace(-3, 3, 7), 2.0)
    assert c1.shape == (7, 4)
    assert (c1 >= 0).all() and (c1 <= 1).all()
    # clipping: values beyond +-vmax saturate to the endpoint colors
    assert np.allclose(c1[0], k_colors_1d(-2.0, 2.0))
    assert np.allclose(c1[-1], k_colors_1d(2.0, 2.0))

    x, y = np.meshgrid(np.linspace(-1, 1, 5), np.linspace(-1, 1, 5))
    c2 = k_colors_2d(x, y, 1.0, 1.0)
    assert c2.shape == (5, 5, 3)
    # the k-plane origin is desaturated (gray); corners are saturated hues
    assert np.ptp(c2[2, 2]) < 1e-6
    assert np.ptp(c2[0, 0]) > 0.5


def test_ilt1d_direct_amplitudes_unbiased():
    """ls=False residues from the shifted Hankel must divide out the
    one-step decay (the reference's identical code under-reports fast
    components by exp(-r dt): 22% at r dt = 0.25)."""
    from epgpy_tpu.utils.ilt1d import ilt1d

    t = np.arange(0, 50.5, 0.5)
    y = 1.0 * np.exp(-0.05 * t) + 0.8 * np.exp(-0.5 * t)
    rates, amps = ilt1d(t, y, ls=False)
    order = np.argsort(rates)
    assert np.allclose(rates[order], [0.05, 0.5], atol=1e-6)
    assert np.allclose(amps[order], [1.0, 0.8], atol=1e-6)


def test_diffusion_shape_checks():
    """Tensor D with a lower-dim explicit k raises (reference parity);
    direct op application with an incompatible state batch raises a
    clear error instead of an obscure broadcast failure."""
    import pytest
    import epgpy_tpu as epg

    with pytest.raises(ValueError, match="Incompatible D and k"):
        epg.D(10.0, np.eye(3) * 1e-3, k=[1.0])
    epg.D(10.0, np.eye(3) * 1e-3, k=[1.0, 0.5, 0.2])   # 3-D k is fine

    sm = epg.StateMatrix([0, 0, 1], nstate=2).broadcast((2, 3))
    sm = sm.setup_coords(1)
    with pytest.raises(ValueError, match="Incompatible StateMatrix"):
        epg.D(np.array([1.0, 2.0, 3.0]), 1e-3)(sm)
