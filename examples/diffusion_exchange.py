"""Diffusion weighting and EPG-X exchange/MT examples
(reference examples/diffusion/*, examples/exchange/*)."""

import numpy as np

import epgpy_tpu as epg
from epgpy_tpu.utils import magnettransfer as mt


def diffusion_se():
    """Stejskal-Tanner diffusion attenuation of a spin echo."""
    Dc = 1e-3  # mm^2/s (free water ~2e-3)
    kv = 20000.0  # rad/m per shift unit (strong crusher)
    print("tau(ms)  echo  exp(-bD)")
    for tau in (5.0, 10.0, 20.0):
        seq = [epg.T(90, 90),
               epg.S(1, duration=tau), epg.D(tau, Dc, k=1),
               epg.T(180, 0),
               epg.S(1, duration=tau), epg.D(tau, Dc, k=1),
               epg.ADC]
        sig = epg.simulate(seq, kvalue=kv)
        b = 2 * (kv * 1e-3) ** 2 * (tau * 1e-3) / 3
        print(f"{tau:7.1f}  {abs(sig[0, 0]):.4f}  {np.exp(-b * Dc):.4f}")


def exchange_mt():
    """Two-pool MT-weighted GRE: bound pool saturated off-resonance."""
    # bound pool absorption at 2 kHz off-resonance, super-lorentzian
    G = mt.absorption_rate(12e-3, "super-lorentzian", 2.0)
    W = mt.saturation_rate(5.0, 10.0, G)  # 5 ms, 10 uT saturation pulse
    print(f"G = {G:.4g} 1/s, W = {W:.4g} 1/ms")

    # free pool (a) + bound pool (b), 20% bound
    khi = epg.exchange_matrix(0.005, densities=[0.8, 0.2])
    Xop = epg.X(10.0, khi, axis=-1, T1=[1000.0, 1000.0], T2=[80.0, 0.012])
    sat = epg.R(0, rL=np.asarray([0.0, W * 5.0]), r0=None)  # saturate pool b

    seq = []
    for _ in range(50):
        seq += [sat, epg.T(np.asarray([10.0, 0.0]), 0), epg.ADC, Xop, epg.S(1)]
    sig = epg.simulate(seq, max_nstate=10,
                       init=np.asarray([0, 0, 1]) * np.asarray([[0.8], [0.2]])[..., None],
                       density=[0.8, 0.2])
    print("MT-weighted steady state |F0|:", np.abs(sig[-1]).round(4))


def relaxation_exchange_ilt():
    """Recover exchange-mixed T1 components from a mixing-time sweep with
    the matrix-pencil inverse Laplace transform (reference
    examples/exchange/inverse_laplace_transform_1d.py workflow)."""
    import epgpy_tpu as epg
    from epgpy_tpu.utils.ilt1d import ilt1d

    taus = np.linspace(1.0, 2500.0, 160)
    X = epg.X(taus[None, :], 0.0005, axis=-1,
              T1=[1200.0, 250.0], T2=[80.0, 20.0])
    sm = epg.StateMatrix(shape=(2, 1), density=[[0.6], [0.4]])
    # saturation-recovery-style prep: null Z, mix, read
    seq = [epg.T(90, 90), epg.SPOILER, X, epg.T(90, 90), epg.ADC]
    sig = np.asarray(epg.simulate(seq, init=sm))[0]
    total = np.abs(sig.sum(axis=0))          # sum over compartments
    decay = total.max() - total               # recovery -> decay for ILT
    rates, amps = ilt1d(taus, decay + 1e-12)
    print("recovered apparent T1 components (ms):",
          np.round(np.sort(1 / rates), 1))


def cpmg_relaxation_exchange():
    """2-site T2 relaxation exchange in a CPMG train (Van Landeghem 2010;
    reference examples/exchange/relax_exchange_1d.py): the inverse Laplace
    transform of the echo decay shows two apparent T2 components at slow
    exchange that coalesce to the harmonic mean at fast exchange.  The
    exchange-rate sweep is one batch axis; the X operators scan-compile.
    """
    from epgpy_tpu.utils.ilt1d import ilt1d

    T2a, T2b = 2.5, 25.0  # ms
    rates = np.geomspace(1e-3, 10.0, 8)  # 1/ms
    TE, necho = 0.1, 200
    khi = epg.exchange_matrix(rates, axis=1, ncomp=2)
    xt = epg.X(TE / 2, khi, T2=[[T2a, T2b]], axis=1, duration=True)
    seq = [epg.T(90, 90)] + [xt, epg.T(180, 0), xt, epg.ADC] * necho
    sig = np.asarray(epg.simulate(seq))  # (necho, nrate, ncomp)
    total = 0.5 * (sig[..., 0] + sig[..., 1]).real
    times = TE * np.arange(1, necho + 1)

    apparent = []
    for i, r in enumerate(rates):
        rr, aa = ilt1d(times, total[:, i])
        t2s = np.sort(1 / rr)
        apparent.append(t2s)
        print(f"rate={r:8.3g} /ms: apparent T2 = {t2s.round(2)} ms "
              f"(amps {aa.round(3)})")

    # slow limit: both T2s resolved; fast limit: single harmonic mean
    assert np.allclose(apparent[0], [T2a, T2b], rtol=0.05)
    t2_mean = 1.0 / (0.5 * (1 / T2a + 1 / T2b))
    assert len(apparent[-1]) == 1
    assert np.isclose(apparent[-1][0], t2_mean, rtol=0.05)


if __name__ == "__main__":
    diffusion_se()
    exchange_mt()
    relaxation_exchange_ilt()
    cpmg_relaxation_exchange()
