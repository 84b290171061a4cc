"""Quantitative magnetization transfer (qMT) mapping with the EPG-X family.

Two-pool MT-weighted spoiled GRE (reference workload family:
epgpy/exchange.py:89-120 applied per TR as in
examples/exchange/gre_exchange.py, bound-pool saturation via
epgpy/magnettransfer.py rates): per TR the train is

    R(bound-pool saturation)  ->  T(alpha, 0)  ->  ADC  ->  X(TR)  ->  S(1)

The *bound pool fraction* f and the free-pool T2 are mapped by
dictionary search: for each candidate f the whole train runs as ONE
fused Pallas kernel call on TPU (simulate() pattern-matches the block
structure and routes to models/pallas_xgre -- the per-atom T2 sweep
rides the kernel's atom axis; f changes the kinetic matrix and the
equilibrium densities, which are per-call parameters).  Observations
are synthesized at off-grid (f, T2) with noise, matched to the
dictionary, and the recovered maps are checked against the truth.

Run: python examples/mt_qmt_mapping.py   (env QMT_NTR / QMT_NT2 shrink it)
"""

import os

import numpy as np

import epgpy_tpu as epg
from epgpy_tpu.utils import magnettransfer as mt


def build_train(f, T2f, *, ntr, sat_power=5.0, sat_tau=10.0, tr=12.0,
                k=0.005):
    """One qMT train for bound-pool fraction f and a T2f atom sweep.

    The flip angles ramp MRF-style (transient trains encode the
    free-pool T2 far better than a constant-flip steady state -- with a
    fixed alpha the spoiled signal collapses onto the f/T1 manifold)."""
    dens = [1.0 - f, f]
    khi = epg.exchange_matrix(k, densities=dens)
    # Graham saturation rate of the super-lorentzian bound pool at the
    # RF power of the (off-resonant) MT pulse
    G = mt.absorption_rate(12e-3, "super-lorentzian", 2.0)
    W = mt.saturation_rate(sat_power, sat_tau, G)
    T2 = np.stack([np.asarray(T2f, float),
                   np.full(np.shape(T2f), 0.012)], axis=0)
    Xop = epg.X(tr, khi, axis=0, T1=np.asarray([1000.0, 1000.0]), T2=T2)
    sat = epg.R(0, rL=np.asarray([0.0, W * sat_tau]), r0=None)
    fas = 8.0 + 52.0 * np.abs(np.sin(np.arange(ntr) * 0.18))
    seq = []
    for i in range(ntr):
        seq += [sat, epg.T(np.asarray([fas[i], 0.0]), 0.0), epg.ADC, Xop,
                epg.S(1)]
    return seq, dens


def main():
    ntr = int(os.environ.get("QMT_NTR", 60))
    nt2 = int(os.environ.get("QMT_NT2", 24))
    fs = np.linspace(0.05, 0.30, 11)            # bound-pool fraction grid
    T2f = np.linspace(40.0, 120.0, nt2)         # free-pool T2 grid (ms)

    # dictionary: one fused-kernel call per f (the T2 sweep is the
    # kernel's atom axis); keep only the free-pool signal magnitude
    atoms = []
    for f in fs:
        seq, dens = build_train(f, T2f, ntr=ntr)
        sig = np.asarray(epg.simulate(seq, max_nstate=10, density=dens))
        atoms.append(np.abs(sig[:, 0, :]))      # (ntr, nt2) free pool
    D = np.stack(atoms, axis=0)                 # (nf, ntr, nt2)
    Dn = D / np.linalg.norm(D, axis=1, keepdims=True)

    # observations at off-grid truths + noise
    rng = np.random.default_rng(11)
    f_true = np.asarray([0.12, 0.21, 0.27])
    t2_true = np.asarray([55.0, 83.0, 104.0])
    obs = []
    for ft, t2t in zip(f_true, t2_true):
        seq, dens = build_train(ft, [t2t], ntr=ntr)
        s = np.abs(np.asarray(epg.simulate(seq, max_nstate=10,
                                           density=dens))[:, 0, 0])
        obs.append(s + rng.normal(0, 2e-4, s.shape))
    obs = np.stack(obs)                          # (nobs, ntr)
    obs_n = obs / np.linalg.norm(obs, axis=1, keepdims=True)

    # inner-product match over the (f, T2) grid
    scores = np.einsum("on,fnt->oft", obs_n, Dn)
    flat = scores.reshape(len(obs), -1).argmax(axis=1)
    fi, ti = np.unravel_index(flat, (len(fs), nt2))
    f_hat, t2_hat = fs[fi], T2f[ti]

    df = np.abs(f_hat - f_true).max()
    dt2 = np.abs(t2_hat - t2_true).max()
    print("truth   f =", f_true, " T2f =", t2_true)
    print("matched f =", f_hat, " T2f =", t2_hat)
    print(f"max |df| = {df:.3f} (grid step {fs[1]-fs[0]:.3f}), "
          f"max |dT2| = {dt2:.1f} ms (grid step {T2f[1]-T2f[0]:.1f})")
    # recovered values must land on the grid points nearest the truth
    assert df <= (fs[1] - fs[0]) * 1.01, "bound-pool fraction mismatch"
    assert dt2 <= (T2f[1] - T2f[0]) * 1.01, "free-pool T2 mismatch"
    print("qMT mapping OK")


if __name__ == "__main__":
    main()
