"""Diffusion sensitivity of a low-flip-angle RARE echo train.

Weigel 2010 ("Extended phase graphs with anisotropic diffusion"): in a
RARE/TSE train with sub-180 refocusing pulses, magnetization spends part
of the train in longitudinal stimulated-echo pathways, so the effective
diffusion weighting (b-factor) *rises* as the flip angle drops -- the
"diffusion trap".  The b-factor is extracted as -log(S_D / S_0)/D from
paired simulations with and without the D operator (placed with k= set to
model attenuation during each gradient lobe).  Behavioral parity:
reference examples/diffusion/diffusion_sensitivity_rare.py; golden
tests/golden/rare_diffusion.npz pins a reduced sweep to the reference.

The whole 181-angle sweep is one batch axis: a single compiled program.
"""

import os

import numpy as np

import epgpy_tpu as epg
from epgpy_tpu.utils import helpers

ETL = int(os.environ.get("RARE_ETL", 11))
NANGLE = int(os.environ.get("RARE_NANGLE", 181))


def rare_signals(angles, etl=ETL, diffusion=True, kgrid=10.0,
                 max_nstate=None):
    """RARE train signal at the last echo for a refocusing-FA sweep."""
    taurf = 2.56  # ms
    k2 = helpers.get_wavenumber(7.2, 4.0)    # read encoding (rad/m)
    kS = helpers.get_wavenumber(9.9, 0.72)   # spoiler
    k1 = k2 / 2 + kS                         # read dephase
    T1, T2, D = 1e3, 1e2, 1e-3

    exc = epg.T(90, 90)
    trf = epg.T(np.asarray(angles), 0)
    erf = epg.E(taurf / 2, T1, T2)
    e1, e2, eS = epg.E(1.44, T1, T2), epg.E(2.0, T1, T2), epg.E(0.72, T1, T2)
    s1, s2, sS = epg.S(k1), epg.S(k2 / 2), epg.S(kS)
    if diffusion:
        d1 = epg.D(1.44, D, k=k1)
        d2 = epg.D(2.0, D, k=k2 / 2)
        dS = epg.D(0.72, D, k=kS)
        init = [erf, s1, d1, e1]
        pre = [s2, d2, e2, sS, dS, eS, erf]
        post = [erf, sS, dS, eS, s2, d2, e2]
    else:
        init = [erf, s1, e1]
        pre = [s2, e2, sS, eS, erf]
        post = [erf, sS, eS, s2, e2]
    seq = [exc, init, trf, post] + [pre, trf, post] * etl + [epg.ADC]
    opts = {} if max_nstate is None else {"max_nstate": max_nstate}
    return np.asarray(epg.simulate(seq, kgrid=kgrid, **opts))[0]


def main():
    D = 1e-3  # mm^2/s
    angles = np.linspace(1, 180, NANGLE)
    sig = rare_signals(angles, diffusion=True)
    sig0 = rare_signals(angles, diffusion=False)
    bfactor = -np.log(np.abs(sig / sig0)) / D  # s/mm^2

    i60 = np.argmin(np.abs(angles - 60))
    i180 = np.argmin(np.abs(angles - 180))
    print(f"b-factor at FA=60: {bfactor[i60]:.1f} s/mm^2, "
          f"at FA=180: {bfactor[i180]:.1f} s/mm^2")
    # Weigel 2010's central result: lower refocusing angles trap more
    # magnetization in diffusion-sensitizing stimulated-echo pathways
    assert bfactor[i60] > bfactor[i180] > 0

    try:
        from matplotlib import pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(ncols=2, sharex=True, figsize=(9, 4),
                             num="diff-sensitivity")
    axes[0].plot(angles, np.abs(sig))
    axes[0].set(xlabel="refocusing angle (deg)", ylabel="|signal| (a.u.)",
                title=f"RARE echo #{ETL + 1} intensity")
    axes[0].grid(True)
    axes[1].plot(angles, bfactor)
    axes[1].set(xlabel="refocusing angle (deg)", ylabel="b-factor (s/mm^2)",
                title="effective diffusion weighting")
    axes[1].grid(True)
    fig.suptitle("Diffusion sensitivity of a RARE train (Weigel 2010)")
    fig.tight_layout()
    fig.savefig("rare_diffusion.png", dpi=110)
    print("saved: rare_diffusion.png")


if __name__ == "__main__":
    main()
