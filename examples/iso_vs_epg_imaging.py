"""Isochromats (Bloch) vs spatially-resolved EPG: 1-D gradient-echo image.

Two independent routes to the same k-space signal of a 1-D object with a
random proton-density profile and T2' dephasing:

* EPG: float gradient shifts build the k-state ladder; the C operator
  accumulates dephasing time (T2' decay enters the Imaging probe through
  System/modulation-free weighting with exp(-|t|/T2')); the Imaging probe
  DFTs the F ladder at the pixel positions with sinc voxel weighting.
* Bloch: explicit isochromats at sub-voxel positions with Cauchy-sampled
  off-resonance frequencies; P operators apply per-isochromat precession
  and the plain ADC sums them.

The EPG route is exact in the continuum limit: the isochromat signal
converges to it as niso grows (reference
examples/gradient/isochromats_vs_epg_1d.py).
"""

import os

import numpy as np

import epgpy_tpu as epg

NREAD = int(os.environ.get("IMG_NREAD", 64))
NISO = int(os.environ.get("IMG_NISO", 2000))
NRF = int(os.environ.get("IMG_NRF", 1))  # prep pulses before readout


def epg_image(pd, pixels, pixsize, FA, TR, T1, T2, T2p, nread):
    adc = epg.Imaging(pixels[:, None], voxel_size=pixsize)
    init = epg.System(weights=pd)
    rf = epg.T(FA, 90)
    rlx = epg.E(TR / nread, T1, T2) * epg.C(TR / nread, R2=1.0 / T2p)
    k = 2 * np.pi / (pixsize * nread)  # rad/m
    gxpre, gx = epg.S(-k * nread / 2), epg.S(k)
    seq = [init, rf, gxpre] + [adc, rlx, gx] * nread
    kspace = np.asarray(epg.simulate(seq, kgrid=0.1, max_nstate=4 * nread))
    return np.fft.fftshift(np.fft.fft(kspace.squeeze())) / nread


def iso_image(pd, pixels, pixsize, FA, TR, T1, T2, T2p, nread, niso, rng):
    iso = rng.uniform(-0.5, 0.5, niso) * pixsize
    # within-voxel off-resonance: Cauchy distribution gives exp(-t/T2')
    omega = np.tan(0.999 * np.pi * np.linspace(-0.5, 0.5, niso)) / 2 / np.pi
    init = epg.PD(pd[:, None] * np.ones(niso))
    rf = epg.T(FA, 90)
    rlx = epg.E(TR / nread, T1, T2) * epg.P(TR / nread,
                                            omega[None] / T2p)
    g = (pixels[:, None] + iso) / (pixsize * nread)  # cycles
    gxpre, gx = epg.P(1, -g * nread / 2), epg.P(1, g)
    seq = [init, rf, gxpre] + [epg.ADC, rlx, gx] * nread
    sig = np.asarray(epg.simulate(seq))
    kspace = sig.sum(axis=(-2, -1)) / niso
    return np.fft.fftshift(np.fft.fft(kspace)) / nread


def main():
    rng = np.random.default_rng(3)
    FA, TR = 30.0, 10.0
    FOV = 200e-3
    nread = NREAD
    pixsize = FOV / nread
    pixels = np.arange(-nread // 2, nread // 2) / nread * FOV
    pd = rng.uniform(0.5, 1, nread)
    T1, T2, T2p = 830.0, 70.0, 100.0

    sig_epg = epg_image(pd, pixels, pixsize, FA, TR, T1, T2, T2p, nread)
    sig_iso = iso_image(pd, pixels, pixsize, FA, TR, T1, T2, T2p, nread,
                        NISO, rng)

    err = (np.linalg.norm(sig_iso - sig_epg)
           / np.linalg.norm(sig_epg))
    # the image recovers the proton-density profile up to the steady
    # signal scale: correlate |image| with pd
    corr = np.corrcoef(np.abs(sig_epg), pd)[0, 1]
    print(f"EPG vs isochromats({NISO}) profile error: {err:.4f}")
    print(f"corr(|EPG image|, proton density) = {corr:.4f}")
    assert err < 0.1, "Bloch isochromats must converge to the EPG profile"
    assert corr > 0.95, "image must recover the proton-density profile"

    try:
        from matplotlib import pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(ncols=2, figsize=(9, 4), num="iso-vs-epg-1d")
    axes[0].plot(1e3 * pixels, np.abs(sig_iso), alpha=0.6,
                 label=f"Bloch ({NISO} iso.)")
    axes[0].plot(1e3 * pixels, np.abs(sig_epg), "r:+", label="EPG")
    axes[0].plot(1e3 * pixels, pd * np.abs(sig_epg).max() / pd.max(), "k--",
                 lw=0.7, label="proton density (scaled)")
    axes[0].set(xlabel="location (mm)", ylabel="|image| (a.u.)")
    axes[0].legend(fontsize=7)
    axes[1].plot(1e3 * pixels, np.angle(sig_iso), alpha=0.6)
    axes[1].plot(1e3 * pixels, np.angle(sig_epg), "r:+")
    axes[1].set(xlabel="location (mm)", ylabel="phase (rad)")
    fig.suptitle(f"Isochromats vs EPG (T1={T1:.0f} T2={T2:.0f} "
                 f"T2'={T2p:.0f} ms)")
    fig.tight_layout()
    fig.savefig("iso_vs_epg_1d.png", dpi=110)
    print("saved: iso_vs_epg_1d.png")


if __name__ == "__main__":
    main()
