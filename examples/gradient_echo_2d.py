"""2-D spatially-resolved EPG: gradient-echo imaging of a 3-tissue phantom.

The full Cartesian readout of a gradient-echo acquisition is simulated
WITHOUT a per-pixel batch: the state batch is only (readout-sample,
tissue), and the spatial dependence enters exclusively through the
k-state ladder -- the Imaging probe DFTs the shared ladder at every pixel
position, weights by per-tissue proton-density maps
(System(weights=...)), applies T2' via the accumulated-time coordinate
and System(modulation=...), and sums tissues and positions into one
k-space line per TR.  This is the "spatially resolved EPG" of Gao 2021:
the cost is independent of the image matrix except in the final DFT.

The FFT2 of the collected k-space reconstructs the phantom.  Behavioral
parity: reference examples/gradient/isochromats_vs_epg_2d_vec.py (the
reference uses the Colin-27 atlas; a synthetic ellipse phantom avoids
shipping that data).  Golden tests/golden/gre2d.npz pins the 16x16
configuration to the reference.
"""

import os

import numpy as np

import epgpy_tpu as epg

N = int(os.environ.get("GRE2D_N", 32))       # matrix size (nread = nphase)
PRUNE = float(os.environ.get("GRE2D_PRUNE", 1e-2))
MAXNSTATE = int(os.environ.get("GRE2D_NSTATE", 256))


def ellipse_phantom(n):
    """Three tissue masks (WM/GM/CSF-like), values in [0, 1]."""
    y, x = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
    outer = ((x / 0.85) ** 2 + (y / 0.95) ** 2 < 1).astype(float)
    wm = (((x / 0.55) ** 2 + ((y - 0.05) / 0.65) ** 2) < 1
          ).astype(float) * outer
    gm = np.clip(outer - wm, 0, 1)
    csf = ((((x + 0.15) / 0.2) ** 2 + ((y + 0.2) / 0.25) ** 2) < 1
           ).astype(float) * outer
    wm = np.clip(wm - csf, 0, 1)
    gm = np.clip(gm - csf, 0, 1)
    return wm, gm, csf


def epg_kspace(pds, pixels, fov, fa, tr, T1, T2, T2p, n,
               prune=PRUNE, max_nstate=MAXNSTATE):
    """Collect (nphase, nread) k-space with spatially-resolved EPG."""
    init = epg.System(weights=pds[None], modulation=-1 / np.asarray([T2p]))
    rf = epg.T(fa, 0)
    adc = epg.Imaging(pixels, voxel_size=fov / n, phase=-rf.phi,
                      reduce=(1, 2))
    # readout-sample axis: relax + accumulate time to each sample
    tau1 = np.asarray([i * tr / n for i in range(n)])
    tau2 = np.asarray([tr * (n - 1 - i) / n for i in range(n)])
    rlx1 = epg.E(tau1, [T1], [T2]) * epg.C(tau1)
    rlx2 = epg.E(tau2, [T1], [T2]) * epg.C(tau2)
    kx = np.array([2 * np.pi / fov, 0.0])
    ky = np.array([0.0, 2 * np.pi / fov])
    gx1 = epg.S(np.asarray([kx * (i - n / 2) for i in range(n)]))
    gx2 = epg.S(np.asarray([kx * (n - i + 1) for i in range(n)]))
    gxspl = epg.S(1.5 * kx * n / 2)
    lines = range(-n // 2, n // 2)
    gp1 = [epg.S(ky * i) if i else epg.NULL for i in lines]
    gp2 = [epg.S(-ky * i) if i else epg.NULL for i in lines]
    seq = [init] + [
        [rf, gx1, gp1[i], rlx1, adc, rlx2, gx2, gxspl, gp2[i]]
        for i in range(n)
    ]
    return np.asarray(epg.simulate(
        seq, prune=prune, kgrid=1e-8, max_nstate=max_nstate))


def phantom_setup(n, fov):
    wm, gm, csf = ellipse_phantom(n)
    mask = np.max([wm, gm, csf], axis=0) > 1e-5
    # GM, WM, CSF tissue parameters (PD a.u., times ms)
    PD = [0.8, 0.7, 1.0]
    T1 = [1.55e3, 0.83e3, 4.16e3]
    T2 = [0.09e3, 0.07e3, 1.65e3]
    T2p = [0.322e3, 0.183e3, 0.0591e3]
    pds = np.stack([gm * PD[0], wm * PD[1], csf * PD[2]])
    pds = pds.reshape(3, -1)[:, mask.flat]
    pixels = (np.mgrid[-n // 2:n // 2, -n // 2:n // 2]
              .reshape(2, -1).T[mask.flat] * fov / np.array([n, n]))
    return pds, pixels, mask, (T1, T2, T2p)


def main():
    fa, tr, fov = 30.0, 10.0, 200e-3
    n = N
    pds, pixels, mask, (T1, T2, T2p) = phantom_setup(n, fov)

    kspace = epg_kspace(pds, pixels, fov, fa, tr, T1, T2, T2p, n)
    img = np.fft.fftshift(np.fft.fft2(kspace)) / n

    ref = np.zeros((n, n))
    ref[mask] = pds.sum(axis=0)
    corr = np.corrcoef(np.abs(img).ravel(), ref.ravel())[0, 1]
    print(f"recon {img.shape}, corr(|img|, phantom PD) = {corr:.3f}")
    assert corr > 0.7, "reconstruction must resemble the phantom"

    try:
        from matplotlib import pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(1, 3, figsize=(10, 3.6), num="gre-2d")
    axes[0].imshow(ref, cmap="gray")
    axes[0].set_title("phantom (PD-weighted)")
    axes[1].imshow(np.abs(kspace) ** 0.3, cmap="gray")
    axes[1].set_title("|k-space|^0.3")
    axes[2].imshow(np.abs(img), cmap="gray")
    axes[2].set_title("EPG reconstruction")
    for ax in axes:
        ax.axis("off")
    fig.suptitle("2-D spatially-resolved EPG gradient-echo imaging")
    fig.tight_layout()
    fig.savefig("gradient_echo_2d.png", dpi=110)
    print("saved: gradient_echo_2d.png")


if __name__ == "__main__":
    main()
