"""Point-resolved spectroscopy (PRESS) voxel localization in 3-D EPG.

Gao 2021 ("Three-dimensional spatially resolved phase graph framework",
part 3.3): three orthogonal 90-degree pulses with 3-D crusher gradients
select a voxel; unwanted coherence pathways are dephased beyond the
k-space filter and the 3-D DFT of the surviving F states images the
magnetization after each pulse.  Also runs the DOTCOPS crusher scheme,
which cancels more unwanted pathways than equal crushers.  Behavioral
parity: reference examples/gradient/point_resolved_mrs.py (reduced scale;
golden tests/golden/press.npz pins the PRESS images to the reference).
"""

import os

import numpy as np

import epgpy_tpu as epg
from epgpy_tpu.utils import constants, imaging

NPIX = int(os.environ.get("PRESS_NPIX", 8))
FOV = 48.0  # mm


def press_images(crushers, npix=NPIX, max_nstate=64):
    """Simulate the PRESS train; return the 3-D image at each of 4 ADCs.

    crushers: list of 4 crusher wavenumber 3-vectors (rad/m) applied
    around the two refocusing pulses (gc, gc2, gc3, gc4).
    """
    gamma = constants.gamma_1H
    grid = FOV * 1e-3 * np.stack(
        np.meshgrid(*[np.linspace(-0.5, 0.5, npix)] * 3, indexing="ij"), -1)
    kfilt = 2 * np.pi / (FOV * 1e-3 / npix)
    TE1, TE2 = 14.0, 16.0  # ms
    Gs = np.array([0.1, -0.2, 0.3]) / gamma * 1e2  # static gradient (mT/m)
    kim = 2 * np.pi * npix / FOV * 1e3

    rf1, rf2, rf3 = epg.T(90, 90), epg.T(90, 0), epg.T(90, 0)
    eye = 0.5 * np.eye(3)
    gy, gz = epg.S(eye[1] * kim), epg.S(eye[2] * kim)
    gc1, gc2, gc3, gc4 = (epg.S(np.asarray(c, float)) for c in crushers)
    gs1 = epg.G(TE1 / 2, Gs, duration=True)
    gs2 = epg.G(TE2 / 2, Gs, duration=True)
    gslong = epg.G(100.0, Gs, duration=True)

    seq = [
        [rf1],
        [gs1, gc1, gy, rf2, gy, gc2, gs1], epg.ADC,
        [gs2, gc3, gz, rf3, gz, gc4, gs2], epg.ADC,
        [gslong], epg.ADC,
        [gslong], epg.ADC,
    ]
    F, k = epg.simulate(seq, kgrid=1.0, max_nstate=max_nstate,
                        probe=("F", "k"))
    images = []
    for i in range(4):
        Fi, ki = F[i].squeeze(0), k[i].squeeze(0)
        keep = np.all(np.abs(ki) <= kfilt, axis=-1)
        images.append(np.asarray(imaging.dft(grid, Fi[keep], ki[keep])))
    return np.stack(images)


def main():
    kc = 2 * np.pi * 50.0  # crusher area (rad/m)
    press = press_images([[kc] * 3] * 4)
    dotcops = press_images(
        [[kc] * 3, [kc, kc, 0], [kc, kc, 0], [kc, kc, -kc]])

    for name, sig in (("PRESS", press), ("DOTCOPS", dotcops)):
        mags = np.abs(sig).max(axis=(1, 2, 3))
        print(f"{name}: max |image| per ADC = {mags.round(4)}")

    # the selected-voxel signal must survive both refocusing pulses
    assert np.abs(press[3]).max() > 0.5
    assert np.abs(dotcops[3]).max() > 0.5

    try:
        from matplotlib import pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(2, 4, figsize=(10, 5), num="press")
    for row, (name, sig) in enumerate((("PRESS", press),
                                       ("DOTCOPS", dotcops))):
        for i in range(4):
            ax = axes[row, i]
            ax.imshow(np.abs(sig[i][..., NPIX // 2]), cmap="gray",
                      interpolation="nearest", vmin=0, vmax=0.8)
            ax.set_title(f"{name} t{i + 1}", fontsize=8)
            ax.axis("off")
    fig.suptitle("PRESS voxel localization: |M_xy| (X-Y slice) after each "
                 "pulse/delay")
    fig.tight_layout()
    fig.savefig("press_mrs.png", dpi=110)
    print("saved: press_mrs.png")


if __name__ == "__main__":
    main()
