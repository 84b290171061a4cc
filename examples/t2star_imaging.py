"""T2* decay via the time-accumulation operator C and spatially-resolved
imaging readout (reference examples/gradient/t2star_simulation.py,
isochromats_vs_epg examples)."""

import numpy as np

import epgpy_tpu as epg


def t2star_fid():
    R2prime = 0.05  # 1/ms
    seq = [epg.T(90, 90)]
    for _ in range(10):
        seq += [epg.C(2.0, R2prime), epg.ADC]
    fid = np.asarray(epg.simulate(seq, max_nstate=20, kgrid=0.1))
    t = 2.0 * np.arange(1, 11)
    print("FID vs exp(-R2' t):",
          np.abs(fid[:, 0]).round(4), np.exp(-R2prime * t).round(4), sep="\n  ")


def gradient_echo_image():
    """1-D 'image': DFT of F-states at spatial positions."""
    positions = np.linspace(-0.02, 0.02, 33)[:, None]  # m
    seq = [
        epg.T(30, 0), epg.S(1, duration=1.0),
        epg.T(30, 0), epg.S(1, duration=1.0),
        epg.Imaging(positions, reduce=False, voxel_size=1.5e-3),
    ]
    img = np.asarray(epg.simulate(seq, kvalue=300.0))[0].squeeze()
    print("image profile |.|:", np.abs(img).round(3))


if __name__ == "__main__":
    t2star_fid()
    gradient_echo_image()
