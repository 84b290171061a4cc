"""Slice profile of a shaped pulse (reference examples/basics/pulse_profile.py)."""

import numpy as np

import epgpy_tpu as epg
from epgpy_tpu.ops.rfpulse import RFPulse, encode_phase


def main():
    # windowed-sinc 90deg pulse, 2 ms
    x = np.linspace(-3, 3, 128)
    values = np.sinc(x) * np.hamming(128)
    values /= np.abs(values).max()
    pulse = RFPulse(values, 2.0, alpha=90.0)
    print(f"calibrated rf = {pulse.rf:.4f}, alpha = {pulse.alpha:.1f} deg")

    # slice profile across 30 mm under a 10 mT/m gradient, with rewinder
    profile = encode_phase(pulse, gradient=10.0, fov=30.0, npoint=101,
                           rewind=True)
    sig = np.asarray(epg.simulate([profile, epg.ADC]))[0].squeeze()
    pos = epg.spatial_range(30.0, 101)
    center = np.abs(sig[50])
    fwhm_mask = np.abs(sig) > center / 2
    print(f"center |F0| = {center:.3f}, "
          f"FWHM ~ {pos[fwhm_mask][-1] - pos[fwhm_mask][0]:.1f} mm")


if __name__ == "__main__":
    main()
