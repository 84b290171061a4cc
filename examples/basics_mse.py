"""Multi-spin-echo basics: the README example plus a vectorized T2xB1 sweep
(reference examples/basics/mse.py, docs/basics.md)."""

import time

import numpy as np

import epgpy_tpu as epg


def main():
    # simple CPMG
    necho = 18
    seq = [epg.T(90, 90)] + [
        epg.S(1, duration=4.5), epg.T(150, 0),
        epg.S(1, duration=4.5), epg.ADC,
    ] * necho
    signal = epg.simulate(epg.modify(seq, T1=1400, T2=35.0))
    print("single T2:", np.abs(signal[:5, 0]).round(4))

    # vectorized sweep: 100 T2 x 50 B1 = 5000 signals (docs/basics.md timing)
    T2s = np.linspace(20, 100, 100)
    B1s = np.linspace(0.5, 1.2, 50)
    seq = [epg.T(90, 90)] + [
        epg.E(4.5, 1400, T2s), epg.S(1), epg.T(150 * B1s[None, :], 0),
        epg.E(4.5, 1400, T2s), epg.S(1), epg.ADC,
    ] * necho
    t0 = time.perf_counter()
    signal = epg.simulate(seq)
    dt = time.perf_counter() - t0
    print(f"sweep {signal.shape}: {dt:.3f}s "
          f"({signal.shape[1] * signal.shape[2] / dt:.0f} signals/s)")


if __name__ == "__main__":
    main()
