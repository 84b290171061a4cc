"""RF spoiling: quadratic phase cycling vs ideal spoiling in SPGR.

Sweeps the phase increment 0..180 deg and compares the steady-state
signal against the ideal-spoiler limit (Zur 1991; reference
examples/gradient/random_spoiling.py setup -- re-expressed, not copied).

The phase-increment sweep is one extra batch axis: all 61 increments x
both flip angles simulate in a single compiled program.
"""

import numpy as np

import epgpy_tpu as epg


def main():
    T1, T2, TR, nrf = 600.0, 100.0, 10.0, 200
    FA = np.asarray([15.0, 40.0])

    # ideal spoiling: perfect transverse crusher each TR
    seq = [[epg.T(FA, 0), epg.E(TR, T1, T2), epg.SPOILER]] * (nrf - 1)
    seq += [[epg.T(FA, 0), epg.ADC]]
    ideal = np.abs(np.asarray(epg.simulate(seq))[0])
    print("ideal spoiling |F0|:", ideal.round(4))

    # quadratic RF spoiling, phase increment sweep on a second axis
    incs = np.linspace(0, 180, 61)  # (61,) phase increments
    seq = []
    for n in range(nrf):
        phase = (n + 1) * n / 2 * incs[None, :]  # FA axis 0, inc axis 1
        rf = epg.T(FA[:, None], phase)
        if n < nrf - 1:
            seq += [rf, epg.E(TR, T1, T2), epg.S(1)]
        else:
            seq += [rf, epg.Adc(phase=phase)]
    spoiled = np.abs(np.asarray(epg.simulate(seq, max_nstate=24))[0])

    for i, fa in enumerate(FA):
        best = incs[np.argmin(np.abs(spoiled[i] - ideal[i]))]
        print(f"FA={fa:.0f}: closest-to-ideal increment = {best:.0f} deg "
              f"(literature: ~117 deg); range "
              f"[{spoiled[i].min():.4f}, {spoiled[i].max():.4f}], "
              f"ideal {ideal[i]:.4f}")

    try:
        from matplotlib import pyplot as plt
    except ImportError:
        return
    for i, fa in enumerate(FA):
        plt.plot(incs, spoiled[i], label=f"RF spoiled, FA={fa:.0f}")
        plt.axhline(ideal[i], ls=":", color=f"C{i}")
    plt.xlabel("phase increment (deg)")
    plt.ylabel("|F0| at steady state")
    plt.legend()
    plt.title("RF spoiling vs ideal spoiler")
    plt.savefig("rf_spoiling.png", dpi=110)
    print("saved rf_spoiling.png")


if __name__ == "__main__":
    main()
