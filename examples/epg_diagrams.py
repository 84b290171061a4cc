"""EPG phase-graph diagrams for classic sequences (SSFP, TSE).

The diagram simulates the sequence and draws RF/gradient timing lanes
plus the k-state trajectory fan (reference examples/basics/ssfp.py and
tse.py; rendering utils/plotting.plot_epg)."""

import epgpy_tpu as epg
from epgpy_tpu.utils import plotting


def ssfp_diagram():
    FA, TR, nrf = 30, 10.0, 15
    rf = epg.T(FA, 0)
    seq = [[rf,
            epg.S(-1, duration=TR / 3), epg.E(TR / 3, 1e3, 1e2),
            epg.S(2, duration=TR * 2 / 3), epg.E(TR * 2 / 3, 1e3, 1e2)]
           ] * nrf + [epg.ADC]
    return plotting.plot_epg(seq, title="SSFP sequence", figname="ssfp")


def tse_diagram():
    FA, esp, nrf = 120, 10.0, 10
    shift = epg.S(1, duration=esp / 2)
    seq = [epg.T(90, 90)] + [
        [shift, epg.T(FA, 0), shift, epg.ADC]] * nrf
    return plotting.plot_epg(seq, title="Turbo spin echo sequence",
                             figname="tse")


def main():
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        print("matplotlib unavailable; skipping diagrams")
        return
    ssfp_diagram().savefig("epg_ssfp.png", dpi=110)
    tse_diagram().savefig("epg_tse.png", dpi=110)
    print("saved: epg_ssfp.png epg_tse.png")


if __name__ == "__main__":
    main()
