"""Hyperecho: a train of small pulses, a 180, then the time-reversed
negated train refocuses the full magnetization (Weigel 2015, JMRI 41:266).

Demonstrates whole-ladder probes (``probe=("F", "Z")``) and a
pre-allocated state capacity via ``init=StateMatrix(nstate=...)``
(reference examples/basics/hyperecho.py -- re-expressed, not copied).
"""

import numpy as np

import epgpy_tpu as epg


def main():
    alpha, nrf = 10.0, 111  # pulses per half-train
    exc = epg.T(90, 90)
    rfc = epg.T(180, 0)
    grad = epg.S(1)

    seq = [exc, grad]
    seq += [[epg.T(alpha, 0), grad, epg.ADC]] * nrf
    seq += [rfc, grad]
    seq += [[epg.T(-alpha, 0), grad, epg.ADC]] * nrf

    ncap = nrf + 10
    init = epg.StateMatrix(nstate=ncap, max_nstate=ncap)
    F, Z = epg.simulate(seq, probe=("F", "Z"), init=init)
    F, Z = F[:, 0].T, Z[:, 0].T  # (2*ncap+1 states, 2*nrf echoes)
    ncap = F.shape[0] // 2  # center row index

    echo = np.abs(F[ncap])  # F0 row across echoes
    print(f"ladder occupancy at midpoint: "
          f"{int((np.abs(F[:, nrf - 1]) > 1e-6).sum())} F-states")
    print(f"|F0| just before refocusing train ends: {echo[nrf - 1]:.4f}")
    print(f"|F0| at the hyperecho:                  {echo[-1]:.4f}  (-> 1.0)")
    assert echo[-1] > 0.999, "hyperecho should refocus fully"

    try:
        from matplotlib import pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    for ax, arr, title, vmin in ((axes[0], F, "|F(k)|", 1e-2),
                                 (axes[1], Z, "|Z(k)|", 1e-3)):
        ax.imshow(np.abs(arr), origin="lower", vmin=vmin,
                  aspect=arr.shape[1] / arr.shape[0],
                  cmap="jet", interpolation="nearest")
        ax.set_xlabel("# echo")
        ax.set_title(title)
        ax.set_yticks([0, ncap, 2 * ncap],
                      [r"$-k_{max}$", "0", r"$+k_{max}$"])
    fig.suptitle("Hyperecho state evolution")
    fig.tight_layout()
    fig.savefig("hyperecho.png", dpi=110)
    print("saved hyperecho.png")


if __name__ == "__main__":
    main()
