"""Random spoiling in fast gradient-echo imaging (Lin & Song 2009).

Gradient spoiling simulated with N isochromats: a P(tau, freqs) operator
dephases each within-voxel position by the gradient moment, and an
Adc(weights=1/N) probe averages the voxel signal.  Four spoiling schemes
are compared against the ideal-spoiler steady state: quadratic RF
(117 deg), random RF, random gradient moments, and random RF + gradient.
Behavioral parity: reference examples/gradient/random_spoiling.py
("profiles and steady state" part).

The whole isochromat axis is one batch dimension: each scheme is a single
compiled scan over the RF train.
"""

import os

import numpy as np

import epgpy_tpu as epg

NRF = int(os.environ.get("SPOIL_NRF", 400))
NPOINT = int(os.environ.get("SPOIL_NPOINT", 501))
MX = float(os.environ.get("SPOIL_MX", 20))  # gradient moment (cycles/pixel)


def steady_state(seq, **opts):
    return np.asarray(epg.simulate(seq, **opts))


def main():
    T1, T2, TR, FA = 60.0, 40.0, 1.0, 60.0
    rng = np.random.default_rng(1)

    pos = np.linspace(0, 1, NPOINT)
    freqs = pos - 0.5  # cycles/pixel across the voxel

    rlx = epg.E(TR, T1, T2)
    adc = epg.Adc(weights=np.full(NPOINT, 1.0 / NPOINT), reduce=True)

    # ideal spoiling: crusher zeroes F each TR
    seq = [[epg.T(FA, 180), epg.ADC, rlx, epg.SPOILER]] * NRF
    ideal = steady_state(seq).squeeze()

    # phase schedules
    phq = np.array([(n + 1) * n / 2 * 117.0 for n in range(NRF)])
    phr = rng.uniform(1, 360, NRF)
    krs = rng.uniform(0.5, 1, NRF)

    def spoiled(phases, moments):
        """Voxel-averaged approach to steady state + final spatial profile."""
        seq = []
        for n in range(NRF):
            rf = epg.T(FA, 180 + phases[n])
            spl = epg.P(moments[n] * MX, freqs)
            seq.append([rf, adc, rlx, spl])
        sig = steady_state(seq, asarray=True)
        # demodulate the RF phase (as the scanner receiver would)
        return sig * np.exp(-1j * np.pi * phases / 180)

    schemes = {
        "quadratic RF": spoiled(phq, np.ones(NRF)),
        "random RF": spoiled(phr, np.ones(NRF)),
        "random gradient": spoiled(phq, krs),
        "random RF+gradient": spoiled(phr, krs),
    }

    print(f"ideal steady state |F0| = {np.abs(ideal[-1]):.4f}")
    for name, sig in schemes.items():
        tail = np.abs(sig[-NRF // 4:])
        bias = tail.mean() / np.abs(ideal[-NRF // 4:]).mean()
        ripple = tail.std() / tail.mean()
        print(f"{name:>20}: mean/ideal = {bias:.3f}, ripple = {ripple:.3f}")

    # random RF+gradient should hug the ideal signal far better than
    # quadratic-RF-only at these settings (Lin & Song 2009, fig. 2)
    def tail_err(sig):
        t = sig[-NRF // 4:]
        return np.abs(np.abs(t) - np.abs(ideal[-NRF // 4:])).mean()

    assert tail_err(schemes["random RF+gradient"]) < 0.3 * np.abs(ideal[-1])

    try:
        from matplotlib import pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(2, 2, figsize=(9, 6), sharex=True, sharey=True,
                             num="random-spoiling")
    for ax, (name, sig) in zip(axes.flat, schemes.items()):
        ax.plot(np.abs(sig), label="|signal|")
        ax.plot(np.abs(ideal), "k:", label="ideal")
        ax.set(title=name, ylim=(0, 0.25))
        ax.legend(loc="upper right", fontsize=7)
    fig.suptitle("Approach to steady state (voxel-averaged isochromats)")
    fig.supxlabel("RF index")
    fig.supylabel("|F0| (a.u.)")
    fig.tight_layout()
    fig.savefig("random_spoiling.png", dpi=110)
    print("saved: random_spoiling.png")


if __name__ == "__main__":
    main()
