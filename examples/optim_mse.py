"""CRLB-guided echo-spacing choice for a multi-spin-echo T2 measurement.

Lee 2019 ("Flexible and Efficient Optimization of Quantitative Sequences
using Automatic Differentiation"): the Cramer-Rao lower bound on a T2
estimate, as a function of the echo spacing, locates the optimal MSE
protocol.  The whole 1000-point tau sweep is ONE batch axis pushed
through the Jacobian (jacfwd) path -- each point yields dS/dT2 for all
echoes and the CRLB is assembled from the stacked Jacobian.  Behavioral
parity: reference examples/differentiation/optim_mse.py.

Known anchor (single echo, known S0): the optimal echo time equals T2,
i.e. ESP/T2 = 1.
"""

import os

import numpy as np

import epgpy_tpu as epg
from epgpy_tpu import stats

NTAU = int(os.environ.get("MSE_NTAU", 1000))
MAXECHO = int(os.environ.get("MSE_MAXECHO", 6))


def crlb_vs_tau(tau, necho, variables, weights):
    T1, T2 = 1400.0, 10.0
    rlx = epg.E(tau, T1, T2, order1="T2")
    exc, inv, grd = epg.T(90, 90), epg.T(180, 0), epg.S(1)
    seq = [exc] + [grd, rlx, inv, grd, rlx, epg.ADC] * necho
    jac = np.asarray(epg.simulate(seq, probe=epg.Jacobian(variables)))
    # (necho, ntau, nvar) -> CRLB per tau over the echo axis
    return stats.crlb(np.moveaxis(jac, -2, 0), log=True, W=weights)


def main():
    T2 = 10.0
    tau = np.linspace(0.5, 10, NTAU)

    results = {}
    for necho in range(1, MAXECHO + 1):
        cost = np.asarray(crlb_vs_tau(tau, necho, "T2", [10.0]))
        results[necho] = cost
        best = tau[np.argmin(cost)]
        print(f"necho={necho}: optimal ESP/T2 = {2 * best / T2:.3f} "
              f"(log10 CRLB {cost.min():.3f})")

    # single echo, known S0: optimum echo time TE = 2 tau = T2
    best1 = tau[np.argmin(results[1])]
    assert abs(2 * best1 / T2 - 1.0) < 0.1, "necho=1 optimum must sit at TE=T2"
    # more echoes always lower the bound
    mins = [results[n].min() for n in sorted(results)]
    assert all(b < a for a, b in zip(mins, mins[1:]))

    # unknown S0: joint (magnitude, T2) estimation shifts the optimum
    results_s0 = {}
    for necho in range(2, MAXECHO + 1):
        cost = np.asarray(
            crlb_vs_tau(tau, necho, ["magnitude", "T2"], [1.0, 10.0]))
        results_s0[necho] = cost
        best = tau[np.argmin(cost)]
        print(f"necho={necho} (unknown S0): optimal ESP/T2 = "
              f"{2 * best / T2:.3f}")

    try:
        from matplotlib import pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(ncols=2, sharey=True, figsize=(9, 4),
                             num="mse-crlb")
    for necho, cost in results.items():
        h = axes[0].plot(2 * tau / T2, cost, label=f"Nechos={necho}")
        axes[0].scatter(2 * tau[np.argmin(cost)] / T2, cost.min(),
                        color=h[0].get_color())
    axes[0].set(title="known $S_0$", xlabel="ESP/T2", ylabel="log10(CRLB)")
    axes[0].legend(fontsize=7)
    axes[0].grid(True)
    for necho, cost in results_s0.items():
        h = axes[1].plot(2 * tau / T2, cost, label=f"Nechos={necho}")
        axes[1].scatter(2 * tau[np.argmin(cost)] / T2, cost.min(),
                        color=h[0].get_color())
    axes[1].set(title="unknown $S_0$", xlabel="ESP/T2")
    axes[1].legend(fontsize=7)
    axes[1].grid(True)
    fig.suptitle("CRLB of T2 vs MSE echo spacing (T2=10 ms)")
    fig.tight_layout()
    fig.savefig("optim_mse.png", dpi=110)
    print("saved: optim_mse.png")


if __name__ == "__main__":
    main()
