"""Generate golden parity values by running the reference epgpy (NumPy).

Run where /root/reference exists; commits small .npz files used by the test
suite.  The test suite itself never imports the reference.

Usage: python tools/make_golden.py
"""

import os
import sys

import numpy as np

REF = os.environ.get("EPGPY_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

sys.path.insert(0, REF)

import epgpy.operators as ops  # noqa: E402
import epgpy.functions as fun  # noqa: E402


def cpmg():
    T2s = [30.0, 45.0, 60.0]
    necho = 8
    seq = [ops.T(90, 90)] + [
        ops.E(4.5, 1400, T2s), ops.S(1), ops.T(150, 0),
        ops.E(4.5, 1400, T2s), ops.S(1), ops.ADC,
    ] * necho
    return {"signal": np.asarray(fun.simulate(seq)), "T2s": np.asarray(T2s)}


def spgr():
    # RF-spoiled gradient echo with quadratic phase cycling
    n, TR, TE = 50, 10.0, 3.0
    phases = np.cumsum(np.arange(n) * 117.0)
    seq = []
    for i in range(n):
        seq += [
            ops.T(15, phases[i] % 360),
            ops.E(TE, 1000, 80), ops.Adc(phase=-(phases[i] % 360)),
            ops.E(TR - TE, 1000, 80), ops.S(1),
        ]
    return {"signal": np.asarray(fun.simulate(seq, max_nstate=20))}


def mse_b1():
    # vectorized MSE with B1 sweep via modify (docs/basics.md example)
    necho = 18
    T2s = np.linspace(20, 100, 11)
    B1s = np.linspace(0.5, 1.2, 7)
    seq = [ops.T(90, 90)]
    for _ in range(necho):
        seq += [
            ops.E(4.5, 1400, T2s), ops.S(1),
            ops.T(150 * B1s[None, :], 0),
            ops.E(4.5, 1400, T2s), ops.S(1), ops.ADC,
        ]
    return {
        "signal": np.asarray(fun.simulate(seq)),
        "T2s": T2s, "B1s": B1s,
    }


def fisp_mrf():
    # small FISP MRF dictionary: variable flip angles, fixed TR
    np.random.seed(0)
    npulse = 64
    FAs = 10 + 50 * np.abs(np.sin(np.arange(npulse) * 2 * np.pi / npulse))
    TR, TE = 12.0, 5.0
    T1s = np.asarray([300.0, 800.0, 1400.0])
    T2s = np.asarray([30.0, 80.0, 110.0])
    seq = []
    for i in range(npulse):
        seq += [
            ops.T(FAs[i], 90),
            ops.E(TE, T1s, T2s), ops.ADC,
            ops.E(TR - TE, T1s, T2s), ops.S(1),
        ]
    return {
        "signal": np.asarray(fun.simulate(seq, max_nstate=10)),
        "FAs": FAs, "T1s": T1s, "T2s": T2s,
    }


CASES = {
    "cpmg": cpmg,
    "spgr": spgr,
    "mse_b1": mse_b1,
    "fisp_mrf": fisp_mrf,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    names = sys.argv[1:] or list(CASES)
    for name in names:
        data = CASES[name]()
        path = os.path.join(OUT, f"{name}.npz")
        np.savez_compressed(path, **data)
        print(f"wrote {path}: " + ", ".join(f"{k}{v.shape}" for k, v in data.items()))


if __name__ == "__main__":
    main()
