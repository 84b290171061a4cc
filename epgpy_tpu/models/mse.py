"""Multi-spin-echo / CPMG sequences (reference examples/basics/mse.py)."""

from __future__ import annotations

import numpy as np

from ..ops import T, E, S, ADC

__all__ = ["cpmg_sequence", "mse_signal"]


def cpmg_sequence(necho: int, *, exc=(90.0, 90.0), ref=(150.0, 0.0),
                  esp: float = 9.0, T1=None, T2=None, g=0.0, B1=None):
    """Build a CPMG multi-spin-echo sequence (operator list).

    Args:
        necho: number of echoes; esp: echo spacing (ms).
        exc/ref: (alpha, phi) of excitation and refocusing pulses (deg).
        T1/T2/g: if given, interleave relaxation; B1: scales ref alpha.
    """
    alpha = ref[0] if B1 is None else np.asarray(B1) * ref[0]
    seq = [T(*exc)]
    for _ in range(necho):
        if T2 is not None or T1 is not None:
            e = E(esp / 2, 1e10 if T1 is None else T1,
                  1e10 if T2 is None else T2, g)
            seq += [e, S(1), T(alpha, ref[1]), e, S(1), ADC]
        else:
            seq += [S(1, duration=esp / 2), T(alpha, ref[1]),
                    S(1, duration=esp / 2), ADC]
    return seq


def mse_signal(necho: int, T1, T2, *, esp: float = 9.0, B1=None, **kwargs):
    """Simulate a CPMG echo train; returns (necho, ...) complex numpy."""
    from ..engine import simulate
    seq = cpmg_sequence(necho, esp=esp, T1=T1, T2=T2, B1=B1, **kwargs)
    return simulate(seq)
