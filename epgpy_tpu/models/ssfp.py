"""Steady-state sequences: SPGR (RF-spoiled GRE) and DESS
(reference examples/basics: spgr.py, dess.py)."""

from __future__ import annotations

import numpy as np

from ..ops import T, E, S, Adc, ADC

__all__ = ["spgr_sequence", "dess_sequence"]


def spgr_sequence(npulse: int, *, alpha=15.0, TR=10.0, TE=3.0,
                  T1=1000.0, T2=80.0, phase_inc=117.0):
    """RF-spoiled gradient-echo with quadratic phase cycling."""
    phases = np.cumsum(np.arange(npulse) * phase_inc) % 360.0
    seq = []
    for i in range(npulse):
        seq += [
            T(alpha, phases[i]),
            E(TE, T1, T2), Adc(phase=-phases[i]),
            E(TR - TE, T1, T2), S(1),
        ]
    return seq


def dess_sequence(npulse: int, *, alpha=25.0, TR=20.0, TE=5.0,
                  T1=1000.0, T2=80.0):
    """Double-echo steady state: FISP + PSIF echoes per TR."""
    seq = []
    for _ in range(npulse):
        seq += [
            T(alpha, 0),
            E(TE, T1, T2), ADC,                 # FISP echo (pre-gradient)
            E(TR - 2 * TE, T1, T2), S(1),
            E(TE, T1, T2), ADC,                 # PSIF echo (post-gradient)
        ]
    return seq
