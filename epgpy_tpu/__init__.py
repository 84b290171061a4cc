"""epgpy_tpu -- TPU-native Extended Phase Graph simulation framework.

A from-scratch JAX/XLA re-design of the EPG formalism with the capabilities
of the reference `epgpy` package: operator algebra (T/E/S/D/X/...), batched
parameter sweeps, autodiff-powered Jacobians/Hessians and CRLB sequence
optimization, n-D and float gradient shifts, exchange/MT, imaging readouts.

Usage mirrors the reference (``import epgpy_tpu as epg``):

>>> import epgpy_tpu as epg
>>> seq = [epg.T(90, 90)] + [epg.S(1), epg.T(150, 0), epg.S(1), epg.ADC] * 20
>>> signal = epg.simulate(epg.modify(seq, T2=[30, 40, 50]))
"""

from .statematrix import StateMatrix
from .ops import (
    Operator, EmptyOperator, MultiOperator, CombinableOperator,
    Wait, Offset, Spoiler, Reset, PD, System, NULL, SPOILER, RESET,
    ScalarOp, MatrixOp, CombinedOp,
    T, Tx, Ty, Phi, E, P, R, S, G, C, D, X, exchange_matrix,
    Probe, Adc, ADC, DFT, Imaging, RFPulse,
)
from .engine import (
    simulate, modify, flatten_sequence,
    getshape, getnshift, getkdim, get_adc_times,
)
from .diff import Jacobian, Hessian, Pair, PartialsPruner
from .sequence import Sequence, Variable, Constant, Expression, repeat
from . import sequence
from .utils import (
    gamma_1H, gamma_23Na, Axes, get_norm, get_wavenumber,
    spatial_range, space_to_freq, freq_to_space,
    dft, load_pulse, saturation_rate, absorption_rate,
)
from .utils.imaging import imaging
from .utils.ilt1d import ilt1d
from . import config, stats

# logging level from environment (reference epgpy/common.py:8-11)
import logging as _logging
import os as _os

if _os.environ.get("LOG_LEVEL"):
    _logging.basicConfig(level=_os.environ["LOG_LEVEL"].upper())

__version__ = "0.1.0"
