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

from .config import setup_compilation_cache as _setup_cache

_setup_cache()  # persistent XLA compile cache: warm processes skip recompiles

from .statematrix import StateMatrix
from .ops import (
    Operator, EmptyOperator, MultiOperator, CombinableOperator,
    Wait, Offset, Spoiler, Reset, PD, System, NULL, SPOILER, RESET,
    ScalarOp, MatrixOp, CombinedOp, combine,
    T, Tx, Ty, Phi, E, P, R, S, G, C, D, X, exchange_matrix,
    Probe, Adc, ADC, DFT, Imaging, RFPulse,
)
from .engine import (
    simulate, simulate_simple, modify, flatten_sequence,
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
from .utils.helpers import cexp, progressbar
from . import config, stats

# reference flat-namespace aliases (epgpy exposes its submodules directly;
# map them onto the ops/ package: `from epgpy import transition` parity)
from .ops import (
    base as operator, scalarop as opscalar, matrixop as opmatrix,
    transition, evolution, shift, diffusion, exchange, probe, rfpulse,
)
from . import statematrix, common, engine as functions
# `from epgpy import operators` parity (reference epgpy/operators.py is
# the combined operator namespace; here the ops package plays that role)
from . import ops as operators

#: reference epgpy/utils.py:5 -- np.newaxis alias used in probe expressions
NAX = None

#: the reference's DiffOperator base (epgpy/diff.py:20): the marker
#: class that ScalarOp/MatrixOp/S (hence all physics ops) inherit and
#: probes/Wait/Spoiler do not -- isinstance filters select the same set
from .ops.base import DiffOperator


def check_states(states):
    """Ladder conjugate-symmetry check (reference epgpy/utils.py:118-121)."""
    import numpy as _np
    states = _np.asarray(states)
    return bool(_np.allclose(states, states[..., ::-1, :][..., (1, 0, 2)].conj()))


def set_array_module(xp=None):
    """API-compat shim: this framework has exactly one backend (XLA).

    The reference switches numpy<->cupy globally (epgpy/common.py:21-50);
    here 'numpy'/'cupy' requests are accepted and ignored -- device
    placement is controlled by JAX (jax_default_device / shardings).
    """
    import jax.numpy as _jnp
    return _jnp


def get_array_module(*objs):
    """API-compat shim: always the JAX namespace (see set_array_module)."""
    import jax.numpy as _jnp
    return _jnp

# logging level from environment (reference epgpy/common.py:8-11)
import logging as _logging
import os as _os

if _os.environ.get("LOG_LEVEL"):
    _logging.basicConfig(level=_os.environ["LOG_LEVEL"].upper())

# must come after NAX/DiffOperator/etc.: epg re-imports them (core alias
# mirrors reference epgpy/core.py, the scripting flat namespace)
from . import epg as core  # noqa: E402

__version__ = "0.1.0"
