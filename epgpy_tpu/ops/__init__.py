"""Operator namespace: physics kernels and utilities (flat re-exports)."""

from .base import (
    Operator, EmptyOperator, MultiOperator, CombinableOperator,
    Wait, Offset, Spoiler, Reset, PD, System, NULL, SPOILER, RESET,
)
from .scalarop import ScalarOp
from .matrixop import MatrixOp
from .transition import T, Tx, Ty, Phi
from .evolution import E, P, R
from .shift import S, G, C
from .diffusion import D
from .exchange import X, exchange_matrix
from .combined import CombinedOp, combine
from .rfpulse import RFPulse
from .probe import Probe, Adc, ADC, DFT, Imaging
# reference epgpy/operators.py also re-exports the diff probes and the
# DiffOperator base (`from epgpy import operators` drop-in parity);
# imported late to avoid a cycle (diff.py imports ops.probe)
from ..diff import Jacobian, Hessian
from .base import DiffOperator

__all__ = [
    "Jacobian", "Hessian", "DiffOperator",
    "Operator", "EmptyOperator", "MultiOperator", "CombinableOperator",
    "Wait", "Offset", "Spoiler", "Reset", "PD", "System",
    "NULL", "SPOILER", "RESET",
    "ScalarOp", "MatrixOp",
    "T", "Tx", "Ty", "Phi", "E", "P", "R", "S", "G", "C", "D", "X",
    "exchange_matrix", "CombinedOp", "combine", "RFPulse",
    "Probe", "Adc", "ADC", "DFT", "Imaging",
]
