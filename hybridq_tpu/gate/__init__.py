"""Gate layer: gate zoo, algebra, and composition utilities."""

from hybridq_tpu.gate.gate import (BaseGate, PowerMatrixGate, NamedGate,
                                   MatrixGate, TupleGate, FunctionalGate,
                                   StochasticGate, SchmidtGate,
                                   ControlledGate, ProjectionGate,
                                   MeasureGate, Gate, Projection, Measure,
                                   Control)
from hybridq_tpu.gate.utils import (get_available_gates, get_clifford_gates,
                                    merge, pad, decompose, is_clifford)
from hybridq_tpu.gate.zoo import GATES, ALIASES

__all__ = [
    'BaseGate', 'PowerMatrixGate', 'NamedGate', 'MatrixGate', 'TupleGate',
    'FunctionalGate', 'StochasticGate', 'SchmidtGate', 'ControlledGate',
    'ProjectionGate', 'MeasureGate', 'Gate', 'Projection', 'Measure',
    'Control', 'get_available_gates', 'get_clifford_gates', 'merge', 'pad',
    'decompose', 'is_clifford', 'GATES', 'ALIASES'
]
