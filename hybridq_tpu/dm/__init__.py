"""Density-matrix layer: supergates, super-circuits, and the
doubled-qubit evolution engine."""

from hybridq_tpu.dm.gate import (BaseSuperGate, MatrixSuperGate,
                                 KrausSuperGate, TupleSuperGate, Gate)
from hybridq_tpu.dm.circuit import Circuit
from hybridq_tpu.dm.simulation import simulate

__all__ = ['BaseSuperGate', 'MatrixSuperGate', 'KrausSuperGate',
           'TupleSuperGate', 'Gate', 'Circuit', 'simulate']
