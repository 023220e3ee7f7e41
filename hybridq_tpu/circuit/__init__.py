"""Circuit IR and transformation toolbox."""

from hybridq_tpu.circuit.circuit import BaseCircuit, Circuit
from hybridq_tpu.circuit import utils

__all__ = ['BaseCircuit', 'Circuit', 'utils']
