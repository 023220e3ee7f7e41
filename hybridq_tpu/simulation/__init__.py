"""Simulation engines: state-vector (single-chip + sharded), tensor
network, Clifford expansion."""

from hybridq_tpu.simulation.prepare import prepare_state, prepare_state_jax
from hybridq_tpu.simulation.simulation import simulate, expectation_value

__all__ = ['prepare_state', 'prepare_state_jax', 'simulate',
           'expectation_value']
