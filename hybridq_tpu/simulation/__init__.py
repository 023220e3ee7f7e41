"""Simulation engines: state-vector (single-chip + sharded), tensor
network, Clifford expansion."""

from hybridq_tpu.simulation.prepare import (prepare_state,
                                            prepare_state_jax,
                                            prepare_state_split)
from hybridq_tpu.simulation.simulation import simulate, expectation_value
from hybridq_tpu.simulation import clifford

__all__ = ['prepare_state', 'prepare_state_jax', 'prepare_state_split',
           'simulate', 'expectation_value', 'clifford']
