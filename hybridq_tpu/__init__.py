"""hybridq_tpu — a TPU-native hybrid quantum-circuit simulation framework.

A from-scratch rebuild of the capabilities of NASA's HybridQ simulator,
designed for TPU hardware: gate application runs as fused XLA/Pallas
kernels, the state vector shards over a `jax.sharding.Mesh` with ICI
collectives for qubit rotation, and sliced tensor-network contraction
batches over devices with `psum` reduction — in place of the reference's
C++/AVX core and MPI plumbing.

Engines:
  * state-vector evolution  — `hybridq_tpu.simulation.simulate`
  * tensor-network slicing  — `optimize='tn'`
  * Clifford expansion      — `hybridq_tpu.simulation.clifford`
  * density-matrix / noise  — `hybridq_tpu.dm`, `hybridq_tpu.noise`
"""

__version__ = '0.1.0'

from hybridq_tpu.gate import Gate, Projection, Measure, Control
from hybridq_tpu.circuit import Circuit

__all__ = ['Gate', 'Projection', 'Measure', 'Control', 'Circuit',
           '__version__']
