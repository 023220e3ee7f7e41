"""Single-chip state-vector evolution (analog of the reference
``examples/example.py``: 23 qubits × 2000 gates)."""

import importlib.util
import os
import sys

if importlib.util.find_spec('hybridq_tpu') is None:
    # Fresh checkout without the editable install: run in-place.
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np

# Allow running on CPU: python examples/example.py --cpu
if '--cpu' in sys.argv:
    import jax
    jax.config.update('jax_platforms', 'cpu')

from hybridq_tpu.extras.random import get_rqc
from hybridq_tpu.simulation import simulate

n_qubits = int(os.environ.get('N_QUBITS', 16))
n_gates = int(os.environ.get('N_GATES', 400))

print(f'# Generate random circuit ({n_qubits} qubits, {n_gates} gates)')
circuit = get_rqc(n_qubits, n_gates, indexes=list(range(n_qubits)))

t0 = time.time()
psi = simulate(circuit, initial_state='0', optimize='evolution')
print(f'# Evolution runtime: {time.time() - t0:.2f}s')

norm = np.linalg.norm(np.asarray(psi).ravel())
print(f'# |psi| = {norm:.6f}')
assert abs(norm - 1) < 1e-3

# Cross-check a small prefix against the einsum engine.
small = circuit[:50]
a = np.asarray(simulate(small, initial_state='0', optimize='evolution'))
b = np.asarray(simulate(small, initial_state='0',
                        optimize='evolution-einsum', backend='numpy'))
assert np.allclose(a, b, atol=1e-4)
print('# OK: engines agree')
