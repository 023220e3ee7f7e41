"""Clifford / Pauli-string expansion (analog of the reference
``examples/example-mpi-clifford.py``: 20 qubits × 40 gates)."""

import importlib.util
import os
import sys

if importlib.util.find_spec('hybridq_tpu') is None:
    # Fresh checkout without the editable install: run in-place.
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

import sys

import numpy as np

if '--cpu' in sys.argv:
    import jax
    jax.config.update('jax_platforms', 'cpu')

from hybridq_tpu.circuit import Circuit
from hybridq_tpu.gate import Gate
from hybridq_tpu.extras.random import get_rqc
from hybridq_tpu.simulation import clifford

n_qubits = 20
n_gates = 40

circuit = get_rqc(n_qubits, n_gates, indexes=list(range(n_qubits)),
                  use_clifford_only=True, randomize_power=False)
op = Circuit([Gate('Z', [0]), Gate('X', [1])])

db, info = clifford.update_pauli_string(circuit, op, return_info=True,
                                        float_type='float64')
print(f'# strings: {len(db)}, explored branches: '
      f'{info["n_explored_branches"]}')
# A Clifford circuit never branches.
assert len(db) == 1
(phase,) = db.values()
assert abs(abs(phase) - 1) < 1e-8
print('# OK: Clifford circuit produced a single Pauli string')

# Add T gates: branching appears.
noisy = Circuit(circuit[:10]) + Circuit(
    [Gate('T', [0]), Gate('T', [1])]) + Circuit(circuit[10:20])
db2 = clifford.update_pauli_string(noisy, op, float_type='float64')
print(f'# with T gates: {len(db2)} strings')
assert len(db2) >= 1

ev = clifford.expectation_value(Circuit(circuit[:20]), op,
                                initial_state='0', float_type='float64')
print(f'# <0...|C† (Z0 X1) C|0...> = {ev:.6f}')
print('# OK')
