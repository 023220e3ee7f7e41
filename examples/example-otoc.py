"""OTOC workload (Science 374, 6574 (2021) scrambling experiment) on a
sub-grid of the Sycamore layout, simulated with the evolution engine and
cross-checked via the Clifford expansion of the ancilla observable."""

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

from hybridq_tpu.architecture.google import sycamore
from hybridq_tpu.circuit import Circuit
from hybridq_tpu.extras.otoc import generate_OTOC
from hybridq_tpu.gate import Gate
from hybridq_tpu.simulation import expectation_value, simulate

# Small patch of the Sycamore grid
qpu = [(x, y) for x, y in sycamore.layout if 2 <= x <= 5 and 4 <= y <= 6]
layers = sycamore.get_layers(qpu)
seq = ['A', 'B', 'C', 'D']


def ones():
    i = 0
    while True:
        yield Gate('SQRT_X' if i % 2 else 'SQRT_Y')
        i += 1


def twos():
    while True:
        yield Gate('FSIM', params=[np.pi / 2, np.pi / 6])


ancilla = qpu[0]
# target coupled to the ancilla in one of the first layers
target0 = next(b if a == ancilla else a
               for s in seq for a, b in layers[s]
               if ancilla in (a, b))
butterfly = next(q for q in qpu if q not in (ancilla, target0))

circ = generate_OTOC(layout=layers, depth=4, sequence=seq,
                     one_qb_gates=ones(), two_qb_gates=twos(),
                     butterfly_op='X', ancilla=ancilla,
                     targets=[target0, butterfly])
n = len(circ.all_qubits)
print(f'# OTOC circuit: {n} qubits, {len(circ)} gates')

# <psi| Y_ancilla |psi> is the OTOC signal (ancilla prepared with SQRT_X)
psi = np.asarray(simulate(circ, initial_state='0',
                          complex_type='complex128'))
otoc = expectation_value(psi, Circuit([Gate('Y', [ancilla])]),
                         qubits_order=circ.all_qubits,
                         complex_type='complex128')
print(f'# OTOC <Y_ancilla> = {float(np.real(otoc)):+.6f}')
assert abs(np.imag(otoc)) < 1e-6

# Cross-check with the Clifford/Pauli-string engine
from hybridq_tpu.simulation import clifford
ev2 = clifford.expectation_value(circ, Circuit([Gate('Y', [ancilla])]),
                                 initial_state='0', float_type='float64')
print(f'# Clifford engine    = {float(np.real(ev2)):+.6f}')
assert abs(np.real(otoc) - np.real(ev2)) < 1e-4
print('# OK: engines agree on the OTOC signal')
