"""Mesh-sharded state-vector evolution — the analog of the reference's
MPI example (``examples/example-mpi.py``), with the 2^n state sharded
over a JAX device mesh and qubit rotation over ICI instead of MPI ranks.

Run on CPU with a virtual 8-device mesh:
    JAX_PLATFORMS='' python examples/example-sharded.py --cpu
"""

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
    jax.config.update('jax_num_cpu_devices', 8)
else:
    import jax

from hybridq_tpu.extras.random import get_rqc
from hybridq_tpu.simulation import simulate
from hybridq_tpu.simulation.sharded import ShardedEvolver

n_qubits = 10
devices = jax.devices()
print(f'# Devices: {len(devices)} × {devices[0].device_kind}')

circuit = get_rqc(n_qubits, 80, indexes=list(range(n_qubits)))

ev = ShardedEvolver(n_qubits=n_qubits, devices=devices)
psi = ev.prepare_state('0' * n_qubits)
psi = ev.evolve(psi, circuit, qubits=list(range(n_qubits)))
sharded = ev.gather(psi)
print(f'# sharded |psi| = {np.linalg.norm(sharded.ravel()):.6f}')

# Compare against the single-chip engine (the reference compares ranks
# against the single-node result at 1e-5).
single = np.asarray(
    simulate(circuit + type(circuit)(), initial_state='0',
             complex_type='complex64', simplify=False))
pad_needed = single.ndim != n_qubits
assert np.allclose(sharded.ravel()[:single.size], single.ravel(),
                   atol=1e-4)
print('# OK: sharded evolution matches single-chip engine')

# --- Runtime-position engine: compile-once kernels + native measurement ---
from hybridq_tpu.gate import ProjectionGate
from hybridq_tpu.simulation.sharded import ShardedIndexedEvolver

ev2 = ShardedIndexedEvolver(n_qubits=n_qubits, devices=devices, seed=7)
psi2 = ev2.prepare_state('0' * n_qubits)
psi2 = ev2.evolve(psi2, circuit, qubits=list(range(n_qubits)))
# Joint outcome distribution of two qubits (psum over the mesh), then a
# projective measurement with on-device collapse.
psi2, probs = ev2.probabilities(psi2, [0, 1])
print(f'# P(q0,q1) = {np.round(probs, 4)}  (sum={probs.sum():.6f})')
psi2, outcome = ev2.measure(psi2, [0, 1])
print(f'# measured outcome: {outcome:02b}, norm after collapse = '
      f'{ev2.norm(psi2):.6f}')
psi2 = ev2.evolve(psi2, type(circuit)([ProjectionGate('0', [2])]),
                  qubits=list(range(n_qubits)))
print(f'# after Projection(q2->0): norm = {ev2.norm(psi2):.6f}')
print(f'# compiled programs: {len(ev2._progs)} '
      '(bounded by gate-size classes, not circuits)')
