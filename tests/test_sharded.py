"""Sharded state-vector engine tests on the 8-device CPU mesh.

Differential: mesh-sharded evolution (with global-local qubit swaps over
ppermute) must reproduce the single-chip engine exactly.
"""

import numpy as np
import pytest

import jax

from hybridq_tpu.circuit import Circuit
from hybridq_tpu.gate import Gate
from hybridq_tpu.extras.random import get_rqc
from hybridq_tpu.simulation import simulate
from hybridq_tpu.simulation.sharded import ShardedEvolver

ATOL = 1e-5


def _n_devices():
    return len(jax.devices())


@pytest.mark.parametrize('n_dev', [2, 4, 8])
def test_sharded_matches_single_chip(n_dev):
    if _n_devices() < n_dev:
        pytest.skip('not enough devices')
    n = 7
    c = get_rqc(n, 30, indexes=list(range(n))) + Circuit(
        Gate('H', [q]) for q in range(n))  # H layer: full coverage
    expected = np.asarray(
        simulate(c, initial_state='0', optimize='evolution',
                 complex_type='complex128'))

    ev = ShardedEvolver(n_qubits=n, devices=jax.devices()[:n_dev],
                        complex_type='complex64')
    psi = ev.prepare_state('0' * n)
    psi = ev.evolve(psi, c)
    got = ev.gather(psi)
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_sharded_global_qubit_gates():
    """Gates acting directly on global (sharded) qubits force ppermute."""
    if _n_devices() < 8:
        pytest.skip('not enough devices')
    n = 6
    # All gates on the three global qubits (0, 1, 2) of an 8-device mesh.
    c = Circuit([Gate('H', [0]), Gate('H', [1]), Gate('CX', [0, 2]),
                 Gate('CZ', [1, 2]), Gate('X', [0])])
    expected = np.asarray(
        simulate(c + Circuit([Gate('I', [q]) for q in range(n)]),
                 initial_state='0', optimize='evolution',
                 complex_type='complex128', remove_id_gates=False))

    ev = ShardedEvolver(n_qubits=n, devices=jax.devices()[:8])
    psi = ev.prepare_state('0' * n)
    psi = ev.evolve(psi, c, qubits=list(range(n)))
    got = ev.gather(psi)
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_sharded_initial_states_and_norm():
    if _n_devices() < 4:
        pytest.skip('not enough devices')
    n = 6
    ev = ShardedEvolver(n_qubits=n, devices=jax.devices()[:4])
    psi = ev.prepare_state('+-01+-')
    from hybridq_tpu.simulation import prepare_state
    np.testing.assert_allclose(ev.gather(psi), prepare_state('+-01+-'),
                               atol=ATOL)
    assert abs(ev.norm(psi) - 1.0) < 1e-6


def test_sharded_sequential_evolutions():
    """The evolver's qubit map persists across evolve calls."""
    if _n_devices() < 4:
        pytest.skip('not enough devices')
    n = 6
    qubits = list(range(n))
    c1 = get_rqc(n, 12, indexes=qubits)
    c2 = get_rqc(n, 12, indexes=qubits)
    pad = Circuit(Gate('I', [q]) for q in qubits)
    expected = np.asarray(
        simulate(c1 + c2 + pad, initial_state='0',
                 complex_type='complex128', simplify=False,
                 remove_id_gates=False))

    ev = ShardedEvolver(n_qubits=n, devices=jax.devices()[:4])
    psi = ev.prepare_state('0' * n)
    psi = ev.evolve(psi, c1, qubits=qubits)
    psi = ev.evolve(psi, c2, qubits=qubits)
    np.testing.assert_allclose(ev.gather(psi), expected, atol=ATOL)


def test_simulate_dispatch_sharded():
    """optimize='evolution-sharded' through the public simulate()."""
    if _n_devices() < 4:
        pytest.skip('not enough devices')
    n = 6
    c = get_rqc(n, 20, indexes=list(range(n)))
    pad = Circuit(Gate('I', [q]) for q in range(n))
    expected = np.asarray(
        simulate(c + pad, initial_state='0', complex_type='complex128',
                 remove_id_gates=False, simplify=False))
    got = np.asarray(
        simulate(c + pad, initial_state='0',
                 optimize='evolution-sharded', remove_id_gates=False,
                 simplify=False))
    np.testing.assert_allclose(got, expected, atol=1e-4)
