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


def test_simulate_dispatch_sharded_array_initial_state(seed):
    """Array initial states scatter into the shard layout (the
    single-chip engines accept arrays; the sharded one must too)."""
    if _n_devices() < 8:
        pytest.skip('not enough devices')
    n = 7
    rng = np.random.default_rng(seed)
    psi0 = rng.standard_normal((2,) * n) + \
        1j * rng.standard_normal((2,) * n)
    psi0 = (psi0 / np.linalg.norm(psi0)).astype('complex64')
    c = Circuit(Gate('H', [q]) for q in range(n)) + \
        get_rqc(n, 20, indexes=list(range(n)))
    expected = np.asarray(
        simulate(c, initial_state=psi0, complex_type='complex128',
                 simplify=False))
    got = np.asarray(
        simulate(c, initial_state=psi0, optimize='evolution-sharded',
                 simplify=False))
    np.testing.assert_allclose(got, expected, atol=1e-4)


# ---------------------------------------------------------------------------
# Runtime-position sharded engine (ShardedIndexedEvolver)
# ---------------------------------------------------------------------------
from hybridq_tpu.gate import MeasureGate, ProjectionGate  # noqa: E402
from hybridq_tpu.simulation.sharded import ShardedIndexedEvolver  # noqa


@pytest.mark.parametrize('n_dev', [2, 8])
def test_indexed_sharded_matches_single_chip(n_dev):
    if _n_devices() < n_dev:
        pytest.skip('not enough devices')
    n = 7
    c = get_rqc(n, 30, indexes=list(range(n))) + Circuit(
        Gate('H', [q]) for q in range(n))
    expected = np.asarray(
        simulate(c, initial_state='0', optimize='evolution',
                 complex_type='complex128'))
    ev = ShardedIndexedEvolver(n_qubits=n, devices=jax.devices()[:n_dev])
    psi = ev.prepare_state('0' * n)
    psi = ev.evolve(psi, c)
    np.testing.assert_allclose(ev.gather(psi), expected, atol=ATOL)


def test_indexed_sharded_compiles_once_per_class():
    """Two structurally different circuits must not add programs."""
    if _n_devices() < 4:
        pytest.skip('not enough devices')
    np.random.seed(0xC0FFEE)  # unseeded draws can exceed the class bound
    n = 7
    qubits = list(range(n))
    ev = ShardedIndexedEvolver(n_qubits=n, devices=jax.devices()[:4])
    psi = ev.prepare_state('0' * n)
    for _ in range(4):  # warm the bounded program classes
        psi = ev.evolve(psi, get_rqc(n, 20, indexes=qubits),
                        qubits=qubits)
    n_progs = len(ev._progs)
    # The class set is bounded: (k_hi, k_lo) gate classes + g x slot
    # swaps — a dozen programs, not one per circuit.
    assert n_progs <= 14
    for _ in range(3):  # further distinct circuits add nothing
        psi = ev.evolve(psi, get_rqc(n, 20, indexes=qubits),
                        qubits=qubits)
    assert len(ev._progs) == n_progs


def test_indexed_sharded_projection():
    if _n_devices() < 4:
        pytest.skip('not enough devices')
    n = 6
    qubits = list(range(n))
    c = get_rqc(n, 15, indexes=qubits)
    c_proj = c + Circuit([ProjectionGate('01', [0, 3])])
    pad = Circuit(Gate('I', [q]) for q in qubits)
    expected = np.asarray(
        simulate(c_proj + pad, initial_state='0',
                 complex_type='complex128', remove_id_gates=False,
                 simplify=False))
    ev = ShardedIndexedEvolver(n_qubits=n, devices=jax.devices()[:4])
    psi = ev.prepare_state('0' * n)
    psi = ev.evolve(psi, c_proj, qubits=qubits)
    np.testing.assert_allclose(ev.gather(psi), expected, atol=ATOL)


def test_indexed_sharded_measure_probabilities():
    if _n_devices() < 4:
        pytest.skip('not enough devices')
    n = 6
    qubits = list(range(n))
    c = get_rqc(n, 15, indexes=qubits)
    pad = Circuit(Gate('I', [q]) for q in qubits)
    full = np.asarray(
        simulate(c + pad, initial_state='0', complex_type='complex128',
                 remove_id_gates=False, simplify=False))
    # joint probs of qubits (1, 4): axes-first marginal
    m = np.transpose(np.abs(full)**2, (1, 4, 0, 2, 3, 5))
    expected = m.reshape(4, -1).sum(axis=1)

    ev = ShardedIndexedEvolver(n_qubits=n, devices=jax.devices()[:4])
    psi = ev.prepare_state('0' * n)
    psi = ev.evolve(psi, c, qubits=qubits)
    psi, probs = ev.probabilities(psi, [1, 4])
    np.testing.assert_allclose(probs, expected, atol=1e-5)
    assert abs(probs.sum() - 1) < 1e-5

    # collapse must equal a renormalized projection onto the outcome
    psi2, outcome = ev.measure(psi, [1, 4])
    mask = np.zeros_like(full, dtype=bool)
    idx = [slice(None)] * n
    idx[1] = outcome >> 1
    idx[4] = outcome & 1
    mask[tuple(idx)] = True
    sel = np.where(mask, full, 0)
    sel = sel / np.linalg.norm(sel)
    np.testing.assert_allclose(ev.gather(psi2), sel, atol=ATOL)


def test_indexed_sharded_functional_host_fallback():
    if _n_devices() < 4:
        pytest.skip('not enough devices')
    from hybridq_tpu.gate import FunctionalGate as FG
    n = 6
    qubits = list(range(n))
    c = get_rqc(n, 10, indexes=qubits)

    def phase_flip(self, psi, order):
        out = psi.copy()
        out *= -1
        return out, order

    fg = FG(phase_flip, qubits=[0])
    pad = Circuit(Gate('I', [q]) for q in qubits)
    expected = -np.asarray(
        simulate(c + pad, initial_state='0', complex_type='complex128',
                 remove_id_gates=False, simplify=False))
    ev = ShardedIndexedEvolver(n_qubits=n, devices=jax.devices()[:4])
    psi = ev.prepare_state('0' * n)
    with pytest.warns(UserWarning, match='host'):
        psi = ev.evolve(psi, c + Circuit([fg]), qubits=qubits)
    np.testing.assert_allclose(ev.gather(psi), expected, atol=ATOL)
