"""Runtime-position kernel tests: IndexedEvolver vs the per-structure
traced engine and the matrix oracle."""

import numpy as np
import pytest

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import Gate
from hybridq_tpu.extras.random import get_rqc
from hybridq_tpu.simulation import simulate, prepare_state
from hybridq_tpu.simulation.kernels import IndexedEvolver

ATOL = 1e-4


def _run_indexed(c, n, row_bits=4):
    ev = IndexedEvolver(n, row_bits=row_bits)
    state = ev.prepare_state('0' * n)
    qubit_index = {q: q for q in range(n)}  # dense integer labels
    state = ev.apply_gates(state, c, qubit_index)
    return ev.gather(state)


@pytest.mark.parametrize('n,row_bits', [(6, 3), (8, 4), (8, 0), (8, 8)])
def test_indexed_matches_oracle(n, row_bits):
    c = get_rqc(n, 30, indexes=list(range(n)))
    pad = Circuit(Gate('I', [q]) for q in range(n))
    expected = np.asarray(
        simulate(c + pad, initial_state='0', complex_type='complex128',
                 remove_id_gates=False, simplify=False))
    got = _run_indexed(c, n, row_bits)
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_indexed_single_gates_every_position():
    """An X on each single qubit lands on the right axis for every
    hi/lo split."""
    n = 7
    for row_bits in (0, 3, 7):
        ev = IndexedEvolver(n, row_bits=row_bits)
        for q in range(n):
            state = ev.prepare_state('0' * n)
            state = ev.apply_gate(state, Gate('X').matrix(), (q,))
            psi = ev.gather(state)
            idx = [0] * n
            idx[q] = 1
            assert abs(psi[tuple(idx)] - 1) < ATOL, (q, row_bits)


def test_indexed_two_qubit_order():
    """CX control/target order must survive the hi/lo reordering."""
    n = 6
    for row_bits in (0, 3, 6):
        for qs in [(0, 5), (5, 0), (1, 2), (4, 3)]:
            ev = IndexedEvolver(n, row_bits=row_bits)
            state = ev.prepare_state('0' * n)
            state = ev.apply_gate(state, Gate('X').matrix(), (qs[0],))
            state = ev.apply_gate(state, Gate('CX').matrix(), qs)
            psi = ev.gather(state)
            idx = [0] * n
            idx[qs[0]] = 1
            idx[qs[1]] = 1
            assert abs(psi[tuple(idx)] - 1) < ATOL, (qs, row_bits)


def test_indexed_mixed_hi_lo_gate():
    """A 3-qubit gate spanning the row/column boundary."""
    n = 6
    row_bits = 3  # qubits 3,4,5 are 'low', 0,1,2 are 'high'
    c = Circuit([Gate('H', [1]), Gate('H', [4]),
                 Gate('MATRIX', qubits=[1, 3, 4],
                      U=np.linalg.qr(np.random.randn(8, 8) +
                                     1j * np.random.randn(8, 8))[0])])
    pad = Circuit(Gate('I', [q]) for q in range(n))
    expected = np.asarray(
        simulate(c + pad, initial_state='0', complex_type='complex128',
                 remove_id_gates=False, simplify=False))
    got = _run_indexed(c, n, row_bits)
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_deferred_layout_matches_eager():
    """defer=True leaves the state in gate layout; after flush it matches
    the defer=False result exactly."""
    import jax.numpy as jnp
    n = 8
    c = get_rqc(n, 25, indexes=list(range(n)))
    for row_bits in (0, 4, 8):
        evd = IndexedEvolver(n, row_bits=row_bits, defer=True)
        eve = IndexedEvolver(n, row_bits=row_bits, defer=False)
        sd = evd.prepare_state('0' * n)
        se = eve.prepare_state('0' * n)
        qubit_index = {q: q for q in range(n)}
        for g in c:
            U = np.ascontiguousarray(g.matrix())
            qs = tuple(qubit_index[q] for q in g.qubits)
            sd = evd.apply_gate(sd, U, qs)
            se = eve.apply_gate(se, U, qs)
        np.testing.assert_allclose(evd.gather(sd), eve.gather(se),
                                   atol=1e-4)
