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


def test_deferred_layout_flush_idempotent():
    """Flushing after every gate must match one flush at the end (the
    deferred layout is an internal detail, not a semantic one)."""
    n = 12
    c = get_rqc(n, 25, indexes=list(range(n)))
    for row_bits in (7, 10):
        evd = IndexedEvolver(n, row_bits=row_bits)
        eve = IndexedEvolver(n, row_bits=row_bits)
        sd = evd.prepare_state('0' * n)
        se = eve.prepare_state('0' * n)
        qubit_index = {q: q for q in range(n)}
        for g in c:
            U = np.ascontiguousarray(g.matrix())
            qs = tuple(qubit_index[q] for q in g.qubits)
            sd = evd.apply_gate(sd, U, qs)
            se = eve.apply_gate(se, U, qs)
            se = eve.flush(se)
        np.testing.assert_allclose(evd.gather(sd), eve.gather(se),
                                   atol=1e-4)


def test_small_and_big_paths_agree():
    """The flat-gather small path and the [2R, C] row/ext path must
    produce identical states on the same circuit."""
    n = 12
    c = get_rqc(n, 30, indexes=list(range(n)))
    qubit_index = {q: q for q in range(n)}
    ev_small = IndexedEvolver(n, row_bits=0)     # forces the small path
    ev_big = IndexedEvolver(n, row_bits=8)       # [2^5, 2^8] view
    assert ev_small.small and not ev_big.small
    ss = ev_small.apply_gates(ev_small.prepare_state('0' * n), c,
                              qubit_index)
    sb = ev_big.apply_gates(ev_big.prepare_state('0' * n), c,
                            qubit_index)
    np.testing.assert_allclose(ev_small.gather(ss), ev_big.gather(sb),
                               atol=1e-4)


def _rand_u(k, rng):
    m = rng.standard_normal((2**k, 2**k)) + \
        1j * rng.standard_normal((2**k, 2**k))
    q, _ = np.linalg.qr(m)
    return q.astype('complex64')


def _oracle_apply(psi, U, qs, n):
    k = len(qs)
    T = np.moveaxis(psi.reshape((2,) * n), qs, range(k))
    T = (U.astype(complex) @ T.reshape(2**k, -1)).reshape((2,) * n)
    return np.moveaxis(T, range(k), qs).reshape(-1)


@pytest.mark.parametrize('max_size', [4, 7])
def test_extended_low7_engine_matches_oracle(max_size):
    """Extended low-7 path (L=10, shadow-tracked columns): random gates
    up to 7 qubits at arbitrary positions, including rotation-heavy
    column traffic."""
    rng = np.random.default_rng(11 + max_size)
    n = 14
    ev = IndexedEvolver(n)
    assert not ev.small, "big path must be active at n=14, L=10"
    state = ev.prepare_state('0' * n)
    psi = np.zeros(2**n, dtype=complex)
    psi[0] = 1.0
    for _ in range(25):
        k = int(rng.integers(1, max_size + 1))
        qs = tuple(int(x) for x in rng.choice(n, k, replace=False))
        U = _rand_u(k, rng)
        state = ev.apply_gate(state, U, qs)
        psi = _oracle_apply(psi, U, qs, n)
    got = ev.gather(state).reshape(-1)
    np.testing.assert_allclose(got, psi, atol=ATOL)


def test_pair_matrix_gates_matches_unpaired():
    from hybridq_tpu.simulation.kernels import pair_matrix_gates

    rng = np.random.default_rng(3)
    n = 14
    items = []
    for _ in range(20):
        qs = tuple(int(x) for x in rng.choice(n, 4, replace=False))
        items.append((_rand_u(4, rng), qs))
    paired = pair_matrix_gates(items, n)
    assert len(paired) < len(items)  # some blocks must fuse
    psi = np.zeros(2**n, dtype=complex)
    psi[0] = 1.0
    for U, qs in items:
        psi = _oracle_apply(psi, U, qs, n)
    ev = IndexedEvolver(n)
    state = ev.prepare_state('0' * n)
    for U, qs in paired:
        state = ev.apply_gate(state,
                              np.ascontiguousarray(U, dtype='complex64'),
                              qs)
    np.testing.assert_allclose(ev.gather(state).reshape(-1), psi,
                               atol=ATOL)


def test_plan_classes_matches_apply(monkeypatch):
    """``plan_classes`` (the AOT warm planner) must predict exactly the
    kernel specs ``apply_gate`` routes to, including the LRU column
    rotation variants."""
    rng = np.random.default_rng(7)
    n = 14
    qs_list = []
    for _ in range(30):
        k = int(rng.integers(1, 8))
        qs_list.append(tuple(int(x)
                             for x in rng.choice(n, k, replace=False)))

    ev = IndexedEvolver(n)
    assert not ev.small
    planned = ev.plan_classes(qs_list, passes=2)

    observed = set()
    orig = IndexedEvolver._callable

    def record(self, kind, *cls):
        if kind != 'flush':
            observed.add((kind, cls))
        return orig(self, kind, *cls)

    monkeypatch.setattr(IndexedEvolver, '_callable', record)
    state = ev.prepare_state('0' * n)
    for _ in range(2):
        for qs in qs_list:
            state = ev.apply_gate(state, _rand_u(len(qs), rng), qs)
    assert observed == planned


def test_warm_precompiles_and_matches_jit():
    """AOT-warmed executables must produce the same state as the jit
    path (and be preferred by ``_callable``)."""
    from hybridq_tpu.simulation.kernels import _KERNEL_CACHE

    rng = np.random.default_rng(9)
    n = 12
    qs_list = [tuple(int(x) for x in rng.choice(n, 4, replace=False))
               for _ in range(6)]
    gates = [(_rand_u(4, rng), qs) for qs in qs_list]

    ev_cold = IndexedEvolver(n)
    s0 = ev_cold.prepare_state('0' * n)
    for U, qs in gates:
        s0 = ev_cold.apply_gate(s0, U, qs)
    ref = ev_cold.gather(s0)

    ev = IndexedEvolver(n)
    n_warmed = ev.warm(qs_list, passes=1)
    assert n_warmed > 0
    base = (ev.n, ev.L, str(ev.float_type), ev.precision)
    for kind, cls in ev.plan_classes(qs_list, passes=1):
        assert ('exec', kind) + base + cls in _KERNEL_CACHE
    s1 = ev.prepare_state('0' * n)
    for U, qs in gates:
        s1 = ev.apply_gate(s1, U, qs)
    np.testing.assert_allclose(ev.gather(s1), ref, atol=ATOL)
