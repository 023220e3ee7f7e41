"""State-vector engine tests: differential against the dense matrix oracle,
cross-engine, and against the reference implementation."""

import numpy as np
import pytest

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import Gate, Measure, Projection
from hybridq_tpu.extras.random import get_rqc
from hybridq_tpu.simulation import (simulate, expectation_value,
                                    prepare_state, prepare_state_jax)

ATOL = 1e-4


def _oracle(circuit, initial_state='0'):
    qubits = circuit.all_qubits
    n = len(qubits)
    if isinstance(initial_state, str):
        if len(initial_state) == 1:
            initial_state = initial_state * n
        psi0 = prepare_state(initial_state, complex_type='complex128')
    else:
        psi0 = np.asarray(initial_state, dtype='complex128')
    U = utils.matrix(circuit, complex_type='complex128')
    return (U @ psi0.ravel()).reshape((2,) * n)


def test_prepare_state_tokens():
    np.testing.assert_allclose(
        prepare_state('+-+').ravel(),
        np.array([1, 1, -1, -1, 1, 1, -1, -1]) / np.sqrt(8), atol=1e-6)
    np.testing.assert_allclose(prepare_state('01').ravel(), [0, 1, 0, 0])
    np.testing.assert_allclose(np.asarray(prepare_state_jax('+-+')),
                               prepare_state('+-+'), atol=1e-6)
    np.testing.assert_allclose(np.asarray(prepare_state_jax('011')),
                               prepare_state('011'), atol=1e-6)
    with pytest.raises(ValueError):
        prepare_state('0x1')


@pytest.mark.parametrize('n,m', [(4, 20), (6, 40)])
def test_evolution_vs_matrix_oracle(n, m):
    c = get_rqc(n, m)
    expected = _oracle(c)
    psi = simulate(c, initial_state='0', optimize='evolution')
    np.testing.assert_allclose(psi, expected, atol=ATOL)


def test_evolution_heterogeneous_labels():
    c = get_rqc(5, 30, use_random_indexes=True)
    expected = _oracle(c)
    psi = simulate(c, initial_state='0', optimize='evolution')
    np.testing.assert_allclose(psi, expected, atol=ATOL)


@pytest.mark.parametrize('initial', ['+', '1', '+-01'])
def test_evolution_initial_states(initial):
    c = get_rqc(4, 20)
    expected = _oracle(c, initial)
    psi = simulate(c, initial_state=initial, optimize='evolution')
    np.testing.assert_allclose(psi, expected, atol=ATOL)


def test_evolution_array_initial_state():
    c = get_rqc(4, 15)
    n = len(c.all_qubits)  # random circuits may not touch every label
    shape = (2,) * n
    psi0 = np.random.randn(*shape) + 1j * np.random.randn(*shape)
    psi0 /= np.linalg.norm(psi0)
    expected = _oracle(c, psi0)
    psi = simulate(c, initial_state=psi0.astype('complex64'),
                   optimize='evolution')
    np.testing.assert_allclose(psi, expected, atol=ATOL)


def test_einsum_engine_matches_tpu_engine():
    c = get_rqc(5, 25)
    a = simulate(c, initial_state='0', optimize='evolution')
    b = simulate(c, initial_state='0', optimize='evolution-einsum',
                 backend='numpy')
    d = simulate(c, initial_state='0', optimize='evolution-einsum-greedy',
                 backend='jax')
    np.testing.assert_allclose(a, b, atol=ATOL)
    np.testing.assert_allclose(a, d, atol=ATOL)


@pytest.mark.parametrize('compress', [0, 1, 2, 4])
def test_evolution_compress_levels(compress):
    c = get_rqc(4, 20)
    expected = _oracle(c)
    psi = simulate(c, initial_state='0', optimize='evolution',
                   compress=compress)
    np.testing.assert_allclose(psi, expected, atol=ATOL)


def test_return_info():
    c = get_rqc(3, 10)
    psi, info = simulate(c, initial_state='0', optimize='evolution',
                         return_info=True)
    assert 'runtime (s)' in info


def test_projection_gate_in_circuit():
    c = Circuit([Gate('H', [0]), Gate('CX', [0, 1]),
                 Projection('0', qubits=[0])])
    psi = simulate(c, initial_state='00', optimize='evolution')
    expected = np.zeros((2, 2))
    expected[0, 0] = 1
    np.testing.assert_allclose(psi, expected, atol=ATOL)


def test_measure_gate_in_circuit():
    c = Circuit([Gate('H', [0]), Gate('CX', [0, 1]), Measure(qubits=[0])])
    psi = np.asarray(simulate(c, initial_state='00', optimize='evolution'))
    # Collapsed to |00> or |11> with norm 1
    np.testing.assert_allclose(np.linalg.norm(psi), 1, atol=ATOL)
    probs = np.abs(psi.ravel())**2
    assert probs[0] > 0.99 or probs[3] > 0.99


def test_stochastic_sampling():
    g = Gate('STOC', gates=[Gate('I', [0]), Gate('X', [0])], p=[0.0, 1.0])
    c = Circuit([g])
    psi = simulate(c, initial_state='0', optimize='evolution',
                   allow_sampling=True)
    np.testing.assert_allclose(np.abs(np.asarray(psi).ravel()), [0, 1],
                               atol=ATOL)


def test_expectation_value():
    # <+|X|+> = 1
    ev = expectation_value(prepare_state('+'), Circuit([Gate('X', [0])]),
                           qubits_order=[0])
    np.testing.assert_allclose(ev, 1, atol=ATOL)
    # <0|Z|0> = 1, <1|Z|1> = -1
    ev = expectation_value(prepare_state('1'), Circuit([Gate('Z', [0])]),
                           qubits_order=[0])
    np.testing.assert_allclose(ev, -1, atol=ATOL)


def test_expectation_value_random():
    # A final H layer guarantees every label is covered (random circuits
    # may otherwise miss a qubit and shrink the register).
    c = get_rqc(4, 12, indexes=list(range(4))) + Circuit(
        Gate('H', [q]) for q in range(4))
    op = get_rqc(3, 6, indexes=c.all_qubits[:3])
    psi = np.asarray(simulate(c, initial_state='0')).astype('complex128')
    Uop = utils.matrix(op, order=c.all_qubits[:3],
                       complex_type='complex128')
    full = np.kron(Uop, np.eye(2))
    expected = psi.conj().ravel() @ full @ psi.ravel()
    got = expectation_value(psi, op, qubits_order=c.all_qubits)
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_reference_parity():
    """Amplitudes match the reference implementation to 1e-6 (einsum
    engine, the reference's C++-free path)."""
    from tests._ref_oracle import import_reference
    if import_reference() is None:
        pytest.skip("reference not importable")
    from hybridq.circuit import Circuit as RefCircuit
    from hybridq.circuit.simulation import simulate as ref_simulate
    from hybridq.gate import Gate as RefGate

    np.random.seed(7)
    c = Circuit()
    ref_c = RefCircuit()
    for _ in range(30):
        name = np.random.choice(['H', 'X', 'CZ', 'CX', 'T', 'RX', 'ISWAP'])
        g = Gate(name)
        nq = g.n_qubits
        qs = [int(q) for q in
              np.random.choice(5, nq, replace=False)]
        params = list(np.random.random(g.n_params)) if \
            g.provides('params') and g.n_params else None
        c.append(Gate(name, qubits=qs, params=params))
        ref_c.append(RefGate(name, qubits=qs, params=params))

    psi = simulate(c, initial_state='0', optimize='evolution',
                   complex_type='complex128')
    ref_psi = ref_simulate(ref_c, initial_state='0',
                           optimize='evolution-einsum',
                           complex_type='complex128', backend='numpy')
    np.testing.assert_allclose(np.asarray(psi), np.asarray(ref_psi),
                               atol=1e-6)
