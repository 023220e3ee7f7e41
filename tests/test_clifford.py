"""Clifford / Pauli-string engine tests.

Differential strategy (reference ``tests.py:1629-1766``): the weighted
Pauli sum must reconstruct ``matrix(circuit + pauli + circuit.inv())``;
Clifford-only circuits must not branch; expectation values cross-check the
dense engines.
"""

import numpy as np
import pytest

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import Gate
from hybridq_tpu.extras.random import get_rqc
from hybridq_tpu.simulation import simulate, prepare_state
from hybridq_tpu.simulation.clifford import (expectation_value,
                                             update_pauli_string)

ATOL = 1e-4


def _reconstruct(db, n):
    U = np.zeros((2**n, 2**n), dtype=complex)
    for key, ph in db.items():
        M = np.array([[1.0]])
        for c in key:
            M = np.kron(M, Gate(c).matrix())
        U = U + ph * M
    return U


def _oracle(circuit, pauli):
    full = circuit + pauli + circuit.inv()
    return utils.matrix(full, complex_type='complex128')


def test_reference_docstring_example():
    c = Circuit([Gate('X', qubits=[0])**1.2,
                 Gate('ISWAP', qubits=[0, 1])**2.3])
    p = Circuit([Gate('Z', qubits=[1])])
    db = update_pauli_string(c, p, float_type='float64')
    np.testing.assert_allclose(db['IZ'], 0.7938926261462365, atol=1e-6)
    np.testing.assert_allclose(db['XY'], -0.40450849718747345, atol=1e-6)
    np.testing.assert_allclose(_reconstruct(db, 2), _oracle(c, p),
                               atol=1e-6)


@pytest.mark.parametrize('n,m', [(3, 10), (4, 15)])
def test_random_circuit_reconstruction(n, m):
    c = get_rqc(n, m, indexes=list(range(n)))
    p = Circuit([Gate('Z', [0]), Gate('X', [n - 1])])
    db = update_pauli_string(c + Circuit(Gate('I', [q])
                                         for q in range(n)), p,
                             float_type='float64',
                             remove_id_gates=False)
    np.testing.assert_allclose(
        _reconstruct(db, n),
        _oracle(c + Circuit(Gate('I', [q]) for q in range(n)), p),
        atol=1e-5)


def test_clifford_only_does_not_branch():
    c = get_rqc(5, 40, indexes=list(range(5)), use_clifford_only=True,
                randomize_power=False)
    p = Circuit([Gate('Z', [2])])
    db, info = update_pauli_string(
        c + Circuit(Gate('I', [q]) for q in range(5)), p,
        compress=0, simplify=False, remove_id_gates=False,
        float_type='float64', return_info=True)
    # A Clifford circuit maps one Pauli string to exactly one.
    assert len(db) == 1
    (ph,) = db.values()
    np.testing.assert_allclose(abs(ph), 1, atol=1e-6)


def test_t_gates_branch():
    c = Circuit([Gate('T', [0]), Gate('H', [0]), Gate('T', [0])])
    p = Circuit([Gate('Z', [0])])
    db = update_pauli_string(c, p, float_type='float64')
    assert len(db) > 1
    np.testing.assert_allclose(_reconstruct(db, 1), _oracle(c, p),
                               atol=1e-6)


def test_dict_pauli_string_input():
    c = Circuit([Gate('H', [0]), Gate('CX', [0, 1])])
    db = update_pauli_string(c, {'ZI': 0.5, 'IZ': 0.5},
                             float_type='float64')
    expected = 0.5 * _oracle(c, Circuit([Gate('Z', [0]),
                                         Gate('I', [1])])) + \
        0.5 * _oracle(c, Circuit([Gate('I', [0]), Gate('Z', [1])]))
    np.testing.assert_allclose(_reconstruct(db, 2), expected, atol=1e-6)


def test_expectation_value_reference_example():
    c = Circuit([Gate('X', qubits=[0])**1.2,
                 Gate('ISWAP', qubits=[0, 1])**2.3])
    op = Circuit([Gate('Z', qubits=[1])])
    ev = expectation_value(c, op, initial_state='11',
                           float_type='float64')
    np.testing.assert_allclose(ev, -0.6271482580325515, atol=1e-6)


@pytest.mark.parametrize('initial', ['00', '1+', '-0'])
def test_expectation_value_vs_dense(initial):
    n = 2
    c = get_rqc(n, 10, indexes=list(range(n)))
    c = c + Circuit(Gate('I', [q]) for q in range(n))
    op = Circuit([Gate('Z', [0]), Gate('X', [1])])
    ev = expectation_value(c, op, initial_state=initial,
                           float_type='float64',
                           remove_id_gates=False)

    psi = np.asarray(
        simulate(c, initial_state=initial, complex_type='complex128',
                 remove_id_gates=False)).ravel()
    O = np.kron(Gate('Z').matrix(), Gate('X').matrix())
    expected = np.real(psi.conj() @ O @ psi)
    np.testing.assert_allclose(ev, expected, atol=1e-5)


def test_max_branches_splitting():
    """Small batch cap exercises the DFS splitting; result unchanged."""
    c = Circuit([Gate('T', [q % 3]) for q in range(6)] +
                [Gate('H', [q % 3]) for q in range(6)])
    p = Circuit([Gate('Z', [0])])
    full = update_pauli_string(c, p, float_type='float64')
    small = update_pauli_string(c, p, float_type='float64',
                                max_breadth_first_branches=2)
    assert set(full) == set(small)
    for k in full:
        np.testing.assert_allclose(full[k], small[k], atol=1e-6)


def test_reference_clifford_parity():
    from tests._ref_oracle import import_reference
    if import_reference() is None:
        pytest.skip('reference unavailable')
    from hybridq.circuit import Circuit as RC
    from hybridq.gate import Gate as RG
    from hybridq.circuit.simulation.clifford import (
        update_pauli_string as ref_update)

    c = Circuit([Gate('H', [0]), Gate('T', [0]), Gate('CX', [0, 1]),
                 Gate('T', [1]), Gate('H', [1])])
    rc = RC([RG('H', [0]), RG('T', [0]), RG('CX', [0, 1]),
             RG('T', [1]), RG('H', [1])])
    p = Circuit([Gate('Z', [0])])
    rp = RC([RG('Z', [0])])
    mine = update_pauli_string(c, p, float_type='float64')
    ref = ref_update(rc, rp, float_type='float64', parallel=False)
    assert set(mine) == set(dict(ref))
    for k in mine:
        np.testing.assert_allclose(mine[k], ref[k], atol=1e-6)
