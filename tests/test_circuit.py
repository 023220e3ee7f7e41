"""Circuit IR + transformation tests, checked against dense matrices."""

import numpy as np
import pytest

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import Gate
from hybridq_tpu.extras.random import get_rqc

ATOL = 1e-5


def _random_circuit(n=4, m=20, **kw):
    return get_rqc(n, m, **kw)


def test_all_qubits_sorted():
    c = Circuit([Gate('H', ['b']), Gate('H', [0]), Gate('CZ', [(1, 2), 3])])
    assert c.all_qubits == [0, 3, 'b', (1, 2)]
    assert c.n_qubits == 4


def test_list_behavior():
    c = Circuit([Gate('H', [0])])
    c.append(Gate('X', [1]))
    c += [Gate('Z', [0])]
    assert len(c) == 3
    assert isinstance(c[0:2], Circuit)
    assert (c + c).n_qubits == 2
    with pytest.raises(ValueError):
        c.append('not a gate')


def test_inv_conj_T_adj():
    c = _random_circuit(3, 15)
    U = utils.matrix(c, complex_type='complex128')
    np.testing.assert_allclose(
        utils.matrix(c.inv(), complex_type='complex128') @ U,
        np.eye(U.shape[0]), atol=ATOL)
    np.testing.assert_allclose(
        utils.matrix(c.conj(), complex_type='complex128'), U.conj(),
        atol=ATOL)
    np.testing.assert_allclose(
        utils.matrix(c.T(), complex_type='complex128'), U.T, atol=ATOL)
    np.testing.assert_allclose(
        utils.matrix(c.adj(), complex_type='complex128'), U.conj().T,
        atol=ATOL)


def test_matrix_order():
    c = Circuit([Gate('CX', [1, 0])])
    np.testing.assert_allclose(utils.matrix(c),
                               Gate('CX', [1, 0]).matrix(order=[0, 1]),
                               atol=ATOL)
    np.testing.assert_allclose(utils.matrix(c, order=[1, 0]),
                               Gate('CX').matrix(), atol=ATOL)


@pytest.mark.parametrize('k', [1, 2, 3])
def test_compress_preserves_unitary(k):
    c = _random_circuit(4, 30)
    U = utils.matrix(c, complex_type='complex128', max_compress=0)
    blocks = utils.compress(c, max_n_qubits=k)
    assert all(len(b.all_qubits) <= max(
        k, max(g.n_qubits for g in b)) for b in blocks)
    merged = Circuit(g for b in blocks for g in b)
    # compress only reorders commuting gates: the unitary is unchanged
    np.testing.assert_allclose(
        utils.matrix(merged, order=c.all_qubits,
                     complex_type='complex128', max_compress=0), U,
        atol=ATOL)


def test_compress_block_structure():
    c = Circuit([Gate('X', [0]), Gate('ISWAP', [0, 1]),
                 Gate('ISWAP', [0, 2])])
    # Block structure matches the reference implementation's actual output
    # (its docstring example disagrees with its own code; verified against
    # hybridq.circuit.utils.compress directly).
    assert len(utils.compress(c, 1)) == 2
    assert len(utils.compress(c, 2)) == 2
    assert len(utils.compress(c, 3)) == 1


def test_simplify_cancels_inverses():
    c = _random_circuit(3, 12)
    full = c + c.inv()
    s = utils.simplify(full)
    assert len(s) == 0 or utils.isidentity(s, atol=1e-4)


def test_simplify_removes_identities():
    c = Circuit([Gate('I', [0]), Gate('H', [0])])
    s = utils.simplify(c)
    assert len(s) == 1 and s[0].name == 'H'


def test_isclose_circuits():
    c = Circuit(Gate('H', [q]) for q in range(4))
    assert utils.isclose(c, Circuit(c))
    assert not utils.isclose(c, Circuit(g**1.1 for g in c))


def test_pop_lightcone():
    # Gates on qubit 2 are outside the lightcone of qubit 0
    c = Circuit([Gate('H', [0]), Gate('H', [2]), Gate('CZ', [0, 1])])
    popped = utils.popright(c, pinned_qubits=[0])
    assert all(0 in g.qubits or 1 in g.qubits for g in popped)


def test_moments():
    c = Circuit([Gate('H', [0]), Gate('H', [1]), Gate('CZ', [0, 1]),
                 Gate('X', [0])])
    ms = utils.moments(c)
    assert len(ms) == 3
    assert len(ms[0]) == 2


def test_remove_swap():
    c = Circuit([Gate('H', [0]), Gate('SWAP', [0, 1]), Gate('X', [0])])
    new, qmap = utils.remove_swap(c)
    assert all(g.name != 'SWAP' for g in new)
    # X on 0 after SWAP(0,1) == X acting on what was qubit 1
    assert new[1].name == 'X' and new[1].qubits == (1,)
    assert qmap == {0: 1, 1: 0}


def test_expand_iswap():
    c = Circuit([Gate('ISWAP', [0, 1])])
    e = utils.expand_iswap(c)
    np.testing.assert_allclose(
        utils.matrix(e, order=[0, 1], complex_type='complex128'),
        utils.matrix(c, complex_type='complex128'), atol=ATOL)


def test_filter():
    c = Circuit([Gate('H', [0], tags={'x': 1}), Gate('X', [1]),
                 Gate('CZ', [0, 1])])
    assert [g.name for g in utils.filter(c, names=['H'])] == ['H']
    assert len(list(utils.filter(c, qubits=[0]))) == 2
    assert len(list(utils.filter(c, n_qubits=2))) == 1
    assert [g.name for g in utils.filter(c, x=1)] == ['H']


def test_to_nx():
    c = _random_circuit(3, 10)
    g = utils.to_nx(c)
    # qubit leaves (initial+final) + one node per gate
    assert g.number_of_nodes() == 2 * len(c.all_qubits) + len(c)


def test_moments_and_flatten():
    c = Circuit([Gate('H', [0]), Gate('CZ', [0, 1])])
    ms = utils.moments(c)
    flat = utils.flatten(Circuit(ms))
    assert list(flat) == list(c)


def test_random_heterogeneous_circuit_matrix():
    c = get_rqc(4, 20, use_random_indexes=True)
    U = utils.matrix(c, complex_type='complex128')
    np.testing.assert_allclose(U @ U.conj().T, np.eye(16), atol=1e-4)
