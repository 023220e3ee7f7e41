"""Gate-algebra tests: matrix semantics, power/conj/T, composition.

Mirrors the differential strategy of the reference test suite
(``tests/tests.py:465-1078``): every algebraic operation is checked
numerically against dense matrix arithmetic.
"""

import numpy as np
import pytest
from scipy.linalg import fractional_matrix_power as powm

from hybridq_tpu.gate import (Gate, MatrixGate, Control, Projection, Measure,
                              merge, pad, decompose, get_available_gates,
                              get_clifford_gates)
from hybridq_tpu.extras.random import get_random_gate

ATOL = 1e-7


def test_zoo_matrices_are_unitary():
    for name in get_available_gates():
        g = Gate(name)
        if g.provides('params') and g.n_params:
            g.set_params(np.random.random(g.n_params), inplace=True)
        U = g.matrix()
        np.testing.assert_allclose(U.conj().T @ U, np.eye(U.shape[0]),
                                   atol=1e-8, err_msg=name)


def test_known_matrices():
    np.testing.assert_allclose(
        Gate('CNOT').matrix(),
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])
    np.testing.assert_allclose(Gate('T').matrix(),
                               np.diag([1, np.exp(0.25j * np.pi)]))
    # S = sqrt(Z)
    np.testing.assert_allclose(
        Gate('S').matrix() @ Gate('S').matrix(), Gate('Z').matrix(),
        atol=ATOL)
    # U3 identity: U3(0,0,0) == I
    np.testing.assert_allclose(Gate('U3', params=[0, 0, 0]).matrix(),
                               np.eye(2), atol=ATOL)


def test_power_conj_T_adj():
    for _ in range(20):
        g = get_random_gate(randomize_power=False)
        U = g.matrix()
        p = 2 * np.random.random() - 1
        # Power composes on the base matrix; use a plain MatrixGate so the
        # base *is* U (conj/T flags apply after the power, as in the
        # reference, so powm(U, p) of a flagged gate differs by branch).
        np.testing.assert_allclose((MatrixGate(U)**p).matrix(), powm(U, p),
                                   atol=1e-5)
        np.testing.assert_allclose(g.conj().matrix(), U.conj(), atol=ATOL)
        np.testing.assert_allclose(g.T().matrix(), U.T, atol=ATOL)
        np.testing.assert_allclose(g.adj().matrix(), U.conj().T, atol=ATOL)
        np.testing.assert_allclose(g.inv().matrix() @ U,
                                   np.eye(U.shape[0]), atol=1e-5)


def test_rotation_power_folds_into_angle():
    phi = 0.7
    g = Gate('RX', params=[phi])
    g2 = g**2.5
    assert g2.power == 1
    np.testing.assert_allclose(g2.params[0], (phi * 2.5) % (4 * np.pi))
    np.testing.assert_allclose(g2.matrix(),
                               powm(g.matrix(), 2.5), atol=1e-6)


def test_matrix_order_permutation():
    g = Gate('CX', qubits=[0, 1])
    U = g.matrix()
    Uswap = g.matrix(order=[1, 0])
    SWAP = Gate('SWAP').matrix()
    np.testing.assert_allclose(Uswap, SWAP @ U @ SWAP, atol=ATOL)
    with pytest.raises(ValueError):
        g.matrix(order=[0, 2])


def test_merge_matches_matmul():
    for _ in range(10):
        a = get_random_gate()
        a = a.on(list(range(a.n_qubits)))
        b = get_random_gate()
        b = b.on(list(np.random.choice(3, b.n_qubits, replace=False)))
        m = merge(a, b)
        # merged == pad(b) @ pad(a) over union qubits, in m.qubits order
        qs = m.qubits
        Ua = pad(a, qs, order=qs, return_matrix_only=True)
        Ub = pad(b, qs, order=qs, return_matrix_only=True)
        np.testing.assert_allclose(m.matrix(), Ub @ Ua, atol=1e-5)


def test_commutes_with():
    assert Gate('Z', [0]).commutes_with(Gate('Z', [0]))
    assert Gate('Z', [0]).commutes_with(Gate('CZ', [0, 1]))
    assert not Gate('X', [0]).commutes_with(Gate('Z', [0]))
    assert Gate('X', [0]).commutes_with(Gate('Z', [1]))


def test_pad():
    g = Gate('X', qubits=[1])
    p = pad(g, [0, 1], order=[0, 1])
    np.testing.assert_allclose(p.matrix(),
                               np.kron(np.eye(2), Gate('X').matrix()),
                               atol=ATOL)


def test_decompose_schmidt():
    for _ in range(5):
        g = MatrixGate(np.linalg.qr(
            np.random.randn(4, 4) + 1j * np.random.randn(4, 4))[0],
                       qubits=[0, 1])
        sg = decompose(g, [0])
        np.testing.assert_allclose(sg.matrix(order=[0, 1]),
                                   g.matrix(), atol=1e-6)


def test_control_gate():
    c = Control([0], gate=Gate('X', qubits=[1]))
    np.testing.assert_allclose(c.matrix(), Gate('CX', [0, 1]).matrix(),
                               atol=ATOL)
    c2 = Control([0, 1], gate=Gate('X', qubits=[2]))
    U = c2.matrix()
    assert U.shape == (8, 8)
    np.testing.assert_allclose(U[:6, :6], np.eye(6), atol=ATOL)
    np.testing.assert_allclose(U[6:, 6:], Gate('X').matrix(), atol=ATOL)


def test_stochastic_gate_sampling():
    g = Gate('STOC', gates=[Gate('X', [0]), Gate('Z', [0])], p=[0.5, 0.5])
    rng = np.random.default_rng(0)
    names = {g.sample(rng=rng).name for _ in range(50)}
    assert names == {'X', 'Z'}
    assert g.qubits == (0,)


def test_projection_and_measure():
    # |+> state projected on |0> -> |0>
    psi = np.ones((2, 2), dtype=complex) / 2
    p = Projection('0', qubits=[0])
    new, order = p(psi, order=(0, 1))
    np.testing.assert_allclose(np.linalg.norm(new), 1, atol=ATOL)
    assert np.allclose(new[1], 0)

    m = Measure(qubits=[0])
    probs = m(psi, order=(0, 1), get_probs_only=True)
    np.testing.assert_allclose(probs, [0.5, 0.5], atol=ATOL)
    new, order = m(psi, order=(0, 1))
    np.testing.assert_allclose(np.linalg.norm(new), 1, atol=ATOL)


def test_clifford_flags():
    assert Gate('H').is_clifford()
    assert Gate('CZ').is_clifford()
    assert not Gate('T').is_clifford()
    assert not (Gate('X')**0.33).is_clifford()
    assert set(get_clifford_gates()) >= {'H', 'X', 'Y', 'Z', 'CZ', 'CX'}


def test_equality_and_hash():
    assert Gate('H', [0]) == Gate('H', [0])
    assert Gate('H', [0]) != Gate('H', [1])
    assert Gate('H', [0]) != Gate('X', [0])
    assert Gate('RX', [0], params=[0.3]) == Gate('RX', [0], params=[0.3])
    assert Gate('RX', [0], params=[0.3]) != Gate('RX', [0], params=[0.4])
    assert hash(Gate('H', [0])) == hash(Gate('H', [0]))
    assert Gate('H', [0]).conj() != Gate('H', [0]).T()


def test_gate_tags():
    g = Gate('H', [0], tags={'a': 1})
    assert g.tags == {'a': 1}
    g2 = g.update_tags({'b': 2})
    assert g2.tags == {'a': 1, 'b': 2} and g.tags == {'a': 1}
    assert g2.remove_tags(['a']).tags == {'b': 2}
    # tags do not affect equality
    assert g == Gate('H', [0])


def test_control_functional_gate():
    """Controlled FunctionalGate: projector decomposition
    (reference ``gate.py:962-999``)."""
    from hybridq_tpu.circuit import Circuit
    from hybridq_tpu.gate import Control, FunctionalGate
    from hybridq_tpu.simulation import simulate

    def fx(self, psi, order, **kw):
        ax = order.index(self.qubits[0])
        return np.flip(psi, axis=ax), order

    cf = Control([0, 1], FunctionalGate(fx, qubits=[2]))
    cm = Control([0, 1], Gate('X', [2]))
    pre = Circuit(Gate('H', [q]) for q in range(3))
    pad = Circuit([Gate('I', [3])])
    got = np.asarray(simulate(pre + [cf] + pad, initial_state='0',
                              simplify=False, remove_id_gates=False))
    exp = np.asarray(simulate(pre + [cm] + pad, initial_state='0',
                              simplify=False, remove_id_gates=False))
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_control_stochastic_gate():
    """Controlled StochasticGate with a deterministic branch equals the
    controlled matrix gate (reference ``gate.py:1001-1031``)."""
    from hybridq_tpu.circuit import Circuit
    from hybridq_tpu.gate import Control, StochasticGate
    from hybridq_tpu.simulation import simulate

    cs = Control([0], StochasticGate([Gate('X', [1])], [1.0]))
    got = np.asarray(simulate(Circuit([Gate('H', [0]), cs]),
                              initial_state='0', simplify=False,
                              allow_sampling=False))
    exp = np.asarray(simulate(Circuit([Gate('H', [0]),
                                       Gate('CX', [0, 1])]),
                              initial_state='0'))
    np.testing.assert_allclose(got, exp, atol=1e-6)
