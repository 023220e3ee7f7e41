"""Contract tests for ``extras/io/cirq_io.py``.

cirq is not installed in this image, so ``to_cirq`` is exercised against
a *faithful mini-cirq*: a stub module implementing exactly the
constructors the exporter uses, with the unitaries cirq documents
(e.g. ``X**t = exp(i*pi*t/2) * (cos(pi*t/2) I - i sin(pi*t/2) X)`` via the
principal fractional matrix power, ``rx(t) = expm(-i t X / 2)``,
``CZPowGate(exponent=t) = diag(1,1,1,exp(i*pi*t))``).  The exported
circuit's unitary must then match ``circuit.utils.matrix`` exactly (both
use big-endian qubit ordering), which validates both the name mapping
and the parameter conventions end-to-end.

Reference behavior: ``hybridq/extras/io/cirq.py`` (same export table).
"""

import sys
import types

import numpy as np
import pytest

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import Gate


# ---------------------------------------------------------------------
# mini-cirq
# ---------------------------------------------------------------------

def _frac_power(m, t):
    """Principal fractional matrix power (what cirq's EigenGate does)."""
    w, v = np.linalg.eig(m)
    return (v * np.power(w.astype(complex), t)) @ np.linalg.inv(v)


class _Op:
    def __init__(self, matrix, qubits):
        self.matrix = np.asarray(matrix, dtype=complex)
        self.qubits = tuple(qubits)


class _MiniGate:
    def __init__(self, matrix):
        self._m = np.asarray(matrix, dtype=complex)

    def on(self, *qubits):
        return _Op(self._m, qubits)

    def __pow__(self, t):
        return _MiniGate(_frac_power(self._m, t))


class _LineQubit:
    def __init__(self, x):
        self.x = x

    def __lt__(self, other):
        return self.x < other.x

    def __eq__(self, other):
        return isinstance(other, _LineQubit) and self.x == other.x

    def __hash__(self):
        return hash(('LineQubit', self.x))


class _MiniCircuit:
    def __init__(self):
        self.ops = []

    def append(self, op):
        self.ops.append(op)

    def unitary(self):
        """Big-endian total unitary (cirq sorts qubits ascending; the
        first/lowest qubit is the most significant bit)."""
        qubits = sorted({q for op in self.ops for q in op.qubits})
        pos = {q: i for i, q in enumerate(qubits)}
        n = len(qubits)
        u = np.eye(2**n, dtype=complex)
        for op in self.ops:
            axes = [pos[q] for q in op.qubits]
            k = len(axes)
            g = op.matrix.reshape((2,) * (2 * k))
            psi = u.reshape((2,) * n + (2**n,))
            psi = np.tensordot(g, psi, axes=(range(k, 2 * k), axes))
            psi = np.moveaxis(psi, range(k), axes)
            u = psi.reshape(2**n, 2**n)
        return u


def _mini_cirq():
    cirq = types.ModuleType('cirq')
    isq2 = 1 / np.sqrt(2)
    X = np.array([[0, 1], [1, 0]])
    Y = np.array([[0, -1j], [1j, 0]])
    Z = np.diag([1, -1])
    SWAP = np.eye(4)[[0, 2, 1, 3]]
    ISWAP = np.eye(4, dtype=complex)
    ISWAP[1:3, 1:3] = [[0, 1j], [1j, 0]]
    cirq.I = _MiniGate(np.eye(2))
    cirq.H = _MiniGate(isq2 * np.array([[1, 1], [1, -1]]))
    cirq.X, cirq.Y, cirq.Z = map(_MiniGate, (X, Y, Z))
    cirq.T = _MiniGate(np.diag([1, np.exp(1j * np.pi / 4)]))
    cirq.S = _MiniGate(np.diag([1, 1j]))
    cirq.CZ = _MiniGate(np.diag([1, 1, 1, -1]))
    cirq.CNOT = _MiniGate(np.eye(4)[[0, 1, 3, 2]])
    cirq.SWAP = _MiniGate(SWAP)
    cirq.ISWAP = _MiniGate(ISWAP)
    cirq.ZZ = _MiniGate(np.kron(Z, Z))
    cirq.rx = lambda t: _MiniGate(np.cos(t / 2) * np.eye(2) -
                                  1j * np.sin(t / 2) * X)
    cirq.ry = lambda t: _MiniGate(np.cos(t / 2) * np.eye(2) -
                                  1j * np.sin(t / 2) * Y)
    cirq.rz = lambda t: _MiniGate(np.cos(t / 2) * np.eye(2) -
                                  1j * np.sin(t / 2) * Z)
    cirq.CZPowGate = lambda exponent: _MiniGate(
        np.diag([1, 1, 1, np.exp(1j * np.pi * exponent)]))

    def _fsim(theta, phi):
        m = np.eye(4, dtype=complex)
        m[1:3, 1:3] = [[np.cos(theta), -1j * np.sin(theta)],
                       [-1j * np.sin(theta), np.cos(theta)]]
        m[3, 3] = np.exp(-1j * phi)
        return _MiniGate(m)

    cirq.FSimGate = _fsim
    cirq.MatrixGate = _MiniGate
    cirq.LineQubit = _LineQubit
    cirq.Circuit = _MiniCircuit
    return cirq


@pytest.fixture
def mini_cirq(monkeypatch):
    monkeypatch.setitem(sys.modules, 'cirq', _mini_cirq())


# ---------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------

def test_to_cirq_unitary_parity(mini_cirq):
    """Every simple-mapped gate name exports with the right unitary."""
    from hybridq_tpu.extras.io.cirq_io import to_cirq

    rng = np.random.default_rng(5)
    th, ph = float(rng.uniform(0, np.pi)), float(rng.uniform(0, np.pi))
    c = Circuit([
        Gate('H', [0]), Gate('X', [1]), Gate('Y', [2]), Gate('Z', [0]),
        Gate('T', [1]), Gate('P', [2]), Gate('SQRT_X', [0]),
        Gate('SQRT_Y', [1]), Gate('I', [2]),
        Gate('RX', [0], params=[th]), Gate('RY', [1], params=[ph]),
        Gate('RZ', [2], params=[th]),
        Gate('CZ', [0, 1]), Gate('CX', [1, 2]), Gate('SWAP', [0, 2]),
        Gate('ISWAP', [0, 1]), Gate('SQRT_SWAP', [1, 2]),
        Gate('SQRT_ISWAP', [0, 2]), Gate('ZZ', [0, 1]),
        Gate('CPHASE', [1, 2], params=[ph]),
        Gate('FSIM', [0, 1], params=[th, ph]),
    ])
    exported = to_cirq(c)
    got = exported.unitary()
    want = np.asarray(utils.matrix(c, complex_type='complex128'))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_to_cirq_matrix_fallback(mini_cirq):
    """Powered / conjugated / MATRIX / U3 gates export as MatrixGate
    (reference cirq.py:122-127) and keep the exact unitary."""
    from hybridq_tpu.extras.io.cirq_io import to_cirq

    rng = np.random.default_rng(6)
    a = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    u, _ = np.linalg.qr(a)
    c = Circuit([
        Gate('H', [0])**0.3,
        Gate('U3', [1], params=[0.1, 0.2, 0.3]),
        Gate('MATRIX', [0, 1], U=u),
        Gate('ISWAP', [0, 1])**-0.5,
    ])
    exported = to_cirq(c)
    got = exported.unitary()
    want = np.asarray(utils.matrix(c, complex_type='complex128'))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_to_cirq_qubits_map(mini_cirq):
    """A custom qubits_map relabels wires."""
    import cirq

    from hybridq_tpu.extras.io.cirq_io import to_cirq

    c = Circuit([Gate('CX', [('a', 1), ('b', 2)])])
    qmap = {('a', 1): cirq.LineQubit(5), ('b', 2): cirq.LineQubit(3)}
    exported = to_cirq(c, qubits_map=qmap)
    (op,) = exported.ops
    assert [q.x for q in op.qubits] == [5, 3]


def test_to_cirq_without_cirq_raises():
    """Without cirq installed, a clear ImportError (not a crash)."""
    import importlib

    if 'cirq' in sys.modules:  # not under our fixture here
        pytest.skip('real cirq present')
    from hybridq_tpu.extras.io.cirq_io import to_cirq
    with pytest.raises(ImportError, match='cirq'):
        to_cirq(Circuit([Gate('H', [0])]))
