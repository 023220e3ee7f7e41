"""Density-matrix evolution via the doubled-qubit vectorization trick.

Exactly the reference's lowering (``hybridq/dm/circuit/simulation.py:24-51``):

  * each pure gate ``g`` becomes ``g`` on qubits ``(0, q)`` and
    ``g.conj()`` on ``(1, q)`` — since ρ → U ρ U† vectorizes to
    ``(U ⊗ U*) vec(ρ)``;
  * each supergate becomes one ``MatrixGate(gate.map())`` on the doubled
    qubits;

then the *pure-state* engines (single-chip XLA, sharded, TN) run the
doubled circuit unchanged — so the density-matrix layer inherits every
TPU optimization for free.
"""

from __future__ import annotations

import numpy as np

from hybridq_tpu.circuit import Circuit as PureCircuit
from hybridq_tpu.circuit.utils import matrix as circuit_matrix
from hybridq_tpu.dm.circuit import Circuit as SuperCircuit
from hybridq_tpu.dm.gate import BaseSuperGate
from hybridq_tpu.gate import BaseGate, MatrixGate
from hybridq_tpu.utils import sort

__all__ = ['simulate']


def _transform(gate):
    """SuperCircuit gate -> pure-state gate(s) on doubled qubits."""
    if isinstance(gate, BaseSuperGate):
        # Channels may be both BaseGate and BaseSuperGate; the supergate
        # lowering takes precedence (exact evolution).
        if isinstance(gate, BaseGate):
            l_qubits = r_qubits = gate.qubits
        else:
            l_qubits, r_qubits = gate.qubits
        return (MatrixGate(gate.map(),
                           qubits=[(0, q) for q in l_qubits] +
                           [(1, q) for q in r_qubits]),)
    if isinstance(gate, BaseGate):
        return (gate.on([(0, q) for q in gate.qubits]),
                gate.conj().on([(1, q) for q in gate.qubits]))
    raise TypeError(f"{type(gate).__name__} not supported.")


def _convert(circuit) -> PureCircuit:
    """SuperCircuit -> pure Circuit on doubled qubits."""
    flat = (g for w in circuit
            for g in (w if isinstance(w, tuple) and not isinstance(
                w, (BaseGate, BaseSuperGate)) else [w]))
    return PureCircuit(g for gate in flat for g in _transform(gate))


def simulate(circuit, initial_state, final_state=None,
             optimize='evolution', parallel=False, verbose: bool = False,
             **kwargs):
    """Simulate a density-matrix circuit.

    ``optimize='clifford'`` delegates to the Pauli-string engine; anything
    else lowers to a doubled-qubit pure-state circuit and calls
    ``hybridq_tpu.simulation.simulate``.

    ``initial_state`` may be a token string (single char broadcast; doubled
    automatically), a pure ``Circuit`` (ρ = U |0..0><0..0| U† is *not*
    assumed — the circuit's matrix U is used as ρ, transposed input/output,
    as in the reference), or a dense array of ``nl + nr`` qubit axes.
    """
    circuit = list(circuit)

    if optimize == 'clifford':
        from hybridq_tpu.simulation import clifford

        if any(not isinstance(g, BaseGate) for g in circuit):
            raise NotImplementedError(
                "'optimize=clifford' only supports 'BaseGate's")
        if final_state is not None:
            raise ValueError(
                "'final_state' cannot be provided if optimize='clifford'.")
        return clifford.update_pauli_string(
            PureCircuit(circuit), initial_state, verbose=verbose, **kwargs)

    from hybridq_tpu.simulation import simulate as pure_simulate

    circuit = SuperCircuit(circuit)
    l_qubits, r_qubits = circuit.all_qubits
    nl, nr = len(l_qubits), len(r_qubits)
    doubled = _convert(circuit)

    def _get_state(state, name):
        if state is None:
            return None
        if isinstance(state, str):
            state = state * (nl + nr) if len(state) == 1 else state
            if not (len(state) == nl + nr or
                    (l_qubits == r_qubits and len(state) == nl)):
                raise ValueError(f"'{name}' has the wrong number of qubits.")
            return state + state if len(state) == nl else state
        if isinstance(state, PureCircuit):
            if l_qubits != r_qubits or sort(l_qubits) != sort(
                    state.all_qubits):
                raise ValueError(
                    f"Qubits in '{name}' are not consistent with "
                    "'circuit'.")
            U = circuit_matrix(state, order=l_qubits)
            return np.transpose(np.reshape(U, (2,) * (2 * nl)),
                                list(range(nl, 2 * nl)) + list(range(nl)))
        state = np.asarray(state)
        if set(state.shape) != {2}:
            raise NotImplementedError(
                "Only 2-dimensional qubits are allowed.")
        if not (state.ndim == nl + nr or
                (l_qubits == r_qubits and state.ndim == nl)):
            raise ValueError(f"'{name}' has the wrong number of qubits.")
        if state.ndim == nl:
            state = np.reshape(np.kron(state.ravel(), state.ravel()),
                               (2,) * (2 * nl))
        return state

    return pure_simulate(doubled,
                         initial_state=_get_state(initial_state,
                                                  'initial_state'),
                         final_state=_get_state(final_state, 'final_state'),
                         optimize=optimize, verbose=verbose, **kwargs)
