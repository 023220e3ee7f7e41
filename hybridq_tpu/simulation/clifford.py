"""Clifford / Pauli-string expansion engine.

Evolves an operator P through a circuit C as a sum of Pauli strings:
``C† P C = Σ_s phase_s · P_s`` — the density-matrix expansion used for
Clifford+T simulation (reference
``hybridq/circuit/simulation/clifford.py``; output parity with its
``update_pauli_string``: ``matrix(circuit + pauli + circuit.inv())``
equals the weighted Pauli sum).

The reference implements branching with a numba scalar kernel plus
multiprocessing/MPI task parallelism.  Here the branch frontier is a
*vectorized batch*: Pauli strings are rows of a uint8 code array
(0=I, 1=X, 2=Y, 3=Z) and each gate updates the whole batch with numpy
array ops grouped by local substring — the same data layout a device
(vmap) variant would use.  Memory is bounded by depth-first splitting of
oversized batches, mirroring the reference's BFS→DFS strategy
(``clifford.py:549-729``).
"""

from __future__ import annotations

from collections import defaultdict
from itertools import product

import numpy as np

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import BaseGate, Gate
from hybridq_tpu.utils import kron, sort

__all__ = ['update_pauli_string', 'expectation_value']

_PAULI_NAMES = 'IXYZ'
_PAULIS = [Gate(g).matrix().astype('complex128') for g in _PAULI_NAMES]


def _pauli_rows(U: np.ndarray, eps: float):
    """Sparse Pauli-transfer rows of a k-qubit gate.

    ``rows[s] = (codes_t, coeffs)`` with
    ``U† P_s U = Σ_t coeffs[t] P_t`` (reference ``_process_gate``,
    ``clifford.py:491-546``).  Coefficients are real for unitary gates;
    entries below ``eps`` are dropped (the branching cutoff).
    """
    dim = U.shape[0]
    k = int(round(np.log2(dim)))
    paulis = [kron(*(_PAULIS[int(c)] for c in digits))
              for digits in product(range(4), repeat=k)]
    Ud = U.conj().T
    rows = []
    for s in range(4**k):
        M = Ud @ paulis[s] @ U
        coeffs = np.array(
            [np.real(np.trace(paulis[t] @ M)) / dim
             for t in range(4**k)])
        sel = np.abs(coeffs) > eps
        ts = np.nonzero(sel)[0].astype(np.int64)
        # Largest-weight first: deeper branches die sooner under
        # branch_atol (reference explores largest first).
        order = np.argsort(-np.abs(coeffs[sel]))
        rows.append((ts[order], coeffs[sel][order]))
    return rows, k


def _digits(vals, k):
    """4-ary digits of vals, most significant first: [len(vals), k]."""
    out = np.empty((len(vals), k), dtype=np.uint8)
    for j in range(k):
        out[:, k - 1 - j] = (vals >> (2 * j)) & 3
    return out


def _apply_gate_batch(codes, phases, qs, rows, k, branch_atol):
    """Apply one gate's Pauli-transfer to the whole branch batch."""
    # Local substring code: qs[0] is the most significant digit.
    local = np.zeros(len(codes), dtype=np.int64)
    for j, q in enumerate(qs):
        local = (local << 2) | codes[:, q]

    out_codes = []
    out_phases = []
    for s in np.unique(local):
        mask = local == s
        ts, cs = rows[s]
        if len(ts) == 0:
            continue
        nb = int(mask.sum())
        nt = len(ts)
        rep = np.repeat(codes[mask], nt, axis=0)
        tdig = _digits(ts, k)
        for j, q in enumerate(qs):
            rep[:, q] = np.tile(tdig[:, j], nb)
        ph = (phases[mask][:, None] * cs[None, :]).ravel()
        out_codes.append(rep)
        out_phases.append(ph)

    if not out_codes:
        return codes[:0], phases[:0]
    codes = np.concatenate(out_codes)
    phases = np.concatenate(out_phases)
    if branch_atol:
        sel = np.abs(phases) > branch_atol
        if not sel.all():
            codes, phases = codes[sel], phases[sel]
    return codes, phases


def _merge_batch(codes, phases):
    """Sum phases of identical strings (linearity of the evolution)."""
    if len(codes) < 2:
        return codes, phases
    uniq, inv = np.unique(codes, axis=0, return_inverse=True)
    summed = np.zeros(len(uniq), dtype=phases.dtype)
    np.add.at(summed, inv, phases)
    return uniq, summed


def update_pauli_string(circuit, pauli_string, phase: float = 1,
                        parallel=False, return_info: bool = False,
                        use_mpi=None, compress: int = 4,
                        simplify: bool = True,
                        remove_id_gates: bool = True,
                        float_type='float32', verbose: bool = False,
                        **kwargs):
    """Expand ``C† P C`` in Pauli strings.

    Returns a dict mapping Pauli strings (over the sorted circuit qubits)
    to real amplitudes; with ``return_info=True`` also an info dict.
    """
    float_type = np.dtype(float_type)
    kwargs.setdefault('eps',
                      1e-7 if float_type == np.dtype('float32') else 1e-8)
    kwargs.setdefault('atol',
                      1e-8 if float_type == np.dtype('float32') else 1e-12)
    kwargs.setdefault('branch_atol', kwargs['atol'])
    kwargs.setdefault('max_breadth_first_branches', 2**18)
    kwargs.setdefault('merge_interval', 4)

    circuit = utils.flatten(Circuit(circuit))
    if remove_id_gates:
        circuit = Circuit(g for g in circuit if g.name != 'I')

    # A plain token string means a single Pauli string with unit phase.
    if isinstance(pauli_string, str):
        pauli_string = {pauli_string: 1.0}

    # Determine qubits (circuit plus Pauli support).
    if isinstance(pauli_string, dict):
        pauli_qubits = []
    else:
        pauli_string = Circuit(pauli_string)
        pauli_qubits = pauli_string.all_qubits
    qubits = sort(set(circuit.all_qubits) | set(pauli_qubits))
    n = len(qubits)
    qubit_index = {q: i for i, q in enumerate(qubits)}

    # Initial branches.
    if isinstance(pauli_string, dict):
        codes0 = []
        phases0 = []
        for key, ph in pauli_string.items():
            key = str(key).upper()
            if len(key) != n or set(key) - set(_PAULI_NAMES):
                raise ValueError(f"'{key}' is not a valid Pauli string.")
            codes0.append([_PAULI_NAMES.index(c) for c in key])
            phases0.append(ph * phase)
        codes = np.asarray(codes0, dtype=np.uint8)
        phases = np.asarray(phases0, dtype=float_type)
    else:
        code = np.zeros(n, dtype=np.uint8)
        for g in pauli_string:
            if g.name not in _PAULI_NAMES:
                raise ValueError(
                    "'pauli_string' must contain only Pauli gates.")
            (q,) = g.qubits
            code[qubit_index[q]] = _PAULI_NAMES.index(g.name)
        codes = code[None]
        phases = np.asarray([phase], dtype=float_type)

    # Preprocess circuit: simplify then lightcone-prune against the Pauli
    # support (gates outside the cone cancel between C† and C;
    # reference ``clifford.py:1056-1081``).
    if simplify and len(circuit):
        support = [qubits[i] for i in range(n)
                   if np.any(codes[:, i] != 0)]
        circuit = utils.simplify(circuit, remove_id_gates=remove_id_gates)
        if support:
            circuit = utils.popright(Circuit(circuit),
                                     pinned_qubits=support)

    # Compress and precompute Pauli-transfer rows.
    blocks = utils.compress(circuit, compress) if compress else \
        [Circuit([g]) for g in circuit]
    gates = []
    for b in blocks:
        g = utils.to_matrix_gate(b, complex_type='complex128') \
            if len(b) > 1 else b[0]
        if not g.provides('matrix'):
            raise NotImplementedError(
                f"Gate '{g.name}' not supported by the Clifford engine.")
        rows, k = _pauli_rows(np.asarray(g.matrix(), dtype='complex128'),
                              kwargs['eps'])
        qs = tuple(qubit_index[q] for q in g.qubits)
        gates.append((qs, rows, k))

    # Depth-first evolution with bounded batches.
    max_batch = int(kwargs['max_breadth_first_branches'])
    merge_every = int(kwargs['merge_interval'])
    db = defaultdict(float)
    info = {'n_explored_branches': 0, 'largest_batch': len(codes)}

    stack = [(0, codes, phases)]
    while stack:
        gi, codes, phases = stack.pop()
        while gi < len(gates) and len(codes):
            qs, rows, k = gates[gi]
            codes, phases = _apply_gate_batch(codes, phases, qs, rows, k,
                                              kwargs['branch_atol'])
            gi += 1
            if merge_every and gi % merge_every == 0:
                codes, phases = _merge_batch(codes, phases)
            info['largest_batch'] = max(info['largest_batch'], len(codes))
            if len(codes) > max_batch:
                half = len(codes) // 2
                stack.append((gi, codes[half:], phases[half:]))
                codes, phases = codes[:half], phases[:half]
        if not len(codes):
            continue
        info['n_explored_branches'] += len(codes)
        codes, phases = _merge_batch(codes, phases)
        for row, ph in zip(codes, phases):
            key = ''.join(_PAULI_NAMES[c] for c in row)
            db[key] += float(ph)

    # Drop negligible strings.
    atol = kwargs['atol']
    for key in [k for k, v in db.items() if abs(v) < atol]:
        del db[key]

    info['n_strings'] = len(db)
    return (db, info) if return_info else db


def expectation_value(circuit, op, initial_state: str, **kwargs):
    """⟨ψ| C† op C |ψ⟩ with ψ a product state given by tokens '01+-'
    (reference ``clifford.py:1403-1556``)."""
    return_info = kwargs.pop('return_info', False)
    circuit = Circuit(circuit)
    qubits = circuit.all_qubits
    if len(initial_state) == 1:
        initial_state = initial_state * len(qubits)
    if len(initial_state) != len(qubits):
        raise ValueError("'initial_state' has the wrong number of qubits.")

    # Prepend the state-preparation circuit so the expectation reduces to
    # counting X/Y-free strings on |0...0>.
    prep = Circuit()
    for q, s in zip(qubits, initial_state):
        if s == '0':
            pass
        elif s == '1':
            prep.append(Gate('X', [q]))
        elif s == '+':
            prep.append(Gate('H', [q]))
        elif s == '-':
            prep.extend([Gate('X', [q]), Gate('H', [q])])
        else:
            raise ValueError(f"Unexpected token '{s}'")

    out = update_pauli_string(prep + circuit, op, return_info=return_info,
                              **kwargs)
    db, info = out if return_info else (out, None)
    value = sum(v for k, v in db.items() if not set(k) & set('XY'))
    return (value, info) if return_info else value
