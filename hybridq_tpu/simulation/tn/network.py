"""Tensor-network representation of circuits.

The reference delegates to quimb (``hybridq/circuit/utils.py:324-417``,
``simulation.py:873-917``); quimb is not TPU-friendly and not available
here, so this is a small self-contained TN layer: named indices, circuit →
network construction with initial/final state boundary tensors, and
rank-simplification (absorb low-rank tensors) replacing quimb's
``full_simplify('RC')``.

All indices are dimension-2 (qubit legs); index names follow the
reference convention ``{prefix}_{qubit_index}_{tag}`` with tags ``i``
(initial leg), ``f`` (final leg), or the gate position.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from string import ascii_letters
from typing import Dict, List, Tuple

import numpy as np

from hybridq_tpu.circuit import Circuit
from hybridq_tpu.utils import sort

__all__ = ['Tensor', 'TensorNetwork', 'circuit_to_tn', 'build_tn']

_MPS = {
    '0': np.array([1.0, 0.0]),
    '1': np.array([0.0, 1.0]),
    '+': np.array([1.0, 1.0]) / np.sqrt(2),
    '-': np.array([1.0, -1.0]) / np.sqrt(2),
}


@dataclasses.dataclass
class Tensor:
    """A dense tensor with named indices."""
    data: np.ndarray
    inds: Tuple[str, ...]

    def __post_init__(self):
        self.data = np.asarray(self.data)
        self.inds = tuple(self.inds)
        if self.data.ndim != len(self.inds):
            raise ValueError("indices inconsistent with data rank")

    @property
    def rank(self) -> int:
        return len(self.inds)

    def reindex(self, mapping: Dict[str, str]) -> 'Tensor':
        return Tensor(self.data, tuple(mapping.get(i, i)
                                       for i in self.inds))


def _contract_pair(a: Tensor, b: Tensor, keep: set) -> Tensor:
    """Contract two tensors over shared indices not in ``keep``."""
    shared = [i for i in a.inds if i in b.inds and i not in keep]
    a_axes = [a.inds.index(i) for i in shared]
    b_axes = [b.inds.index(i) for i in shared]
    data = np.tensordot(a.data, b.data, axes=(a_axes, b_axes))
    inds = tuple(i for i in a.inds if i not in shared) + tuple(
        i for i in b.inds if i not in shared)
    if len(set(inds)) != len(inds):
        # Our construction never produces hyper-edges; guard anyway.
        raise ValueError("repeated index after contraction")
    return Tensor(data, inds)


class TensorNetwork:
    """A list of tensors plus designated open (outer) indices."""

    def __init__(self, tensors: List[Tensor]):
        self.tensors = list(tensors)

    @property
    def outer_inds(self) -> List[str]:
        """Indices appearing exactly once."""
        count = defaultdict(int)
        for t in self.tensors:
            for i in t.inds:
                count[i] += 1
        return [i for i, c in count.items() if c == 1]

    def copy(self) -> 'TensorNetwork':
        return TensorNetwork([Tensor(t.data, t.inds)
                              for t in self.tensors])

    def simplify(self, max_rank: int = 4) -> 'TensorNetwork':
        """Absorb every tensor of rank ≤ 2 into a neighbor when this does
        not grow the neighbor's rank (replacement for quimb's
        rank-simplify).  Runs until fixpoint."""
        keep = set(self.outer_inds)
        tensors = list(self.tensors)
        changed = True
        while changed:
            changed = False
            # index -> tensor positions
            where = defaultdict(list)
            for pos, t in enumerate(tensors):
                if t is None:
                    continue
                for i in t.inds:
                    where[i].append(pos)
            for pos, t in enumerate(tensors):
                if t is None or t.rank > 2:
                    continue
                # find a neighbor sharing an index
                neigh = None
                for i in t.inds:
                    if i in keep:
                        continue
                    for p in where[i]:
                        if p != pos and tensors[p] is not None:
                            neigh = p
                            break
                    if neigh is not None:
                        break
                if neigh is None:
                    continue
                merged = _contract_pair(tensors[neigh], t, keep)
                if merged.rank > max(tensors[neigh].rank, max_rank):
                    continue
                tensors[neigh] = merged
                tensors[pos] = None
                changed = True
                # rebuild adjacency lazily
                where = defaultdict(list)
                for p2, t2 in enumerate(tensors):
                    if t2 is None:
                        continue
                    for i in t2.inds:
                        where[i].append(p2)
        self.tensors = [t for t in tensors if t is not None]
        # scalar tensors (rank 0) fold into the first tensor
        scalars = [t for t in self.tensors if t.rank == 0]
        if scalars and len(self.tensors) > len(scalars):
            rest = [t for t in self.tensors if t.rank > 0]
            factor = np.prod([t.data for t in scalars])
            rest[0] = Tensor(rest[0].data * factor, rest[0].inds)
            self.tensors = rest
        return self

    def astype(self, dtype) -> 'TensorNetwork':
        self.tensors = [Tensor(t.data.astype(dtype), t.inds)
                        for t in self.tensors]
        return self

    def __len__(self):
        return len(self.tensors)


def circuit_to_tn(circuit, complex_type='complex64',
                  return_qubits_map: bool = False,
                  leaves_prefix: str = 'q_'):
    """Circuit → TensorNetwork, reference index conventions
    (``hybridq/circuit/utils.py:324-417``)."""
    circuit = Circuit(circuit)
    all_qubits = circuit.all_qubits
    qubits_map = {q: i for i, q in enumerate(all_qubits)}
    last_tag = {q: 'i' for q in all_qubits}

    tensors = []
    for t, gate in enumerate(circuit):
        U = np.reshape(gate.matrix().astype(complex_type),
                       (2,) * (2 * len(gate.qubits)))
        inds = [f'{leaves_prefix}_{qubits_map[q]}_{t}'
                for q in gate.qubits]
        inds += [f'{leaves_prefix}_{qubits_map[q]}_{last_tag[q]}'
                 for q in gate.qubits]
        for q in gate.qubits:
            last_tag[q] = t
        tensors.append(Tensor(U, tuple(inds)))

    out_map = {
        f'{leaves_prefix}_{qubits_map[q]}_{t}':
        f'{leaves_prefix}_{qubits_map[q]}_f' for q, t in last_tag.items()
    }
    tensors = [t.reindex(out_map) for t in tensors]
    net = TensorNetwork(tensors)
    return (net, qubits_map) if return_qubits_map else net


def build_tn(circuit, initial_state: str, final_state: str,
             complex_type='complex64', leaves_prefix: str = 'q_',
             simplify: bool = True):
    """Build the full network with boundary tensors attached.

    Tokens: '0','1','+','-' attach product-state vectors; '.' leaves the
    leg open; any ascii letter traces together all legs sharing that
    letter (reference ``simulation.py:879-917``)."""
    circuit = Circuit(circuit)
    qubits = circuit.all_qubits
    net, qmap = circuit_to_tn(circuit, complex_type=complex_type,
                              return_qubits_map=True,
                              leaves_prefix=leaves_prefix)

    for state, ext in ((initial_state, 'i'), (final_state, 'f')):
        for s, q in zip(state, qubits):
            if s in _MPS:
                ind = f'{leaves_prefix}_{qmap[q]}_{ext}'
                net.tensors.append(
                    Tensor(_MPS[s].astype(complex_type), (ind,)))

    for x in set(initial_state + final_state) - set('01+-.'):
        if x not in ascii_letters:
            raise ValueError(f"Invalid state token '{x}'.")
        inds = [f'{leaves_prefix}_{qmap[q]}_i'
                for s, q in zip(initial_state, qubits) if s == x]
        inds += [f'{leaves_prefix}_{qmap[q]}_f'
                 for s, q in zip(final_state, qubits) if s == x]
        tr = np.reshape([1] + [0] * (2**len(inds) - 2) + [1],
                        (2,) * len(inds))
        net.tensors.append(Tensor(tr.astype(complex_type), tuple(inds)))

    if simplify:
        net.simplify()
    net.astype(complex_type)

    # Output order: sorted initial legs then sorted final legs.
    outer = net.outer_inds
    i_inds = sort([x for x in outer if x.endswith('_i')],
                  key=lambda x: int(x.split('_')[-2]))
    f_inds = sort([x for x in outer if x.endswith('_f')],
                  key=lambda x: int(x.split('_')[-2]))
    return net, i_inds + f_inds
