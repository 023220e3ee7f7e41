"""Slice finding: cut indices until every intermediate fits in memory.

Replacement for cotengra's ``SliceFinder`` (reference
``simulation.py:1037-1048``): fixing ("slicing") an index turns one big
contraction into ``prod(sliced dims)`` independent small ones summed at
the end — the unit of distribution across chips (the reference
distributes slices over MPI ranks; we batch them per chip and ``psum``
across the mesh).

Greedy heuristic: repeatedly slice the index that appears in the largest
intermediates, breaking ties by the smallest total-flops overhead.
"""

from __future__ import annotations

from typing import FrozenSet, Tuple

from hybridq_tpu.simulation.tn.path import ContractionTree

__all__ = ['find_slices', 'SliceCost']


class SliceCost:
    """Cost summary after slicing (mirrors cotengra's ContractionCosts)."""

    def __init__(self, tree: ContractionTree, sliced: FrozenSet[str]):
        self.sliced = frozenset(sliced)
        self.nslices = 1
        for i in self.sliced:
            self.nslices *= tree.size_dict[i]
        self.sliced_flops = tree.total_flops(self.sliced)
        self.total_flops = self.nslices * self.sliced_flops
        self.max_size = tree.max_size(self.sliced)


def find_slices(tree: ContractionTree, target_size: float,
                max_candidates: int = 32) -> Tuple[FrozenSet[str],
                                                   SliceCost]:
    """Greedily pick indices to slice until ``max_size <= target_size``.

    Output indices are never sliced (they must remain open).
    """
    out_set = set(tree.output)
    sliced = set()
    cost = SliceCost(tree, frozenset())

    while cost.max_size > target_size:
        # Indices appearing in oversized intermediates.
        cand = set()
        for v in list(tree.children) + list(range(tree.n_leaves)):
            if tree.node_size(v, sliced) > target_size:
                cand.update(i for i in tree.node_inds[v]
                            if i not in sliced and i not in out_set)
        if not cand:
            break  # cannot reduce further (open legs dominate)

        # Rank candidates: how much does slicing each reduce max size /
        # increase total flops?
        scored = []
        for i in sorted(cand)[:max_candidates * 4]:
            trial = frozenset(sliced | {i})
            c = SliceCost(tree, trial)
            scored.append(((c.max_size, c.total_flops), i, c))
        scored.sort(key=lambda x: x[0])
        _, best_i, best_c = scored[0]
        sliced.add(best_i)
        cost = best_c
        if len(sliced) > 60:
            raise RuntimeError("Slicing did not converge.")

    return frozenset(sliced), SliceCost(tree, frozenset(sliced))
