"""Native (C++) component tests: hypergraph partitioner, exact subtree
DP, and the simulated-annealing tree optimizer.

The quality-critical host-side combinatorics of TN path search
(reference: cotengra + KaHyPar, ``simulation.py:920-983``) live in
``hybridq_tpu/native/``; these tests pin correctness against the
pure-Python cost model and against opt_einsum's exact DP.
"""

import math

import numpy as np
import pytest

from hybridq_tpu import native
from hybridq_tpu.simulation.tn.path import (ContractionTree,
                                            _ssa_to_linear, anneal,
                                            tree_to_ssa)

pytestmark = pytest.mark.skipif(
    not native.hgp_available(),
    reason="native library failed to build (g++ unavailable?)")


def _random_network(rng, n_tensors, n_inds):
    names = [f"i{k}" for k in range(n_inds)]
    size_dict = {i: int(rng.choice([2, 2, 2, 4])) for i in names}
    inputs = []
    for _ in range(n_tensors):
        k = int(rng.integers(1, min(5, n_inds)))
        inputs.append(tuple(rng.choice(names, size=k, replace=False)))
    from collections import Counter
    cnt = Counter(i for inds in inputs for i in inds)
    output = tuple(i for i in names if cnt[i] == 1)
    return inputs, output, size_dict


def test_bipartition_two_cliques():
    # Two 4-cliques joined by one weak edge: the split must cut only it.
    nets, w = [], []
    for grp in ([0, 1, 2, 3], [4, 5, 6, 7]):
        for a in range(4):
            for b in range(a + 1, 4):
                nets.append([grp[a], grp[b]])
                w.append(1.0)
    nets.append([3, 4])
    w.append(0.1)
    labels, cut = native.bipartition(nets, w, 8, seed=1)
    assert cut <= 0.1 + 1e-9
    assert len(set(labels[:4].tolist())) == 1
    assert len(set(labels[4:].tolist())) == 1
    assert labels[0] != labels[4]


def test_bipartition_ring():
    # A weighted ring: optimal balanced cut crosses exactly two edges.
    n = 128
    nets = [[i, (i + 1) % n] for i in range(n)]
    w = [1.0] * n
    labels, cut = native.bipartition(nets, w, n, eps=0.05, n_runs=8,
                                     seed=3)
    assert cut == 2.0
    assert abs(int(labels.sum()) - n // 2) <= int(0.06 * n)


def test_bipartition_respects_balance():
    rng = np.random.default_rng(0)
    n = 60
    nets = [[int(a), int(b)] for a, b in rng.integers(0, n, (200, 2))
            if a != b]
    w = [1.0] * len(nets)
    labels, _ = native.bipartition(nets, w, n, eps=0.1, n_runs=4, seed=7)
    side = int(labels.sum())
    assert math.ceil(0.9 * n / 2) - 1 <= side <= math.floor(1.1 * n / 2) + 1


@pytest.mark.parametrize('seed', range(5))
def test_optimal_subpath_matches_opt_einsum(seed):
    import opt_einsum as oe

    rng = np.random.default_rng(seed)
    inputs, output, size_dict = _random_network(
        rng, int(rng.integers(3, 11)), int(rng.integers(6, 18)))
    ssa = native.optimal_subpath(inputs, output, size_dict)
    tree = ContractionTree(inputs, output, size_dict,
                           _ssa_to_linear(ssa, len(inputs)))

    class _F:
        def __init__(self, shape):
            self.shape = tuple(shape)
            self.ndim = len(shape)

    sym = {i: oe.get_symbol(k)
           for k, i in enumerate({i for inds in inputs for i in inds})}
    eq = ','.join(''.join(sym[i] for i in inds) for inds in inputs)
    eq += '->' + ''.join(sym[i] for i in output)
    views = [_F(tuple(size_dict[i] for i in inds)) for inds in inputs]
    path, _ = oe.contract_path(eq, *views, optimize='dp')
    tree_oe = ContractionTree(inputs, output, size_dict, path)
    # Native DP is exact-optimal: never worse than opt_einsum's DP.
    assert tree.total_flops() <= tree_oe.total_flops() * (1 + 1e-9)


@pytest.mark.parametrize('seed', range(3))
def test_anneal_cost_model_agreement(seed):
    rng = np.random.default_rng(seed)
    inputs, output, size_dict = _random_network(rng, 30, 40)
    path = [(0, 1)] * (len(inputs) - 1)
    tree = ContractionTree(inputs, output, size_dict, path)
    ssa = tree_to_ssa(tree)
    out_ssa, f, w = native.anneal_tree(inputs, output, size_dict, ssa,
                                       n_sweeps=500, t0=1.0, t1=0.1,
                                       seed=seed)
    rebuilt = ContractionTree(inputs, output, size_dict,
                              _ssa_to_linear(out_ssa, len(inputs)))
    assert abs(f - math.log2(rebuilt.total_flops())) < 1e-6
    assert abs(w - math.log2(rebuilt.max_size())) < 1e-6


def test_anneal_improves_bad_tree():
    rng = np.random.default_rng(11)
    # A 1D matrix chain: left-to-right is optimal; a random tree is not.
    n = 24
    names = [f"b{k}" for k in range(n + 1)]
    size_dict = {i: 8 for i in names}
    size_dict[names[0]] = 2
    size_dict[names[-1]] = 2
    inputs = [(names[k], names[k + 1]) for k in range(n)]
    output = (names[0], names[-1])
    perm = list(range(n))
    rng.shuffle(perm)
    # a deliberately bad (random caterpillar) tree
    path = [(0, 1)] * (n - 1)
    tree = ContractionTree([inputs[p] for p in perm], output, size_dict,
                           path)
    f0 = tree.total_flops()
    new = anneal(tree, time_budget=3.0, seed=3)
    assert new.total_flops() <= f0
    # sanity: the tree is still a valid contraction of the same leaves
    assert new.n_leaves == n


def test_anneal_sliced_weights():
    rng = np.random.default_rng(5)
    inputs, output, size_dict = _random_network(rng, 12, 16)
    path = [(0, 1)] * (len(inputs) - 1)
    tree = ContractionTree(inputs, output, size_dict, path)
    sliced = [i for i in size_dict if i not in output][:2]
    ssa = tree_to_ssa(tree)
    _, f, _ = native.anneal_tree(inputs, output, size_dict, ssa,
                                 sliced=sliced, n_sweeps=50, t0=0.0,
                                 t1=0.0, seed=0)
    # At zero temperature with 50 sweeps the returned cost must match
    # the Python sliced cost model for the best tree found.
    assert f <= math.log2(tree.total_flops(frozenset(sliced))) + 1e-6
