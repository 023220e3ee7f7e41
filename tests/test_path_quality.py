"""Path-search quality canaries.

Fast thresholds on small Sycamore-53 networks so search-stack changes
that silently regress contraction quality fail CI.  Thresholds are ~2
bits above what the current stack achieves in seconds on 2 CPU cores.
"""

import math

import numpy as np
import pytest

from hybridq_tpu import native
from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.simulation.tn.network import build_tn
from hybridq_tpu.simulation.tn.path import (ContractionTree, PathInfo,
                                            anneal, find_path)
from hybridq_tpu.simulation.tn.slicer import slice_and_reconfigure


def _sycamore_net(depth, seed=0):
    from hybridq_tpu.architecture.google import sycamore
    from hybridq_tpu.gate import Gate

    rng = np.random.default_rng(seed)
    layers = sycamore.get_layers()
    qubits = sorted({q for cs in layers.values() for c in cs for q in c})
    seq = 'ABCDCDAB'
    circ = Circuit()
    for d in range(depth):
        for q in qubits:
            circ.append(Gate(('SQRT_X', 'SQRT_Y')[rng.integers(2)], [q]))
        for pair in layers[seq[d % len(seq)]]:
            circ.append(Gate('FSIM', list(pair),
                             params=[np.pi / 2, np.pi / 6]))
    n = len(circ.all_qubits)
    blocks = utils.compress(circ, 2)
    circ2 = Circuit(utils.to_matrix_gate(c) for c in blocks)
    net, output_order = build_tn(circ2, '0' * n, '0' * n)
    inputs = [t.inds for t in net.tensors]
    size_dict = {i: d2 for t in net.tensors
                 for i, d2 in zip(t.inds, t.data.shape)}
    return inputs, output_order, size_dict


@pytest.mark.skipif(not native.hgp_available(),
                    reason="native library unavailable")
def test_sycamore_depth8_quality():
    inputs, output, size_dict = _sycamore_net(8)
    tree = find_path(inputs, output, size_dict, max_repeats=8, seed=0)
    tree = anneal(tree, time_budget=10.0, seed=0)
    info = PathInfo(tree)
    # Round-1 spectral search landed ~2^45; the native stack reaches
    # ~2^39-2^41 in seconds.
    assert math.log2(info.opt_cost) < 43.0, info


@pytest.mark.skipif(not native.hgp_available(),
                    reason="native library unavailable")
def test_sycamore_depth8_sliced_quality():
    inputs, output, size_dict = _sycamore_net(8)
    tree = find_path(inputs, output, size_dict, max_repeats=8, seed=1)
    tree = anneal(tree, time_budget=10.0, seed=1)
    tree, sliced, cost = slice_and_reconfigure(tree, target_size=2**22,
                                               time_budget=20.0)
    assert cost.max_size <= 2**22
    assert math.log2(max(cost.total_flops, 1)) < 46.0, (
        len(sliced), math.log2(cost.total_flops))


def test_find_path_python_fallback(monkeypatch):
    """The pure-Python path (no native lib) must still produce valid
    trees."""
    monkeypatch.setattr(native, '_lib', None)
    monkeypatch.setattr(native, '_tried', True)
    inputs, output, size_dict = _sycamore_net(4)
    tree = find_path(inputs, output, size_dict, max_repeats=4, seed=0)
    assert isinstance(tree, ContractionTree)
    # anneal must be a graceful no-op
    tree2 = anneal(tree, time_budget=1.0)
    assert tree2.total_flops() <= tree.total_flops() * (1 + 1e-9)
