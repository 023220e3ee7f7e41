"""Path quality with the hyperedge (full_simplify) network on the
Sycamore-53 workload: build UNCOMPRESSED circuit -> diagonal reduction
(each FSIM(pi/2) coupler -> one 2x2 tensor on crossed wires) -> search.

Usage: python scripts/path_quality_full.py [depth] [seed] [search_s]
                                           [target_bits]
"""
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.simulation.tn.network import build_tn
from hybridq_tpu.simulation.tn.path import (PathInfo, anneal, find_path,
                                            reconfigure)
from hybridq_tpu.simulation.tn.slicer import slice_and_reconfigure
from scripts.path_quality import supremacy_rqc


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    search = float(sys.argv[3]) if len(sys.argv) > 3 else 240.0
    target = int(sys.argv[4]) if len(sys.argv) > 4 else 26

    circ = supremacy_rqc(depth, seed)
    n = len(circ.all_qubits)
    t0 = time.time()
    net, output_order = build_tn(circ, '0' * n, '0' * n,
                                 simplify='full')
    inputs = [t.inds for t in net.tensors]
    size_dict = {i: d for t in net.tensors
                 for i, d in zip(t.inds, t.data.shape)}
    n_hyper = sum(1 for i in size_dict
                  if sum(i in t.inds for t in net.tensors) > 2)
    print(f"# full-simplified: {len(net.tensors)} tensors, "
          f"{len(size_dict)} inds ({n_hyper} hyperedges), "
          f"build {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    tree = find_path(inputs, output_order, size_dict, max_repeats=16,
                     seed=seed)
    print(f"search   {time.time()-t0:7.1f}s  {PathInfo(tree)}",
          flush=True)
    t0 = time.time()
    tree = anneal(tree, time_budget=0.5 * search, verbose=False)
    print(f"anneal   {time.time()-t0:7.1f}s  {PathInfo(tree)}",
          flush=True)
    t0 = time.time()
    tree = reconfigure(tree, time_budget=min(30.0, 0.1 * search))
    print(f"reconfig {time.time()-t0:7.1f}s  {PathInfo(tree)}",
          flush=True)
    t0 = time.time()
    tree, sliced, cost = slice_and_reconfigure(
        tree, target_size=2**target, time_budget=0.4 * search,
        verbose=False)
    print(f"slice    {time.time()-t0:7.1f}s  n_sliced={len(sliced)} "
          f"total 2^{math.log2(max(cost.total_flops, 1)):.2f} "
          f"per-slice 2^{math.log2(max(cost.sliced_flops, 1)):.2f} "
          f"width 2^{math.log2(max(cost.max_size, 1)):.2f}", flush=True)


if __name__ == '__main__':
    sys.path.insert(0, '.')
    main()
