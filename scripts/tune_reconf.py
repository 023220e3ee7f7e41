"""A/B the interleaved DP reconfiguration inside the joint anneal.

Builds (and caches) the depth-20 Sycamore-53 network + searched tree,
then runs slice_and_reconfigure under the HYBRIDQ_RECONF_* env knobs.

Usage: python scripts/tune_reconf.py [budget] [depth]
       (set HYBRIDQ_RECONF_EVERY=0 to disable reconfiguration)
"""
import math
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CACHE = '/tmp/tune_reconf_tree.pkl'


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from scripts.path_quality import supremacy_rqc
    from hybridq_tpu.circuit import Circuit, utils
    from hybridq_tpu.simulation.tn.network import build_tn
    from hybridq_tpu.simulation.tn.path import (ContractionTree, PathInfo,
                                                find_path)
    from hybridq_tpu.simulation.tn.slicer import slice_and_reconfigure

    key = f'{CACHE}.{depth}'
    if os.path.exists(key):
        with open(key, 'rb') as f:
            inputs, output, size_dict, ssa = pickle.load(f)
        from hybridq_tpu.simulation.tn.path import _ssa_to_linear
        tree = ContractionTree(inputs, output, size_dict,
                               _ssa_to_linear(ssa, len(inputs)))
    else:
        circ = supremacy_rqc(depth, 0)
        n = len(circ.all_qubits)
        blocks = utils.compress(circ, 2)
        circ2 = Circuit(utils.to_matrix_gate(c) for c in blocks)
        net, output_order = build_tn(circ2, '0' * n, '0' * n)
        inputs = [t.inds for t in net.tensors]
        size_dict = {}
        for t in net.tensors:
            for i, d in zip(t.inds, t.data.shape):
                size_dict[i] = d
        tree = find_path(inputs, output_order, size_dict,
                         methods=['greedy', 'bisection'], max_repeats=16,
                         minimize='combo', seed=0)
        from hybridq_tpu.simulation.tn.path import tree_to_ssa
        with open(key, 'wb') as f:
            pickle.dump((tree.inputs, tree.output, tree.size_dict,
                         tree_to_ssa(tree)), f)
    print(f"# start: {PathInfo(tree)}")
    t0 = time.time()
    tree, sliced, cost = slice_and_reconfigure(tree, target_size=2**26,
                                               time_budget=budget,
                                               verbose=True)
    print(f"# {time.time()-t0:.0f}s n_sliced={len(sliced)} "
          f"total=2^{math.log2(max(cost.total_flops,1)):.2f} "
          f"width=2^{math.log2(max(cost.max_size,1)):.2f} "
          f"env every={os.environ.get('HYBRIDQ_RECONF_EVERY','24')} "
          f"nodes={os.environ.get('HYBRIDQ_RECONF_NODES','48')}")


if __name__ == '__main__':
    main()
