"""Hyperparameter grid for the joint (tree, slice) anneal on the cached
depth-20 Sycamore-53 network.  Two chains at a time (2 host cores).

Usage: python scripts/joint_grid.py [n_sweeps]
"""
import math
import os
import pickle
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hybridq_tpu import native
from hybridq_tpu.simulation.tn.path import (ContractionTree,
                                            _ssa_to_linear, tree_to_ssa)
from hybridq_tpu.simulation.tn.slicer import SliceCost, _drop_redundant


def main():
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000000
    with open('/tmp/tune_reconf_tree.pkl.20', 'rb') as f:
        inputs, output, size_dict, ssa = pickle.load(f)
    tree = ContractionTree(inputs, output, size_dict,
                           _ssa_to_linear(ssa, len(inputs)))
    ssa_pre, sl0, _, _ = native.slice_anneal_tree(
        tree.inputs, tree.output, tree.size_dict, tree_to_ssa(tree),
        target_size=2**26, sweeps_per_slice=0, final_sweeps=0,
        seed=0, max_slices=400)

    grid = [
        dict(t0=0.7, t1=0.01, slice_moves_per_sweep=4, excess_lambda=0.1),
        dict(t0=0.7, t1=0.01, slice_moves_per_sweep=8, excess_lambda=0.1),
        dict(t0=0.7, t1=0.005, slice_moves_per_sweep=4, excess_lambda=0.1),
        dict(t0=0.7, t1=0.01, slice_moves_per_sweep=16, excess_lambda=0.1),
        dict(t0=0.7, t1=0.005, slice_moves_per_sweep=8, excess_lambda=0.1),
        dict(t0=0.7, t1=0.01, slice_moves_per_sweep=8, excess_lambda=0.2),
    ]

    def run(args):
        idx, kw = args
        out_ssa, sl, fl, wd = native.joint_anneal_tree(
            tree.inputs, tree.output, tree.size_dict, ssa_pre,
            target_size=2**26, sliced=sl0, n_sweeps=sweeps,
            width_lambda=2.0, seed=100 + idx, **kw)
        t2 = ContractionTree(tree.inputs, tree.output, tree.size_dict,
                             _ssa_to_linear(out_ssa, tree.n_leaves))
        sl = _drop_redundant(t2, set(sl), 2**26)
        c = SliceCost(t2, frozenset(sl))
        return (f"{kw}: {len(sl)} sliced "
                f"total 2^{math.log2(max(c.total_flops, 1)):.2f}")

    t0 = time.time()
    with ThreadPoolExecutor(2) as ex:
        for line in ex.map(run, enumerate(grid)):
            print(f"[{time.time()-t0:.0f}s] {line}", flush=True)


if __name__ == '__main__':
    main()
