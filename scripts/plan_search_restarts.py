"""Sliced-plan search with seeded restarts (VERDICT r3 item #4).

``slice_and_reconfigure`` runs the native joint (tree, slice-set)
anneal with a fixed seed — one deterministic trajectory per (tree,
budget).  Measured outcomes across budgets scatter over 2^69-2^81
total sliced flops for Sycamore-53 depth-20, so restart diversity is
worth more than a longer single run.  This driver:

  1. builds (or reuses) a good UNSLICED tree: find_path + long anneal
     + reconfigure;
  2. runs N independent ``_joint_anneal_native`` restarts from
     deep-copies of that tree with different seeds, keeping the best
     total-sliced-flops outcome;
  3. writes the winner into scripts/_plan_cache in bench_tn's format.

Usage:
  python scripts/plan_search_restarts.py [--depth 20] [--anneal 1200]
      [--restart-budget 600] [--restarts 6] [--target 26]

CPU-only (forces the cpu platform: plan search must never claim the
single TPU process slot).
"""
import argparse
import copy
import json
import math
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      '_plan_cache')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--depth', type=int, default=20)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--anneal', type=float, default=1200.0)
    ap.add_argument('--restart-budget', type=float, default=600.0)
    ap.add_argument('--restarts', type=int, default=6)
    ap.add_argument('--target', type=int, default=26)
    ap.add_argument('--tree-cache', default=None,
                    help='pkl with a cached unsliced tree to reuse')
    args = ap.parse_args()

    from hybridq_tpu.circuit import Circuit, utils
    from hybridq_tpu.simulation.tn.network import build_tn
    from hybridq_tpu.simulation.tn.path import (PathInfo, anneal,
                                                find_path, reconfigure)
    from hybridq_tpu.simulation.tn.slicer import (SliceCost,
                                                  _joint_anneal_native)
    from scripts.path_quality import supremacy_rqc

    circ = supremacy_rqc(args.depth, args.seed)
    n = len(circ.all_qubits)
    blocks = utils.compress(circ, 2)
    circ2 = Circuit(utils.to_matrix_gate(c) for c in blocks)
    net, output_order = build_tn(circ2, '0' * n, '0' * n)
    inputs = [t.inds for t in net.tensors]
    size_dict = {i: d for t in net.tensors
                 for i, d in zip(t.inds, t.data.shape)}

    tree_pkl = args.tree_cache or os.path.join(
        _CACHE, f"tree_d{args.depth}_s{args.seed}.pkl")
    if os.path.exists(tree_pkl):
        with open(tree_pkl, 'rb') as f:
            tree0 = pickle.load(f)
        print(f"# unsliced tree from cache: {PathInfo(tree0)}",
              flush=True)
    else:
        t0 = time.time()
        tree0 = find_path(inputs, output_order, size_dict,
                          max_repeats=16, seed=args.seed)
        tree0 = anneal(tree0, time_budget=args.anneal, verbose=True)
        tree0 = reconfigure(tree0, time_budget=60.0)
        print(f"# unsliced search {time.time()-t0:.0f}s: "
              f"{PathInfo(tree0)}", flush=True)
        os.makedirs(_CACHE, exist_ok=True)
        with open(tree_pkl, 'wb') as f:
            pickle.dump(tree0, f)

    best = None
    for r in range(args.restarts):
        t0 = time.time()
        t = copy.deepcopy(tree0)
        out = _joint_anneal_native(t, 2.0 ** args.target,
                                   args.restart_budget, False,
                                   seed=1009 * r + 17)
        if out is None:
            print("# native joint anneal unavailable", flush=True)
            return
        tree, sliced, cost = out
        lg = math.log2(max(cost.total_flops, 1))
        print(f"# restart {r}: {time.time()-t0:.0f}s "
              f"n_inds={len(sliced)} total 2^{lg:.2f}", flush=True)
        if best is None or cost.total_flops < best[2].total_flops:
            best = (tree, sliced, cost)

    tree, sliced, cost = best
    key = f"syc53_d{args.depth}_s{args.seed}_t{args.target}.pkl"
    path = os.path.join(_CACHE, key)
    prev = None
    if os.path.exists(path):
        with open(path, 'rb') as f:
            prev = pickle.load(f)
        prev_flops = prev[4].total_flops
        if prev_flops <= cost.total_flops:
            print(f"# keeping existing plan "
                  f"(2^{math.log2(max(prev_flops,1)):.2f} <= "
                  f"2^{math.log2(max(cost.total_flops,1)):.2f})",
                  flush=True)
            print(json.dumps({
                'plan': key, 'kept_existing': True,
                'log2_total_flops': round(
                    math.log2(max(prev_flops, 1)), 2)}))
            return
    with open(path, 'wb') as f:
        pickle.dump((net, output_order, tree, sliced, cost), f)
    print(json.dumps({
        'plan': key,
        'log2_total_flops': round(
            math.log2(max(cost.total_flops, 1)), 2),
        'n_slices': cost.nslices}))


if __name__ == '__main__':
    main()
