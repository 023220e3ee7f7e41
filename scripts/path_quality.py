"""Path-search quality probe on Sycamore-53-class RQC networks.

Builds the supremacy-style random circuit used by the reference's headline
workload (``hybridq/extras/architecture/sycamore``, ABCDCDAB layers),
converts to a tensor network, runs the path search, and reports
log2(flops) / log2(largest intermediate) before and after
reconfiguration + slicing.  Host-CPU only.

Usage: python scripts/path_quality.py [depth] [seed] [methods...]
"""

import sys
import time

import numpy as np

from hybridq_tpu.architecture.google import sycamore
from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import Gate
from hybridq_tpu.simulation.tn.network import build_tn
from hybridq_tpu.simulation.tn.path import (PathInfo, anneal, find_path,
                                            reconfigure)
from hybridq_tpu.simulation.tn.slicer import slice_and_reconfigure


def supremacy_rqc(depth: int, seed: int = 0) -> Circuit:
    """ABCDCDAB supremacy pattern: random sqrt-gates + FSIM couplers."""
    rng = np.random.default_rng(seed)
    layers = sycamore.get_layers()
    qubits = sorted({q for cs in layers.values() for c in cs for q in c})
    seq = 'ABCDCDAB'
    # X/Y/W single-qubit set of the supremacy experiment; sqrt(W) is the
    # pi/2 rotation about (X+Y)/sqrt(2), i.e. R_PI_2 at phi = pi/4.
    one_qb = [Gate('SQRT_X'), Gate('SQRT_Y'),
              Gate('R_PI_2', params=[np.pi / 4])]
    circ = Circuit()
    for d in range(depth):
        for q in qubits:
            circ.append(one_qb[rng.integers(len(one_qb))].on([q]))
        for pair in layers[seq[d % len(seq)]]:
            circ.append(Gate('FSIM', list(pair),
                             params=[np.pi / 2, np.pi / 6]))
    return circ


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    methods = sys.argv[3:] or ['greedy', 'bisection']

    circ = supremacy_rqc(depth, seed)
    n = len(circ.all_qubits)
    blocks = utils.compress(circ, 2)
    circ2 = Circuit(utils.to_matrix_gate(c) for c in blocks)
    net, output_order = build_tn(circ2, '0' * n, '0' * n)
    inputs = [t.inds for t in net.tensors]
    size_dict = {}
    for t in net.tensors:
        for i, d in zip(t.inds, t.data.shape):
            size_dict[i] = d
    print(f"# sycamore-{n} depth={depth}: {len(net.tensors)} tensors, "
          f"{len(size_dict)} indices")

    t0 = time.time()
    tree = find_path(inputs, output_order, size_dict, methods=methods,
                     max_repeats=16, minimize='combo', seed=seed)
    t_search = time.time() - t0
    info = PathInfo(tree)
    print(f"search   {t_search:7.1f}s  {info}")

    t0 = time.time()
    tree = anneal(tree, time_budget=60)
    info = PathInfo(tree)
    print(f"anneal   {time.time()-t0:7.1f}s  {info}")

    t0 = time.time()
    tree = reconfigure(tree, time_budget=30)
    info = PathInfo(tree)
    print(f"reconfig {time.time()-t0:7.1f}s  {info}")

    t0 = time.time()
    tree, sliced, cost = slice_and_reconfigure(tree, target_size=2**26,
                                               time_budget=120)
    print(f"slice    {time.time()-t0:7.1f}s  n_sliced={len(sliced)} "
          f"n_slices={cost.nslices} "
          f"total_flops=2^{np.log2(max(cost.total_flops,1)):.2f} "
          f"max_size=2^{np.log2(max(cost.max_size,1)):.2f}")


if __name__ == '__main__':
    main()
