"""Multi-device TN slice scaling on the virtual CPU mesh.

Times the mesh executor (`SlicedContractor._contract_jax_mesh`: each
device sums a contiguous slice range, one psum) at 1/2/4/8 virtual
devices.  On this 2-core host wall-clock parallelism saturates at ~2
devices — the point of the table is the work-division overhead of the
collective structure (the per-device ranges + psum the real ICI path
runs), not host speedup.

Usage: python scripts/bench_tn_mesh.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)


def main():
    from hybridq_tpu.circuit import Circuit, utils
    from hybridq_tpu.extras.random import get_rqc
    from hybridq_tpu.gate import Gate
    from hybridq_tpu.simulation.tn.contract import (ContractionPlan,
                                                    SlicedContractor)
    from hybridq_tpu.simulation.tn.network import build_tn
    from hybridq_tpu.simulation.tn.path import find_path
    from hybridq_tpu.simulation.tn.slicer import slice_and_reconfigure

    np.random.seed(11)
    n = 14
    c = Circuit([Gate('H', [q]) for q in range(n)]) + \
        get_rqc(n, 120, indexes=list(range(n)))
    blocks = utils.compress(c, 2)
    c2 = Circuit(utils.to_matrix_gate(b) for b in blocks)
    net, oo = build_tn(c2, '0' * n, '0' * n)
    inputs = [t.inds for t in net.tensors]
    sd = {i: d for t in net.tensors for i, d in zip(t.inds,
                                                    t.data.shape)}
    tree = find_path(inputs, oo, sd, max_repeats=8, seed=0)
    tree, sliced, cost = slice_and_reconfigure(
        tree, target_size=2**8, time_budget=20)
    plan = ContractionPlan(tree, sliced)
    sc = SlicedContractor(plan, net.tensors, oo)
    print(f"# plan: {len(plan.steps)} steps, {sc.nslices} slices, "
          f"width 2^{np.log2(max(cost.max_size, 1)):.0f}",
          file=sys.stderr, flush=True)
    if sc.nslices < 8:
        print("# too few slices for the mesh table", file=sys.stderr)
        return

    want = sc.contract_np()
    rows = []
    for d in (1, 2, 4, 8):
        devs = jax.devices()[:d]
        # warm (compile)
        out = sc.contract_jax(devices=devs if d > 1 else None)
        np.testing.assert_allclose(out, want, atol=1e-5)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = sc.contract_jax(devices=devs if d > 1 else None)
        dt = (time.time() - t0) / reps
        rows.append({'devices': d, 'wall_s': round(dt, 3),
                     'slices_per_s': round(sc.nslices / dt, 1)})
        print(f"# {d} devices: {dt:.3f} s "
              f"({sc.nslices / dt:.1f} slices/s)", file=sys.stderr,
              flush=True)
    print(json.dumps({'n_slices': sc.nslices,
                      'steps': len(plan.steps), 'rows': rows}))


if __name__ == '__main__':
    main()
