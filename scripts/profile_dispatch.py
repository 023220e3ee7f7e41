"""Probe per-dispatch overhead of the indexed engine on the real chip.

Three measurements at 28q:
  1. steady-state per-block cost of each kernel class used by bench.py's
     paired workload (back-to-back calls, single readback);
  2. the same sequence with a readback after EVERY call (upper bound on
     dispatch+sync overhead);
  3. a ``lax.scan``-batched variant of a same-class run (stacked
     matrices + precomputed effective perms) — the candidate fix if
     per-call overhead dominates.

Run manually: python scripts/profile_dispatch.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _workload
    from hybridq_tpu.simulation.kernels import (IndexedEvolver,
                                                pair_matrix_gates)

    n, k, n_gates, seed = 28, 4, 24, 0
    rng = np.random.default_rng(seed)
    gates = _workload(n, k, n_gates, rng)
    blocks = pair_matrix_gates(gates, n)
    blocks = [(np.ascontiguousarray(U, dtype='complex64'), qs)
              for U, qs in blocks]
    print(f"# paired {n_gates} gates -> {len(blocks)} blocks "
          f"(sizes {sorted(len(q) for _, q in blocks)})", flush=True)
    ev = IndexedEvolver(n)
    devs = ev.preload([U for U, _ in blocks])

    def classify(qs):
        bits = [n - 1 - q for q in qs]
        kh = sum(1 for b in bits if b >= ev.L)
        return (len(bits), kh, len(bits) - kh)

    for (U, qs) in blocks:
        print(f"#   block {classify(qs)} qs={qs}", flush=True)

    state = ev.prepare_state('0' * n)
    # Warm-up (2 passes: rotation variants compile too).
    t0 = time.perf_counter()
    for _ in range(2):
        for (U, qs), dev in zip(blocks, devs):
            state = ev.apply_gate(state, U, qs, U_dev=dev)
    _ = float(np.asarray(state[0][:1])[0])
    print(f"# warmup {time.perf_counter()-t0:.0f}s", flush=True)

    # 1. back-to-back, one readback at the end
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        for (U, qs), dev in zip(blocks, devs):
            state = ev.apply_gate(state, U, qs, U_dev=dev)
    _ = float(np.asarray(state[0][:1])[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"pipelined: {dt*1000:.0f} ms/pass "
          f"({dt*1000/len(blocks):.1f} ms/block, "
          f"{n_gates/dt:.1f} gates/s)", flush=True)

    # 2. readback after every call (sync cost upper bound)
    t0 = time.perf_counter()
    per = []
    for _ in range(reps):
        for (U, qs), dev in zip(blocks, devs):
            t1 = time.perf_counter()
            state = ev.apply_gate(state, U, qs, U_dev=dev)
            _ = float(np.asarray(state[0][:1])[0])
            per.append((classify(qs), time.perf_counter() - t1))
    dt = (time.perf_counter() - t0) / reps
    print(f"synced:    {dt*1000:.0f} ms/pass "
          f"({dt*1000/len(blocks):.1f} ms/block)", flush=True)
    agg = {}
    for c, t in per:
        agg.setdefault(c, []).append(t * 1000)
    for c in sorted(agg):
        v = agg[c]
        print(f"#   class {c}: {np.median(v):.0f} ms median "
              f"({min(v):.0f}-{max(v):.0f}, {len(v)} calls)", flush=True)

    # 3. Python-dispatch floor: tiny no-op program called per block
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), 'float32')
    _ = np.asarray(tiny(x))
    t0 = time.perf_counter()
    m = 50
    for _ in range(m):
        x = tiny(x)
    _ = np.asarray(x)[0, 0]
    print(f"tiny-program dispatch: "
          f"{(time.perf_counter()-t0)/m*1000:.1f} ms/call", flush=True)


if __name__ == '__main__':
    main()
