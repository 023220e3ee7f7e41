"""Benchmark: gate-applications/s/chip for state-vector evolution.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload: random 4-qubit fused unitaries (the reference's default
compression level, ``simulation.py:314``) applied to the largest state that
fits on one chip.  ``vs_baseline`` compares against the reference
HybridQ's own einsum engine measured on this host's CPU at a common size
(26 qubits), scaled per gate application — i.e. the number reported is
"times faster than the reference on one x86 node, per chip".
"""

import json
import os
import sys
import time

import numpy as np


def _rand_unitary(k, rng):
    m = rng.standard_normal((2**k, 2**k)) + \
        1j * rng.standard_normal((2**k, 2**k))
    q, _ = np.linalg.qr(m)
    return q.astype('complex64')


def _gate_layers(n, k, n_gates, rng):
    """Random k-qubit gate positions covering the register."""
    axes_list = []
    for _ in range(n_gates):
        qs = tuple(int(x) for x in rng.choice(n, k, replace=False))
        axes_list.append(qs)
    return axes_list


def bench_tpu(n, k=4, n_gates=8, seed=0):
    """Time jitted evolution of ``n_gates`` fused k-qubit gates at n
    qubits.  Returns gate applications per second."""
    import jax.numpy as jnp

    from hybridq_tpu.simulation.statevector import make_evolver

    rng = np.random.default_rng(seed)
    axes_list = _gate_layers(n, k, n_gates, rng)
    mats = []
    for _ in range(n_gates):
        u = _rand_unitary(k, rng)
        mats.append((jnp.asarray(u.real.astype('float32')),
                     jnp.asarray(u.imag.astype('float32'))))

    re = jnp.zeros((2**n,), dtype='float32').at[0].set(1).reshape((2,) * n)
    im = jnp.zeros_like(re)
    run = make_evolver(axes_list, n, 'float32')
    # Warm-up / compile.
    state = run((re, im), mats)
    state[1].block_until_ready()

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        state = run(state, mats)
    state[1].block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep
    return n_gates / dt, dt


def bench_reference_cpu(n, k=4, n_gates=6, seed=0, timeout_s=120):
    """Reference HybridQ einsum engine (numpy backend) on this host's CPU;
    returns gate applications per second, or None if unavailable."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), 'tests'))
        from _ref_oracle import import_reference
        if import_reference() is None:
            return None
        from opt_einsum import contract
        rng = np.random.default_rng(seed)
        psi = np.zeros((2,) * n, dtype='complex64')
        psi[(0,) * n] = 1
        # Time raw per-gate contraction exactly as the reference einsum
        # engine does per block (simulation.py:707-758).
        from opt_einsum import get_symbol
        axes_list = _gate_layers(n, k, n_gates, rng)
        t0 = time.perf_counter()
        for qs in axes_list:
            U = _rand_unitary(k, rng).reshape((2,) * (2 * k))
            sym = {q: get_symbol(q) for q in range(n)}
            path_state = ''.join(sym[q] for q in range(n))
            out_sym = dict(sym)
            for i, q in enumerate(qs):
                out_sym[q] = get_symbol(n + i)
            lhs = (''.join(out_sym[q] for q in qs) +
                   ''.join(sym[q] for q in qs) + ',' + path_state)
            rhs = ''.join(out_sym[q] for q in range(n))
            psi = contract(lhs + '->' + rhs, U, psi)
            if time.perf_counter() - t0 > timeout_s:
                return None
        dt = time.perf_counter() - t0
        return n_gates / dt
    except Exception:
        return None


def _max_qubits_single_chip(default_hbm_bytes=16 * 2**30):
    """Largest n whose split-f32 state plus working buffers fit in HBM.

    Peak concurrent buffers during a gate application: inputs (re, im) +
    outputs (re', im') + partial products ≈ 6 arrays of 4·2^n bytes; use a
    conservative 24·2^n ≤ 0.9·HBM."""
    import jax
    d = jax.devices()[0]
    hbm = None
    try:
        stats = d.memory_stats()
        if stats:
            hbm = stats.get('bytes_limit')
    except Exception:
        pass
    hbm = hbm or default_hbm_bytes
    n = int(np.floor(np.log2(0.9 * hbm / 24)))
    return n


def main():
    # Headline: largest state that fits on one chip (computed from HBM,
    # with a one-step fallback — compiles over the test tunnel are slow,
    # so avoid long trial ladders).
    n_max = _max_qubits_single_chip()
    value = None
    n_used = None
    for n in (n_max, n_max - 1):
        try:
            value, dt = bench_tpu(n)
            n_used = n
            break
        except Exception as e:
            sys.stderr.write(f"# {n}q failed: {type(e).__name__}\n")
            continue
    if value is None:
        print(json.dumps({"metric": "gate_applications_per_s_per_chip",
                          "value": 0.0, "unit": "gates/s",
                          "vs_baseline": 0.0}))
        return

    # Baseline ratio at a common size both sides can run.
    n_common = 26
    ref = bench_reference_cpu(n_common)
    if ref:
        mine_common, _ = bench_tpu(n_common)
        vs = mine_common / ref
    else:
        vs = None

    sys.stderr.write(f"# n={n_used}q fused-4q gates, "
                     f"{value:.1f} gates/s/chip\n")
    print(json.dumps({
        "metric": f"gate_applications_per_s_per_chip_{n_used}q",
        "value": round(value, 2),
        "unit": "fused-4q-gates/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == '__main__':
    main()
