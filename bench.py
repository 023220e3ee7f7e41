"""Benchmark: gate-applications/s/chip for state-vector evolution.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload: random fused 4-qubit unitaries at random qubit positions on the
largest single-chip state (the reference's default compression level,
``simulation.py:314``), applied with the runtime-position indexed engine
(one XLA compile per gate-size class).

``vs_baseline`` is measured, not assumed: the reference HybridQ C++/AVX
core (``include/U.h``) is compiled from the mounted sources and timed on
this host's CPU with the same workload at a common size; the number is
(TPU gate-apps/s) / (reference C++ gate-apps/s on this host).
"""

import ctypes
import json
import os
import subprocess
import sys
import time

import numpy as np

_REF_BUILD_DIR = '/tmp/hybridq_ref_core'


def _rand_unitary(k, rng):
    m = rng.standard_normal((2**k, 2**k)) + \
        1j * rng.standard_normal((2**k, 2**k))
    q, _ = np.linalg.qr(m)
    return q.astype('complex64')


def _workload(n, k, n_gates, rng, min_bit=0):
    """Random gate matrices + qubit positions (dense indices)."""
    gates = []
    for _ in range(n_gates):
        qs = tuple(int(x)
                   for x in rng.choice(n - min_bit, k, replace=False))
        gates.append((_rand_unitary(k, rng), qs))
    return gates


def bench_tpu_fused(n, k=4, n_gates=24, seed=0, reps=3,
                    parity_samples=16, precision='highest'):
    """Fused Pallas engine throughput + reference-parity samples.

    Returns ``(gates_per_s, compile_s, amps)`` where ``amps`` maps
    ``parity_samples`` random flat indices to the complex amplitude
    after ONE pass of the gate list from |0...0> (compared against the
    reference C++ core running the identical workload on the host).

    Gate positions avoid the reference's SIMD pack bits (min_bit=3,
    ``simulation.py:556-630``) so both sides share one workload.
    Amplitudes read back through the slot map (``ev.amplitude``), so
    no flush is needed — at 30q a flush's row gather would need 2x
    state memory."""
    from hybridq_tpu.simulation.fused_evolver import (FusedEvolver,
                                                      calibrate_fused,
                                                      pair_fused_gates)

    rng = np.random.default_rng(seed)
    gates = _workload(n, k, n_gates, rng, min_bit=3)
    ev = FusedEvolver(n, precision=precision)
    from hybridq_tpu.simulation.fused_evolver import MapSim
    blocks = pair_fused_gates(gates, n, MapSim.of(ev))
    sys.stderr.write(f"# fused-paired {n_gates} gates -> "
                     f"{len(blocks)} blocks "
                     f"(sizes {sorted(len(q) for _, q in blocks)})\n")

    t0 = time.perf_counter()
    ev.warm(verbose=True)
    compile_s = time.perf_counter() - t0

    def run_pass(state):
        for i, (U, qs) in enumerate(blocks):
            state = ev.apply_gate(state, np.asarray(U), tuple(qs),
                                  gate_key=i)
        return state

    # Parity pass: ONE application from |0>, sampled amplitudes.
    state = ev.prepare_state('0' * n)
    state = run_pass(state)
    idx = np.random.default_rng(seed + 1).choice(2**n, parity_samples,
                                                 replace=False)
    amps = {int(i): ev.amplitude(state, int(i)) for i in idx}

    # Throughput: warm passes until the slot-map orbit REPEATS a
    # pass-boundary state (victim policy is map-pure, so it must) —
    # from then on every (gate, map) prep is memoized on device and
    # the timed loop is pure chained dispatches (any host work between
    # dispatches stalls the async pipeline for ~0.3 s tunnel RTTs).
    seen = {tuple(ev.phys)}
    for _ in range(12):
        state = run_pass(state)
        key = tuple(ev.phys)
        if key in seen:
            break
        seen.add(key)
    _ = float(np.asarray(state[:1, :1])[0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        state = run_pass(state)
    _ = float(np.asarray(state[:1, :1])[0, 0])
    dt = (time.perf_counter() - t0) / reps

    del state    # free 4 GB before calibrate allocates its own state
    try:
        calibrate_fused(ev, verbose=True)
    except Exception as e:
        sys.stderr.write(f"# fused calibrate failed: "
                         f"{type(e).__name__}: {str(e)[:160]}\n")
    return n_gates / dt, compile_s, amps


def bench_tpu(n, k=4, n_gates=24, seed=0, reps=3, precision='highest'):
    """Indexed-engine throughput: returns (gates/s, compile_s).

    The engine's pairing scheduler fuses the random 4q gates into larger
    blocks when the fused kernel class is cheaper (the analog of the
    reference's ``compress`` pre-pass); throughput counts the *original*
    gates, as the reference's would.

    All kernel classes the schedule needs are AOT-compiled CONCURRENTLY
    before timing (``IndexedEvolver.warm``): the shared remote XLA
    compile service has minutes-level per-program queueing, and round 2
    timed out compiling ~6 classes serially at first use.

    ``precision='highest'`` (the engine default) runs true-f32 matmuls,
    matching the reference C++ core's float32 arithmetic; TPU matmuls
    otherwise round operands to bfloat16 (~1e-2 relative error)."""
    from hybridq_tpu.simulation.kernels import (IndexedEvolver,
                                                pair_matrix_gates)

    rng = np.random.default_rng(seed)
    gates = _workload(n, k, n_gates, rng)
    blocks = pair_matrix_gates(gates, n)
    blocks = [(np.ascontiguousarray(U, dtype='complex64'), qs)
              for U, qs in blocks]
    sys.stderr.write(f"# paired {n_gates} gates -> {len(blocks)} blocks "
                     f"(sizes {sorted(len(q) for _, q in blocks)})\n")
    ev = IndexedEvolver(n, precision=precision)
    # Matrices resident on device (one stacked upload — the reference's
    # matrices live in RAM next to its C++ core just the same).
    devs = ev.preload([U for U, _ in blocks])

    t0 = time.perf_counter()
    # Concurrent AOT compile of every (k_hi, k_lo[, rotate]) class the
    # 2 warm-up + `reps` timed passes will hit.
    ev.warm([qs for _, qs in blocks], passes=2 + reps, verbose=True)
    compile_s = time.perf_counter() - t0

    state = ev.prepare_state('0' * n)
    # Warm-up passes settle the column-layout state machine (the first
    # pass triggers hot-column rotations absent in steady state).
    for _ in range(2):
        for (U, qs), dev in zip(blocks, devs):
            state = ev.apply_gate(state, U, qs, U_dev=dev)
    _ = float(np.asarray(state[0][:1])[0])

    t0 = time.perf_counter()
    for _ in range(reps):
        for (U, qs), dev in zip(blocks, devs):
            state = ev.apply_gate(state, U, qs, U_dev=dev)
    _ = float(np.asarray(state[0][:1])[0])
    dt = (time.perf_counter() - t0) / reps

    # Refresh the pairing scheduler's measured cost model for this
    # device kind (consumed by ``_class_cost`` on the NEXT run; a stale
    # hardcoded table mis-steers the scheduler on other chips/n).
    try:
        ev.calibrate([qs for _, qs in blocks], verbose=True)
    except Exception as e:
        sys.stderr.write(f"# calibrate failed: {type(e).__name__}\n")
    return n_gates / dt, compile_s


def _build_reference_core():
    """Compile the reference C++/AVX core (once) and return the ctypes
    library, or None."""
    so = os.path.join(_REF_BUILD_DIR, 'hybridq.so')
    if not os.path.exists(so):
        try:
            os.makedirs(_REF_BUILD_DIR, exist_ok=True)
            inc = '/root/reference/include'
            if not os.path.isdir(inc):
                return None
            subprocess.run(
                ['g++', '-Ofast', '-ffast-math', '-march=native',
                 '-std=c++17', '-shared', '-fPIC', '-fopenmp',
                 '-DLOG2_PACK_SIZE=3', '-I', inc,
                 os.path.join(inc, 'python_U.cpp'), '-o', so],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        return ctypes.cdll.LoadLibrary(so)
    except OSError:
        return None


def bench_reference_cpp(n, k=4, n_gates=24, seed=0, reps=3,
                        parity_samples=16):
    """Reference HybridQ C++ core on this host's CPU (same workload as
    ``bench_tpu_fused``: identical gates on identical qubits); gate
    positions avoid the SIMD-packed bits as the reference requires
    (``simulation.py:556-630``).

    Returns ``(gates_per_s, amps)`` with ``amps`` the sampled
    amplitudes after ONE pass from |0...0> (the parity contract;
    convention determined empirically: ``pos`` are flat bit indices
    listed LSB-first w.r.t. the gate matrix)."""
    lib = _build_reference_core()
    if lib is None:
        return None
    pack = 3
    rng = np.random.default_rng(seed)
    gates = _workload(n, k, n_gates, rng, min_bit=pack)

    apply_U = lib.apply_U_float32
    fptr = ctypes.POINTER(ctypes.c_float)
    uptr = ctypes.POINTER(ctypes.c_uint32)
    apply_U.argtypes = [fptr, fptr, fptr, uptr, ctypes.c_uint32,
                        ctypes.c_uint32]

    def _aligned_zeros(count, align=128):
        # 128-byte alignment: the core upgrades to 32-float packs when
        # all gate positions allow it.
        buf = np.zeros(count * 4 + align, dtype=np.uint8)
        off = (-buf.ctypes.data) % align
        return buf[off:off + count * 4].view('float32')

    re = _aligned_zeros(2**n)
    im = _aligned_zeros(2**n)
    re[0] = 1

    def run_once():
        for U, qs in gates:
            Uc = np.ascontiguousarray(U, dtype='complex64')
            pos = np.asarray([n - 1 - q for q in reversed(qs)],
                             dtype='uint32')
            r = apply_U(re.ctypes.data_as(fptr), im.ctypes.data_as(fptr),
                        Uc.ctypes.data_as(fptr), pos.ctypes.data_as(uptr),
                        n, len(pos))
            if r != 0:
                raise RuntimeError('reference core error')

    run_once()  # warm-up = the parity pass
    idx = np.random.default_rng(seed + 1).choice(2**n, parity_samples,
                                                 replace=False)
    amps = {int(i): complex(float(re[i]), float(im[i])) for i in idx}
    t0 = time.perf_counter()
    for _ in range(reps):
        run_once()
    dt = (time.perf_counter() - t0) / reps
    return n_gates / dt, amps


def _max_qubits_single_chip(default_hbm_bytes=16 * 2**30,
                            bytes_per_amp=24):
    """Largest n whose split-f32 state plus working set fits in HBM
    (24 B/amp for the XLA gather engine's ~6 buffers; 16 B/amp for
    the in-place fused engine, whose only state-sized transients are
    the prepare/flush copies)."""
    import jax
    hbm = None
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            hbm = stats.get('bytes_limit')
    except Exception:
        pass
    hbm = hbm or default_hbm_bytes
    return int(np.floor(np.log2(0.9 * hbm / bytes_per_amp)))


def main():
    import threading

    # Persistent XLA compile cache: every kernel class is a one-time
    # compile per machine (the remote compile service queues for
    # minutes; reloading the serialized executable takes <1s).
    from hybridq_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    # Largest single-chip size (30q on a 16 GB part: the fused engine
    # keeps 8 B/amp resident, applies every kernel in place, and in
    # inplace mode even parks without a second state-sized buffer; the
    # only transient above the state is the device-side prepare's
    # ~0.5x row-slice update).
    n = min(30, _max_qubits_single_chip(bytes_per_amp=12))

    # The reference C++ baseline runs on the host CPU concurrently with
    # the TPU compile/measure (the host is idle while the remote compile
    # service queues) so it never delays the JSON line.
    ref_out = {}

    def _ref():
        try:
            # reps=2: at 30q one pass is ~4 min on this 2-core host;
            # the thread overlaps the TPU compile/measure.
            ref_out['v'] = bench_reference_cpp(n, reps=2)
        except Exception as e:
            sys.stderr.write(f"# baseline failed: {type(e).__name__}\n")

    ref_thread = threading.Thread(target=_ref, daemon=True)
    ref_thread.start()

    value = amps = None
    try:
        value, compile_s, amps = bench_tpu_fused(n)
        sys.stderr.write(f"# {n}q TPU fused engine (true f32): "
                         f"{value:.2f} gates/s (compile {compile_s:.0f}s)"
                         "\n")
    except Exception as e:
        sys.stderr.write(f"# {n}q fused failed: {type(e).__name__}: "
                         f"{str(e)[:200]}\n")
    if value is None:
        print(json.dumps({"metric": "gate_applications_per_s_per_chip",
                          "value": 0.0, "unit": "fused-4q-gates/s",
                          "vs_baseline": None}), flush=True)
        return

    # Reference C++ baseline + the 1e-6-grade parity check the round-3
    # review called for (both engines ran the identical workload).
    vs = None
    ref_thread.join(timeout=1800)
    ref = ref_out.get('v')
    if ref:
        ref_rate, ref_amps = ref
        vs = value / ref_rate
        sys.stderr.write(
            f"# {n}q reference C++ on host CPU: {ref_rate:.2f} gates/s "
            f"({os.cpu_count()} cores) -> {vs:.1f}x\n")
        rms = 2.0 ** (-n / 2)     # amplitude scale of an RQC state
        max_err = max(abs(amps[i] - ref_amps[i]) for i in amps) / rms
        parity_ok = bool(max_err < 5e-3)
        sys.stderr.write(
            f"# parity vs reference core: {len(amps)} sampled "
            f"amplitudes, max |d|/rms = {max_err:.2e} -> "
            f"{'OK' if parity_ok else 'MISMATCH'}\n")
    else:
        parity_ok = None

    # THE one JSON line the driver records — printed before any
    # optional extras below.
    print(json.dumps({
        "metric": f"gate_applications_per_s_per_chip_{n}q",
        "value": round(value, 2),
        "unit": "fused-4q-gates/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }), flush=True)

    # Echo the recorded TN north-star artifact (written by
    # scripts/bench_tn.py) so it lands in the BENCH tail.
    tn_art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'BENCH_TN.json')
    try:
        with open(tn_art) as f:
            for line in f:
                sys.stderr.write(f"# TN: {line.strip()}\n")
    except OSError:
        pass

    # Optional secondary (stderr only, off by default — it doubles TPU
    # time): the round-3 XLA indexed engine for comparison.
    if os.environ.get('HYBRIDQ_TPU_BENCH_XLA'):
        try:
            xla, _ = bench_tpu(min(n, 28))
            sys.stderr.write(f"# {min(n, 28)}q XLA indexed engine: "
                             f"{xla:.2f} gates/s\n")
        except Exception as e:
            sys.stderr.write(f"# XLA variant failed: "
                             f"{type(e).__name__}\n")


if __name__ == '__main__':
    main()
