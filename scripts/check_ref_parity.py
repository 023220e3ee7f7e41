"""Numeric parity: our IndexedEvolver vs the reference C++/AVX core.

Establishes (and asserts) the position/order convention mapping between
the reference core's ``apply_U`` (``include/python_U.cpp:35-61``:
positions are state-index bit positions, pack-size template dispatch on
the minimum position) and our dense-qubit engine, then cross-checks a
random-circuit evolution.  Runs on CPU (forced) at small n so it can be
validated without the chip; ``bench.py`` reuses ``run_parity`` at the
full benchmark size on the TPU.

Usage: python scripts/check_ref_parity.py [n]
"""
import sys

import numpy as np


def ref_core():
    sys.path.insert(0, '/root/repo')
    import bench

    return bench._build_reference_core()


def ref_apply(lib, re, im, U, pos, n):
    import ctypes

    fptr = ctypes.POINTER(ctypes.c_float)
    uptr = ctypes.POINTER(ctypes.c_uint32)
    f = lib.apply_U_float32
    f.argtypes = [fptr, fptr, fptr, uptr, ctypes.c_uint32,
                  ctypes.c_uint32]
    Uc = np.ascontiguousarray(U, dtype='complex64')
    p = np.asarray(pos, dtype='uint32')
    r = f(re.ctypes.data_as(fptr), im.ctypes.data_as(fptr),
          Uc.ctypes.data_as(fptr), p.ctypes.data_as(uptr), n, len(p))
    if r != 0:
        raise RuntimeError(f'reference core error {r}')


def run_parity(ev, state, lib, gates, n, passes=1, n_sample=16,
               seed=123):
    """Evolve ``gates`` = [(U, ref_positions)] on both engines
    (``passes`` repetitions of the sequence), compare ``n_sample``
    amplitudes.  Returns (max_abs_diff, max_abs_amp).

    Convention (asserted by this script's __main__ at n=10):
    reference position p = state-index bit p  <=>  our dense qubit
    q = n - 1 - p, with the gate's position list carried over in the
    SAME order (reference ``pos[0]`` is the gate's most-significant
    index bit, matching our ``qubits[0]``).
    """
    import bench

    def _aligned_zeros(count, align=128):
        buf = np.zeros(count * 4 + align, dtype=np.uint8)
        off = (-buf.ctypes.data) % align
        return buf[off:off + count * 4].view('float32')

    re = _aligned_zeros(2**n)
    im = _aligned_zeros(2**n)
    re[0] = 1.0

    devs = ev.preload([U for U, _ in gates])
    for _ in range(passes):
        for (U, pos), dev in zip(gates, devs):
            qs = tuple(n - 1 - int(p) for p in pos)
            state = ev.apply_gate(state, U, qs, U_dev=dev)
            ref_apply(lib, re, im, U, pos, n)

    state = ev.flush(state)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 2**n, size=n_sample)
    idx[0] = 0
    # Engine container: [2R, C] rows; flattening gives the re plane then
    # the im plane contiguously (kernels.py "Container contract").
    flat = np.asarray(state).reshape(2, -1)
    got = flat[0][idx] + 1j * flat[1][idx]
    want = re[idx] + 1j * im[idx]
    return (float(np.abs(got - want).max()),
            float(np.abs(want).max()), state)


def main():
    import jax

    jax.config.update('jax_platforms', 'cpu')

    from hybridq_tpu.simulation.kernels import IndexedEvolver

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    lib = ref_core()
    if lib is None:
        print('reference core unavailable', file=sys.stderr)
        return 1

    rng = np.random.default_rng(0)
    import bench

    # Positions >= 3 (the reference's SIMD pack needs min position >=
    # LOG2_PACK_SIZE for full speed; correctness holds anyway, but the
    # bench workload uses >= 3 so validate exactly that).
    gates = []
    for _ in range(12):
        k = int(rng.integers(1, 5))
        pos = rng.choice(np.arange(3, n), size=k, replace=False)
        gates.append((bench._rand_unitary(k, rng),
                      tuple(int(p) for p in pos)))

    ev = IndexedEvolver(n)
    state = ev.prepare_state('0' * n)
    diff, amp, _ = run_parity(ev, state, lib, gates, n, passes=2)
    rel = diff / amp
    print(f'n={n}: max|diff|={diff:.3e} max|amp|={amp:.3e} '
          f'rel={rel:.3e}')
    assert rel < 5e-5, rel
    print('PARITY OK')
    return 0


if __name__ == '__main__':
    sys.exit(main())
