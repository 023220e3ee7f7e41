"""Fused Pallas kernel: compiled perf probe at 28q on the chip.

Times each (k_hi) class against the XLA kernels' measured costs
(row 21.5 / gext 34.5 / rotate 74 ms) and the 6.2 ms one-pass floor.
Run ALONE on the chip."""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, '/root/repo')
from hybridq_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hybridq_tpu.simulation.pallas_fused import (  # noqa: E402
    build_w, fused_kernel, fused_meta)

n = 29
CASES = [
    ('k_hi=0 (4q sub)', (11, 10, 9, 8)),
    ('k_hi=1 (4q)', (27, 10, 9, 8)),
    ('k_hi=2 (4q)', (27, 20, 9, 8)),
    ('k_hi=3 (4q)', (27, 20, 14, 8)),
    ('k_hi=4 (4q hi)', (27, 20, 14, 12)),
    ('k_hi=2 (6q fused)', (27, 20, 11, 10, 9, 8)),
    ('k_hi=3 (6q fused)', (27, 20, 14, 11, 9, 8)),
]
# swap-path cases: (bits incl. lane bits, victims)
SWAP_CASES = [
    ('swap kl=1 ke=1 (4q)', (6, 10, 9, 8), (27,)),
    ('swap kl=1 ke=2 (4q)', (20, 6, 9, 8), (27,)),
    ('swap kl=1 ke=3 (4q)', (20, 14, 6, 8), (27,)),
    ('swap kl=2 ke=2 (4q)', (6, 5, 9, 8), (27, 20)),
    ('swap kl=2 ke=3 (4q)', (20, 6, 5, 8), (27, 26)),
]
FACT_CASES = [
    ('fact k_hi=0 (lane only)', (), (6, 5, 4, 3)),
    ('fact k_hi=1 (2+2)', (27, 9), (6, 5)),
    ('fact k_hi=2 (2+2)', (27, 20), (6, 5)),
]


def main():
    from hybridq_tpu.simulation.pallas_fused import (build_w_factored,
                                                     build_w_swap,
                                                     factored_kernel,
                                                     swap_kernel,
                                                     swap_meta)

    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)

    def rand_u(k):
        m = rng.standard_normal((2**k, 2**k)) + \
            1j * rng.standard_normal((2**k, 2**k))
        return np.linalg.qr(m)[0]

    i32 = jnp.int32
    prepared = []
    for name, bits in CASES:
        U = rand_u(len(bits))
        k_hi, _, _, _, _ = fused_meta(n, bits)
        W, h_offs, rest_mask = build_w(n, U, bits)
        prepared.append((name, ('fused', k_hi),
                         (jnp.asarray(W), jnp.asarray(h_offs, i32),
                          jnp.asarray([rest_mask], i32))))
    for name, bits, victims in SWAP_CASES:
        U = rand_u(len(bits))
        k_hi, k_l, h_offs, rest_mask, Ms = swap_meta(n, bits, victims)
        W = build_w_swap(n, U, bits, victims)
        prepared.append((name, ('swap', k_hi + k_l, k_l),
                         (jnp.asarray(W), jnp.asarray(Ms),
                          jnp.asarray(h_offs, i32),
                          jnp.asarray([rest_mask], i32))))
    for name, row_bits, lane_bits in FACT_CASES:
        Ur = rand_u(len(row_bits)) if row_bits else \
            np.ones((1, 1), complex)
        Ul = rand_u(len(lane_bits))
        k_hi = fused_meta(n, row_bits)[0] if row_bits else 0
        W, Br, Bi, h_offs, rest_mask = build_w_factored(
            n, Ur, row_bits, Ul, lane_bits)
        prepared.append((name, ('fact', k_hi),
                         (jnp.asarray(W), jnp.asarray(Br),
                          jnp.asarray(Bi), jnp.asarray(h_offs, i32),
                          jnp.asarray([rest_mask], i32))))

    t0 = time.time()
    classes = sorted({cls for _, cls, _ in prepared})

    def compile_one(cls):
        st = jax.ShapeDtypeStruct((2**(n - 6), 128), jnp.float32)
        info = jax.ShapeDtypeStruct((1,), jnp.int32)

        def sd(shape, dt=jnp.float32):
            return jax.ShapeDtypeStruct(shape, dt)

        try:
            if cls[0] == 'fused':
                k_hi = cls[1]
                fn = fused_kernel(n, k_hi)
                args = (st, sd((2**(k_hi + 1) * 32,) * 2),
                        sd((2**(k_hi + 1),), i32), info)
            elif cls[0] == 'swap':
                _, ke, k_l = cls
                fn = swap_kernel(n, ke, k_l)
                T = 2**k_l
                args = (st, sd((2**(ke + 1) * 32,) * 2),
                        sd((T, T, 128, 128)),
                        sd((2**(ke + 1),), i32), info)
            else:
                k_hi = cls[1]
                fn = factored_kernel(n, k_hi)
                args = (st, sd((2**(k_hi + 1) * 32,) * 2),
                        sd((128, 128)), sd((128, 128)),
                        sd((2**(k_hi + 1),), i32), info)
            return cls, fn.lower(*args).compile()
        except Exception as e:
            return cls, f"FAIL {type(e).__name__}: {str(e)[:300]}"

    with ThreadPoolExecutor(max_workers=8) as pool:
        compiled = dict(pool.map(compile_one, classes))
    print(f"# compiled {len(classes)} classes in {time.time()-t0:.0f}s",
          flush=True)
    for cls, exe in compiled.items():
        if isinstance(exe, str):
            print(f"{cls}: {exe}", flush=True)

    def sync(x):
        return float(np.asarray(x[:1, :1])[0, 0])

    st = jnp.zeros((2**(n - 6), 128), jnp.float32)
    sync(st)
    t0 = time.perf_counter()
    sync(st)
    sync(st)
    t_sync = (time.perf_counter() - t0) / 2
    print(f"# sync overhead {t_sync*1e3:.1f} ms", flush=True)

    reps = 6
    for name, cls, args in prepared:
        exe = compiled[cls]
        if isinstance(exe, str):
            continue
        st = exe(st, *args)
        sync(st)
        t0 = time.perf_counter()
        for _ in range(reps):
            st = exe(st, *args)
        sync(st)
        ms = max((time.perf_counter() - t0 - t_sync) / reps, 1e-4) * 1e3
        print(f"{name:24s}: {ms:7.1f} ms", flush=True)

    # quick numeric sanity on-chip: norm preserved by a unitary
    nrm = float(jnp.sum(st.astype(jnp.float64)**2)) if False else None
    s = jnp.sum(st * st)
    print(f"# norm^2 after runs: {float(s):.6f} (state was zeros; "
          "expect 0)", flush=True)


if __name__ == '__main__':
    main()
