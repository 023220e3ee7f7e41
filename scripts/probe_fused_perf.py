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

n = 28
CASES = [
    ('k_hi=0 (4q sub)', (11, 10, 9, 8)),
    ('k_hi=1 (4q)', (27, 10, 9, 8)),
    ('k_hi=2 (4q)', (27, 20, 9, 8)),
    ('k_hi=3 (4q)', (27, 20, 14, 8)),
    ('k_hi=4 (4q hi)', (27, 20, 14, 12)),
    ('k_hi=2 (6q fused)', (27, 20, 11, 10, 9, 8)),
    ('k_hi=3 (6q fused)', (27, 20, 14, 11, 9, 8)),
]


def main():
    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)

    prepared = []
    for name, bits in CASES:
        k = len(bits)
        m = rng.standard_normal((2**k, 2**k)) + \
            1j * rng.standard_normal((2**k, 2**k))
        U, _ = np.linalg.qr(m)
        k_hi, _, _, _, _ = fused_meta(n, bits)
        W, h_offs, rest_mask = build_w(n, U, bits)
        prepared.append((name, k_hi, jnp.asarray(W),
                         jnp.asarray(h_offs, dtype=jnp.int32),
                         jnp.asarray([rest_mask], dtype=jnp.int32)))

    t0 = time.time()
    classes = sorted({k_hi for _, k_hi, *_ in prepared})

    def compile_one(k_hi):
        fn = fused_kernel(n, k_hi)
        W = jax.ShapeDtypeStruct((2**(k_hi + 1) * 32,) * 2, jnp.float32)
        st = jax.ShapeDtypeStruct((2**(n - 6), 128), jnp.float32)
        ho = jax.ShapeDtypeStruct((2**(k_hi + 1),), jnp.int32)
        info = jax.ShapeDtypeStruct((1,), jnp.int32)
        try:
            return k_hi, fn.lower(st, W, ho, info).compile()
        except Exception as e:
            return k_hi, f"FAIL {type(e).__name__}: {str(e)[:300]}"

    with ThreadPoolExecutor(max_workers=8) as pool:
        compiled = dict(pool.map(compile_one, classes))
    print(f"# compiled {len(classes)} classes in {time.time()-t0:.0f}s",
          flush=True)
    for k_hi, exe in compiled.items():
        if isinstance(exe, str):
            print(f"k_hi={k_hi}: {exe}", flush=True)

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
    for name, k_hi, W, h_offs, info in prepared:
        exe = compiled[k_hi]
        if isinstance(exe, str):
            continue
        st = exe(st, W, h_offs, info)
        sync(st)
        t0 = time.perf_counter()
        for _ in range(reps):
            st = exe(st, W, h_offs, info)
        sync(st)
        ms = max((time.perf_counter() - t0 - t_sync) / reps, 1e-4) * 1e3
        print(f"{name:22s}: {ms:7.1f} ms", flush=True)

    # quick numeric sanity on-chip: norm preserved by a unitary
    nrm = float(jnp.sum(st.astype(jnp.float64)**2)) if False else None
    s = jnp.sum(st * st)
    print(f"# norm^2 after runs: {float(s):.6f} (state was zeros; "
          "expect 0)", flush=True)


if __name__ == '__main__':
    main()
