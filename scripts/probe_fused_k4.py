"""Why does the (n=28, k_hi=4) fused class fail to compile?
Try: smaller blocks, split dot, fewer buffers."""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, '/root/repo')
from hybridq_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

n = 28
R = 32
HI = jax.lax.Precision.HIGHEST


def mk(k_hi, r_blk, split=1, nbuf=2):
    H2 = 2 ** (k_hi + 1)
    K2 = H2 * R
    n_run_bits = n + 1 - 12
    n_rest = 2 ** (n_run_bits - (k_hi + 1))
    R_blk = min(r_blk, n_rest)
    n_blocks = n_rest // R_blk
    S_blk = R_blk * K2
    runs_per_blk = R_blk * H2

    def kernel(x_hbm, w_ref, h_offs, info, o_hbm, sin, sout, addr,
               isem, osem):
        mask = info[0]

        def start_gather(slot, rest0):
            r = rest0
            for i in range(R_blk):
                addr[slot, i] = r
                for h in range(H2):
                    row = (r | h_offs[h]) * R
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(row, R), :],
                        sin.at[slot, pl.ds((i * H2 + h) * R, R), :],
                        isem.at[slot]).start()
                r = ((r | ~mask) + 1) & mask
            return r

        def start_scatter(slot):
            for i in range(R_blk):
                r = addr[slot, i]
                for h in range(H2):
                    row = (r | h_offs[h]) * R
                    pltpu.make_async_copy(
                        sout.at[slot, pl.ds((i * H2 + h) * R, R), :],
                        o_hbm.at[pl.ds(row, R), :],
                        osem.at[slot]).start()

        def wait_all(sem, slot, buf):
            def go(j, _):
                pltpu.make_async_copy(
                    buf.at[slot, pl.ds(0, R), :],
                    buf.at[slot, pl.ds(0, R), :],
                    sem.at[slot]).wait()
                return 0
            jax.lax.fori_loop(0, runs_per_blk, go, 0)

        rest = start_gather(0, 0)

        def body(b, rest):
            slot = jax.lax.rem(b, nbuf)
            nslot = jax.lax.rem(b + 1, nbuf)
            rest = jax.lax.cond(b + 1 < n_blocks,
                                lambda r: start_gather(nslot, r),
                                lambda r: r, rest)
            wait_all(isem, slot, sin)

            @pl.when(b >= nbuf)
            def _():
                wait_all(osem, slot, sout)

            for i in range(R_blk):
                base = i * K2
                if split == 1:
                    ys = sin[slot, pl.ds(base, K2), :]
                    out = jax.lax.dot_general(
                        w_ref[...], ys, (((1,), (0,)), ((), ())),
                        precision=HI,
                        preferred_element_type=jnp.float32)
                else:
                    S = K2 // split
                    out = None
                    for s2 in range(split):
                        ys = sin[slot, pl.ds(base + s2 * S, S), :]
                        d = jax.lax.dot_general(
                            w_ref[:, s2 * S:(s2 + 1) * S], ys,
                            (((1,), (0,)), ((), ())),
                            precision=HI,
                            preferred_element_type=jnp.float32)
                        out = d if out is None else out + d
                sout[slot, pl.ds(base, K2), :] = out
            start_scatter(slot)
            return rest

        jax.lax.fori_loop(0, n_blocks, body, rest)
        for s in range(nbuf):
            last = n_blocks - nbuf + s

            @pl.when(last >= 0)
            def _():
                wait_all(osem, jax.lax.rem(last, nbuf), sout)

    n_rows = 2 ** (n + 1 - 7)

    def apply(state, W, h_offs, info):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nbuf, S_blk, 128), jnp.float32),
                pltpu.VMEM((nbuf, S_blk, 128), jnp.float32),
                pltpu.SMEM((nbuf, R_blk), jnp.int32),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(state, W, h_offs, info)

    return jax.jit(apply, donate_argnums=(0,)), K2


VARIANTS = [
    ('k4 R_blk=2 (prod)', 4, 2, 1),
    ('k4 R_blk=1', 4, 1, 1),
    ('k4 R_blk=1 split2', 4, 1, 2),
    ('k4 R_blk=1 split4', 4, 1, 4),
    ('k3 R_blk=4 (ctrl)', 3, 4, 1),
]


def main():
    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    t0 = time.time()

    def compile_one(item):
        name, k_hi, r_blk, split = item
        fn, K2 = mk(k_hi, r_blk, split)
        st = jax.ShapeDtypeStruct((2**(n - 6), 128), jnp.float32)
        args = (st, jax.ShapeDtypeStruct((K2, K2), jnp.float32),
                jax.ShapeDtypeStruct((2**(k_hi + 1),), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32))
        try:
            return name, (fn.lower(*args).compile(), k_hi, K2)
        except Exception as e:
            return name, f"FAIL {type(e).__name__}: {str(e)[:400]}"

    with ThreadPoolExecutor(max_workers=8) as pool:
        compiled = dict(pool.map(compile_one, VARIANTS))
    print(f"# compiled in {time.time()-t0:.0f}s", flush=True)

    def sync(x):
        return float(np.asarray(x[:1, :1])[0, 0])

    st = jnp.zeros((2**(n - 6), 128), jnp.float32)
    sync(st)
    t0 = time.perf_counter()
    sync(st)
    sync(st)
    t_sync = (time.perf_counter() - t0) / 2

    for name, _, _, _ in VARIANTS:
        got = compiled[name]
        if isinstance(got, str):
            print(f"{name:20s}: {got}", flush=True)
            continue
        exe, k_hi, K2 = got
        W = jnp.eye(K2, dtype=jnp.float32)
        ho = jnp.zeros(2**(k_hi + 1), dtype=jnp.int32)
        info = jnp.asarray([0], dtype=jnp.int32)
        # h_offs must be real: recompute
        import numpy as _np
        from hybridq_tpu.simulation.pallas_fused import fused_meta
        bits = {4: (27, 20, 14, 12), 3: (27, 20, 14, 8)}[k_hi]
        _, h_offs, rest_mask, _, _ = fused_meta(n, bits)
        ho = jnp.asarray(h_offs, jnp.int32)
        info = jnp.asarray([rest_mask], jnp.int32)
        st = exe(st, W, ho, info)
        sync(st)
        t0 = time.perf_counter()
        for _ in range(4):
            st = exe(st, W, ho, info)
        sync(st)
        ms = max((time.perf_counter() - t0 - t_sync) / 4, 1e-4) * 1e3
        print(f"{name:20s}: {ms:7.1f} ms", flush=True)


if __name__ == '__main__':
    main()
