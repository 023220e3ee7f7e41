"""Pallas gathered-run DMA probe (round 4, step A).

The fused one-pass gate kernel gathers runs of state rows whose
addresses depend on runtime gate positions.  This probe measures
in-place double-buffered gather->scale->scatter bandwidth vs run size
(the gate's lowest row bit sets the run length), plus:

  * the same loop with a per-block MXU matmul (does compute overlap?)
  * exactness of the 3-term bf16 split (x = x0+x1+x2 with 0/1 operand)
  * precision=HIGHEST inside a pallas dot (supported? accurate?)
"""
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

SUB, LANE = 2**22, 128      # 2 GB f32 as [sublanes, 128]
NBYTES = SUB * LANE * 4


def mk_gather(run_sub, blk_sub, matmul=False, nbuf=2):
    """In-place gathered copy: each step processes ``blk_sub`` sublanes
    made of runs of ``run_sub`` sublanes taken with a bit-reversed-ish
    scramble of the run index (worst-case locality, like a gate whose
    row bits are high)."""
    n_runs_total = SUB // run_sub
    runs_per_blk = blk_sub // run_sub
    n_steps = SUB // blk_sub

    def kernel(x_hbm, o_hbm, s, so, isem, osem):
        nrt = n_runs_total

        def src_of(step, j):
            r = step * runs_per_blk + j
            # scramble: swap low/high halves of the run index
            half = nrt.bit_length() // 2
            lo = jax.lax.rem(r, 2**half)
            hi = r // (2**half)
            return (lo * (nrt // 2**half) + hi) * run_sub

        def get_in(slot, step):
            def go(j, _):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(src_of(step, j), run_sub), :],
                    s.at[slot, pl.ds(j * run_sub, run_sub), :],
                    isem.at[slot]).start()
                return 0
            jax.lax.fori_loop(0, runs_per_blk, go, 0)

        def wait_in(slot):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, run_sub), :],
                s.at[slot, pl.ds(0, run_sub), :],
                isem.at[slot]).wait()

        def put_out(slot, step):
            def go(j, _):
                pltpu.make_async_copy(
                    so.at[slot, pl.ds(j * run_sub, run_sub), :],
                    o_hbm.at[pl.ds(src_of(step, j), run_sub), :],
                    osem.at[slot]).start()
                return 0
            jax.lax.fori_loop(0, runs_per_blk, go, 0)

        def wait_out(slot):
            pltpu.make_async_copy(
                so.at[slot, pl.ds(0, run_sub), :],
                o_hbm.at[pl.ds(0, run_sub), :],
                osem.at[slot]).wait()

        # NOTE: wait_in/wait_out wait on the semaphore for ALL copies of
        # the slot: each async_copy waits for `bytes of that copy`; with
        # runs_per_blk copies signaling one semaphore we must wait
        # runs_per_blk times.
        def wait_in_all(slot):
            def go(j, _):
                wait_in(slot)
                return 0
            jax.lax.fori_loop(0, runs_per_blk, go, 0)

        def wait_out_all(slot):
            def go(j, _):
                wait_out(slot)
                return 0
            jax.lax.fori_loop(0, runs_per_blk, go, 0)

        get_in(0, 0)

        def body(i, _):
            slot = jax.lax.rem(i, nbuf)
            nslot = jax.lax.rem(i + 1, nbuf)

            @pl.when(i + 1 < n_steps)
            def _():
                get_in(nslot, i + 1)

            wait_in_all(slot)

            @pl.when(i >= nbuf)
            def _():
                wait_out_all(slot)

            if matmul:
                # per 128-sublane chunk: W @ X (bf16 single-pass, just
                # to load the MXU; correctness not probed here)
                x = s[slot]
                acc = jnp.zeros_like(x)
                for c in range(blk_sub // 128):
                    xa = x[c * 128:(c + 1) * 128, :]
                    acc = jax.lax.dynamic_update_slice(
                        acc,
                        jnp.dot(jnp.eye(128, dtype=jnp.bfloat16),
                                xa.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32),
                        (c * 128, 0))
                so[slot] = acc
            else:
                so[slot] = s[slot] * 2.0
            put_out(slot, i)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        for k in range(nbuf):
            last = n_steps - nbuf + k

            @pl.when(last >= 0)
            def _():
                wait_out_all(jax.lax.rem(last, nbuf))

    def f(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nbuf, blk_sub, LANE), jnp.float32),
                pltpu.VMEM((nbuf, blk_sub, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True),
        )(x)

    return jax.jit(f, donate_argnums=(0,))


VARIANTS = [
    ('run 512B  (1 sub)  blk 1024', mk_gather(1, 1024)),
    ('run 2KB   (4 sub)  blk 1024', mk_gather(4, 1024)),
    ('run 4KB   (8 sub)  blk 1024', mk_gather(8, 1024)),
    ('run 16KB  (32 sub) blk 1024', mk_gather(32, 1024)),
    ('run 64KB  (128sub) blk 1024', mk_gather(128, 1024)),
    ('run 512KB (1024)   blk 1024', mk_gather(1024, 1024)),
    ('run 16KB  blk 2048', mk_gather(32, 2048)),
    ('run 16KB  blk 1024 + matmul', mk_gather(32, 1024, matmul=True)),
    ('run 4KB   blk 1024 x4buf', mk_gather(8, 1024, nbuf=4)),
]


def main():
    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    t0 = time.time()
    shapes = (jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),)

    def compile_one(item):
        name, fn = item
        try:
            return name, fn.lower(*shapes).compile()
        except Exception as e:
            return name, f"FAIL {type(e).__name__}: {str(e)[:160]}"

    with ThreadPoolExecutor(max_workers=8) as pool:
        compiled = dict(pool.map(compile_one, VARIANTS))
    print(f"# compiled {len(VARIANTS)} in {time.time()-t0:.0f}s",
          flush=True)

    def sync(x):
        return float(np.asarray(x[:1, :1])[0, 0])

    st = jnp.zeros((SUB, LANE), jnp.float32)
    sync(st)
    t0 = time.perf_counter()
    sync(st)
    sync(st)
    t_sync = (time.perf_counter() - t0) / 2

    reps = 4
    for name, _ in VARIANTS:
        exe = compiled[name]
        if isinstance(exe, str):
            print(f"{name:30s}: {exe}", flush=True)
            continue
        st = exe(st)
        sync(st)
        t0 = time.perf_counter()
        for _ in range(reps):
            st = exe(st)
        sync(st)
        st = st * 0
        ms = max((time.perf_counter() - t0 - t_sync) / reps, 1e-4) * 1e3
        gbs = 2 * NBYTES / (ms * 1e-3) / 1e9
        print(f"{name:30s}: {ms:7.1f} ms  {gbs:6.0f} GB/s(rw)",
              flush=True)

    # bf16x3 exact-split sanity (host-level math, no kernel needed)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype('float32')
    x0 = x.astype('bfloat16' if hasattr(np, 'bfloat16') else 'float32')
    xj = jnp.asarray(x)
    a0 = xj.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = xj - a0
    a1 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    r2 = r1 - a1
    a2 = r2.astype(jnp.bfloat16).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(a0 + a1 + a2 - xj)))
    print(f"bf16x3 split residual: {err:.2e}", flush=True)

    # HIGHEST precision inside pallas dot?
    def dk(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    a = np.random.default_rng(0).standard_normal((128, 128)).astype(
        'float32')
    b = np.random.default_rng(1).standard_normal((128, 128)).astype(
        'float32')
    try:
        out = pl.pallas_call(
            dk,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a), jnp.asarray(b))
        want = a.astype('float64') @ b.astype('float64')
        err = float(np.max(np.abs(np.asarray(out) - want)) /
                    np.max(np.abs(want)))
        print(f"pallas dot precision=HIGHEST rel-err: {err:.2e}",
              flush=True)
    except Exception as e:
        print(f"pallas dot HIGHEST FAILED: {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)


if __name__ == '__main__':
    main()
