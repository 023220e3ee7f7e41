"""Pallas streaming-bandwidth probe (round 4).

The round-1 fused gate kernel measured ~174 GB/s and was shelved — but
it start/waits ALL its DMAs inside each grid step with no cross-step
overlap.  This probe measures what double-buffered streaming actually
reaches on this part:

  A  XLA copy baseline (x*2)                        — the ~710 GB/s bar
  B  pallas auto-pipelined grid copy, block sweep   — Mosaic's own
     double buffering
  C  manual double-buffered DMA streaming (HBM scratch -> VMEM -> HBM)
  D  pallas f32 dot accuracy check vs numpy (does Mosaic's f32 matmul
     match HIGHEST-style multi-pass accuracy?)
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

R, C = 2**19, 1024          # 2 GB f32
NBYTES = R * C * 4


def mk_xla_copy():
    def f(x):
        return x * jnp.float32(2.0)

    return jax.jit(f, donate_argnums=(0,))


def mk_auto(S):
    def kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:] * 2.0

    def f(x):
        return pl.pallas_call(
            kernel,
            grid=(R // S,),
            in_specs=[pl.BlockSpec((S, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((S, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        )(x)

    return jax.jit(f, donate_argnums=(0,))


def mk_auto_aliased(S):
    def kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:] * 2.0

    def f(x):
        return pl.pallas_call(
            kernel,
            grid=(R // S,),
            in_specs=[pl.BlockSpec((S, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((S, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
            input_output_aliases={0: 0},
        )(x)

    return jax.jit(f, donate_argnums=(0,))


def mk_manual(S, nbuf=2):
    """Manual double-buffered streaming: read chunk, scale, write."""
    n_chunks = R // S

    def kernel(x_hbm, o_hbm, sin, sout, isem, osem):
        def get_in(slot, i):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * S, S), :], sin.at[slot], isem.at[slot])

        def put_out(slot, i):
            return pltpu.make_async_copy(
                sout.at[slot], o_hbm.at[pl.ds(i * S, S), :],
                osem.at[slot])

        get_in(0, 0).start()

        def body(i, _):
            slot = jax.lax.rem(i, nbuf)
            nslot = jax.lax.rem(i + 1, nbuf)

            @pl.when(i + 1 < n_chunks)
            def _():
                get_in(nslot, i + 1).start()

            get_in(slot, i).wait()

            # Re-use of an out slot requires its previous write done.
            @pl.when(i >= nbuf)
            def _():
                put_out(slot, i - nbuf).wait()

            sout[slot] = sin[slot] * 2.0
            put_out(slot, i).start()
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        for s in range(nbuf):
            last = n_chunks - nbuf + s

            @pl.when(last >= 0)
            def _():
                put_out(jax.lax.rem(last, nbuf), last).wait()

    def f(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nbuf, S, C), jnp.float32),
                pltpu.VMEM((nbuf, S, C), jnp.float32),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True),
        )(x)

    return jax.jit(f, donate_argnums=(0,))


VARIANTS = [
    ('A  XLA copy', mk_xla_copy()),
    ('B  auto S=256 (1MB)', mk_auto(256)),
    ('B  auto S=512 (2MB)', mk_auto(512)),
    ('B  auto S=1024 (4MB)', mk_auto(1024)),
    ('B2 auto aliased S=512', mk_auto_aliased(512)),
    ('C  manual S=256 x2buf', mk_manual(256)),
    ('C  manual S=512 x2buf', mk_manual(512)),
    ('C  manual S=1024 x2buf', mk_manual(1024)),
    ('C  manual S=256 x4buf', mk_manual(256, nbuf=4)),
]


def main():
    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    t0 = time.time()
    shapes = (jax.ShapeDtypeStruct((R, C), jnp.float32),)

    def compile_one(item):
        name, fn = item
        try:
            return name, fn.lower(*shapes).compile()
        except Exception as e:
            return name, f"FAIL {type(e).__name__}: {str(e)[:200]}"

    with ThreadPoolExecutor(max_workers=8) as pool:
        compiled = dict(pool.map(compile_one, VARIANTS))
    print(f"# compiled {len(VARIANTS)} in {time.time()-t0:.0f}s",
          flush=True)

    def sync(x):
        return float(np.asarray(x[:1, :1])[0, 0])

    st = jnp.zeros((R, C), jnp.float32)
    sync(st)
    t0 = time.perf_counter()
    sync(st)
    sync(st)
    t_sync = (time.perf_counter() - t0) / 2

    reps = 6
    for name, _ in VARIANTS:
        exe = compiled[name]
        if isinstance(exe, str):
            print(f"{name:26s}: {exe}", flush=True)
            continue
        st = exe(st)
        st = st * 0  # keep values finite across *2 runs
        st = exe(st)
        sync(st)
        t0 = time.perf_counter()
        for _ in range(reps):
            st = exe(st)
        sync(st)
        st = st * 0
        ms = max((time.perf_counter() - t0 - t_sync) / reps, 1e-4) * 1e3
        gbs = 2 * NBYTES / (ms * 1e-3) / 1e9
        print(f"{name:26s}: {ms:7.1f} ms  {gbs:6.0f} GB/s(rw)",
              flush=True)

    # D: pallas f32 dot accuracy
    def dk(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)

    a = np.random.default_rng(0).standard_normal((128, 128)).astype(
        'float32')
    b = np.random.default_rng(1).standard_normal((128, 128)).astype(
        'float32')
    out = pl.pallas_call(
        dk,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(a), jnp.asarray(b))
    want = a.astype('float64') @ b.astype('float64')
    err = float(np.max(np.abs(np.asarray(out) - want)) /
                np.max(np.abs(want)))
    xla_hi = jnp.einsum('ij,jk->ik', jnp.asarray(a), jnp.asarray(b),
                        precision=jax.lax.Precision.HIGHEST)
    err_hi = float(np.max(np.abs(np.asarray(xla_hi) - want)) /
                   np.max(np.abs(want)))
    print(f"D  pallas f32 dot rel-err: {err:.2e} (XLA HIGHEST: "
          f"{err_hi:.2e})", flush=True)


if __name__ == '__main__':
    main()
