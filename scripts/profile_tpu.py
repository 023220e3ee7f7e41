"""Profile per-op costs of the gate kernel pipeline on the real chip.

Run manually: python scripts/profile_tpu.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    idx = tuple([0] * leaf.ndim)
    np.asarray(leaf[idx])


def bench_op(name, fn, *args, reps=10):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f'{name}: {dt:.2f} ms (compile {t_compile:.1f}s)', flush=True)


def main():
    n, L = 28, 10
    R, C = 2**(n - L), 2**L
    re = jnp.zeros((R, C), 'float32')
    perm = jnp.asarray(np.random.permutation(R).astype(np.int32))
    cperm = jnp.asarray(np.random.permutation(C).astype(np.int32))
    U = jnp.zeros((16, 16), 'float32')

    bench_op('noop slice', jax.jit(lambda a: a[:8, :8] + 0), re)
    bench_op('copy (a+1)', jax.jit(lambda a: a + 1.0), re)
    bench_op('row take', jax.jit(lambda a, p: jnp.take(a, p, axis=0)), re,
             perm)
    bench_op('col take', jax.jit(lambda a, p: jnp.take(a, p, axis=1)), re,
             cperm)
    bench_op('einsum',
             jax.jit(lambda a, u: jnp.einsum(
                 'rBc,bB->rbc', a.reshape(-1, 16, C), u).reshape(R, C)),
             re, U)
    bench_op(
        'full complex gate (2 in-gathers, 4 einsum, 2 out-gathers)',
        jax.jit(lambda a, b, p, pc, u: tuple(
            jnp.take(jnp.take(
                jnp.einsum('rBc,bB->rbc',
                           jnp.take(jnp.take(x, p, axis=0), pc,
                                    axis=1).reshape(-1, 16, C // 16),
                           u).reshape(R, C), pc, axis=1), p, axis=0)
            for x in (a, b))), re, re, perm, cperm, U)


if __name__ == '__main__':
    main()
