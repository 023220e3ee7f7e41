"""Round 4: row<->col bit exchange via XLA transpose, and small-kh
mixed joint-ext einsums — the final inputs to the stacked-engine cost
model.

Run manually: python scripts/profile_exchange.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def bench(name, fn, *args, reps=6):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f'{name}: {dt:.1f} ms (compile {tc:.0f}s)', flush=True)
    return out


def main():
    n, L = 28, 10
    R, C = 2**(n - L), 2**L
    R2 = 2 * R
    rng = np.random.default_rng(0)
    st = jnp.asarray(rng.standard_normal((R2, C)).astype('float32'))

    # T2a: exchange row bit 9 (of 19) with col bit 3 (of 10, minor zone)
    @jax.jit
    def t2a(a):
        x = a.reshape(2**10, 2, 2**8, 2**6, 2, 2**3)
        x = jnp.swapaxes(x, 1, 4)
        return x.reshape(R2, C)

    bench('T2a exchange row<->minor-col bit', t2a, st)

    # T2c: exchange row bit with a g-zone col bit (bit 8: above minor-7)
    @jax.jit
    def t2c(a):
        x = a.reshape(2**10, 2, 2**8, 2, 2**9)
        x = jnp.swapaxes(x, 1, 3)
        return x.reshape(R2, C)

    bench('T2c exchange row<->g-zone col bit', t2c, st)

    # T2b: exchange TWO row bits with two col bits (one program)
    @jax.jit
    def t2b(a):
        x = a.reshape(2**8, 2, 2**4, 2, 2**5, 2**4, 2, 2**2, 2, 2**2)
        x = jnp.swapaxes(x, 1, 6)
        x = jnp.swapaxes(x, 3, 8)
        return x.reshape(R2, C)

    bench('T2b exchange 2 row<->col bits', t2b, st)

    # T2d: exchange + row gather in one program (the mixed-gate prelude)
    perm = jnp.asarray(rng.permutation(R2).astype(np.int32))

    @jax.jit
    def t2d(a, p):
        x = a.reshape(2**10, 2, 2**8, 2**6, 2, 2**3)
        x = jnp.swapaxes(x, 1, 4).reshape(R2, C)
        return jnp.take(x, p, axis=0)

    bench('T2d exchange + row gather', t2d, st, perm)

    # T4: mixed joint ext at small kh, HIGHEST
    for kh in (1, 2):
        Q = 2 * 2**kh
        W = jnp.asarray(rng.standard_normal(
            (Q, 128, Q, 128)).astype('float32'))

        def mk(Q):
            @jax.jit
            def f(a, w):
                x = a.reshape(-1, Q, C // 128, 128)
                return jnp.einsum('rQgX,PxQX->rPgx', a.reshape(
                    -1, Q, C // 128, 128), w,
                    precision=HI).reshape(R2, C)
            return f

        bench(f'T4 mixed joint ext kh={kh} HIGHEST', mk(Q), st, W)

    # T5: (4,0) and (8,0) HIGHEST with gather (engine classes)
    for k in (4, 8):
        Q = 2 * 2**k
        W = jnp.asarray(rng.standard_normal((Q, Q)).astype('float32'))

        def mk2(Q):
            @jax.jit
            def f(a, p, w):
                x = jnp.take(a, p, axis=0).reshape(-1, Q, C)
                return jnp.einsum('rQc,PQ->rPc', x, w,
                                  precision=HI).reshape(R2, C)
            return f

        bench(f'T5 ({k},0) gather+einsum HIGHEST', mk2(Q), st, perm, W)


if __name__ == '__main__':
    main()
