"""Round 3: mixed-gate structures and fused-block economics for the
stacked engine.  The stack (re/im) bit is treated as the top row bit;
row gathers may place it anywhere (the layout is tracked).

  M0  gather only, L=10 baseline
  M1  (8,0) fused row block, HIGH vs HIGHEST  (pairing economics)
  M2  mixed joint ext einsum, (s,B) gathered adjacent, L=10, HIGH
  M3  2D relayout (row take + col take, one program)
  M4  M3 + row einsum = mixed gate as "swap cols into rows"
  M5  (9,0) fused row block HIGH

Run manually: python scripts/profile_stacked3.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST
H3 = jax.lax.Precision.HIGH


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


def rand_perm(rng, size):
    return jnp.asarray(rng.permutation(size).astype(np.int32))


def main():
    n, L = 28, 10
    R, C = 2**(n - L), 2**L
    R2 = 2 * R
    rng = np.random.default_rng(0)
    st = jnp.asarray(rng.standard_normal((R2, C)).astype('float32'))

    p_r = rand_perm(rng, R2)
    bench('M0 row gather [2R,C]',
          jax.jit(lambda a, p: jnp.take(a, p, axis=0)), st, p_r)

    # M1: (8,0) fused row block — contraction (s, B8) = 512
    K8 = 2**8
    W8 = jnp.asarray(rng.standard_normal(
        (2 * K8, 2 * K8)).astype('float32'))

    def blk(prec):
        @jax.jit
        def f(a, p, w):
            a = jnp.take(a, p, axis=0).reshape(-1, 2 * K8, C)
            return jnp.einsum('rQc,PQ->rPc', a, w,
                              precision=prec).reshape(R2, C)
        return f

    bench('M1 (8,0) block HIGH', blk(H3), st, p_r, W8)
    bench('M1 (8,0) block HIGHEST', blk(HI), st, p_r, W8)

    # M5: (9,0) fused row block — contraction 1024
    K9 = 2**9
    W9 = jnp.asarray(rng.standard_normal(
        (2 * K9, 2 * K9)).astype('float32'))

    @jax.jit
    def m5(a, p, w):
        a = jnp.take(a, p, axis=0).reshape(-1, 2 * K9, C)
        return jnp.einsum('rQc,PQ->rPc', a, w,
                          precision=H3).reshape(R2, C)

    bench('M5 (9,0) block HIGH', m5, st, p_r, W9)

    # M2: mixed (kh=3, kl=1) joint ext, (s,B) adjacent after gather
    KH = 2**3
    Q = 2 * KH
    Wx = jnp.asarray(rng.standard_normal(
        (Q, 128, Q, 128)).astype('float32'))

    def mixed(prec):
        @jax.jit
        def f(a, p, w):
            a = jnp.take(a, p, axis=0).reshape(-1, Q, C // 128, 128)
            return jnp.einsum('rQgX,PxQX->rPgx', a, w,
                              precision=prec).reshape(R2, C)
        return f

    bench('M2 mixed joint ext HIGH', mixed(H3), st, p_r, Wx)
    bench('M2 mixed joint ext HIGHEST', mixed(HI), st, p_r, Wx)

    # M3: 2D relayout (separable row x col permutation)
    p_c = rand_perm(rng, C)

    @jax.jit
    def m3(a, pr, pc):
        return jnp.take(jnp.take(a, pr, axis=0), pc, axis=1)

    bench('M3 2D relayout (row+col take)', m3, st, p_r, p_c)

    # M4: 2D relayout + (4,0) row einsum in one program
    K4 = 2**4
    W4 = jnp.asarray(rng.standard_normal(
        (2 * K4, 2 * K4)).astype('float32'))

    @jax.jit
    def m4(a, pr, pc, w):
        a = jnp.take(jnp.take(a, pr, axis=0), pc, axis=1)
        a = a.reshape(-1, 2 * K4, C)
        return jnp.einsum('rQc,PQ->rPc', a, w,
                          precision=HI).reshape(R2, C)

    bench('M4 2D relayout + (4,0) einsum', m4, st, p_r, p_c, W4)

    # M6: col take alone
    bench('M6 col take only',
          jax.jit(lambda a, p: jnp.take(a, p, axis=1)), st, p_c)


if __name__ == '__main__':
    main()
