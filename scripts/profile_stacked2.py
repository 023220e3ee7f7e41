"""Round 2: matmul precision and gather form for the stacked-complex
engine.

  P1  stacked einsum, precision=highest      — true-f32 cost
  P2  stacked gather as [2R, C] take axis0   — does it fuse like the
                                               split-pair takes do?
  P3  P2 + einsum highest (full (kh,0) gate)
  P4  ext col stacked, highest
  P5  shared gather + 2 stacked gates, highest
  Each checked against numpy float64.

Run manually: python scripts/profile_stacked2.py
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


def block2(Ur, Ui):
    k = Ur.shape[0]
    W = np.zeros((2, k, 2, k), dtype=Ur.dtype)
    W[0, :, 0, :] = Ur
    W[0, :, 1, :] = -Ui
    W[1, :, 0, :] = Ui
    W[1, :, 1, :] = Ur
    return W


def main():
    n, L = 28, 10
    R, C = 2**(n - L), 2**L
    nr = n - L
    rng = np.random.default_rng(0)
    st_h = rng.standard_normal((2, R, C)).astype('float32')
    st = jnp.asarray(st_h)

    kh = 3
    K = 2**kh
    Ur = rng.standard_normal((K, K)).astype('float32')
    Ui = rng.standard_normal((K, K)).astype('float32')
    W2 = jnp.asarray(block2(Ur, Ui))

    # numpy f64 oracle for the minor-rows gate
    def oracle(x):
        a = x.astype('float64').reshape(2, -1, K, C)
        W = block2(Ur, Ui).astype('float64')
        return np.einsum('srBc,tbsB->trbc', a, W).reshape(2, R, C)

    want = oracle(st_h)

    @jax.jit
    def p0(a, w):
        a2 = a.reshape(2, -1, K, C)
        return jnp.einsum('srBc,tbsB->trbc', a2, w).reshape(2, R, C)

    got = bench('P0 stacked einsum default prec', p0, st, W2)
    print(f'#   err: {np.abs(np.asarray(got) - want).max():.2e}')

    @jax.jit
    def p1(a, w):
        a2 = a.reshape(2, -1, K, C)
        return jnp.einsum('srBc,tbsB->trbc', a2, w,
                          precision=HI).reshape(2, R, C)

    got = bench('P1 stacked einsum HIGHEST', p1, st, W2)
    print(f'#   err: {np.abs(np.asarray(got) - want).max():.2e}')

    # P2: gather via [2R, C] view, doubled perm, take axis 0
    perm, inv = _perm((2, 9, 15), nr)
    perm2 = jnp.asarray(np.concatenate([perm, perm + R]))

    @jax.jit
    def p2(a, p):
        return jnp.take(a.reshape(2 * R, C), p, axis=0).reshape(2, R, C)

    bench('P2 stacked gather via [2R, C]', p2, st, perm2)

    # P3: full (kh, 0) gate = gather + stacked einsum, highest
    @jax.jit
    def p3(a, p, w):
        a = jnp.take(a.reshape(2 * R, C), p, axis=0)
        a = a.reshape(2, -1, K, C)
        return jnp.einsum('srBc,tbsB->trbc', a, w,
                          precision=HI).reshape(2, R, C)

    got = bench('P3 gather + stacked einsum HIGHEST', p3, st, perm2, W2)
    wantg = oracle(np.take(st_h.reshape(2 * R, C), np.asarray(perm2),
                           axis=0).reshape(2, R, C))
    print(f'#   err: {np.abs(np.asarray(got) - wantg).max():.2e}')

    # P4: ext col stacked, highest
    kl = 2
    Vr = rng.standard_normal((2**kl, 2**kl)).astype('float32')
    Vi = rng.standard_normal((2**kl, 2**kl)).astype('float32')
    eye = np.eye(2**(7 - kl), dtype='float32')
    W2x = jnp.asarray(block2(np.kron(Vr, eye), np.kron(Vi, eye)))

    @jax.jit
    def p4(a, w):
        a2 = a.reshape(2, R, C // 128, 128)
        return jnp.einsum('srgX,txsX->trgx', a2, w,
                          precision=HI).reshape(2, R, C)

    bench('P4 ext col stacked HIGHEST', p4, st, W2x)

    # P5: shared gather + 2 stacked gates, highest
    perm6, _ = _perm((2, 9, 15, 4, 11, 16), nr)
    perm6d = jnp.asarray(np.concatenate([perm6, perm6 + R]))
    W2b = jnp.asarray(block2(
        rng.standard_normal((K, K)).astype('float32'),
        rng.standard_normal((K, K)).astype('float32')))

    @jax.jit
    def p5(a, p, w1, w2):
        a = jnp.take(a.reshape(2 * R, C), p, axis=0)
        a = a.reshape(2, -1, K, K, C)
        a = jnp.einsum('srBSc,tbsB->trbSc', a, w1, precision=HI)
        a = jnp.einsum('srbSc,tUsS->trbUc', a, w2, precision=HI)
        return a.reshape(2, R, C)

    bench('P5 shared gather + 2 gates HIGHEST', p5, st, perm6d, W2, W2b)

    # P6: ext kernel for a MIXED (kh rows, kl cols) gate done as TWO
    # einsums in one program: rows first (stacked), then cols (real
    # block op) — 2 passes but no gathers beyond the row compose.
    @jax.jit
    def p6(a, p, w1, wx):
        a = jnp.take(a.reshape(2 * R, C), p, axis=0)
        a = a.reshape(2, -1, K, C)
        a = jnp.einsum('srBc,tbsB->trbc', a, w1, precision=HI)
        a = a.reshape(2, R, C // 128, 128)
        a = jnp.einsum('srgX,txsX->trgx', a, wx, precision=HI)
        return a.reshape(2, R, C)

    bench('P6 row einsum + col einsum HIGHEST', p6, st, perm2, W2, W2x)


def _perm(rbits, nr):
    pos = [nr - 1 - b for b in rbits]
    k = len(pos)
    g = np.arange(2**(nr - k), dtype=np.int64)
    idx = g
    for p in sorted(pos):
        low = idx & ((1 << p) - 1)
        idx = ((idx >> p) << (p + 1)) | low
    offs = np.zeros(2**k, dtype=np.int64)
    bb = np.arange(2**k, dtype=np.int64)
    for j, p in enumerate(pos):
        offs |= ((bb >> (k - 1 - j)) & 1) << p
    perm = (idx[:, None] + offs[None, :]).reshape(-1)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return perm.astype(np.int32), inv.astype(np.int32)


if __name__ == '__main__':
    main()
