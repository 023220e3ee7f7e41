"""Stacked-complex formulation: state as ONE array [2, R, C] (re, im
stacked) and the complex gate as ONE real matmul with the 2x2 block
matrix  [[Ur, -Ui], [Ui, Ur]]  contracting (stack, gate-bits) together.
If XLA emits this as a single-pass dot, the einsum cost halves vs the
4-matmul split-pair form (21.7 ms -> ~12 ms at 28q).

Run manually: python scripts/profile_stacked.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


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
    return dt


def block2(Ur, Ui):
    """[t, b, s, B] block matrix: out_t = sum_sB W[t,b,s,B] in_s."""
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
    st = jnp.asarray(rng.standard_normal((2, R, C)).astype('float32'))

    bench('S0 copy stacked', jax.jit(lambda a: a + 1.0), st)

    kh = 3
    K = 2**kh
    Ur = rng.standard_normal((K, K)).astype('float32')
    Ui = rng.standard_normal((K, K)).astype('float32')
    W2 = jnp.asarray(block2(Ur, Ui))

    # S1: stacked einsum variants (gate bits already minormost rows)
    @jax.jit
    def s1(a, w):
        a2 = a.reshape(2, -1, K, C)
        return jnp.einsum('srBc,tbsB->trbc', a2, w).reshape(2, R, C)

    bench('S1 stacked einsum [s,r,B,c]', s1, st, W2)

    st_mid = jnp.asarray(rng.standard_normal((R // K, 2, K, C)).astype(
        'float32'))

    @jax.jit
    def s1b(a, w):
        return jnp.einsum('rsBc,tbsB->rtbc', a, w)

    bench('S1b stacked einsum [r,s,B,c]', s1b, st_mid, W2)

    # S2: row gather + stacked einsum (a full (kh, 0) gate)
    perm, inv = _perm((2, 9, 15), nr)
    permd = jnp.asarray(perm)

    @jax.jit
    def s2(a, p, w):
        a = jnp.take(a, p, axis=1).reshape(2, -1, K, C)
        return jnp.einsum('srBc,tbsB->trbc', a, w).reshape(2, R, C)

    bench('S2 gather + stacked einsum', s2, st, permd, W2)

    # S3: shared gather + 2 stacked gates
    perm4, _ = _perm((2, 9, 15, 4, 11, 16), nr)
    perm4d = jnp.asarray(perm4)
    W2b = jnp.asarray(block2(
        rng.standard_normal((K, K)).astype('float32'),
        rng.standard_normal((K, K)).astype('float32')))

    @jax.jit
    def s3(a, p, w1, w2):
        a = jnp.take(a, p, axis=1).reshape(2, -1, K, K, C)
        a = jnp.einsum('srBSc,tbsB->trbSc', a, w1)
        a = jnp.einsum('srbSc,tUsS->trbUc', a, w2)
        return a.reshape(2, R, C)

    bench('S3 shared gather + 2 stacked gates', s3, st, perm4d, W2, W2b)

    # S4: ext low-7 column gate, stacked: W2x [2,128,2,128]
    kl = 2
    Vr = rng.standard_normal((2**kl, 2**kl)).astype('float32')
    Vi = rng.standard_normal((2**kl, 2**kl)).astype('float32')
    eye = np.eye(2**(7 - kl), dtype='float32')
    W2x = jnp.asarray(block2(np.kron(Vr, eye), np.kron(Vi, eye)))

    @jax.jit
    def s4(a, w):
        a2 = a.reshape(2, R, C // 128, 128)
        return jnp.einsum('srgX,txsX->trgx', a2, w).reshape(2, R, C)

    bench('S4 ext col stacked einsum', s4, st, W2x)

    # S5: combined (kh rows via gather-compose) x (ext cols), one pass
    # combined complex operator: (U_row ⊗ V_col ⊗ I) as a block matrix
    Ufull_r = np.kron(Ur, np.kron(Vr, eye)) - np.kron(Ui, np.kron(Vi,
                                                                  eye))
    Ufull_i = np.kron(Ur, np.kron(Vi, eye)) + np.kron(Ui, np.kron(Vr,
                                                                  eye))
    Wc = np.zeros((2, K * 128, 2, K * 128), dtype='float32')
    Wc[0, :, 0, :] = Ufull_r
    Wc[0, :, 1, :] = -Ufull_i
    Wc[1, :, 0, :] = Ufull_i
    Wc[1, :, 1, :] = Ufull_r
    Wc = jnp.asarray(Wc.reshape(2, K, 128, 2, K, 128))

    @jax.jit
    def s5(a, p, w):
        a = jnp.take(a, p, axis=1).reshape(2, -1, K, C // 128, 128)
        return jnp.einsum('srBgX,tbxsBX->trbgx', a, w).reshape(2, R, C)

    bench('S5 gather + combined row x col stacked', s5, st, permd, Wc)

    # Correctness: S2 vs split-pair reference
    re0 = np.asarray(st[0])
    im0 = np.asarray(st[1])
    a = np.take(re0, perm, axis=0).reshape(-1, K, C)
    b = np.take(im0, perm, axis=0).reshape(-1, K, C)
    oa = np.einsum('rBc,bB->rbc', a, Ur) - np.einsum('rBc,bB->rbc', b, Ui)
    ob = np.einsum('rBc,bB->rbc', b, Ur) + np.einsum('rBc,bB->rbc', a, Ui)
    got = np.asarray(s2(st, permd, W2))
    err = max(np.abs(got[0] - oa.reshape(R, C)).max(),
              np.abs(got[1] - ob.reshape(R, C)).max())
    print(f'# S2 max err vs numpy: {err:.2e}')


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
