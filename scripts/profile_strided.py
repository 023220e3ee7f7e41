"""Where do the gate-kernel milliseconds go, and can a gate run in
fewer HBM passes?

Experiments at 28q (state as [2^18, 1024] f32 pair):
  E0  copy                       — the bandwidth floor
  E1  row take + complex einsum  — the two-pass structure, 4 matmuls
  E1b E1 with layout-compose     — + take(inv_rowmap, rp) as the engine
  E1c E1 without the take        — einsum only (gate bits already minor)
  E2  strided einsum             — gate row bits contracted in place
  E3  ext low-7 column kernel    — the engine's (0, kl) class, W built
  E3b E3 with W precomputed      — is the kron/gather W build the cost?
  E4  shared gather + 2 gates    — amortize one gather over two gates

Run manually: python scripts/profile_strided.py
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


def cmul(ar, ai, br, bi, spec):
    return (jnp.einsum(spec, ar, br) - jnp.einsum(spec, ai, bi),
            jnp.einsum(spec, ai, br) + jnp.einsum(spec, ar, bi))


def main():
    n, L = 28, 10
    R, C = 2**(n - L), 2**L
    nr = n - L  # 18 row bits
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((R, C)).astype('float32'))
    im = jnp.asarray(rng.standard_normal((R, C)).astype('float32'))

    bench('E0 copy pair', jax.jit(lambda a, b: (a + 1.0, b + 1.0)), re, im)

    kh = 3
    rbits = (2, 9, 15)
    perm, inv = _perm(rbits, nr)
    permd = jnp.asarray(perm)
    Ur = jnp.asarray(rng.standard_normal((2**kh, 2**kh)).astype('float32'))
    Ui = jnp.asarray(rng.standard_normal((2**kh, 2**kh)).astype('float32'))

    @jax.jit
    def e1(a, b, p, ur, ui):
        a = jnp.take(a, p, axis=0).reshape(-1, 2**kh, C)
        b = jnp.take(b, p, axis=0).reshape(-1, 2**kh, C)
        oa, ob = cmul(a, b, ur, ui, 'rBc,bB->rbc')
        return oa.reshape(R, C), ob.reshape(R, C)

    bench('E1 take + complex einsum', e1, re, im, permd, Ur, Ui)

    # E1b: + the engine's layout-compose (extra take of the perm itself)
    inv_rowmap = jnp.asarray(
        rng.permutation(R).astype(np.int32))

    @jax.jit
    def e1b(a, b, invm, p, ur, ui):
        eff = jnp.take(invm, p)
        a = jnp.take(a, eff, axis=0).reshape(-1, 2**kh, C)
        b = jnp.take(b, eff, axis=0).reshape(-1, 2**kh, C)
        oa, ob = cmul(a, b, ur, ui, 'rBc,bB->rbc')
        return oa.reshape(R, C), ob.reshape(R, C)

    bench('E1b + layout compose', e1b, re, im, inv_rowmap, permd, Ur, Ui)

    # E1c: einsum only (gate bits already minormost rows)
    @jax.jit
    def e1c(a, b, ur, ui):
        a = a.reshape(-1, 2**kh, C)
        b = b.reshape(-1, 2**kh, C)
        oa, ob = cmul(a, b, ur, ui, 'rBc,bB->rbc')
        return oa.reshape(R, C), ob.reshape(R, C)

    bench('E1c complex einsum only', e1c, re, im, Ur, Ui)

    # E2: strided einsum — gate row bits contracted in place
    shape, in_sub, out_sub = _strided_spec(rbits, nr)
    spec = f'{in_sub},{"".join(chr(ord("A")+i) for i in range(kh))}' \
           f'{"".join(chr(ord("a")+i) for i in range(kh))}->{out_sub}'
    Urt = Ur.reshape((2,) * (2 * kh))
    Uit = Ui.reshape((2,) * (2 * kh))

    @jax.jit
    def e2(a, b, ur, ui):
        a2 = a.reshape(shape)
        b2 = b.reshape(shape)
        oa, ob = cmul(a2, b2, ur, ui, spec)
        return oa.reshape(R, C), ob.reshape(R, C)

    bench('E2 strided complex einsum', e2, re, im, Urt, Uit)

    # E3: the ext low-7 kernel for a (0, kl) gate, W built on device
    kl = 2
    pperm = jnp.asarray(np.arange(128, dtype=np.int32))
    Vr = jnp.asarray(rng.standard_normal((2**kl, 2**kl)).astype('float32'))
    Vi = jnp.asarray(rng.standard_normal((2**kl, 2**kl)).astype('float32'))

    @jax.jit
    def e3(a, b, vr, vi, pp):
        eye = jnp.eye(2**(7 - kl), dtype=vr.dtype)
        Wr = jnp.kron(vr, eye)
        Wi = jnp.kron(vi, eye)
        Wr = jnp.take(jnp.take(Wr, pp, axis=0), pp, axis=1)
        Wi = jnp.take(jnp.take(Wi, pp, axis=0), pp, axis=1)
        Wr, Wi = jax.lax.optimization_barrier((Wr, Wi))
        a2 = a.reshape(R, C // 128, 128)
        b2 = b.reshape(R, C // 128, 128)
        oa, ob = cmul(a2, b2, Wr, Wi, 'rgX,xX->rgx')
        return oa.reshape(R, C), ob.reshape(R, C)

    bench('E3 ext col kernel (0,2), W on device', e3, re, im, Vr, Vi,
          pperm)

    Wr0 = jnp.asarray(np.kron(np.asarray(Vr),
                              np.eye(32, dtype='float32')))
    Wi0 = jnp.asarray(np.kron(np.asarray(Vi),
                              np.eye(32, dtype='float32')))

    @jax.jit
    def e3b(a, b, wr, wi):
        a2 = a.reshape(R, C // 128, 128)
        b2 = b.reshape(R, C // 128, 128)
        oa, ob = cmul(a2, b2, wr, wi, 'rgX,xX->rgx')
        return oa.reshape(R, C), ob.reshape(R, C)

    bench('E3b ext col kernel, W premade', e3b, re, im, Wr0, Wi0)

    # E4: shared gather, two 3-bit row gates in sequence
    rb_all = (2, 9, 15, 4, 11, 16)
    perm4, _ = _perm(rb_all, nr)
    perm4d = jnp.asarray(perm4)
    U2r = jnp.asarray(rng.standard_normal((2**kh, 2**kh)).astype(
        'float32'))
    U2i = jnp.asarray(rng.standard_normal((2**kh, 2**kh)).astype(
        'float32'))

    @jax.jit
    def e4(a, b, p, u1r, u1i, u2r, u2i):
        a = jnp.take(a, p, axis=0).reshape(-1, 2**kh, 2**kh, C)
        b = jnp.take(b, p, axis=0).reshape(-1, 2**kh, 2**kh, C)
        oa, ob = cmul(a, b, u1r, u1i, 'rBsc,bB->rbsc')
        oa, ob = cmul(oa, ob, u2r, u2i, 'rbSc,sS->rbsc')
        return oa.reshape(R, C), ob.reshape(R, C)

    bench('E4 shared gather + 2 complex gates', e4, re, im, perm4d,
          Ur, Ui, U2r, U2i)

    # Correctness: E2 equals E1 after undoing E1's layout change
    a1, _ = e1(re, im, permd, Ur, Ui)
    a2o, _ = e2(re, im, Urt, Uit)
    inv_d = jnp.asarray(inv)
    err = float(jnp.max(jnp.abs(jnp.take(a1, inv_d, axis=0) - a2o)))
    print(f'# E1-vs-E2 max err: {err:.2e}')


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


def _strided_spec(rbits, nr):
    rbits = sorted(rbits)
    shape = []
    in_sub = ''
    out_sub = ''
    prev = 0
    letters = iter('mnopqrstuv')
    for j, b in enumerate(rbits):
        if b > prev:
            shape.append(2**(b - prev))
            c = next(letters)
            in_sub += c
            out_sub += c
        shape.append(2)
        in_sub += chr(ord('A') + j)
        out_sub += chr(ord('a') + j)
        prev = b + 1
    if nr > prev:
        shape.append(2**(nr - prev))
        c = next(letters)
        in_sub += c
        out_sub += c
    shape.append(-1)
    c = next(letters)
    in_sub += c
    out_sub += c
    return tuple(shape), in_sub, out_sub


if __name__ == '__main__':
    main()
