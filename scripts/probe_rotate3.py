"""Production-kernel overheads at 28q: in-jit W build vs barrier, and
the EXACT fused rotation (3-level bf16 split through the P-einsum).

probe_rotate.py measured the pure einsum forms 4-7 ms faster than the
production kernels; the suspect is the W build (uperm double-take +
block2 concat) fusing INTO the einsum and being recomputed per tile
(the ext kernel already guards this with an optimization_barrier —
row/gext do not).

  T1  gext in-place, W built in-jit (production form)
  T2  T1 + optimization_barrier(W)
  T3  row k=4, W built in-jit (production form)
  T4  T3 + optimization_barrier(W)
  T5  EXACT fused rotation: x -> 3 bf16 levels -> P-einsum each at
      DEFAULT (0/1 matrix: selection, exact) -> sum -> gate einsum
  T6  T5 exactness check on random state slice
"""
import time

import numpy as np

from hybridq_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

n, L = 28, 10
R2, C = 2**(n - L + 1), 2**L
HI = jax.lax.Precision.HIGHEST
DEF = jax.lax.Precision.DEFAULT

kh, kl = 2, 2
k = kh + kl
K2 = 2**(k + 1)
Y = C // 2**kl
Q2 = 2**(kh + 1)


def sync(x):
    return float(np.asarray(x.reshape(-1)[:1])[0])


def bench(name, fn, *args, reps=6):
    rest = args[1:]
    o = fn(*args)
    sync(o)
    t0 = time.perf_counter()
    sync(o)
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(o, *rest)
    sync(o)
    ms = (time.perf_counter() - t0 - t_s) / reps * 1e3
    print(f"{name}: {ms:.1f} ms", flush=True)
    return o


def block2(Ur, Ui):
    top = jnp.concatenate([Ur, -Ui], axis=1)
    bot = jnp.concatenate([Ui, Ur], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@jax.jit
def t1(st, Ur, Ui, uperm, eff):
    Ur = jnp.take(jnp.take(Ur, uperm, axis=0), uperm, axis=1)
    Ui = jnp.take(jnp.take(Ui, uperm, axis=0), uperm, axis=1)
    W = block2(Ur, Ui)
    x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0)
    x = x.reshape(-1, K2, Y)
    out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


@jax.jit
def t2(st, Ur, Ui, uperm, eff):
    Ur = jnp.take(jnp.take(Ur, uperm, axis=0), uperm, axis=1)
    Ui = jnp.take(jnp.take(Ui, uperm, axis=0), uperm, axis=1)
    W = jax.lax.optimization_barrier(block2(Ur, Ui))
    x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0)
    x = x.reshape(-1, K2, Y)
    out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


@jax.jit
def t3(st, Ur, Ui, uperm, eff):
    Ur = jnp.take(jnp.take(Ur, uperm, axis=0), uperm, axis=1)
    Ui = jnp.take(jnp.take(Ui, uperm, axis=0), uperm, axis=1)
    W = block2(Ur, Ui)
    x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0)
    x = x.reshape(-1, 2**(k + 1), C)
    out = jnp.einsum('rQc,PQ->rPc', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


@jax.jit
def t4(st, Ur, Ui, uperm, eff):
    Ur = jnp.take(jnp.take(Ur, uperm, axis=0), uperm, axis=1)
    Ui = jnp.take(jnp.take(Ui, uperm, axis=0), uperm, axis=1)
    W = jax.lax.optimization_barrier(block2(Ur, Ui))
    x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0)
    x = x.reshape(-1, 2**(k + 1), C)
    out = jnp.einsum('rQc,PQ->rPc', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


# exact fused rotation: levels through the P3 einsum
perm_bits = list(range(10))
perm_bits[1], perm_bits[9] = perm_bits[9], perm_bits[1]
perm_bits[4], perm_bits[8] = perm_bits[8], perm_bits[4]
xi = np.arange(C, dtype=np.int64)
cperm_h = np.zeros_like(xi)
for i, p in enumerate(perm_bits):
    cperm_h |= ((xi >> p) & 1) << i
cperm = jnp.asarray(cperm_h.astype(np.int32))
P = jnp.zeros((C, C), jnp.float32).at[cperm, jnp.arange(C)].set(1.0)
P3 = jnp.reshape(P, (C, 2**kl, Y))


def levels3(x):
    hi = jax.lax.convert_element_type(
        jax.lax.convert_element_type(x, jnp.bfloat16), jnp.float32)
    r1 = x - hi
    mid = jax.lax.convert_element_type(
        jax.lax.convert_element_type(r1, jnp.bfloat16), jnp.float32)
    lo = r1 - mid
    return hi, mid, lo


@jax.jit
def t5(st, W, P3, eff):
    x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0)
    x = x.reshape(-1, Q2, C)
    rot = None
    for lv in levels3(x):
        r = jnp.einsum('rQc,ctY->rQtY', lv, P3, precision=DEF)
        rot = r if rot is None else rot + r
    rot = rot.reshape(-1, K2, Y)
    out = jnp.einsum('rKY,PK->rPY', rot, W, precision=HI)
    return jnp.reshape(out, (R2, C))


eff = jnp.arange(R2, dtype=jnp.int32)
Ur = jnp.eye(2**k, dtype=jnp.float32)
Ui = jnp.zeros_like(Ur)
uperm = jnp.arange(2**k, dtype=jnp.int32)
W = jnp.eye(K2, dtype=jnp.float32)

st = jnp.zeros((R2, C), jnp.float32)
st = bench('T1 gext W-in-jit        ', t1, st, Ur, Ui, uperm, eff)
st = bench('T2 gext W-barrier       ', t2, st, Ur, Ui, uperm, eff)
st = bench('T3 row  W-in-jit        ', t3, st, Ur, Ui, uperm, eff)
st = bench('T4 row  W-barrier       ', t4, st, Ur, Ui, uperm, eff)
st = bench('T5 exact fused rotate   ', t5, st, W, P3, eff)

# exactness: small random block through the same level trick
rng = np.random.default_rng(0)
xs = (rng.standard_normal((8, Q2, C)) *
      np.exp(rng.standard_normal((8, Q2, C)) * 3)).astype('f4')


@jax.jit
def t5s(x, P3):
    rot = None
    for lv in levels3(x):
        r = jnp.einsum('rQc,ctY->rQtY', lv, P3, precision=DEF)
        rot = r if rot is None else rot + r
    return rot


got = np.asarray(t5s(jnp.asarray(xs), P3)).reshape(8, Q2, C)
want = xs[:, :, np.asarray(cperm)]
diff = np.abs(got - want)
print(f"T6 exactness: max abs diff {diff.max():.3e} "
      f"(max |x| {np.abs(xs).max():.3e})", flush=True)
