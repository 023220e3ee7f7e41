"""Ext-kernel alternatives at 28q (L=10), all with native (R2, C) state:

  E0  current ext: extend gate over the minor-128, einsum contraction
      Q*128 (kh=1, kl=2 -> K=512)
  E1  G-form: gate low bits in the G range (column bits 7..9), einsum
      'rQgX,PhQg->rPhX' contraction Q*2^kl (K=16)
  E2  G-form with X folded into the batch reshape (transpose-free?)
"""
import time

import numpy as np

from hybridq_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

n, L = 28, 10
R2, C = 2**(n - L + 1), 2**L
G = C // 128
HI = jax.lax.Precision.HIGHEST
kh, kl = 1, 2
Q = 2 * 2**kh          # stack+hi row group
g = 2**kl              # gate lo bits (in G range)
K = 2**(kh + kl)


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


# E0: current ext form (kh=1, kl=2): W [Q,128,Q,128]
def e0(st, W, rp):
    x = jnp.reshape(st, (R2, C))
    x = jnp.take(x, rp, axis=0)
    x = x.reshape(-1, Q, G, 128)
    out = jnp.einsum('rQgX,PxQX->rPgx', x, W,
                     precision=HI)
    return jnp.reshape(out, (R2, C))


# E1: G-form: gate lo bits are the TOP kl bits of the G index.
#     x [r, Q, g, Gr, X] with Gr = G // g the non-gate G remainder.
def e1(st, W, rp):
    x = jnp.reshape(st, (R2, C))
    x = jnp.take(x, rp, axis=0)
    x = x.reshape(-1, Q, g, (G // g) * 128)
    out = jnp.einsum('rQgY,PhQg->rPhY', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


st = jnp.zeros((R2, C), jnp.float32)
rp = jnp.arange(R2, dtype=jnp.int32)

W0 = jax.lax.optimization_barrier(
    jnp.eye(Q * 128, dtype=jnp.float32).reshape(Q, 128, Q, 128))
W1 = jnp.eye(Q * g, dtype=jnp.float32).reshape(Q, g, Q, g)

st = bench('E0 ext current (kh=1,kl=2)', e0, st, W0, rp)
st = bench('E1 G-form      (kh=1,kl=2)', e1, st, W1, rp)

# kh=3 variants
kh3 = 3
Q3 = 2 * 2**kh3
W0b = jax.lax.optimization_barrier(
    jnp.eye(Q3 * 128, dtype=jnp.float32).reshape(Q3, 128, Q3, 128))


def e0b(st, W, rp):
    x = jnp.reshape(st, (R2, C))
    x = jnp.take(x, rp, axis=0)
    x = x.reshape(-1, Q3, G, 128)
    out = jnp.einsum('rQgX,PxQX->rPgx', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


W1b = jnp.eye(Q3 * g, dtype=jnp.float32).reshape(Q3, g, Q3, g)


def e1b(st, W, rp):
    x = jnp.reshape(st, (R2, C))
    x = jnp.take(x, rp, axis=0)
    x = x.reshape(-1, Q3, g, (G // g) * 128)
    out = jnp.einsum('rQgY,PhQg->rPhY', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


st = bench('E0 ext current (kh=3,kl=2)', e0b, st, W0b, rp)
st = bench('E1 G-form      (kh=3,kl=2)', e1b, st, W1b, rp)


# E2: merge (Q, g) into one contraction dim -> row-kernel-shaped einsum.
def e2(st, W, rp):
    x = jnp.reshape(st, (R2, C))
    x = jnp.take(x, rp, axis=0)
    x = x.reshape(-1, Q * g, (G // g) * 128)
    out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


def e2b(st, W, rp):
    x = jnp.reshape(st, (R2, C))
    x = jnp.take(x, rp, axis=0)
    x = x.reshape(-1, Q3 * g, (G // g) * 128)
    out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


W2 = jnp.eye(Q * g, dtype=jnp.float32)
W2b = jnp.eye(Q3 * g, dtype=jnp.float32)
st = jnp.zeros((R2, C), jnp.float32)
st = bench('E2 merged-K    (kh=1,kl=2)', e2, st, W2, rp)
st = bench('E2 merged-K    (kh=3,kl=2)', e2b, st, W2b, rp)
st = bench('E2 again       (kh=1,kl=2)', e2, st, W2, rp)
