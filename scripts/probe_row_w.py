"""Is the row kernel's W-construction (uperm takes + block2 concat)
being fused into the einsum and recomputed per tile?  A/B with an
optimization_barrier."""
import time

import numpy as np

from hybridq_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

n, L, k = 28, 10, 4
R2, C, Q = 2**(n - L + 1), 2**L, 2**(k + 1)
HI = jax.lax.Precision.HIGHEST


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


def kern(barrier):
    def apply(st, Ur, Ui, uperm, rp, inv_rowmap):
        Ur2 = jnp.take(jnp.take(Ur, uperm, axis=0), uperm, axis=1)
        Ui2 = jnp.take(jnp.take(Ui, uperm, axis=0), uperm, axis=1)
        W = block2(Ur2, Ui2)
        if barrier:
            W = jax.lax.optimization_barrier(W)
        eff = jnp.take(inv_rowmap, rp)
        x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0)
        x = x.reshape(-1, Q, C)
        out = jnp.einsum('rQc,PQ->rPc', x, W, precision=HI)
        return jnp.reshape(out, (2, -1))
    return jax.jit(apply, donate_argnums=(0,))


st = jnp.zeros((2, 2**n), jnp.float32)
K = 2**k
Ur = jnp.eye(K, dtype=jnp.float32)
Ui = jnp.zeros((K, K), jnp.float32)
up = jnp.arange(K, dtype=jnp.int32)
rp = jnp.arange(R2, dtype=jnp.int32)
inv = jnp.arange(R2, dtype=jnp.int32)

st = bench('row NO barrier (production)', kern(False), st, Ur, Ui, up,
           rp, inv)
st = bench('row WITH barrier', kern(True), st, Ur, Ui, up, rp, inv)


def kern_flat():
    def apply(st, Ur, Ui, uperm, rp, inv_rowmap):
        Ur2 = jnp.take(jnp.take(Ur, uperm, axis=0), uperm, axis=1)
        Ui2 = jnp.take(jnp.take(Ui, uperm, axis=0), uperm, axis=1)
        W = block2(Ur2, Ui2)
        eff = jnp.take(inv_rowmap, rp)
        x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0)
        x = x.reshape(-1, Q, C)
        out = jnp.einsum('rQc,PQ->rPc', x, W, precision=HI)
        return jnp.reshape(out, (-1,))
    return jax.jit(apply, donate_argnums=(0,))


stf = jnp.zeros((2**(n + 1),), jnp.float32)
stf = bench('row FLAT state', kern_flat(), stf, Ur, Ui, up, rp, inv)
