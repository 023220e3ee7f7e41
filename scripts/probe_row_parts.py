"""Decompose the row-kernel cost at 28q: gather pass vs einsum pass vs
fused, plus precision and formulation variants.  Informs VERDICT r2 #4
(cut per-gate HBM passes toward the copy floor)."""
import time

import numpy as np

from hybridq_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

n, L, k = 28, 10, 4
R2, C, Q = 2**(n - L + 1), 2**L, 2**(k + 1)
HI = jax.lax.Precision.HIGHEST
H2 = jax.lax.Precision.DEFAULT


def sync(x):
    return float(np.asarray(x.reshape(-1)[:1])[0])


def bench(name, fn, *args, reps=6):
    rest = args[1:]
    o = fn(*args)  # arg0 is DONATED: dead after this call
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


st = jnp.zeros((R2, C), jnp.float32)
eff = jnp.arange(R2, dtype=jnp.int32)
W = jnp.eye(Q, dtype=jnp.float32)

gather = jax.jit(lambda x, e: jnp.take(x, e, axis=0),
                 donate_argnums=(0,))
einsum_hi = jax.jit(
    lambda x, w: jnp.einsum('rQc,PQ->rPc', x.reshape(-1, Q, C), w,
                            precision=HI).reshape(R2, C),
    donate_argnums=(0,))
einsum_def = jax.jit(
    lambda x, w: jnp.einsum('rQc,PQ->rPc', x.reshape(-1, Q, C), w,
                            precision=H2).reshape(R2, C),
    donate_argnums=(0,))
fused_hi = jax.jit(
    lambda x, e, w: jnp.einsum(
        'rQc,PQ->rPc', jnp.take(x, e, axis=0).reshape(-1, Q, C), w,
        precision=HI).reshape(R2, C),
    donate_argnums=(0,))
# dot_general variant: contract Q as lhs dim1 -> [M, C, P], transpose.
dg = jax.jit(
    lambda x, e, w: jax.lax.transpose(
        jax.lax.dot_general(
            jnp.take(x, e, axis=0).reshape(-1, Q, C), w,
            (((1,), (1,)), ((), ())), precision=HI),
        (0, 2, 1)).reshape(R2, C),
    donate_argnums=(0,))

st = bench('gather only', gather, st, eff)
st = bench('einsum HIGHEST only', einsum_hi, st, W)
st = bench('einsum DEFAULT only', einsum_def, st, W)
st = bench('gather+einsum fused HIGHEST', fused_hi, st, eff, W)
st = bench('dot_general variant', dg, st, eff, W)
