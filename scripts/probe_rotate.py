"""Column-rotation alternatives for the gext class at 28q (L=10).

The round-3 calibration measured gext rotate=True at ~74 ms vs ~38 ms
in place: the cross-lane column gather (jnp.take axis=1 with a bit
permutation mixing lane bits <7 and G bits 7..9) costs ~36 ms — a full
cross-lane shuffle pass.  Variants probed:

  R0  current: take(cperm, axis=1) -> take(eff, axis=0) -> einsum
  R1  in-place gext (no rotation) — the 38 ms floor of this design
  R2  rotation as matmul x @ P (P = [C,C] 0/1 permutation matrix,
      DEFAULT precision — bf16 is exact for 0/1) inside the SAME jit
  R3  rotation matmul folded into the einsum as an extra contraction:
      einsum('rQc,cKY,PK->rPY') with P reshaped [C, KL, Y]
  R4  combined 2D gather: one advanced-indexing gather building the
      einsum operand directly (rows+cols in one gather)
  R5  row kernel k=4 (reference point, ~23 ms)
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
K2 = 2**(kh + kl + 1)          # merged contraction (stack, hi, lo-top)
Y = C // 2**kl


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


# a representative rotation: swap col bit 1 (lane) with bit 9 (G top),
# and bit 4 (lane) with bit 8 — the worst-case lane<->G mix.
perm_bits = list(range(10))
perm_bits[1], perm_bits[9] = perm_bits[9], perm_bits[1]
perm_bits[4], perm_bits[8] = perm_bits[8], perm_bits[4]
x_idx = np.arange(C, dtype=np.int64)
cperm_h = np.zeros_like(x_idx)
for i, p in enumerate(perm_bits):
    cperm_h |= ((x_idx >> p) & 1) << i
cperm = jnp.asarray(cperm_h.astype(np.int32))
# permutation matrix: (x @ P)[, j] = x[, cperm[j]] -> P[cperm[j], j] = 1
P = jnp.zeros((C, C), jnp.float32).at[cperm, jnp.arange(C)].set(1.0)
P = jax.device_put(np.asarray(P))  # settle

eff = jnp.arange(R2, dtype=jnp.int32)
W = jnp.eye(K2, dtype=jnp.float32)
# P reshaped for R3: P[c, (K_top, y)] -> [C, KL, Y]
P3 = jnp.reshape(P, (C, 2**kl, Y))


@jax.jit
def r0(st, W, cperm, eff):
    x = jnp.reshape(st, (R2, C))
    x = jnp.take(x, cperm, axis=1)
    x = jnp.take(x, eff, axis=0)
    x = x.reshape(-1, K2, Y)
    out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


@jax.jit
def r1(st, W, eff):
    x = jnp.reshape(st, (R2, C))
    x = jnp.take(x, eff, axis=0)
    x = x.reshape(-1, K2, Y)
    out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


@jax.jit
def r2(st, W, P, eff):
    x = jnp.reshape(st, (R2, C))
    x = jax.lax.dot_general(x, P, (((1,), (0,)), ((), ())),
                            precision=DEF)
    x = jnp.take(x, eff, axis=0)
    x = x.reshape(-1, K2, Y)
    out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


@jax.jit
def r3(st, W, P3, eff):
    x = jnp.reshape(st, (R2, C))
    x = jnp.take(x, eff, axis=0)
    Q2 = 2**(kh + 1)
    x = x.reshape(-1, Q2, C)
    # rotate+regroup in one contraction: x[r,Q,c] P3[c,t,Y] -> [r,Q,t,Y]
    xr = jnp.einsum('rQc,ctY->rQtY', x, P3, precision=DEF)
    xr = xr.reshape(-1, K2, Y)
    out = jnp.einsum('rKY,PK->rPY', xr, W, precision=HI)
    return jnp.reshape(out, (R2, C))


@jax.jit
def r4(st, W, cperm, eff):
    x = jnp.reshape(st, (R2, C))
    x = x[eff[:, None], cperm[None, :]]
    x = x.reshape(-1, K2, Y)
    out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


@jax.jit
def r5(st, Wr, eff):
    x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0)
    x = x.reshape(-1, 32, C)
    out = jnp.einsum('rQc,PQ->rPc', x, Wr, precision=HI)
    return jnp.reshape(out, (R2, C))


Wr = jnp.eye(32, dtype=jnp.float32)

st = jnp.zeros((R2, C), jnp.float32)
st = bench('R1 in-place gext      ', r1, st, W, eff)
st = bench('R0 take-rotate (cur)  ', r0, st, W, cperm, eff)
st = bench('R2 matmul-rotate      ', r2, st, W, P, eff)
st = bench('R3 fused P-einsum     ', r3, st, W, P3, eff)
st = bench('R4 2D-gather          ', r4, st, W, cperm, eff)
st = bench('R5 row k=4            ', r5, st, Wr, eff)
st = bench('R1 again              ', r1, st, W, eff)
st = bench('R2 again              ', r2, st, W, P, eff)
