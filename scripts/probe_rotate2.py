"""Rotation-free / cheap-rotation gext alternatives at 28q (L=10).

Follow-up to probe_rotate.py.  The exactness constraint: 1e-6 parity
means the state may NOT round through bf16 (plain DEFAULT-precision
matmuls with a 0/1 permutation matrix still round the *state* operand).

  S1  G-form kernel: gate col bits ANYWHERE in the G range (bits 7..9),
      operator kron-extended over all 8 G values on device — no column
      rotation ever needed for G-resident bits.  einsum contraction
      (Q2, 8), HIGHEST.
  S2  lane<->G single-bit swap, exact f32: xf = double-flip (G-axis roll
      + lane XOR-shuffle), out = where(mask, x, xf).  Then S1 applies.
  S2b same but two swaps chained in one jit.
  S3  plain lane-XOR shuffle alone (axis=2 take with XOR perm).
  S4  exact matmul-rotate: state split hi/mid/lo bf16 levels, three
      DEFAULT matmuls vs the 0/1 [C,C] permutation (P exact in bf16;
      products exact; sums are selections) — f32-exact by construction.
  S5  merged-K einsum with the Y axis kept 2D [G', 128] (layout probe).
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


# ---- S1: G-form (operator extended over all 8 G values) -------------
@jax.jit
def s1(st, Wg, eff):
    x = jnp.reshape(st, (R2, C))
    x = jnp.take(x, eff, axis=0)
    x = x.reshape(-1, Q2, 8, 128)
    out = jnp.einsum('rQgX,PhQg->rPhX', x, Wg, precision=HI)
    return jnp.reshape(out, (R2, C))


Wg = jnp.eye(Q2 * 8, dtype=jnp.float32).reshape(Q2, 8, Q2, 8)
eff = jnp.arange(R2, dtype=jnp.int32)

# ---- S2: lane<->G swap via double-flip + where ----------------------
# swap G bit 1 (of 3) with lane bit 4.
gbit, lbit = 1, 4
gperm = jnp.asarray(np.arange(8) ^ (1 << gbit), dtype=jnp.int32)
lperm = jnp.asarray(np.arange(128) ^ (1 << lbit), dtype=jnp.int32)
gmask = (np.arange(8) >> gbit) & 1
lmask = (np.arange(128) >> lbit) & 1
cond = jnp.asarray((gmask[:, None] == lmask[None, :]))  # [8,128] bool


@jax.jit
def s2(st):
    x = jnp.reshape(st, (R2, 8, 128))
    xf = jnp.take(jnp.take(x, gperm, axis=1), lperm, axis=2)
    out = jnp.where(cond[None], x, xf)
    return jnp.reshape(out, (R2, C))


# second swap: G bit 2 <-> lane bit 0
gperm2 = jnp.asarray(np.arange(8) ^ 4, dtype=jnp.int32)
lperm2 = jnp.asarray(np.arange(128) ^ 1, dtype=jnp.int32)
cond2 = jnp.asarray((((np.arange(8) >> 2) & 1)[:, None] ==
                     ((np.arange(128)) & 1)[None, :]))


@jax.jit
def s2b(st):
    x = jnp.reshape(st, (R2, 8, 128))
    xf = jnp.take(jnp.take(x, gperm, axis=1), lperm, axis=2)
    x = jnp.where(cond[None], x, xf)
    xf = jnp.take(jnp.take(x, gperm2, axis=1), lperm2, axis=2)
    out = jnp.where(cond2[None], x, xf)
    return jnp.reshape(out, (R2, C))


# ---- S2c: swap fused with the S1 einsum in one jit ------------------
@jax.jit
def s2c(st, Wg, eff):
    x = jnp.reshape(st, (R2, 8, 128))
    xf = jnp.take(jnp.take(x, gperm, axis=1), lperm, axis=2)
    x = jnp.where(cond[None], x, xf)
    x = jnp.take(x.reshape(R2, C), eff, axis=0)
    x = x.reshape(-1, Q2, 8, 128)
    out = jnp.einsum('rQgX,PhQg->rPhX', x, Wg, precision=HI)
    return jnp.reshape(out, (R2, C))


# ---- S3: lane shuffle alone ----------------------------------------
@jax.jit
def s3(st):
    x = jnp.reshape(st, (R2, 8, 128))
    x = jnp.take(x, lperm, axis=2)
    return jnp.reshape(x, (R2, C))


# ---- S4: exact split matmul-rotate ----------------------------------
perm_bits = list(range(10))
perm_bits[1], perm_bits[9] = perm_bits[9], perm_bits[1]
perm_bits[4], perm_bits[8] = perm_bits[8], perm_bits[4]
xi = np.arange(C, dtype=np.int64)
cperm_h = np.zeros_like(xi)
for i, p in enumerate(perm_bits):
    cperm_h |= ((xi >> p) & 1) << i
cperm = jnp.asarray(cperm_h.astype(np.int32))
P = jnp.zeros((C, C), jnp.float32).at[cperm, jnp.arange(C)].set(1.0)


@jax.jit
def s4(st, P):
    x = jnp.reshape(st, (R2, C))
    hi = jax.lax.convert_element_type(
        jax.lax.convert_element_type(x, jnp.bfloat16), jnp.float32)
    r1 = x - hi
    mid = jax.lax.convert_element_type(
        jax.lax.convert_element_type(r1, jnp.bfloat16), jnp.float32)
    lo = r1 - mid
    out = (jnp.dot(hi, P, precision=DEF) +
           jnp.dot(mid, P, precision=DEF) +
           jnp.dot(lo, P, precision=DEF))
    return out


# ---- S5: merged-K with 2D tail --------------------------------------
K2 = 2**(kh + kl + 1)


@jax.jit
def s5(st, W, eff):
    x = jnp.reshape(st, (R2, C))
    x = jnp.take(x, eff, axis=0)
    x = x.reshape(-1, K2, 2, 128)
    out = jnp.einsum('rKgX,PK->rPgX', x, W, precision=HI)
    return jnp.reshape(out, (R2, C))


W = jnp.eye(K2, dtype=jnp.float32)

st = jnp.zeros((R2, C), jnp.float32)
st = bench('S1  G-form gext (kh=2,kl=2)', s1, st, Wg, eff)
st = bench('S2  one lane<->G swap       ', s2, st)
st = bench('S2b two swaps               ', s2b, st)
st = bench('S2c swap + G-form one jit   ', s2c, st, Wg, eff)
st = bench('S3  lane XOR shuffle        ', s3, st)
st = bench('S4  exact 3-split matmul rot', s4, st, P)
st = bench('S5  merged-K 2D tail        ', s5, st, W, eff)
st = bench('S1  again                   ', s1, st, Wg, eff)

# exactness spot-check of S4 on random data (small)
xs = np.random.default_rng(0).standard_normal((4, C)).astype('f4')


@jax.jit
def s4s(x, P):
    hi = jax.lax.convert_element_type(
        jax.lax.convert_element_type(x, jnp.bfloat16), jnp.float32)
    r1 = x - hi
    mid = jax.lax.convert_element_type(
        jax.lax.convert_element_type(r1, jnp.bfloat16), jnp.float32)
    lo = r1 - mid
    return (jnp.dot(hi, P, precision=DEF) +
            jnp.dot(mid, P, precision=DEF) +
            jnp.dot(lo, P, precision=DEF))


got = np.asarray(s4s(jnp.asarray(xs), P))
want = xs[:, np.asarray(cperm)]
err = np.abs(got - want).max() / np.abs(want).max()
print(f"S4 exactness: rel err {err:.2e}", flush=True)
