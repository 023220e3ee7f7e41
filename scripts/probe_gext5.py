"""gext round-4 probe #2: cheap column rotation + identity extension.

probe_gext4 findings (28q, v5e, HIGHEST):
  row4 21.5 | gext 34.5 | einsum-only 19.4 | rotate(+col take) 73-75
  -> the column `jnp.take(x, cperm, axis=1)` costs ~40 ms (minor-axis
     gather breaks (8,128) tiles).  Candidates to replace it:

  R1  perm-matmul: the rotation is a BIT permutation of the column
      index spanning [p_min, 9]; on the view [R2, A, Y] (A = 2^(10-
      p_min), Y = 2^p_min) it is x' = einsum('rAY,BA->rBY', x, P) with
      P an exact 0/1 matrix — EXACT in f32 at HIGHEST (bf16x3 splits of
      x recombine exactly against an exact-bf16 operand).  MXU cost
      2^29*A*2*6/197e12: A=1024 -> 33 ms, 512 -> 17, 256 -> 8, 128 -> 4.
  R2  perm-matmul FUSED with the gext einsum in one program.
  X1  identity extension: skip rotation; contract (stack, hi, ALL col
      bits from 9 down to p_min) with U (x) I reordered — K2 grows
      2^(10-p_min).
  G1  row-gather with mode='clip' (skip FILL_OR_DROP bounds select).
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, '/root/repo')
from hybridq_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

n, L = 28, 10
R2, C = 2**(n - L + 1), 2**L
HI = jax.lax.Precision.HIGHEST


def block2(Ur, Ui):
    top = jnp.concatenate([Ur, -Ui], axis=1)
    bot = jnp.concatenate([Ui, Ur], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def build_W(Ur, Ui, uperm):
    Ur = jnp.take(jnp.take(Ur, uperm, axis=0), uperm, axis=1)
    Ui = jnp.take(jnp.take(Ui, uperm, axis=0), uperm, axis=1)
    return block2(Ur, Ui)


def mk_rotmm(A):
    """Column rotation as exact perm matmul on [R2, A, Y]."""
    Y = C // A

    def apply(st, P):
        x = jnp.reshape(st, (R2, A, Y))
        out = jnp.einsum('rAY,BA->rBY', x, P, precision=HI)
        return jnp.reshape(out, (R2, C))

    return jax.jit(apply, donate_argnums=(0,))


def mk_rotmm_gext(A, kh, kl):
    """R2: rotation perm-matmul + gext einsum, ONE program."""
    Y = C // A
    K2 = 2**(kh + kl + 1)
    Yg = C // 2**kl

    def apply(st, P, Ur, Ui, uperm, rp, inv_rowmap):
        x = jnp.reshape(st, (R2, A, Y))
        x = jnp.einsum('rAY,BA->rBY', x, P, precision=HI)
        W = build_W(Ur, Ui, uperm)
        eff = jnp.take(inv_rowmap, rp)
        x = jnp.take(jnp.reshape(x, (R2, C)), eff, axis=0)
        x = x.reshape(-1, K2, Yg)
        out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
        return jnp.reshape(out, (R2, C))

    return jax.jit(apply, donate_argnums=(0,))


def mk_xgext(kh, ext_bits):
    """X1: identity-extended gext — contract (stack, hi, top ext_bits
    column bits); gate already reordered/extended inside W (we pass an
    identity-extended eye so only the SHAPE matters for timing)."""
    K2 = 2**(kh + 1 + ext_bits)
    Y = C // 2**ext_bits

    def apply(st, W, rp, inv_rowmap):
        eff = jnp.take(inv_rowmap, rp)
        x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0)
        x = x.reshape(-1, K2, Y)
        out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
        return jnp.reshape(out, (R2, C))

    return jax.jit(apply, donate_argnums=(0,))


def mk_gext_clip(kh, kl):
    K2 = 2**(kh + kl + 1)
    Y = C // 2**kl

    def apply(st, Ur, Ui, uperm, rp, inv_rowmap):
        W = build_W(Ur, Ui, uperm)
        eff = jnp.take(inv_rowmap, rp, mode='clip')
        x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0,
                     mode='clip')
        x = x.reshape(-1, K2, Y)
        out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
        return jnp.reshape(out, (R2, C))

    return jax.jit(apply, donate_argnums=(0,))


def mk_row_clip(k):
    Q = 2**(k + 1)

    def apply(st, Ur, Ui, uperm, rp, inv_rowmap):
        W = build_W(Ur, Ui, uperm)
        eff = jnp.take(inv_rowmap, rp, mode='clip')
        x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0, mode='clip')
        x = x.reshape(-1, Q, C)
        out = jnp.einsum('rQc,PQ->rPc', x, W, precision=HI)
        return jnp.reshape(out, (R2, C))

    return jax.jit(apply, donate_argnums=(0,))


def mk_gext_wt(kh, kl):
    """gext with W transposed operand order ('rKY,KP->rPY')."""
    K2 = 2**(kh + kl + 1)
    Y = C // 2**kl

    def apply(st, Ur, Ui, uperm, rp, inv_rowmap):
        W = build_W(Ur, Ui, uperm).T
        eff = jnp.take(inv_rowmap, rp)
        x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0)
        x = x.reshape(-1, K2, Y)
        out = jnp.einsum('rKY,KP->rPY', x, W, precision=HI)
        return jnp.reshape(out, (R2, C))

    return jax.jit(apply, donate_argnums=(0,))


def sd(shape, dt='float32'):
    return jax.ShapeDtypeStruct(shape, dt)


def perm_arg(A):
    # a real bit-rotation: cyclic shift of the A-group bits
    bits = int(np.log2(A))
    i = np.arange(A, dtype=np.int64)
    j = ((i << 1) & (A - 1)) | (i >> (bits - 1))
    P = np.zeros((A, A), np.float32)
    P[j, i] = 1.0
    return jnp.asarray(P)


def gext_args(k):
    return (jnp.eye(2**k, dtype=jnp.float32),
            jnp.zeros((2**k, 2**k), jnp.float32),
            jnp.arange(2**k, dtype=jnp.int32),
            jnp.arange(R2, dtype=jnp.int32),
            jnp.arange(R2, dtype=jnp.int32))


VARIANTS = [
    ('R1 rotmm A=1024', mk_rotmm(1024), (sd((R2, C)), sd((1024, 1024))),
     lambda: (perm_arg(1024),)),
    ('R1 rotmm A=512', mk_rotmm(512), (sd((R2, C)), sd((512, 512))),
     lambda: (perm_arg(512),)),
    ('R1 rotmm A=256', mk_rotmm(256), (sd((R2, C)), sd((256, 256))),
     lambda: (perm_arg(256),)),
    ('R1 rotmm A=128', mk_rotmm(128), (sd((R2, C)), sd((128, 128))),
     lambda: (perm_arg(128),)),
    ('R2 rotmm512+gext31 fused', mk_rotmm_gext(512, 3, 1),
     (sd((R2, C)), sd((512, 512))) + tuple(
         [sd((16, 16)), sd((16, 16)), sd((16,), 'int32'),
          sd((R2,), 'int32'), sd((R2,), 'int32')]),
     lambda: (perm_arg(512),) + gext_args(4)),
    ('X1 xgext kh=3 ext=3 (K2=128)', mk_xgext(3, 3),
     (sd((R2, C)), sd((128, 128)), sd((R2,), 'int32'),
      sd((R2,), 'int32')),
     lambda: (jnp.eye(128, dtype=jnp.float32),
              jnp.arange(R2, dtype=jnp.int32),
              jnp.arange(R2, dtype=jnp.int32))),
    ('X1 xgext kh=3 ext=4 (K2=256)', mk_xgext(3, 4),
     (sd((R2, C)), sd((256, 256)), sd((R2,), 'int32'),
      sd((R2,), 'int32')),
     lambda: (jnp.eye(256, dtype=jnp.float32),
              jnp.arange(R2, dtype=jnp.int32),
              jnp.arange(R2, dtype=jnp.int32))),
    ('X1 xgext kh=3 ext=5 (K2=512)', mk_xgext(3, 5),
     (sd((R2, C)), sd((512, 512)), sd((R2,), 'int32'),
      sd((R2,), 'int32')),
     lambda: (jnp.eye(512, dtype=jnp.float32),
              jnp.arange(R2, dtype=jnp.int32),
              jnp.arange(R2, dtype=jnp.int32))),
    ('X1 xgext kh=3 ext=6 (K2=1024)', mk_xgext(3, 6),
     (sd((R2, C)), sd((1024, 1024)), sd((R2,), 'int32'),
      sd((R2,), 'int32')),
     lambda: (jnp.eye(1024, dtype=jnp.float32),
              jnp.arange(R2, dtype=jnp.int32),
              jnp.arange(R2, dtype=jnp.int32))),
    ('G1 gext31 clip-gathers', mk_gext_clip(3, 1),
     (sd((R2, C)), sd((16, 16)), sd((16, 16)), sd((16,), 'int32'),
      sd((R2,), 'int32'), sd((R2,), 'int32')),
     lambda: gext_args(4)),
    ('G1 row4 clip-gathers', mk_row_clip(4),
     (sd((R2, C)), sd((16, 16)), sd((16, 16)), sd((16,), 'int32'),
      sd((R2,), 'int32'), sd((R2,), 'int32')),
     lambda: gext_args(4)),
    ('W1 gext31 W-transposed', mk_gext_wt(3, 1),
     (sd((R2, C)), sd((16, 16)), sd((16, 16)), sd((16,), 'int32'),
      sd((R2,), 'int32'), sd((R2,), 'int32')),
     lambda: gext_args(4)),
]


def main():
    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    t0 = time.time()

    def compile_one(item):
        name, fn, shapes, _ = item
        try:
            return name, fn.lower(*shapes).compile()
        except Exception as e:
            return name, f"FAIL {type(e).__name__}: {str(e)[:150]}"

    with ThreadPoolExecutor(max_workers=8) as pool:
        compiled = dict(pool.map(compile_one, VARIANTS))
    print(f"# compiled {len(VARIANTS)} programs in {time.time()-t0:.0f}s",
          flush=True)

    def sync(x):
        return float(np.asarray(x[:1, :1])[0, 0])

    st = jnp.zeros((R2, C), jnp.float32)
    sync(st)
    t0 = time.perf_counter()
    sync(st)
    sync(st)
    t_sync = (time.perf_counter() - t0) / 2

    reps = 6
    for name, fn, shapes, argmk in VARIANTS:
        exe = compiled[name]
        if isinstance(exe, str):
            print(f"{name:32s}: {exe}", flush=True)
            continue
        args = argmk()
        st = exe(st, *args)
        sync(st)
        t0 = time.perf_counter()
        for _ in range(reps):
            st = exe(st, *args)
        sync(st)
        ms = max((time.perf_counter() - t0 - t_sync) / reps, 1e-4) * 1e3
        print(f"{name:32s}: {ms:7.1f} ms", flush=True)


if __name__ == '__main__':
    main()
