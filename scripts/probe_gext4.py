"""gext-kernel forensics at 28q (round 4).

Round-3 calibration measured the production gext class at ~74 ms while
the bare-einsum probe (probe_ext_forms.py E2) measured 38 ms.  The
production kernel differs from the probe in: (a) W is built ON DEVICE
from (Ur, Ui, uperm) with no optimization_barrier — XLA may fuse the
build into the einsum and recompute it per output tile (the ext kernel
documents 6-10x slowdowns from exactly this); (b) jnp.take defaults to
bounds-checked FILL_OR_DROP gathers; (c) the rotate variant pays a
separate column-gather pass.  This probe isolates each.

All programs AOT-compile CONCURRENTLY (remote compile service queues
minutes per program).  Run alone on the chip (one TPU process at a
time).
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from functools import partial

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


def mk_gext(kh, kl, barrier, mode=None, rotate='no', warg=False,
            prec=HI):
    K2 = 2**(kh + kl + 1)
    Y = C // 2**kl
    tk = partial(jnp.take, mode=mode) if mode else jnp.take

    if warg:
        def apply(st, W, rp, inv_rowmap, cperm=None):
            eff = tk(inv_rowmap, rp)
            x = jnp.reshape(st, (R2, C))
            if rotate == 'pre':
                x = tk(x, cperm, axis=1)
            x = tk(x, eff, axis=0)
            x = x.reshape(-1, K2, Y)
            out = jnp.einsum('rKY,PK->rPY', x, W, precision=prec)
            out = jnp.reshape(out, (R2, C))
            if rotate == 'post':
                out = tk(out, cperm, axis=1)
            return out
    else:
        def apply(st, Ur, Ui, uperm, rp, inv_rowmap, cperm=None):
            W = build_W(Ur, Ui, uperm)
            if barrier:
                W = jax.lax.optimization_barrier(W)
            eff = tk(inv_rowmap, rp)
            x = jnp.reshape(st, (R2, C))
            if rotate == 'pre':
                x = tk(x, cperm, axis=1)
            elif rotate == '2d':
                x = x[eff[:, None], cperm[None, :]]
                x = x.reshape(-1, K2, Y)
                out = jnp.einsum('rKY,PK->rPY', x, W, precision=prec)
                return jnp.reshape(out, (R2, C))
            x = tk(x, eff, axis=0)
            x = x.reshape(-1, K2, Y)
            out = jnp.einsum('rKY,PK->rPY', x, W, precision=prec)
            out = jnp.reshape(out, (R2, C))
            if rotate == 'post':
                out = tk(out, cperm, axis=1)
            return out

    return jax.jit(apply, donate_argnums=(0,))


def mk_gext_noeff(kh, kl):
    """No row gather at all — einsum-only floor (W built, barrier)."""
    K2 = 2**(kh + kl + 1)
    Y = C // 2**kl

    def apply(st, Ur, Ui, uperm):
        W = jax.lax.optimization_barrier(build_W(Ur, Ui, uperm))
        x = jnp.reshape(st, (R2, C)).reshape(-1, K2, Y)
        out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
        return jnp.reshape(out, (R2, C))

    return jax.jit(apply, donate_argnums=(0,))


def mk_row(k, barrier):
    Q = 2**(k + 1)

    def apply(st, Ur, Ui, uperm, rp, inv_rowmap):
        W = build_W(Ur, Ui, uperm)
        if barrier:
            W = jax.lax.optimization_barrier(W)
        eff = jnp.take(inv_rowmap, rp)
        x = jnp.take(jnp.reshape(st, (R2, C)), eff, axis=0)
        x = x.reshape(-1, Q, C)
        out = jnp.einsum('rQc,PQ->rPc', x, W, precision=HI)
        return jnp.reshape(out, (R2, C))

    return jax.jit(apply, donate_argnums=(0,))


def mk_copy():
    def apply(st):
        return jnp.reshape(st, (R2, C)) + jnp.float32(0.0)

    return jax.jit(apply, donate_argnums=(0,))


def mk_double_gext(kh, kl):
    """Two sequential gext applications in ONE program."""
    K2 = 2**(kh + kl + 1)
    Y = C // 2**kl

    def one(x, Ur, Ui, uperm, eff):
        W = jax.lax.optimization_barrier(build_W(Ur, Ui, uperm))
        x = jnp.take(x, eff, axis=0)
        x = x.reshape(-1, K2, Y)
        out = jnp.einsum('rKY,PK->rPY', x, W, precision=HI)
        return jnp.reshape(out, (R2, C))

    def apply(st, Ur, Ui, uperm, rp, inv_rowmap):
        eff = jnp.take(inv_rowmap, rp)
        x = jnp.reshape(st, (R2, C))
        x = one(x, Ur, Ui, uperm, eff)
        x = one(x, Ur, Ui, uperm, eff)
        return x

    return jax.jit(apply, donate_argnums=(0,))


def sd(shape, dt='float32'):
    return jax.ShapeDtypeStruct(shape, dt)


def gext_shapes(kh, kl, rotate='no', warg=False):
    k = kh + kl
    st = sd((R2, C))
    if warg:
        args = (st, sd((2**(k + 1) * 2,) * 0 or (2 * 2**k, 2 * 2**k)),
                sd((R2,), 'int32'), sd((R2,), 'int32'))
    else:
        args = (st, sd((2**k, 2**k)), sd((2**k, 2**k)),
                sd((2**k,), 'int32'), sd((R2,), 'int32'),
                sd((R2,), 'int32'))
    if rotate in ('pre', 'post', '2d'):
        args = args + (sd((C,), 'int32'),)
    return args


def row_shapes(k):
    st = sd((R2, C))
    return (st, sd((2**k, 2**k)), sd((2**k, 2**k)), sd((2**k,), 'int32'),
            sd((R2,), 'int32'), sd((R2,), 'int32'))


VARIANTS = []


def add(name, fn, shapes, argmk):
    VARIANTS.append((name, fn, shapes, argmk))


def gext_args(kh, kl, rotate='no', warg=False):
    k = kh + kl
    if warg:
        base = (jnp.eye(2 * 2**k, dtype=jnp.float32),
                jnp.arange(R2, dtype=jnp.int32),
                jnp.arange(R2, dtype=jnp.int32))
    else:
        base = (jnp.eye(2**k, dtype=jnp.float32),
                jnp.zeros((2**k, 2**k), jnp.float32),
                jnp.arange(2**k, dtype=jnp.int32),
                jnp.arange(R2, dtype=jnp.int32),
                jnp.arange(R2, dtype=jnp.int32))
    if rotate in ('pre', 'post', '2d'):
        base = base + (jnp.arange(C, dtype=jnp.int32),)
    return base


def row_args(k):
    return (jnp.eye(2**k, dtype=jnp.float32),
            jnp.zeros((2**k, 2**k), jnp.float32),
            jnp.arange(2**k, dtype=jnp.int32),
            jnp.arange(R2, dtype=jnp.int32),
            jnp.arange(R2, dtype=jnp.int32))


add('copy (floor)', mk_copy(), (sd((R2, C)),), lambda: ())
add('row4 prod', mk_row(4, False), row_shapes(4), lambda: row_args(4))
add('row4 +barrier', mk_row(4, True), row_shapes(4), lambda: row_args(4))
add('gext31 prod (no barrier)', mk_gext(3, 1, False),
    gext_shapes(3, 1), lambda: gext_args(3, 1))
add('gext31 +barrier', mk_gext(3, 1, True),
    gext_shapes(3, 1), lambda: gext_args(3, 1))
add('gext31 +barrier +inbounds',
    mk_gext(3, 1, True, mode='promise_in_bounds'),
    gext_shapes(3, 1), lambda: gext_args(3, 1))
add('gext31 W-as-arg', mk_gext(3, 1, True, warg=True),
    gext_shapes(3, 1, warg=True), lambda: gext_args(3, 1, warg=True))
add('gext22 +barrier', mk_gext(2, 2, True),
    gext_shapes(2, 2), lambda: gext_args(2, 2))
add('gext31 noeff (einsum floor)', mk_gext_noeff(3, 1),
    (sd((R2, C)), sd((16, 16)), sd((16, 16)), sd((16,), 'int32')),
    lambda: (jnp.eye(16, dtype=jnp.float32),
             jnp.zeros((16, 16), jnp.float32),
             jnp.arange(16, dtype=jnp.int32)))
add('gext31 rotate-pre', mk_gext(3, 1, True, rotate='pre'),
    gext_shapes(3, 1, 'pre'), lambda: gext_args(3, 1, 'pre'))
add('gext31 rotate-post', mk_gext(3, 1, True, rotate='post'),
    gext_shapes(3, 1, 'post'), lambda: gext_args(3, 1, 'post'))
add('gext31 rotate-2d', mk_gext(3, 1, False, rotate='2d'),
    gext_shapes(3, 1, '2d'), lambda: gext_args(3, 1, '2d'))
add('gext31 HIGH prec', mk_gext(3, 1, True, prec=jax.lax.Precision.HIGH),
    gext_shapes(3, 1), lambda: gext_args(3, 1))
add('gext31 x2-in-one-program', mk_double_gext(3, 1),
    gext_shapes(3, 1), lambda: gext_args(3, 1))


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
            print(f"{name:34s}: {exe}", flush=True)
            continue
        args = argmk()
        st = exe(st, *args)
        sync(st)
        t0 = time.perf_counter()
        for _ in range(reps):
            st = exe(st, *args)
        sync(st)
        ms = max((time.perf_counter() - t0 - t_sync) / reps, 1e-4) * 1e3
        if 'x2' in name:
            ms /= 2
        print(f"{name:34s}: {ms:7.1f} ms", flush=True)


if __name__ == '__main__':
    main()
