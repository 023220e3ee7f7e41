"""Quick HBM bandwidth probe on the real chip: full-state copy and one
row-class gate at 28q.  Compares against the round-2 reference numbers
(copy ~11 ms, row gate ~25 ms) to tell device/tunnel degradation apart
from kernel regressions.
"""
import time

import numpy as np

from hybridq_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

n = 28


@jax.jit
def copy(x):
    return x + 1.0


def sync(x):
    return float(np.asarray(x[0][:1] if x.ndim > 1 else x[:1])[0])


x = jnp.zeros((2, 2**n), jnp.float32)
x = copy(x)
sync(x)
t0 = time.perf_counter()
sync(x)
t_sync = time.perf_counter() - t0
print(f"sync overhead: {t_sync*1e3:.1f} ms", flush=True)

t0 = time.perf_counter()
for _ in range(8):
    x = copy(x)
dt = time.perf_counter() - t0
print(f"issue8: {dt*1e3:.1f}ms", flush=True)
sync(x)
dt = time.perf_counter() - t0 - t_sync
gb = 8 * 2 * (2 * 2**n * 4) / dt / 1e9
print(f"copy 2GB: {dt/8*1e3:.1f} ms -> {gb:.0f} GB/s (rw)", flush=True)

from hybridq_tpu.simulation.kernels import IndexedEvolver

ev = IndexedEvolver(n)
ev.warm(specs=[('row', (4,)), ('ext', (1, 3, False))], verbose=True)
st = ev.prepare_state('0' * n)
for kind, cls in (('row', (4,)), ('ext', (1, 3, False))):
    exe = ev._callable(kind, *cls)
    args = ev._calib_args(kind, cls)
    st = exe(st, *args)
    sync(st)
    t0 = time.perf_counter()
    for _ in range(6):
        st = exe(st, *args)
    sync(st)
    ms = (time.perf_counter() - t0 - t_sync) / 6 * 1e3
    print(f"{kind} {cls}: {ms:.1f} ms", flush=True)
