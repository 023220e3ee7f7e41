"""Probe: does jax's persistent compilation cache work on the axon
backend?  Run twice; the second run should hit the on-disk cache and
skip the remote compile service entirely.

Usage: python scripts/test_compile_cache.py [tag]
"""
import os
import sys
import time

import jax
import numpy as np

CACHE = '/root/repo/.xla_cache'

jax.config.update('jax_compilation_cache_dir', CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
# Log cache activity.
import logging
logging.getLogger('jax._src.compilation_cache').setLevel(logging.DEBUG)
logging.getLogger('jax._src.compiler').setLevel(logging.DEBUG)
logging.basicConfig(level=logging.DEBUG, stream=sys.stderr)
for name in ('urllib3', 'requests', 'filelock'):
    logging.getLogger(name).setLevel(logging.WARNING)

tag = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0


@jax.jit
def f(x, y):
    # Distinctive program (tag baked in as a constant).
    z = x @ y * tag
    return z.sum() + (x * y).sum()


x = np.ones((512, 512), np.float32)
y = np.ones((512, 512), np.float32)

t0 = time.time()
out = f(x, y)
v = float(np.asarray(out))
t1 = time.time()
print(f"RESULT value={v} compile+run={t1 - t0:.1f}s", flush=True)
print("cache dir contents:", os.listdir(CACHE) if os.path.isdir(CACHE)
      else 'MISSING', flush=True)
