"""Persistent XLA compilation cache.

The shared remote TPU compile service has minutes-level, high-variance
queueing (measured: the same 512x512 matmul program took 251 s to
compile+load cold and 0.4 s from the on-disk cache).  Enabling jax's
persistent compilation cache makes every program a one-time cost per
machine: serialized executables are stored under ``.xla_cache/`` at the
repo root and reloaded by any later process — including AOT
``lower().compile()`` executables, which is how the evolver/TN warm
paths compile their kernel classes.

Call :func:`enable_persistent_cache` before the first compile (it is
harmless afterwards — jax picks the cache up for subsequent compiles).
All entry points do (``bench.py``, ``__graft_entry__.py``, the CLIs,
``simulate()`` itself).
"""

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), '.xla_cache')

_enabled = [False]


def enable_persistent_cache(path: str = None):
    """Point jax's persistent compilation cache at ``path`` (default:
    ``<repo>/.xla_cache``, overridable with ``HYBRIDQ_TPU_XLA_CACHE``;
    set that env var to ``0``/``off`` to disable).  Idempotent."""
    if _enabled[0]:
        return
    env = os.environ.get('HYBRIDQ_TPU_XLA_CACHE')
    if env is not None and env.lower() in ('0', 'off', 'none', ''):
        _enabled[0] = True
        return
    path = path or env or _DEFAULT_DIR
    try:
        import jax
        # CPU compiles are local and fast — don't fill the cache with
        # the test suite's thousands of tiny programs.
        if jax.default_backend() == 'cpu':
            _enabled[0] = True
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        # Cache everything: small programs pay the same remote queueing.
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          0.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        _enabled[0] = True
    except Exception:
        pass
