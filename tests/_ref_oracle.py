"""Import helper for the reference implementation at /root/reference.

The reference needs ``numba`` (absent here); only ``numba.vectorize`` and
``numba.njit`` are used, so a pure-Python stub is enough to run it as an
oracle (slow, test-sized workloads only).
"""

import sys
import types

import numpy as np


def import_reference():
    """Return the reference ``hybridq`` package, or None if unavailable."""
    if 'numba' not in sys.modules:
        numba = types.ModuleType('numba')

        def njit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda f: f

        numba.njit = njit
        numba.jit = njit
        numba.vectorize = lambda *a, **k: (
            np.vectorize(a[0]) if a and callable(a[0])
            else (lambda f: np.vectorize(f)))
        numba.prange = range
        sys.modules['numba'] = numba

    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    try:
        import hybridq
        return hybridq
    except Exception:
        return None
