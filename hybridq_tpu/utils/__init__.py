"""Generic utilities: heterogeneous sorting, linear algebra helpers.

TPU-native rebuild of the helpers in the reference implementation
(``hybridq/utils/utils.py``).  The aligned-array machinery
(``hybridq/utils/aligned``) and the ctypes SIMD bindings
(``hybridq/utils/dot.py``, ``transpose.py``) are intentionally absent: on
TPU, XLA owns array layout and the gate/permutation kernels live in
``hybridq_tpu.simulation.kernels``.
"""

from hybridq_tpu.utils.sorting import sort, argsort
from hybridq_tpu.utils.linalg import svd, kron, isunitary

__all__ = [
    'sort', 'argsort', 'svd', 'kron', 'isunitary', 'isintegral', 'isnumber',
    'to_list'
]


def isintegral(x) -> bool:
    """Return True if ``x`` converts to ``int`` without loss."""
    try:
        return int(x) == x
    except (TypeError, ValueError):
        return False


def isnumber(x) -> bool:
    """Return True if ``x`` converts to ``float``."""
    try:
        float(x)
    except (TypeError, ValueError):
        return False
    return True


def to_list(x, value_type=lambda v: v, list_type=list):
    """Convert ``x`` to a list, mapping every element through ``value_type``."""
    return list_type(value_type(v) for v in x)
