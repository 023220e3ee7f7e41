"""Initial/final state preparation.

Parity with the reference ``hybridq/circuit/simulation/utils.py:40-156``:
tokens '0', '1', '+', '-' build a product state of ``len(state)`` qubits.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ['prepare_state', 'prepare_state_jax', 'prepare_state_split',
           'TOKEN_VECTORS']

_SQRT2 = np.sqrt(2.0)

TOKEN_VECTORS = {
    '0': np.array([1.0, 0.0]),
    '1': np.array([0.0, 1.0]),
    '+': np.array([1.0, 1.0]) / _SQRT2,
    '-': np.array([1.0, -1.0]) / _SQRT2,
}


def _check_state(state, d) -> str:
    state = str(state)
    if set(state) - set('01+-'):
        raise ValueError(
            f"Symbols {set(state) - set('01+-')} are not allowed.")
    try:
        d = (int(d),) * len(state)
    except (TypeError, ValueError):
        d = tuple(int(x) for x in d)
    if len(d) != len(state):
        raise ValueError(
            "Number of qubits and dimensions are not consistent.")
    if any(x != 2 for x in d):
        raise ValueError("Only qubits of dimension 2 are supported.")
    return state


def prepare_state(state: str, d=2, complex_type='complex64') -> np.ndarray:
    """Dense product state of shape ``(2,)*n`` for a token string."""
    state = _check_state(state, d)
    psi = functools.reduce(np.multiply.outer,
                           (TOKEN_VECTORS[s] for s in state),
                           np.array(1.0))
    return np.asarray(psi, dtype=complex_type)


def prepare_state_jax(state: str, d=2, complex_type='complex64'):
    """Product state built directly on device (no 2^n host transfer).

    For the all-zeros state this is a single scatter; otherwise the product
    structure is materialized with a chain of outer products under jit.
    """
    import jax.numpy as jnp

    re, _ = prepare_state_split(state, d,
                                float_type=np.real(
                                    np.zeros(1, dtype=complex_type)).dtype)
    return re.astype(complex_type).reshape((2,) * len(_check_state(state,
                                                                   d)))


def prepare_state_split(state: str, d=2, float_type='float32'):
    """Split-complex product state on device: flat ``(re, im)`` float
    pair of shape ``(2^n,)``.

    All '01+-' token amplitudes are real, so ``im`` is zeros.  This is
    the native input format of the TPU engines (no complex dtype on the
    device backend; split-complex keeps contractions as real MXU
    matmuls).  The state stays FLAT: rank-n ``(2,)*n`` device arrays get
    tile-padded by orders of magnitude on TPU.
    """
    import jax.numpy as jnp

    state = _check_state(state, d)
    n = len(state)
    if set(state) <= {'0', '1'}:
        idx = int(state, 2)
        re = jnp.zeros((2**n,), dtype=float_type).at[idx].set(1)
    else:
        re = jnp.ones((1,), dtype=float_type)
        for s in state:
            vec = jnp.asarray(TOKEN_VECTORS[s], dtype=float_type)
            re = (re[:, None] * vec[None, :]).reshape(-1)
    return re, jnp.zeros_like(re)
