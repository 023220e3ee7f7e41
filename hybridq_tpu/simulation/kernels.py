"""Runtime-position gate-application kernels.

The core performance problem on this hardware is *compile amortization*:
XLA compiles one executable per traced program, and a distinct program per
gate-position pattern means minutes of compilation for a deep circuit.
The reference solves the analogous problem in C++ with a single
runtime-position kernel (``include/U.h:123-202``: positions are function
arguments, not template parameters).  This module is the XLA equivalent:

  * the state is a *flat* split-complex pair ``(re, im)`` of length 2^n
    in fixed canonical bit order (bit ``n-1-i`` of the index holds qubit
    ``i`` — C order of the ``(2,)*n`` view).  The data never gets
    relabeled or unpermuted;
  * one jitted program per (n, k_hi, k_lo) gate-size class takes the
    gate matrix **and the qubit bit positions as runtime arguments**;
    applying any k-qubit gate anywhere costs zero recompiles;
  * the state is viewed as a ``[2^(n-L), 2^L]`` matrix (rows of 2^L
    contiguous amplitudes — multiples of the f32 (8,128) tile).  Gate
    bits ≥ L index *rows*: applying the gate is a gather of 2^k_hi row
    blocks, four real MXU matmuls, and a scatter back.  Gate bits < L
    index *columns* within rows and gather on the minor axis.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

__all__ = ['IndexedEvolver', 'DEFAULT_ROW_BITS']

DEFAULT_ROW_BITS = 10  # 2^10 f32 = one (8, 128) tile of 4 KiB

_KERNEL_CACHE: dict = {}


def _expand_bits(g, sorted_pos, k):
    """Insert a zero bit at each of ``sorted_pos`` (ascending, traced)
    into every integer of ``g`` — the pdep-style index expansion of the
    reference (``include/utils.h:79-105``)."""
    idx = g
    for j in range(k):
        p = sorted_pos[j]
        low = idx & ((1 << p) - 1)
        idx = ((idx >> p) << (p + 1)) | low
    return idx


def _offsets(pos, k):
    """offsets[b] = sum_j bit_j(b) << pos[j] for b in [0, 2^k)."""
    import jax.numpy as jnp

    b = jnp.arange(2**k, dtype=jnp.int32)
    # bit j of b is the significance of pos[j]: b's MSB pairs with pos[0].
    bits = (b[:, None] >> jnp.arange(k - 1, -1, -1, dtype=jnp.int32)[None])\
        & 1
    return jnp.sum(bits << pos[None, :], axis=1)


def _build_kernel(n: int, k_hi: int, k_lo: int, L: int):
    """Jitted ``(re, im, Ur, Ui, hi_pos, lo_pos) -> (re, im)``.

    ``hi_pos``: bit positions (relative to the row index, i.e. already
    shifted down by L) of the gate qubits living in the row part,
    most-significant gate bit first.  ``lo_pos``: positions < L of the
    gate qubits in the column part.  The gate matrix must be ordered so
    its index bits are ``[hi..., lo...]``.
    """
    import jax
    import jax.numpy as jnp

    k = k_hi + k_lo
    R = 2**(n - L) if n > L else 1
    C = 2**min(L, n)
    Rg = R // 2**k_hi
    Cg = C // 2**k_lo

    def apply(re, im, Ur, Ui, hi_pos, lo_pos):
        re = jnp.reshape(re, (R, C))
        im = jnp.reshape(im, (R, C))

        # Row gather ------------------------------------------------------
        if k_hi:
            row_base = _expand_bits(
                jnp.arange(Rg, dtype=jnp.int32), jnp.sort(hi_pos), k_hi)
            row_idx = row_base[None, :] + _offsets(hi_pos, k_hi)[:, None]
            g_re = re[row_idx]          # [2^kh, Rg, C]
            g_im = im[row_idx]
        else:
            row_idx = None
            g_re = re[None]             # [1, R, C]
            g_im = im[None]

        # Column gather ---------------------------------------------------
        if k_lo:
            col_base = _expand_bits(
                jnp.arange(Cg, dtype=jnp.int32), jnp.sort(lo_pos), k_lo)
            col_idx = col_base[None, :] + _offsets(lo_pos, k_lo)[:, None]
            s_re = jnp.take(g_re, col_idx, axis=2)  # [2^kh, Rg, 2^kl, Cg]
            s_im = jnp.take(g_im, col_idx, axis=2)
        else:
            col_idx = None
            s_re = g_re[:, :, None, :]
            s_im = g_im[:, :, None, :]

        # Contract on the MXU --------------------------------------------
        # [2^kh, Rg, 2^kl, Cg] -> [2^kh * 2^kl, Rg * Cg]
        t_re = jnp.transpose(s_re, (0, 2, 1, 3)).reshape(2**k, -1)
        t_im = jnp.transpose(s_im, (0, 2, 1, 3)).reshape(2**k, -1)
        o_re = Ur @ t_re - Ui @ t_im
        o_im = Ur @ t_im + Ui @ t_re
        o_re = jnp.transpose(
            o_re.reshape(2**k_hi, 2**k_lo, Rg, Cg), (0, 2, 1, 3))
        o_im = jnp.transpose(
            o_im.reshape(2**k_hi, 2**k_lo, Rg, Cg), (0, 2, 1, 3))

        # Scatter back ----------------------------------------------------
        if k_lo:
            g_re = g_re.at[:, :, col_idx].set(o_re)
            g_im = g_im.at[:, :, col_idx].set(o_im)
        else:
            g_re = o_re.reshape(g_re.shape)
            g_im = o_im.reshape(g_im.shape)
        if k_hi:
            re = re.at[row_idx].set(g_re)
            im = im.at[row_idx].set(g_im)
        else:
            re = g_re[0]
            im = g_im[0]
        return jnp.reshape(re, (-1,)), jnp.reshape(im, (-1,))

    return jax.jit(apply, donate_argnums=(0, 1))


class IndexedEvolver:
    """Single-chip evolution with one compiled kernel per gate-size class.

    Usage::

        ev = IndexedEvolver(n_qubits)
        state = ev.prepare_state('0' * n)     # split pair, flat
        state = ev.apply_gates(state, gates, qubit_index)
        psi = ev.gather(state)                # (2,)*n complex host array
    """

    def __init__(self, n_qubits: int, float_type='float32',
                 row_bits: int = DEFAULT_ROW_BITS):
        self.n = int(n_qubits)
        self.L = min(int(row_bits), self.n)
        self.float_type = np.dtype(float_type)

    def _kernel(self, k_hi, k_lo):
        key = (self.n, k_hi, k_lo, self.L, str(self.float_type))
        fn = _KERNEL_CACHE.get(key)
        if fn is None:
            fn = _build_kernel(self.n, k_hi, k_lo, self.L)
            _KERNEL_CACHE[key] = fn
        return fn

    def prepare_state(self, state: str):
        from hybridq_tpu.simulation.prepare import prepare_state_split
        import jax.numpy as jnp

        re, im = prepare_state_split(state, float_type=self.float_type)
        return jnp.reshape(re, (-1,)), jnp.reshape(im, (-1,))

    def apply_gate(self, state, U: np.ndarray, qubits: Tuple[int, ...]):
        """Apply one gate; ``qubits`` are dense indices in [0, n)."""
        import jax.numpy as jnp

        re, im = state
        n, L = self.n, self.L
        # Bit position of qubit i (from the LSB): n - 1 - i.
        bits = [n - 1 - q for q in qubits]
        hi = [(b, j) for j, b in enumerate(bits) if b >= L]
        lo = [(b, j) for j, b in enumerate(bits) if b < L]
        k = len(bits)

        # Reorder U so its index bits are [hi..., lo...] in kernel order.
        order = [j for _, j in hi] + [j for _, j in lo]
        if order != list(range(k)):
            perm = order + [k + j for j in order]
            U = np.reshape(
                np.transpose(np.reshape(U, (2,) * (2 * k)), perm),
                (2**k, 2**k))

        ftype = self.float_type
        Ur = jnp.asarray(np.ascontiguousarray(U.real), dtype=ftype)
        Ui = jnp.asarray(np.ascontiguousarray(U.imag), dtype=ftype)
        hi_pos = jnp.asarray([b - L for b, _ in hi], dtype=jnp.int32)
        lo_pos = jnp.asarray([b for b, _ in lo], dtype=jnp.int32)
        fn = self._kernel(len(hi), len(lo))
        return fn(re, im, Ur, Ui, hi_pos, lo_pos)

    def apply_gates(self, state, gates, qubit_index):
        for g in gates:
            U = np.ascontiguousarray(g.matrix())
            qs = tuple(qubit_index[q] for q in g.qubits)
            state = self.apply_gate(state, U, qs)
        return state

    def gather(self, state, complex_type='complex64') -> np.ndarray:
        re, im = state
        out = np.asarray(re).astype(complex_type)
        out += 1j * np.asarray(im).astype(self.float_type)
        return out.reshape((2,) * self.n)
