"""Single-chip state-vector evolution engine (JAX/XLA, split-complex).

TPU-native replacement for the reference C++ AVX core
(``include/U.h``, ``include/swap.h`` driven by
``hybridq/circuit/simulation/simulation.py:464-678``).

Design:
  * **Split-complex layout.** The state is a pair of real arrays
    ``(re, im)`` of shape ``(2,)*n`` each.  The TPU backend has no complex
    arithmetic; more importantly, split-complex keeps every contraction a
    *real* matmul that maps directly onto the MXU — the same layout the
    reference's C++ core uses (``python_U.cpp:114-123`` splits re/im).
    Complex gate application is four real tensordots:
    ``re' = Ur·re − Ui·im``, ``im' = Ur·im + Ui·re``.
  * **Relabel instead of transpose.** Axis ``i`` of the state holds the
    qubit at position ``i`` of a logical axis map, not necessarily qubit
    ``i``: each gate contraction brings its qubit axes to the front and we
    update the map rather than transposing back — the XLA analog of the
    reference's relabel-and-swap scheduling (``simulation.py:512-630``).
    One final transpose restores sorted order.
  * The whole gate sequence of a circuit segment is traced once and
    compiled by XLA; gate matrices are runtime arguments so structurally
    identical circuits reuse the compiled executable.  Input buffers are
    donated so XLA can round-robin two 2^n allocations instead of one per
    gate.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

__all__ = ['make_evolver', 'evolve_statevector', 'apply_gate_split',
           'clear_cache', 'split_complex', 'merge_complex']

_EVOLVER_CACHE: dict = {}


def clear_cache():
    """Drop all compiled evolvers (frees XLA executables)."""
    _EVOLVER_CACHE.clear()


def split_complex(psi, float_type='float32'):
    """Host complex array -> (re, im) float pair."""
    psi = np.asarray(psi)
    return (np.ascontiguousarray(psi.real, dtype=float_type),
            np.ascontiguousarray(psi.imag, dtype=float_type))


def merge_complex(re, im, complex_type='complex64'):
    """(re, im) pair -> host complex array."""
    out = np.asarray(re).astype(complex_type)
    out += 1j * np.asarray(im).astype(np.asarray(re).dtype)
    return out


def apply_gate_split(re, im, Ur, Ui, in_axes: Tuple[int, ...], k: int):
    """Apply one complex gate to a split state; gate axes land in front.

    Four real tensordots (XLA CSEs the shared operand transpose, and the
    matmuls run on the MXU)."""
    import jax
    import jax.numpy as jnp

    # HIGHEST: TPU matmuls default to bf16 inputs (~1e-2 accuracy).
    hi = jax.lax.Precision.HIGHEST
    Ur = jnp.reshape(Ur, (2,) * (2 * k))
    Ui = jnp.reshape(Ui, (2,) * (2 * k))
    caxes = (tuple(range(k, 2 * k)), tuple(in_axes))
    rr = jnp.tensordot(Ur, re, axes=caxes, precision=hi)
    ri = jnp.tensordot(Ur, im, axes=caxes, precision=hi)
    ir = jnp.tensordot(Ui, re, axes=caxes, precision=hi)
    ii = jnp.tensordot(Ui, im, axes=caxes, precision=hi)
    return rr - ii, ri + ir


def _plan_gate_view(layout, qs, n_qubits):
    """Compute the low-rank reshape isolating the gate qubits.

    ``layout[p]`` is the qubit stored at bit position ``p`` (0 = most
    significant bit of the flat 2^n index).  Returns
    ``(shape, in_axes, new_layout)``: the segment shape exposing each gate
    qubit as its own size-2 axis (rank ≤ 2k+1), the axis of each gate
    qubit in ``qs`` order, and the bit layout after the contraction puts
    the gate qubits in front.
    """
    pos_of = {q: p for p, q in enumerate(layout)}
    ps = [pos_of[q] for q in qs]
    sorted_ps = sorted(ps)
    shape = []
    axis_of_pos = {}
    prev = 0
    for p in sorted_ps:
        if p > prev:
            shape.append(2**(p - prev))
        axis_of_pos[p] = len(shape)
        shape.append(2)
        prev = p + 1
    if n_qubits > prev:
        shape.append(2**(n_qubits - prev))
    in_axes = [axis_of_pos[p] for p in ps]
    new_layout = list(qs) + [q for p, q in enumerate(layout)
                             if p not in set(ps)]
    return tuple(shape), in_axes, new_layout


def _trace_evolution(state, mats, axes_list: Tuple[Tuple[int, ...], ...],
                     n_qubits: int, restore: bool = True):
    """Apply a sequence of gates to the split state (traced under jit).

    ``state = (re, im)`` flat or shaped; ``mats = list of (Ur, Ui)``
    pairs; ``axes_list[i]`` are the qubit indices gate ``i`` acts on.

    The state is kept *flat* (one 2^n vector); each gate reshapes it to a
    rank ≤ 2k+1 segment view exposing exactly the gate qubits, contracts,
    and flattens back — tensor ranks stay small no matter how many qubits
    (XLA compile time scales badly with rank; the reference C++ core
    works on the flat array with bit arithmetic for the same reason,
    ``include/utils.h:79-105``).  The qubit→bit layout is tracked host-
    side and restored with one final transpose (grouped into the same
    low-rank segment views).
    """
    import jax.numpy as jnp

    re, im = state
    re = jnp.reshape(re, (-1,))
    im = jnp.reshape(im, (-1,))
    layout = list(range(n_qubits))  # layout[p] = qubit at bit position p

    for (Ur, Ui), qs in zip(mats, axes_list):
        k = len(qs)
        shape, in_axes, layout = _plan_gate_view(layout, qs, n_qubits)
        re_v = jnp.reshape(re, shape)
        im_v = jnp.reshape(im, shape)
        re_v, im_v = apply_gate_split(re_v, im_v, Ur, Ui, in_axes, k)
        re = jnp.reshape(re_v, (-1,))
        im = jnp.reshape(im_v, (-1,))

    if restore and layout != list(range(n_qubits)):
        re = _permute_bits(re, layout, n_qubits)
        im = _permute_bits(im, layout, n_qubits)
    # Stay FLAT: rank-n (2,)*n device arrays are pathologically
    # tile-padded on TPU; callers reshape on host.
    return re, im


def _permute_bits(flat, layout, n_qubits):
    """Restore bit order so that bit p holds qubit p.

    Groups contiguous runs of the permutation so the transpose happens on
    the lowest-rank view possible (a handful of segments rather than a
    rank-n array)."""
    import jax.numpy as jnp

    # target: layout == identity.  Work on the inverse permutation:
    # out_bit p must read in_bit pos_of[p].
    pos_of = {q: p for p, q in enumerate(layout)}
    src = [pos_of[q] for q in range(n_qubits)]  # out bit p <- in bit src[p]
    # Group contiguous ascending runs in src.
    runs = []  # (start_bit, length)
    start = src[0]
    length = 1
    for x in src[1:]:
        if x == start + length:
            length += 1
        else:
            runs.append((start, length))
            start, length = x, 1
    runs.append((start, length))
    if len(runs) == 1:
        return flat
    # View the input as segments in *input* order, then transpose to the
    # output run order.
    in_runs = sorted(runs)
    shape = tuple(2**l for (_, l) in in_runs)
    perm = tuple(in_runs.index(r) for r in runs)
    return jnp.reshape(jnp.transpose(jnp.reshape(flat, shape), perm), (-1,))


def make_evolver(axes_list: Sequence[Sequence[int]], n_qubits: int,
                 float_type='float32', donate: bool = True):
    """Compiled ``run((re, im), mats) -> (re, im)`` for a gate-axes
    structure.  Cached on (axes, n_qubits, dtype)."""
    import jax

    axes_key = tuple(tuple(int(q) for q in qs) for qs in axes_list)
    key = (axes_key, int(n_qubits), str(float_type), bool(donate))
    fn = _EVOLVER_CACHE.get(key)
    if fn is None:
        traced = functools.partial(_trace_evolution, axes_list=axes_key,
                                   n_qubits=int(n_qubits))
        fn = jax.jit(traced, donate_argnums=(0,) if donate else ())
        _EVOLVER_CACHE[key] = fn
    return fn


def split_matrices(gates, complex_type='complex64'):
    """Gate list -> list of (Ur, Ui) device arrays + axes tuples."""
    import jax.numpy as jnp

    float_type = np.real(np.zeros(1, dtype=complex_type)).dtype
    mats = []
    for g in gates:
        U = np.ascontiguousarray(g.matrix().astype(complex_type))
        mats.append((jnp.asarray(U.real, dtype=float_type),
                     jnp.asarray(U.imag, dtype=float_type)))
    return mats


def evolve_statevector(psi, gates, qubit_index, n_qubits: int,
                       complex_type='complex64', block_until_ready=True):
    """Evolve a state through a list of matrix gates.

    ``psi`` may be a host complex array of shape ``(2,)*n`` or an already
    split ``(re, im)`` device pair; the return matches the input form.
    """
    import jax.numpy as jnp

    float_type = np.real(np.zeros(1, dtype=complex_type)).dtype
    split_input = isinstance(psi, (tuple, list))
    if split_input:
        re, im = psi
        re = jnp.reshape(re, (-1,))
        im = jnp.reshape(im, (-1,))
    else:
        re_h, im_h = split_complex(psi, float_type)
        re = jnp.asarray(re_h.reshape(-1))
        im = jnp.asarray(im_h.reshape(-1))

    mats = split_matrices(gates, complex_type)
    axes_list = [tuple(qubit_index[q] for q in g.qubits) for g in gates]

    if mats:
        run = make_evolver(axes_list, n_qubits, float_type)
        re, im = run((re, im), mats)
        if block_until_ready:
            im.block_until_ready()
    if split_input:
        return re, im
    return merge_complex(re, im, complex_type).reshape((2,) * n_qubits)
