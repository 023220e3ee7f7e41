"""One-pass fused gate kernel (Pallas/Mosaic, in-place streaming).

The XLA runtime-position kernels (``kernels.py``) cost 3-12 one-pass
HBM traversals per gate (measured 21.5-74 ms at 28q against a 6.2 ms
read+write floor) because every gather, operator extension, and column
rotation is its own fused-but-materialized pass.  This module applies
a gate in ONE traversal: a double-buffered Pallas kernel streams the
state through VMEM in gathered runs and applies the gate as an MXU
matmul on the fly, writing each block back in place.

Measured primitives this design stands on (``scripts/probe_pallas_*``,
v5e):
  * in-place aliased streaming through an auto/manual-pipelined
    Pallas kernel reaches 637 GB/s (the plain-XLA ceiling is 695);
  * gathered-run DMA (the probe replicates exactly this kernel's
    access pattern) reaches 460 GB/s at 16 KiB runs;
  * ``precision=HIGHEST`` inside a kernel ``dot_general`` is exact to
    1.3e-7 (Mosaic's default f32 dot silently truncates to bf16).

Bit-range strategy for an ``[2^(n-6), 128]`` f32 state (stack bit =
top row bit; lanes = flat amplitude bits 0-6):

  * HIGH bits (flat >= 12, row >= 5): handled by DMA *addressing* —
    runs of 32 rows (16 KiB) are gathered per (stack x high-combo)
    group, so any high gate position costs nothing extra;
  * SUBLANE bits (flat 7-11, row 0-4): ride along inside the
    contracted axis via identity extension — the per-run 32-row block
    is contracted whole, ``K2 = 2^(k_hi+1) * 32``;
  * LANE bits (flat 0-6): not handled here (stage B adds masked
    lane-term dots); callers route lane-touching gates to the XLA
    kernels.

The gate operator ``W`` ([K2, K2], real block-2 over the stack bit) is
built on the HOST (``build_w``): it is at most 512x512 and keeping it
a runtime argument means ONE compiled kernel per (n, k_hi) class —
compile amortization exactly as in ``kernels.py`` (the reference's
runtime-position C++ kernel, ``include/U.h:123-202``).

Reference parity targets: ``include/U.h:28-102`` (the packed
single-pass AVX variant this out-designs on TPU).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

__all__ = ['build_w', 'fused_meta', 'fused_kernel', 'FUSED_RUN_ROWS',
           'swap_meta', 'build_w_swap', 'swap_kernel',
           'build_w_factored', 'factored_kernel']

# Run granularity: 32 rows x 128 lanes x 4 B = 16 KiB per DMA —
# measured 460 GB/s gathered (64 KiB runs reach 670; 32 rows keeps
# K2 = 2^(k_hi+1)*32 small enough for cheap MXU passes).
FUSED_RUN_ROWS = 32
_SUB_BITS = 5          # log2(FUSED_RUN_ROWS)
_LANE_BITS = 7         # 128 lanes = flat bits 0-6


def _classify_bits(n: int, bits: Sequence[int]):
    """Split flat amplitude bits into (high desc, sublane desc, lane
    desc) relative to the fused layout."""
    hi = sorted((b for b in bits if b >= _LANE_BITS + _SUB_BITS),
                reverse=True)
    sub = sorted((b for b in bits
                  if _LANE_BITS <= b < _LANE_BITS + _SUB_BITS),
                 reverse=True)
    lane = sorted((b for b in bits if b < _LANE_BITS), reverse=True)
    return hi, sub, lane


def fused_meta(n: int, bits: Sequence[int]):
    """Host metadata for a fused application of a gate on flat bits
    ``bits`` (MSB-first gate order, all >= 7): returns
    ``(k_hi, h_offs[int32 H2], rest_mask, uperm, sperm)``.

    * ``h_offs[h]``: run-index offset of (stack, high-combo) group
      ``h`` (stack = MSB of ``h``);
    * ``rest_mask``: int32 mask of the NON-gate run-index bits (the
      rest space enumerated by masked increment);
    * ``uperm``: 2^k index vector reordering the raw gate matrix to
      kernel bit order [high desc, sublane desc];
    * ``sperm``: 32-entry map from physical 5-bit sublane index to
      (gate-sub msb-first, rest-sub) order for the identity extension.
    """
    bits = [int(b) for b in bits]
    if any(b < _LANE_BITS for b in bits):
        raise ValueError("fused kernel handles bits >= 7 only")
    hi, sub, _ = _classify_bits(n, bits)
    k_hi = len(hi)
    n_run_bits = n + 1 - _LANE_BITS - _SUB_BITS   # incl. stack bit
    stack_run_bit = n_run_bits - 1

    H2 = 2 ** (k_hi + 1)
    h_offs = np.zeros(H2, dtype=np.int32)
    for h in range(H2):
        off = (h >> k_hi) << stack_run_bit
        for j, b in enumerate(hi):
            if (h >> (k_hi - 1 - j)) & 1:
                off |= 1 << (b - _LANE_BITS - _SUB_BITS)
        h_offs[h] = off

    gate_run_bits = {stack_run_bit}
    gate_run_bits.update(b - _LANE_BITS - _SUB_BITS for b in hi)
    rest_mask = 0
    for p in range(n_run_bits):
        if p not in gate_run_bits:
            rest_mask |= 1 << p
    # Sublane rest bits also ride inside runs, not the rest space.

    # uperm maps a KERNEL-order index to the corresponding gate-matrix
    # index (``U2 = U[uperm][:, uperm]``): kernel bit rank a holds the
    # gate's original axis ``order[a]`` (same convention as
    # ``IndexedEvolver._uperm``).
    kernel_order = hi + sub
    k = len(bits)
    order = [bits.index(b) for b in kernel_order]
    i = np.arange(2 ** k, dtype=np.int32)
    uperm = np.zeros(2 ** k, dtype=np.int32)
    for a, oa in enumerate(order):
        uperm |= ((i >> (k - 1 - a)) & 1) << (k - 1 - oa)

    # sperm: physical sublane index -> (gate sub bits msb-first |
    # non-gate sub bits) as laid out by kron(U2, eye).
    sub_rel = [b - _LANE_BITS for b in sub]          # positions 0..4
    rest_rel = [p for p in range(_SUB_BITS) if p not in sub_rel]
    x = np.arange(FUSED_RUN_ROWS, dtype=np.int32)
    gate_part = np.zeros_like(x)
    for j, p in enumerate(sub_rel):
        gate_part |= ((x >> p) & 1) << (len(sub_rel) - 1 - j)
    rest_part = np.zeros_like(x)
    for i2, p in enumerate(rest_rel):
        rest_part |= ((x >> p) & 1) << i2
    sperm = (gate_part << len(rest_rel)) | rest_part
    return k_hi, h_offs, int(rest_mask), uperm, sperm.astype(np.int32)


def build_w(n: int, U: np.ndarray, bits: Sequence[int],
            dtype=np.float32):
    """Host-side [K2, K2] fused operator for gate ``U`` on flat bits
    ``bits``: block-2 over the stack bit of the high-extended,
    sublane-identity-extended, physically-ordered gate.  At most
    512x512 for k_hi <= 3 — microseconds of numpy."""
    k_hi, h_offs, rest_mask, uperm, sperm = fused_meta(n, bits)
    k = len(bits)
    _, sub, _ = _classify_bits(n, bits)
    k_sub = len(sub)

    U2 = np.asarray(U, dtype=np.complex128)[uperm][:, uperm]
    eye = np.eye(2 ** (_SUB_BITS - k_sub))
    E = np.kron(U2, eye)                      # [2^k_hi * 32] squared
    idx = (np.arange(2 ** k_hi, dtype=np.int64)[:, None] *
           FUSED_RUN_ROWS + sperm[None, :]).reshape(-1)
    E = E[idx][:, idx]
    Er, Ei = np.ascontiguousarray(E.real), np.ascontiguousarray(E.imag)
    top = np.concatenate([Er, -Ei], axis=1)
    bot = np.concatenate([Ei, Er], axis=1)
    W = np.concatenate([top, bot], axis=0).astype(dtype)
    return W, np.asarray(h_offs), rest_mask


_FUSED_CACHE: dict = {}


def _pick_r_blk(k_hi: int, n_rest: int, target_rows: int = 2048):
    """Rest combos per block: keep blocks ~``target_rows`` rows."""
    H2 = 2 ** (k_hi + 1)
    r = max(1, target_rows // (H2 * FUSED_RUN_ROWS))
    while n_rest % r:
        r //= 2
    return max(1, r)


def fused_kernel(n: int, k_hi: int, interpret: bool = False,
                 nbuf: int = 2, high: bool = False):
    """Jitted in-place fused gate application for the (n, k_hi) class:
    ``apply(state[2^(n-6), 128], W[K2, K2], h_offs[H2], info[1]) ->
    state`` with ``info[0] = rest_mask``.  One compiled program per
    class; positions enter only through ``h_offs``/``rest_mask``/
    ``W`` — zero recompiles across gates (``include/U.h:123-202``
    semantics)."""
    key = (n, k_hi, interpret, nbuf, high)
    fn = _FUSED_CACHE.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PREC = jax.lax.Precision.HIGH if high else jax.lax.Precision.HIGHEST
    R = FUSED_RUN_ROWS
    H2 = 2 ** (k_hi + 1)
    K2 = H2 * R
    n_run_bits = n + 1 - _LANE_BITS - _SUB_BITS
    n_rest = 2 ** (n_run_bits - (k_hi + 1))
    R_blk = _pick_r_blk(k_hi, n_rest)
    n_blocks = n_rest // R_blk
    S_blk = R_blk * K2
    runs_per_blk = R_blk * H2

    def kernel(x_hbm, w_ref, h_offs, info, o_hbm, sin, sout, addr,
               isem, osem):
        mask = info[0]

        def runs_of(slot, i):
            """Run base (run units) for rest-combo i of the slot."""
            return addr[slot, i]

        def start_gather(slot, rest0):
            r = rest0
            for i in range(R_blk):
                addr[slot, i] = r
                for h in range(H2):
                    row = (r | h_offs[h]) * R
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(row, R), :],
                        sin.at[slot, pl.ds((i * H2 + h) * R, R), :],
                        isem.at[slot]).start()
                r = ((r | ~mask) + 1) & mask
            return r

        def start_scatter(slot):
            for i in range(R_blk):
                r = runs_of(slot, i)
                for h in range(H2):
                    row = (r | h_offs[h]) * R
                    pltpu.make_async_copy(
                        sout.at[slot, pl.ds((i * H2 + h) * R, R), :],
                        o_hbm.at[pl.ds(row, R), :],
                        osem.at[slot]).start()

        def wait_all(sem, slot, buf):
            # Each async copy decrements by its own byte count; with
            # runs_per_blk copies signalling one semaphore we wait
            # runs_per_blk times on a same-shaped handle.
            def go(j, _):
                pltpu.make_async_copy(
                    buf.at[slot, pl.ds(0, R), :],
                    buf.at[slot, pl.ds(0, R), :],
                    sem.at[slot]).wait()
                return 0
            jax.lax.fori_loop(0, runs_per_blk, go, 0)

        rest = start_gather(0, 0)

        def body(b, rest):
            slot = jax.lax.rem(b, nbuf)
            nslot = jax.lax.rem(b + 1, nbuf)

            def gather_next(r):
                return start_gather(nslot, r)

            rest = jax.lax.cond(b + 1 < n_blocks, gather_next,
                                lambda r: r, rest)
            wait_all(isem, slot, sin)

            @pl.when(b >= nbuf)
            def _():
                wait_all(osem, slot, sout)

            for i in range(R_blk):
                xs = sin[slot, pl.ds(i * K2, K2), :]
                # NB: w_ref[...] must stay INSIDE the dot — hoisting
                # it materializes the full W into vregs, which fails
                # to compile at K2 = 1024 (4 MB).
                ys = jax.lax.dot_general(
                    w_ref[...], xs, (((1,), (0,)), ((), ())),
                    precision=PREC,
                    preferred_element_type=jnp.float32)
                sout[slot, pl.ds(i * K2, K2), :] = ys
            start_scatter(slot)
            return rest

        jax.lax.fori_loop(0, n_blocks, body, rest)
        for s in range(nbuf):
            last = n_blocks - nbuf + s

            @pl.when(last >= 0)
            def _():
                wait_all(osem, jax.lax.rem(last, nbuf), sout)

    n_rows = 2 ** (n + 1 - _LANE_BITS)

    def apply(state, W, h_offs, info):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nbuf, S_blk, 128), jnp.float32),
                pltpu.VMEM((nbuf, S_blk, 128), jnp.float32),
                pltpu.SMEM((nbuf, R_blk), jnp.int32),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(state, W, h_offs, info)

    fn = jax.jit(apply, donate_argnums=(0,))
    _FUSED_CACHE[key] = fn
    return fn


# ---------------------------------------------------------------------
# stage B: gates touching LANE bits (flat 0-6)
# ---------------------------------------------------------------------
#
# A gate with k_l lane bits cannot be one row-dot (a (row x lane)
# operator factors into W_row @ X @ W_col only for tensor products).
# Two fused one-pass forms cover it:
#
#  * SWAP PATH (``swap_kernel``): exchange the gate's lane bits with
#    k_l cold "victim" HIGH bits *inside the kernel* (the exchange is
#    2^k_l masked lane-dots over contiguous victim-group slices — the
#    victim groups are already separated by the gather), then apply
#    the gate entirely in row space with K2 = 2^(1+k_hi+k_l)*32.  The
#    lane<->victim relabel is permanent: the caller updates its slot
#    map (LRU lane eviction for free, replacing the XLA engine's 40 ms
#    rotation pass).
#  * FACTORED PATH (``factored_kernel``): when the block operator is
#    U_row (x) U_lane (pure-lane gates, or a pairing of disjoint row
#    and lane gates), apply U_lane as 4 stack-sliced lane-dots and
#    U_row as the usual W row-dot — cost independent of k_l.
#
# K2-axis bit order (both paths): [stack (MSB), victim slots
# v_0..v_{k_l-1}, gate high bits desc, 5 physical sublane bits].


def swap_meta(n: int, bits: Sequence[int], victims: Sequence[int]):
    """Host metadata for the swap path: gate on flat ``bits`` (MSB
    first) whose lane bits are exchanged with flat high bits
    ``victims`` (len == number of lane bits, each >= 12, not in
    ``bits``).  Returns ``(k_hi, k_l, h_offs, rest_mask, Ms)`` with
    ``Ms[u, w]`` the 128x128 lane-combine matrices."""
    bits = [int(b) for b in bits]
    victims = [int(v) for v in victims]
    hi, sub, lane = _classify_bits(n, bits)
    k_hi, k_l = len(hi), len(lane)
    if len(victims) != k_l:
        raise ValueError("need one victim high bit per lane bit")
    if any(v < _LANE_BITS + _SUB_BITS or v in bits for v in victims):
        raise ValueError("victims must be free high bits")
    n_run_bits = n + 1 - _LANE_BITS - _SUB_BITS
    stack_run_bit = n_run_bits - 1

    # h index = (stack, v_0.., g_0..) MSB first.
    hbits = victims + hi
    ke = len(hbits)
    H2 = 2 ** (ke + 1)
    h_offs = np.zeros(H2, dtype=np.int32)
    for h in range(H2):
        off = (h >> ke) << stack_run_bit
        for j, b in enumerate(hbits):
            if (h >> (ke - 1 - j)) & 1:
                off |= 1 << (b - _LANE_BITS - _SUB_BITS)
        h_offs[h] = off
    gate_run_bits = {stack_run_bit}
    gate_run_bits.update(b - _LANE_BITS - _SUB_BITS for b in hbits)
    rest_mask = 0
    for p in range(n_run_bits):
        if p not in gate_run_bits:
            rest_mask |= 1 << p

    # Lane-combine matrices: Y[c=w] = sum_u X[c=u] @ Ms[u, w], where
    # c are the victim slots and a the gate lane bits (a_j <-> v_j).
    # Ms[u, w][l_in, l_out] = 1 iff a(l_out) = u, a(l_in) = w and the
    # non-a lane bits agree (derivation: the element at (c=w, l) of
    # the swapped tile is X[c=a(l), l with a:=w]).
    T = 2 ** k_l
    ll = np.arange(128, dtype=np.int32)
    aval = np.zeros_like(ll)
    for j, a in enumerate(lane):
        aval |= ((ll >> a) & 1) << (k_l - 1 - j)
    amask = 0
    for a in lane:
        amask |= 1 << a
    Ms = np.zeros((T, T, 128, 128), dtype=np.float32)
    for w in range(T):
        lw = np.zeros_like(ll)          # l with a-bits := w
        for j, a in enumerate(lane):
            lw |= ((w >> (k_l - 1 - j)) & 1) << a
        l_in = (ll & ~amask) | lw
        for l_out in range(128):
            u = aval[l_out]
            Ms[u, w, l_in[l_out], l_out] = 1.0
    return k_hi, k_l, h_offs, int(rest_mask), Ms


def build_w_swap(n: int, U: np.ndarray, bits: Sequence[int],
                 victims: Sequence[int], dtype=np.float32):
    """[K2, K2] row operator for the swap path: the gate with its lane
    bits RELOCATED to the victim slots (the in-kernel lane combine has
    already moved the data there)."""
    bits = [int(b) for b in bits]
    hi, sub, lane = _classify_bits(n, bits)
    k = len(bits)
    k_hi, k_l, k_sub = len(hi), len(lane), len(sub)
    ke = k_hi + k_l

    # U2 bit order: [lane bits (victim-slot order), high desc,
    # sub desc]; uperm maps kernel-order index -> gate index (the
    # ``IndexedEvolver._uperm`` convention).
    kernel_order = lane + hi + sub
    order = [bits.index(b) for b in kernel_order]
    # K2 axis (below stack) = (v..., g..., s...): lane bits first.
    i = np.arange(2 ** k, dtype=np.int64)
    uperm = np.zeros(2 ** k, dtype=np.int64)
    for a, oa in enumerate(order):
        uperm |= ((i >> (k - 1 - a)) & 1) << (k - 1 - oa)
    U2 = np.asarray(U, dtype=np.complex128)[uperm][:, uperm]

    # Extend over non-gate sublane bits, order the 5 physical sublane
    # bits, then block-2 over the stack bit.
    sub_rel = [b - _LANE_BITS for b in sub]
    rest_rel = [p for p in range(_SUB_BITS) if p not in sub_rel]
    x = np.arange(FUSED_RUN_ROWS, dtype=np.int32)
    gate_part = np.zeros_like(x)
    for j, p in enumerate(sub_rel):
        gate_part |= ((x >> p) & 1) << (len(sub_rel) - 1 - j)
    rest_part = np.zeros_like(x)
    for i2, p in enumerate(rest_rel):
        rest_part |= ((x >> p) & 1) << i2
    sperm = (gate_part << len(rest_rel)) | rest_part
    eye = np.eye(2 ** (_SUB_BITS - k_sub))
    E = np.kron(U2, eye)
    idx = (np.arange(2 ** ke, dtype=np.int64)[:, None] *
           FUSED_RUN_ROWS + sperm[None, :]).reshape(-1)
    E = E[idx][:, idx]
    Er, Ei = np.ascontiguousarray(E.real), np.ascontiguousarray(E.imag)
    top = np.concatenate([Er, -Ei], axis=1)
    bot = np.concatenate([Ei, Er], axis=1)
    return np.concatenate([top, bot], axis=0).astype(dtype)


def swap_kernel(n: int, ke: int, k_l: int, interpret: bool = False,
                nbuf: int = 2, high: bool = False):
    """Jitted in-place swap-path application for the (n, ke, k_l)
    class (``ke = k_hi + k_l`` victim+high group bits):
    ``apply(state, W[K2,K2], Ms[T,T,128,128], h_offs[H2], info[1])``.
    ``k_l = 0`` degenerates to the pure row-dot (``fused_kernel``)."""
    key = ('swap', n, ke, k_l, interpret, nbuf, high)
    fn = _FUSED_CACHE.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PREC = jax.lax.Precision.HIGH if high else jax.lax.Precision.HIGHEST
    R = FUSED_RUN_ROWS
    T = 2 ** k_l
    H2 = 2 ** (ke + 1)
    K2 = H2 * R
    G = K2 // (2 * T)        # rows per (stack, victim-combo) group
    n_run_bits = n + 1 - _LANE_BITS - _SUB_BITS
    n_rest = 2 ** (n_run_bits - (ke + 1))
    R_blk = _pick_r_blk(ke, n_rest)
    n_blocks = n_rest // R_blk
    S_blk = R_blk * K2
    runs_per_blk = R_blk * H2

    def kernel(x_hbm, w_ref, ms_ref, h_offs, info, o_hbm, sin, sout,
               ytmp, addr, isem, osem):
        mask = info[0]

        def start_gather(slot, rest0):
            r = rest0
            for i in range(R_blk):
                addr[slot, i] = r
                for h in range(H2):
                    row = (r | h_offs[h]) * R
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(row, R), :],
                        sin.at[slot, pl.ds((i * H2 + h) * R, R), :],
                        isem.at[slot]).start()
                r = ((r | ~mask) + 1) & mask
            return r

        def start_scatter(slot):
            for i in range(R_blk):
                r = addr[slot, i]
                for h in range(H2):
                    row = (r | h_offs[h]) * R
                    pltpu.make_async_copy(
                        sout.at[slot, pl.ds((i * H2 + h) * R, R), :],
                        o_hbm.at[pl.ds(row, R), :],
                        osem.at[slot]).start()

        def wait_all(sem, slot, buf):
            def go(j, _):
                pltpu.make_async_copy(
                    buf.at[slot, pl.ds(0, R), :],
                    buf.at[slot, pl.ds(0, R), :],
                    sem.at[slot]).wait()
                return 0
            jax.lax.fori_loop(0, runs_per_blk, go, 0)

        rest = start_gather(0, 0)

        def body(b, rest):
            slot = jax.lax.rem(b, nbuf)
            nslot = jax.lax.rem(b + 1, nbuf)
            rest = jax.lax.cond(b + 1 < n_blocks,
                                lambda r: start_gather(nslot, r),
                                lambda r: r, rest)
            wait_all(isem, slot, sin)

            @pl.when(b >= nbuf)
            def _():
                wait_all(osem, slot, sout)

            for i in range(R_blk):
                base = i * K2
                if T == 1:
                    ys = sin[slot, pl.ds(base, K2), :]
                else:
                    # Lane combine: per (stack st, out-victim w2)
                    # group, sum over in-victim u of X[st,u] @ M[u,w2].
                    for st in range(2):
                        for w2 in range(T):
                            acc = None
                            for u in range(T):
                                xs = sin[slot,
                                         pl.ds(base + (st * T + u) * G,
                                               G), :]
                                m = ms_ref[u, w2]
                                d = jax.lax.dot_general(
                                    xs, m, (((1,), (0,)), ((), ())),
                                    precision=PREC,
                                    preferred_element_type=jnp.float32)
                                acc = d if acc is None else acc + d
                            ytmp[pl.ds((st * T + w2) * G, G), :] = acc
                    ys = ytmp[...]
                # w_ref[...] inside the dot (see fused_kernel note)
                out = jax.lax.dot_general(
                    w_ref[...], ys, (((1,), (0,)), ((), ())),
                    precision=PREC,
                    preferred_element_type=jnp.float32)
                sout[slot, pl.ds(base, K2), :] = out
            start_scatter(slot)
            return rest

        jax.lax.fori_loop(0, n_blocks, body, rest)
        for s in range(nbuf):
            last = n_blocks - nbuf + s

            @pl.when(last >= 0)
            def _():
                wait_all(osem, jax.lax.rem(last, nbuf), sout)

    n_rows = 2 ** (n + 1 - _LANE_BITS)

    def apply(state, W, Ms, h_offs, info):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nbuf, S_blk, 128), jnp.float32),
                pltpu.VMEM((nbuf, S_blk, 128), jnp.float32),
                pltpu.VMEM((K2, 128), jnp.float32),
                pltpu.SMEM((nbuf, R_blk), jnp.int32),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(state, W, Ms, h_offs, info)

    fn = jax.jit(apply, donate_argnums=(0,))
    _FUSED_CACHE[key] = fn
    return fn


def build_w_factored(n: int, U_row: np.ndarray, row_bits: Sequence[int],
                     U_lane: np.ndarray, lane_bits: Sequence[int],
                     dtype=np.float32):
    """Operators for ``factored_kernel``: the block operator
    ``U_row (x) U_lane`` with ``row_bits`` all >= 7 and ``lane_bits``
    all < 7.  Returns ``(W, Br, Bi, h_offs, rest_mask)`` — ``W`` the
    usual [K2, K2] row operator for ``U_row``, ``(Br, Bi)`` the
    transposed 128x128 lane extension of ``U_lane`` (applied as
    ``X @ B``)."""
    W, h_offs, rest_mask = build_w(n, U_row, row_bits, dtype=dtype)

    lane = sorted((int(b) for b in lane_bits), reverse=True)
    k_l = len(lane)
    lane_bits = [int(b) for b in lane_bits]
    order = [lane_bits.index(b) for b in lane]
    i = np.arange(2 ** k_l, dtype=np.int64)
    uperm = np.zeros(2 ** k_l, dtype=np.int64)
    for a, oa in enumerate(order):
        uperm |= ((i >> (k_l - 1 - a)) & 1) << (k_l - 1 - oa)
    U2 = np.asarray(U_lane, dtype=np.complex128)[uperm][:, uperm]
    rest = [p for p in range(_LANE_BITS) if p not in lane]
    x = np.arange(128, dtype=np.int32)
    gate_part = np.zeros_like(x)
    for j, p in enumerate(lane):
        gate_part |= ((x >> p) & 1) << (k_l - 1 - j)
    rest_part = np.zeros_like(x)
    for i2, p in enumerate(rest):
        rest_part |= ((x >> p) & 1) << i2
    pperm = (gate_part << (_LANE_BITS - k_l)) | rest_part
    E = np.kron(U2, np.eye(2 ** (_LANE_BITS - k_l)))
    E = E[pperm][:, pperm]
    # out = X @ B with B = E^T (E[l_out, l_in]).
    B = np.ascontiguousarray(E.T)
    return (W, B.real.astype(dtype), B.imag.astype(dtype), h_offs,
            rest_mask)


def factored_kernel(n: int, k_hi: int, interpret: bool = False,
                    nbuf: int = 2):
    """Jitted in-place application of ``U_row (x) U_lane``:
    ``apply(state, W[K2,K2], Br[128,128], Bi[128,128], h_offs, info)``.
    U_lane is applied as 4 stack-sliced lane-dots (complex pairs),
    then U_row as the usual row-dot — cost independent of how many
    lane bits the gate touches."""
    key = ('fact', n, k_hi, interpret, nbuf)
    fn = _FUSED_CACHE.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = FUSED_RUN_ROWS
    H2 = 2 ** (k_hi + 1)
    K2 = H2 * R
    G = K2 // 2              # rows per stack half
    n_run_bits = n + 1 - _LANE_BITS - _SUB_BITS
    n_rest = 2 ** (n_run_bits - (k_hi + 1))
    R_blk = _pick_r_blk(k_hi, n_rest)
    n_blocks = n_rest // R_blk
    S_blk = R_blk * K2
    runs_per_blk = R_blk * H2

    def kernel(x_hbm, w_ref, br_ref, bi_ref, h_offs, info, o_hbm,
               sin, sout, ytmp, addr, isem, osem):
        mask = info[0]

        def start_gather(slot, rest0):
            r = rest0
            for i in range(R_blk):
                addr[slot, i] = r
                for h in range(H2):
                    row = (r | h_offs[h]) * R
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(row, R), :],
                        sin.at[slot, pl.ds((i * H2 + h) * R, R), :],
                        isem.at[slot]).start()
                r = ((r | ~mask) + 1) & mask
            return r

        def start_scatter(slot):
            for i in range(R_blk):
                r = addr[slot, i]
                for h in range(H2):
                    row = (r | h_offs[h]) * R
                    pltpu.make_async_copy(
                        sout.at[slot, pl.ds((i * H2 + h) * R, R), :],
                        o_hbm.at[pl.ds(row, R), :],
                        osem.at[slot]).start()

        def wait_all(sem, slot, buf):
            def go(j, _):
                pltpu.make_async_copy(
                    buf.at[slot, pl.ds(0, R), :],
                    buf.at[slot, pl.ds(0, R), :],
                    sem.at[slot]).wait()
                return 0
            jax.lax.fori_loop(0, runs_per_blk, go, 0)

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        rest = start_gather(0, 0)

        def body(b, rest):
            slot = jax.lax.rem(b, nbuf)
            nslot = jax.lax.rem(b + 1, nbuf)
            rest = jax.lax.cond(b + 1 < n_blocks,
                                lambda r: start_gather(nslot, r),
                                lambda r: r, rest)
            wait_all(isem, slot, sin)

            @pl.when(b >= nbuf)
            def _():
                wait_all(osem, slot, sout)

            for i in range(R_blk):
                base = i * K2
                x0 = sin[slot, pl.ds(base, G), :]
                x1 = sin[slot, pl.ds(base + G, G), :]
                ytmp[pl.ds(0, G), :] = (dot(x0, br_ref[...]) -
                                        dot(x1, bi_ref[...]))
                ytmp[pl.ds(G, G), :] = (dot(x0, bi_ref[...]) +
                                        dot(x1, br_ref[...]))
                # w_ref[...] inside the dot (see fused_kernel note)
                out = jax.lax.dot_general(
                    w_ref[...], ytmp[...], (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                sout[slot, pl.ds(base, K2), :] = out
            start_scatter(slot)
            return rest

        jax.lax.fori_loop(0, n_blocks, body, rest)
        for s in range(nbuf):
            last = n_blocks - nbuf + s

            @pl.when(last >= 0)
            def _():
                wait_all(osem, jax.lax.rem(last, nbuf), sout)

    n_rows = 2 ** (n + 1 - _LANE_BITS)

    def apply(state, W, Br, Bi, h_offs, info):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nbuf, S_blk, 128), jnp.float32),
                pltpu.VMEM((nbuf, S_blk, 128), jnp.float32),
                pltpu.VMEM((K2, 128), jnp.float32),
                pltpu.SMEM((nbuf, R_blk), jnp.int32),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(state, W, Br, Bi, h_offs, info)

    fn = jax.jit(apply, donate_argnums=(0,))
    _FUSED_CACHE[key] = fn
    return fn
