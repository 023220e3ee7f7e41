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
  * one jitted program per (n, k_hi, k_lo) gate-size class takes the gate
    matrix and *permutation index vectors* as runtime arguments; applying
    any k-qubit gate anywhere costs zero recompiles.  The permutations
    (row/column reorderings that move the gate bits outermost, plus their
    inverses) are computed host-side with vectorized bit arithmetic — the
    pdep/pext index games of the reference (``include/utils.h:79-122``) —
    and cached on device per position set;
  * the state is viewed as a ``[2^(n-L), 2^L]`` matrix (rows of 2^L
    contiguous amplitudes — multiples of the f32 (8,128) tile).  A gate
    application is: gather rows (and/or columns) by the permutation, four
    real MXU matmuls, gather back by the inverse.  No XLA scatter
    (scatter blew up compile times at large n).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ['IndexedEvolver', 'DEFAULT_ROW_BITS']

DEFAULT_ROW_BITS = 10  # 2^10 f32 = one (8, 128) tile of 4 KiB

_KERNEL_CACHE: dict = {}


def host_perm_and_inverse(pos, n_bits: int, major: bool = False):
    """Permutation of ``[0, 2^n_bits)`` moving the bits at ``pos`` (gate
    MSB first) to the bottom (``major=False``: gate index minor-most) or
    the top (``major=True``: gate index most significant), plus its
    inverse.  Vectorized numpy bit arithmetic — the pdep/pext index games
    of the reference (``include/utils.h:79-122``) — in microseconds.
    """
    pos = list(int(p) for p in pos)
    k = len(pos)
    size = 2**n_bits

    g = np.arange(2**(n_bits - k), dtype=np.int64)
    idx = g
    for p in sorted(pos):
        low = idx & ((1 << p) - 1)
        idx = ((idx >> p) << (p + 1)) | low
    offs = np.zeros(2**k, dtype=np.int64)
    b = np.arange(2**k, dtype=np.int64)
    for j, p in enumerate(pos):
        offs |= ((b >> (k - 1 - j)) & 1) << p
    if major:
        # perm[(b << (n_bits-k)) | g] = expand(g) + offset(b)
        perm = (idx[None, :] + offs[:, None]).reshape(size)
    else:
        # perm[(g << k) | b] = expand(g) + offset(b)
        perm = (idx[:, None] + offs[None, :]).reshape(size)

    inv = np.empty(size, dtype=np.int64)
    inv[perm] = np.arange(size, dtype=np.int64)
    return perm.astype(np.int32), inv.astype(np.int32)


def _build_kernel_deferred(n: int, k_hi: int, k_lo: int, L: int):
    """Deferred-canonicalization variant: the state arrives in an
    arbitrary (separable) layout given by ``rowmap``/``colmap`` index
    vectors (device-resident), the gate's target permutation is composed
    with the current layout *on device* (a tiny index gather), and the
    output is left in the gate's layout — no inverse gathers.  The host
    tracks the layout and canonicalizes once at the end."""
    import jax
    import jax.numpy as jnp

    k = k_hi + k_lo
    R = 2**(n - L) if n > L else 1
    C = 2**min(L, n)
    Rg = R // 2**k_hi
    Cg = C // 2**k_lo

    def apply(re, im, Ur, Ui, uperm, inv_rowmap, inv_colmap, rp=None,
              cp=None):
        # Reorder the gate matrix to the kernel's [hi..., lo...] index
        # order on device (uperm is a 2^k index vector) — raw matrices
        # can then live device-resident, stacked, with zero per-gate
        # host uploads through the tunnel.
        Ur = jnp.take(jnp.take(Ur, uperm, axis=0), uperm, axis=1)
        Ui = jnp.take(jnp.take(Ui, uperm, axis=0), uperm, axis=1)
        re = jnp.reshape(re, (R, C))
        im = jnp.reshape(im, (R, C))
        if k_hi:
            eff_r = jnp.take(inv_rowmap, rp)  # compose layouts (262k ints)
            re = jnp.take(re, eff_r, axis=0)
            im = jnp.take(im, eff_r, axis=0)
        elif inv_rowmap is not None:
            pass  # row layout unchanged by this gate
        if k_lo:
            eff_c = jnp.take(inv_colmap, cp)
            re = jnp.take(re, eff_c, axis=1)
            im = jnp.take(im, eff_c, axis=1)

        re = re.reshape(Rg, 2**k, Cg)
        im = im.reshape(Rg, 2**k, Cg)
        o_re = jnp.einsum('rBc,bB->rbc', re, Ur) - \
            jnp.einsum('rBc,bB->rbc', im, Ui)
        o_im = jnp.einsum('rBc,bB->rbc', im, Ur) + \
            jnp.einsum('rBc,bB->rbc', re, Ui)
        return (jnp.reshape(o_re, (-1,)), jnp.reshape(o_im, (-1,)))

    return jax.jit(apply, donate_argnums=(0, 1))


def _build_kernel_ext(n: int, k_hi: int, k_lo: int, L: int,
                      rotate: bool):
    """Extended low-7 kernel: gate lo bits live anywhere in the physical
    low-7 column bits and the (2^k)² gate matrix is extended *on device*
    to a (2^kh·128)² operator on (row slots × low-7) — so column bits
    never need gathering for the gate itself (the 44 ms column gather was
    4× a state copy).  Bits 7..L-1 ride along as a batch axis.

    ``rotate=True`` prepends a fused column gather (a 2^L index vector)
    that re-homes cold column bits before the gate — used when a gate's
    column bits sit outside the physical low-7.

    Requires L == 10 and n - L >= k_hi (callers gate on this)."""
    import jax
    import jax.numpy as jnp

    k = k_hi + k_lo
    R = 2**(n - L)
    C = 2**L
    KH = 2**k_hi
    Rg = R // KH
    G = C // 128  # bits 7..L-1 batch axis

    def apply(re, im, Ur, Ui, uperm, pperm, rp=None, inv_rowmap=None,
              cperm=None):
        # Reorder raw gate matrix to [hi..., lo...] bit order.
        Ur = jnp.take(jnp.take(Ur, uperm, axis=0), uperm, axis=1)
        Ui = jnp.take(jnp.take(Ui, uperm, axis=0), uperm, axis=1)
        # Extend over the full low-7: W = P^T (U ⊗ I_{2^(7-kl)}) P with
        # P placing the gate's lo bits at their *physical* columns.
        # idx[(b, x)] = b·128 + pperm[x] maps physical (b, x) to kron
        # index order (b, lo-gate bits, rest).
        eye = jnp.eye(2**(7 - k_lo), dtype=Ur.dtype)
        Wr = jnp.kron(Ur, eye)
        Wi = jnp.kron(Ui, eye)
        idx = (jnp.arange(KH, dtype=jnp.int32)[:, None] * 128 +
               pperm[None, :]).reshape(-1)
        Wr = jnp.take(jnp.take(Wr, idx, axis=0), idx, axis=1)
        Wi = jnp.take(jnp.take(Wi, idx, axis=0), idx, axis=1)
        Wr = Wr.reshape(KH, 128, KH, 128)
        Wi = Wi.reshape(KH, 128, KH, 128)
        # Materialize W before the einsum: without the barrier XLA fuses
        # the kron+gather build INTO the einsum and recomputes it per
        # output tile (measured 6-10x slowdowns on some classes).
        Wr, Wi = jax.lax.optimization_barrier((Wr, Wi))

        re = jnp.reshape(re, (R, C))
        im = jnp.reshape(im, (R, C))
        if rotate:
            re = jnp.take(re, cperm, axis=1)
            im = jnp.take(im, cperm, axis=1)
        if k_hi:
            eff_r = jnp.take(inv_rowmap, rp)
            re = jnp.take(re, eff_r, axis=0)
            im = jnp.take(im, eff_r, axis=0)
        re = re.reshape(Rg, KH, G, 128)
        im = im.reshape(Rg, KH, G, 128)
        o_re = jnp.einsum('rBgX,bxBX->rbgx', re, Wr) - \
            jnp.einsum('rBgX,bxBX->rbgx', im, Wi)
        o_im = jnp.einsum('rBgX,bxBX->rbgx', im, Wr) + \
            jnp.einsum('rBgX,bxBX->rbgx', re, Wi)
        return (jnp.reshape(o_re, (-1,)), jnp.reshape(o_im, (-1,)))

    return jax.jit(apply, donate_argnums=(0, 1))


def _build_flush(n: int, L: int):
    """One gather restoring canonical layout from (rowmap, colmap)."""
    import jax
    import jax.numpy as jnp

    R = 2**(n - L) if n > L else 1
    C = 2**min(L, n)

    def flush(re, im, rowmap, colmap):
        re = jnp.reshape(re, (R, C))
        im = jnp.reshape(im, (R, C))
        re = jnp.take(jnp.take(re, rowmap, axis=0), colmap, axis=1)
        im = jnp.take(jnp.take(im, rowmap, axis=0), colmap, axis=1)
        return jnp.reshape(re, (-1,)), jnp.reshape(im, (-1,))

    return jax.jit(flush, donate_argnums=(0, 1))


def _build_kernel(n: int, k_hi: int, k_lo: int, L: int):
    """Jitted gate application for a (k_hi, k_lo) gate-size class.

    Signature (unused perm arguments omitted per class):
    ``(re, im, Ur, Ui, [rperm, rinv], [cperm, cinv]) -> (re, im)``.
    """
    import jax
    import jax.numpy as jnp

    k = k_hi + k_lo
    R = 2**(n - L) if n > L else 1
    C = 2**min(L, n)
    Rg = R // 2**k_hi
    Cg = C // 2**k_lo

    def apply(re, im, Ur, Ui, uperm, rperm=None, rinv=None, cperm=None,
              cinv=None):
        """Row permutation puts the hi gate bits minor within rows; the
        column permutation puts the lo gate bits *major* within columns —
        so the flat view ``[Rg, 2^kh, 2^kl, Cg]`` has all gate bits
        adjacent and merges into ``[Rg, 2^k, Cg]`` by pure reshape.  The
        minor axis stays ≥ 64 wide throughout (tile padding on small
        minor dims caused compile-time HBM explosions)."""
        Ur = jnp.take(jnp.take(Ur, uperm, axis=0), uperm, axis=1)
        Ui = jnp.take(jnp.take(Ui, uperm, axis=0), uperm, axis=1)
        re = jnp.reshape(re, (R, C))
        im = jnp.reshape(im, (R, C))
        if k_hi:
            re = jnp.take(re, rperm, axis=0)
            im = jnp.take(im, rperm, axis=0)
        if k_lo:
            re = jnp.take(re, cperm, axis=1)
            im = jnp.take(im, cperm, axis=1)

        re = re.reshape(Rg, 2**k, Cg)
        im = im.reshape(Rg, 2**k, Cg)

        # out[r, b, c] = Σ_B U[b, B] A[r, B, c]
        o_re = jnp.einsum('rBc,bB->rbc', re, Ur) - \
            jnp.einsum('rBc,bB->rbc', im, Ui)
        o_im = jnp.einsum('rBc,bB->rbc', im, Ur) + \
            jnp.einsum('rBc,bB->rbc', re, Ui)

        o_re = o_re.reshape(R, C)
        o_im = o_im.reshape(R, C)
        if k_lo:
            o_re = jnp.take(o_re, cinv, axis=1)
            o_im = jnp.take(o_im, cinv, axis=1)
        if k_hi:
            o_re = jnp.take(o_re, rinv, axis=0)
            o_im = jnp.take(o_im, rinv, axis=0)
        return jnp.reshape(o_re, (-1,)), jnp.reshape(o_im, (-1,))

    return jax.jit(apply, donate_argnums=(0, 1))


def _ext_class_cost(k: int, kh: int, kl: int) -> float:
    """Measured per-application cost (ms, 28q v5e) by kernel class —
    drives the pairing scheduler's merge decisions."""
    if kl == 0:
        return {7: 46.0, 8: 52.0, 9: 67.0}.get(k, 42.0) if k >= 7 \
            else 42.0
    return {0: 24.0, 1: 40.0, 2: 45.0, 3: 50.0, 4: 68.0,
            5: 110.0}.get(kh, 1e9)


def pair_matrix_gates(items, n: int, L: int = DEFAULT_ROW_BITS,
                      max_k: int = 9):
    """Fuse gates into larger blocks when the fused kernel class is
    cheaper than two applications (the analog of the reference's
    ``compress`` pre-pass, ``circuit/utils.py:467``, applied at the
    engine's cost model).

    ``items`` is a list of ``(U, qs)`` with dense qubit indices; gates
    may jump over earlier gates they commute with (disjoint supports).
    Returns a new ``(U, qs)`` list.
    """
    items = list(items)
    used = [False] * len(items)
    out = []
    for i in range(len(items)):
        if used[i]:
            continue
        used[i] = True
        cur = [items[i]]
        qs_set = set(items[i][1])
        cost = _ext_class_cost(*_class_of(items[i][1], n, L))
        while len(qs_set) < max_k:
            # One forward scan: collect every gate that can legally jump
            # next to the block (disjoint from all unused gates in
            # between) and pick the most profitable merge.
            blocked: set = set()
            best_j, best_profit, best = None, 4.0, None
            for j in range(i + 1, len(items)):
                if used[j]:
                    continue
                qsj = set(items[j][1])
                if qsj & blocked:
                    blocked |= qsj
                    continue
                union = qs_set | qsj
                k, kh, kl = _class_of(union, n, L)
                ok = k <= max_k and kl <= 7 and (kl == 0 or kh <= 4)
                if ok:
                    profit = (cost +
                              _ext_class_cost(*_class_of(items[j][1],
                                                         n, L)) -
                              _ext_class_cost(k, kh, kl))
                    if profit > best_profit:
                        best_j, best_profit = j, profit
                        best = (union, _ext_class_cost(k, kh, kl))
                blocked |= qsj
            if best_j is None:
                break
            used[best_j] = True
            cur.append(items[best_j])
            qs_set, cost = best
        if len(cur) == 1:
            out.append(cur[0])
        else:
            out.append(_compose_matrix_gates(cur))
    return out


def _class_of(qs, n, L):
    bits = [n - 1 - q for q in qs]
    kh = sum(1 for b in bits if b >= L)
    return len(bits), kh, len(bits) - kh


def _compose_matrix_gates(items):
    """Compose a list of (U, qs) into one fused (U, qs) block (applied
    left-to-right) via the circuit toolbox."""
    from hybridq_tpu.circuit import Circuit
    from hybridq_tpu.circuit import utils as cutils
    from hybridq_tpu.gate import MatrixGate

    g = cutils.to_matrix_gate(
        Circuit(MatrixGate(np.asarray(U)).on(list(qs))
                for U, qs in items), complex_type='complex128')
    return np.asarray(g.matrix()), tuple(g.qubits)


class IndexedEvolver:
    """Single-chip evolution with one compiled kernel per gate-size class.

    Usage::

        ev = IndexedEvolver(n_qubits)
        state = ev.prepare_state('0' * n)     # split pair, flat
        state = ev.apply_gates(state, gates, qubit_index)
        psi = ev.gather(state)                # (2,)*n complex host array
    """

    def __init__(self, n_qubits: int, float_type='float32',
                 row_bits: int = DEFAULT_ROW_BITS,
                 use_pallas: bool = False, defer: bool = True):
        self.n = int(n_qubits)
        self.L = min(int(row_bits), self.n)
        self.float_type = np.dtype(float_type)
        self._perm_cache: dict = {}
        # The fused Pallas kernel (single HBM pass) applies gates whose
        # bits all live in the row index; it needs full (8, C/8) row
        # tiles, i.e. L >= 10, and float32.
        self.use_pallas = (bool(use_pallas) and self.L >= 10 and
                           self.n - self.L >= 4 and
                           self.float_type == np.dtype('float32'))
        # Deferred canonicalization: skip inverse gathers per gate, track
        # the (separable) layout and restore it once at the end.  The
        # evolver is stateful w.r.t. the layout between apply calls.
        self.defer = bool(defer) and not self.use_pallas
        self._inv_rowmap = None  # device arrays; None = identity
        self._inv_colmap = None
        # Extended low-7 path (L=10 only): column-bit gates apply via a
        # device-extended (2^kh·128)² operator; the column layout is a
        # host-tracked 10-entry bit permutation ("shadow") and columns
        # only physically move on cold hits (the 44 ms column gather was
        # 4x a state copy).
        self.ext = (self.defer and self.L == 10 and self.n - self.L >= 4)
        self._col_shadow = list(range(min(self.L, self.n)))  # phys->canon
        self._col_pos = list(range(min(self.L, self.n)))     # canon->phys
        self._col_use = [0] * min(self.L, self.n)            # canon->tick
        self._tick = 0

    def _kernel(self, k_hi, k_lo):
        key = (self.n, k_hi, k_lo, self.L, str(self.float_type),
               self.defer)
        fn = _KERNEL_CACHE.get(key)
        if fn is None:
            build = _build_kernel_deferred if self.defer else _build_kernel
            fn = build(self.n, k_hi, k_lo, self.L)
            _KERNEL_CACHE[key] = fn
        return fn

    def _identity_map(self, size):
        import jax.numpy as jnp

        key = ('id', size)
        out = self._perm_cache.get(key)
        if out is None:
            out = jnp.arange(size, dtype=jnp.int32)
            self._perm_cache[key] = out
        return out

    def _shadow_colmap(self):
        """Canonicalizing column index vector from the host-tracked
        shadow: ``out[:, j] = data[:, m[j]]`` restores canonical order
        (``m[j]`` places canonical bit c at physical ``pos(c)``)."""
        import jax.numpy as jnp

        Lc = min(self.L, self.n)
        j = np.arange(2**Lc, dtype=np.int64)
        m = np.zeros_like(j)
        for c, p in enumerate(self._col_pos):
            m |= ((j >> c) & 1) << p
        return jnp.asarray(m.astype(np.int32))

    def flush(self, state):
        """Restore canonical layout (no-op if already canonical)."""
        shadow_id = self._col_shadow == list(range(len(self._col_shadow)))
        if self._inv_rowmap is None and self._inv_colmap is None and \
                shadow_id:
            return state
        key = ('flush', self.n, self.L)
        fn = _KERNEL_CACHE.get(key)
        if fn is None:
            fn = _build_flush(self.n, self.L)
            _KERNEL_CACHE[key] = fn
        R = 2**(self.n - self.L) if self.n > self.L else 1
        C = 2**min(self.L, self.n)
        rowmap = self._inv_rowmap if self._inv_rowmap is not None else \
            self._identity_map(R)
        if not shadow_id:
            colmap = self._shadow_colmap()
        else:
            colmap = self._inv_colmap if self._inv_colmap is not None \
                else self._identity_map(C)
        re, im = state
        state = fn(re, im, rowmap, colmap)
        self._inv_rowmap = None
        self._inv_colmap = None
        Lc = min(self.L, self.n)
        self._col_shadow = list(range(Lc))
        self._col_pos = list(range(Lc))
        return state

    def _perms(self, kind: str, bits: Tuple[int, ...], n_bits: int,
               major: bool = False):
        """Device-cached (perm, inv) pair for a position set."""
        import jax.numpy as jnp

        key = (kind, bits)
        out = self._perm_cache.get(key)
        if out is None:
            perm, inv = host_perm_and_inverse(bits, n_bits, major=major)
            out = (jnp.asarray(perm), jnp.asarray(inv))
            self._perm_cache[key] = out
        return out

    def prepare_state(self, state: str):
        from hybridq_tpu.simulation.prepare import prepare_state_split
        import jax.numpy as jnp

        re, im = prepare_state_split(state, float_type=self.float_type)
        return jnp.reshape(re, (-1,)), jnp.reshape(im, (-1,))

    def _uperm(self, order: Tuple[int, ...]):
        """Device-cached 2^k index vector reordering a gate matrix to
        the kernel's [hi..., lo...] bit order: U'[i, j] = U[s[i], s[j]]."""
        import jax.numpy as jnp

        key = ('u', order)
        out = self._perm_cache.get(key)
        if out is None:
            k = len(order)
            i = np.arange(2**k, dtype=np.int32)
            s = np.zeros(2**k, dtype=np.int32)
            for a, oa in enumerate(order):
                s |= ((i >> (k - 1 - a)) & 1) << (k - 1 - oa)
            out = jnp.asarray(s)
            self._perm_cache[key] = out
        return out

    def _ext_kernel(self, k_hi, k_lo, rotate):
        key = (self.n, 'ext', k_hi, k_lo, self.L, rotate,
               str(self.float_type))
        fn = _KERNEL_CACHE.get(key)
        if fn is None:
            fn = _build_kernel_ext(self.n, k_hi, k_lo, self.L, rotate)
            _KERNEL_CACHE[key] = fn
        return fn

    def _ext_pperm(self, phys: Tuple[int, ...]):
        """Device-cached 128-index vector mapping a physical low-7
        column index to kron order (gate lo bits msb-first, rest)."""
        import jax.numpy as jnp

        key = ('pp', phys)
        out = self._perm_cache.get(key)
        if out is None:
            kl = len(phys)
            rest = [p for p in range(7) if p not in phys]
            x = np.arange(128, dtype=np.int32)
            gate_part = np.zeros(128, dtype=np.int32)
            for j, p in enumerate(phys):
                gate_part |= ((x >> p) & 1) << (kl - 1 - j)
            rest_part = np.zeros(128, dtype=np.int32)
            for i, p in enumerate(rest):
                rest_part |= ((x >> p) & 1) << i
            out = jnp.asarray((gate_part << (7 - kl)) | rest_part)
            self._perm_cache[key] = out
        return out

    def _rotate_cols(self, lo_canon):
        """Re-home cold gate column bits into the physical low-7 (LRU
        eviction); updates the shadow and returns the 2^L column gather
        index vector realizing the move."""
        import jax.numpy as jnp

        Lc = min(self.L, self.n)
        old_pos = list(self._col_pos)
        gate_set = set(lo_canon)
        cold = [c for c in lo_canon if self._col_pos[c] >= 7]
        # Victims: canonical bits at physical < 7, not gate bits, LRU.
        victims = sorted(
            (c for c in range(Lc)
             if self._col_pos[c] < 7 and c not in gate_set),
            key=lambda c: self._col_use[c])
        for c, v in zip(cold, victims):
            pc, pv = self._col_pos[c], self._col_pos[v]
            self._col_pos[c], self._col_pos[v] = pv, pc
            self._col_shadow[pv], self._col_shadow[pc] = c, v
        # data'[:, x'] = data[:, m[x']]: bit at new position pos_new(c)
        # comes from old position pos_old(c).
        x = np.arange(2**Lc, dtype=np.int64)
        m = np.zeros_like(x)
        for c in range(Lc):
            m |= ((x >> self._col_pos[c]) & 1) << old_pos[c]
        return jnp.asarray(m.astype(np.int32))

    def _apply_ext(self, state, Ur, Ui, uperm, hi, lo):
        """Extended low-7 application (see ``_build_kernel_ext``)."""
        re, im = state
        n, L = self.n, self.L
        kh, kl = len(hi), len(lo)
        self._tick += 1
        lo_canon = [b for b, _ in lo]
        for c in lo_canon:
            self._col_use[c] = self._tick
        rotate = any(self._col_pos[c] >= 7 for c in lo_canon)
        kw = {}
        if rotate:
            kw['cperm'] = self._rotate_cols(lo_canon)
        phys = tuple(self._col_pos[c] for c in lo_canon)
        pperm = self._ext_pperm(phys)
        if kh:
            R = 2**(n - L)
            rp, rinv = self._perms('r', tuple(b - L for b, _ in hi),
                                   n - L)
            kw['rp'] = rp
            kw['inv_rowmap'] = (self._inv_rowmap
                                if self._inv_rowmap is not None
                                else self._identity_map(R))
        fn = self._ext_kernel(kh, kl, rotate)
        out = fn(re, im, Ur, Ui, uperm, pperm, **kw)
        if kh:
            self._inv_rowmap = rinv
        return out

    def apply_gate(self, state, U: np.ndarray, qubits: Tuple[int, ...],
                   U_dev=None):
        """Apply one gate; ``qubits`` are dense indices in [0, n).

        ``U_dev=(Ur, Ui)`` passes a device-resident split pair of the
        *raw* (un-reordered) matrix — e.g. a lazy slice of a stacked
        upload — avoiding a host->device transfer per gate."""
        import jax.numpy as jnp

        re, im = state
        n, L = self.n, self.L
        # Bit position of qubit i (from the LSB): n - 1 - i.
        bits = [n - 1 - q for q in qubits]
        hi = [(b, j) for j, b in enumerate(bits) if b >= L]
        lo = [(b, j) for j, b in enumerate(bits) if b < L]
        k = len(bits)

        # Kernel bit order [hi..., lo...]; the matrix reorder happens on
        # device via the uperm index vector.
        order = [j for _, j in hi] + [j for _, j in lo]
        uperm = self._uperm(tuple(order))

        ftype = self.float_type
        if U_dev is not None:
            Ur, Ui = U_dev
        else:
            Ur = jnp.asarray(np.ascontiguousarray(U.real), dtype=ftype)
            Ui = jnp.asarray(np.ascontiguousarray(U.imag), dtype=ftype)

        if self.use_pallas and not lo:
            from hybridq_tpu.simulation.pallas_kernels import \
                apply_gate_rows
            Urh = jnp.take(jnp.take(Ur, uperm, axis=0), uperm, axis=1)
            Uih = jnp.take(jnp.take(Ui, uperm, axis=0), uperm, axis=1)
            return apply_gate_rows(re, im, Urh, Uih,
                                   [b - L for b, _ in hi], n, L)

        # Extended low-7 path: column-bit gates avoid the column gather
        # entirely (see _build_kernel_ext).
        if self.ext and lo:
            if len(lo) > 7 or len(hi) > 5:
                # Column tracking is shadow-based in ext mode; the old
                # column-gather kernels would desynchronize it.
                raise NotImplementedError(
                    f"gate class (k_hi={len(hi)}, k_lo={len(lo)}) "
                    "unsupported in the extended engine; keep fused "
                    "blocks within k_lo <= 7 and k_hi <= 5")
            return self._apply_ext(state, Ur, Ui, uperm, hi, lo)

        fn = self._kernel(len(hi), len(lo))
        if self.defer:
            R = 2**(n - L) if n > L else 1
            C = 2**min(L, n)
            kw = {}
            if hi:
                rp, rinv = self._perms('r', tuple(b - L for b, _ in hi),
                                       n - L)
                kw['rp'] = rp
                kw['inv_rowmap'] = (self._inv_rowmap
                                    if self._inv_rowmap is not None
                                    else self._identity_map(R))
            else:
                kw['inv_rowmap'] = None
            if lo:
                cp, cinv = self._perms('c', tuple(b for b, _ in lo),
                                       min(L, n), major=True)
                kw['cp'] = cp
                kw['inv_colmap'] = (self._inv_colmap
                                    if self._inv_colmap is not None
                                    else self._identity_map(C))
            else:
                kw['inv_colmap'] = None
            out = fn(re, im, Ur, Ui, uperm, **kw)
            if hi:
                self._inv_rowmap = rinv
            if lo:
                self._inv_colmap = cinv
            return out

        kw = {}
        if hi:
            kw['rperm'], kw['rinv'] = self._perms(
                'r', tuple(b - L for b, _ in hi), n - L)
        if lo:
            kw['cperm'], kw['cinv'] = self._perms(
                'c', tuple(b for b, _ in lo), min(L, n), major=True)
        fn = self._kernel(len(hi), len(lo))
        return fn(re, im, Ur, Ui, uperm, **kw)

    def preload(self, mats):
        """Upload a list of raw k-qubit matrices as one stacked
        transfer per size class; returns per-gate device (Ur, Ui) pairs
        (lazy slices of the stacks) for ``apply_gate(..., U_dev=...)``.
        Host->device transfers ride a slow tunnel here — one stacked
        upload replaces one round trip per gate."""
        import jax.numpy as jnp

        by_dim: dict = {}
        for i, U in enumerate(mats):
            by_dim.setdefault(U.shape[0], []).append(i)
        out = [None] * len(mats)
        for dim, idxs in by_dim.items():
            sr = jnp.asarray(np.stack(
                [np.ascontiguousarray(mats[i].real) for i in idxs]),
                dtype=self.float_type)
            si = jnp.asarray(np.stack(
                [np.ascontiguousarray(mats[i].imag) for i in idxs]),
                dtype=self.float_type)
            for j, i in enumerate(idxs):
                out[i] = (sr[j], si[j])
        return out

    def apply_gates(self, state, gates, qubit_index):
        mats = [np.ascontiguousarray(g.matrix()) for g in gates]
        devs = self.preload(mats)
        for g, U, dev in zip(gates, mats, devs):
            qs = tuple(qubit_index[q] for q in g.qubits)
            state = self.apply_gate(state, U, qs, U_dev=dev)
        return state

    def gather(self, state, complex_type='complex64') -> np.ndarray:
        state = self.flush(state)
        re, im = state
        out = np.asarray(re).astype(complex_type)
        out += 1j * np.asarray(im).astype(self.float_type)
        return out.reshape((2,) * self.n)
