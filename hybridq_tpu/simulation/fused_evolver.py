"""Single-chip evolution engine on the one-pass fused Pallas kernels.

Container: ``[2^(n-6), 128]`` f32 (lanes = 7 minor amplitude bits,
stack bit = top row bit).  Physical layout is tracked as a BIT
PERMUTATION (``phys[logical_bit] -> physical slot``): the fused
kernels read and write every amplitude in place, so applying a gate
never perturbs the layout — except the swap path, which exchanges the
gate's lane slots with cold (LRU) high slots as a FREE relabel (the
data moves inside the same one-pass traversal that applies the gate).
This replaces the XLA engine's deferred-gather machinery and its
40 ms column-rotation pass (``kernels.py:909-953``) entirely.

Per-gate routing by the gate bits' current physical slots:

  =============================  ============================  =======
  class                          kernel                        ms@28q
  =============================  ============================  =======
  no lane slots, k_hi <= 4       ``fused_kernel``              10-40
  k_l <= 2 lane slots            ``swap_kernel`` (+relabel)    23-41
  k_l >= 3                       pure-swap prepass + above     +37
  U_row (x) U_lane blocks        ``factored_kernel``           22-25
  =============================  ============================  =======

Host-side operator builds (<= 512^2 numpy) are memoized per
(gate id, map state): a repeated schedule (deterministic LRU ->
the map orbit cycles) reaches a zero-upload steady state.

Reference parity: the runtime-position U kernel + swap scheduling of
``include/U.h:123-202`` / ``simulation.py:512-630``, redesigned for
one-pass TPU streaming."""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from hybridq_tpu.simulation.pallas_fused import (FUSED_RUN_ROWS,
                                                 build_w, build_w_swap,
                                                 fused_kernel,
                                                 fused_meta,
                                                 swap_kernel,
                                                 swap_meta)

__all__ = ['FusedEvolver', 'MIN_FUSED_QUBITS']

MIN_FUSED_QUBITS = 14    # below: use IndexedEvolver (small path)
_MAX_KE = 4              # largest compiled (stack+group) exponent
_MAX_KL = 2              # lane bits handled per swap application


class _NeedHighSlots(RuntimeError):
    """Swap path found fewer free high slots than victims needed."""

    def __init__(self, missing):
        super().__init__(f"need {missing} more free high slots")
        self.missing = missing


class FusedEvolver:
    """See module docstring.  Usage mirrors ``IndexedEvolver``::

        ev = FusedEvolver(n)
        state = ev.prepare_state('0' * n)
        state = ev.apply_gates(state, gates, qubit_index)
        psi = ev.gather(state)
    """

    def __init__(self, n_qubits: int, precision: str = 'highest',
                 interpret: bool = False):
        self.n = int(n_qubits)
        if self.n < MIN_FUSED_QUBITS:
            raise ValueError(
                f"FusedEvolver needs n >= {MIN_FUSED_QUBITS}")
        if str(precision).lower() != 'highest':
            raise ValueError(
                "fused kernels run precision='highest' only (exact-f32 "
                "dots; bf16 variants are not implemented)")
        self.interpret = bool(interpret)
        # phys[b] = physical slot of logical flat bit b; lanes are
        # slots 0-6, rows 7..n-1 (stack is fixed at the top row bit
        # and never tracked).
        self.phys = list(range(self.n))
        self.logi = list(range(self.n))
        self._tick = 0
        self._use = [0] * self.n          # logical bit -> last use
        self._prep_cache: dict = {}       # (gate_key, map_key) -> prep
        self._rowmap_cache: dict = {}

    # -- layout helpers ------------------------------------------------
    def _map_key(self):
        return tuple(self.phys)

    def _victims(self, k: int, exclude) -> list:
        """``k`` coldest logical bits on high slots (>= 12), excluded
        bits skipped; returns their PHYSICAL slots."""
        cands = sorted(
            (b for b in range(self.n)
             if self.phys[b] >= 12 and b not in exclude),
            key=lambda b: self._use[b])
        if len(cands) < k:
            raise _NeedHighSlots(k - len(cands))
        return [self.phys[b] for b in cands[:k]]

    def _free_high_slots(self, state, bits_log, count):
        """Small-n fallback: one row-permute parking ``count`` of the
        gate's high-slot bits on free sublane slots (7-11) — they
        become free identity-extension bits — releasing high slots
        for swap victims."""
        gate_hi = [b for b in bits_log if self.phys[b] >= 12]
        free_sub = [s for s in range(7, 12)
                    if self.logi[s] not in bits_log]
        if len(gate_hi) < count or len(free_sub) < count:
            raise RuntimeError(
                "cannot free enough high slots for the swap path "
                f"(n={self.n} too small for this gate)")
        new_phys = list(self.phys)
        for b, s in zip(gate_hi[:count], free_sub[:count]):
            other = self.logi[s]
            new_phys[b], new_phys[other] = s, self.phys[b]
        return self._row_permute(state, new_phys)

    def _apply_swap_relabel(self, lane_slots, victim_slots):
        """Record the lane<->victim physical exchange."""
        for a, v in zip(lane_slots, victim_slots):
            la, lv = self.logi[a], self.logi[v]
            self.phys[la], self.phys[lv] = v, a
            self.logi[a], self.logi[v] = lv, la

    # -- gate preparation ----------------------------------------------
    def _prepare(self, U: np.ndarray, qubits: Tuple[int, ...],
                 gate_key=None):
        """Host args + kernel id for one application at the CURRENT
        map state; memoized by (gate_key, map state).  Returns
        ``(kind, cls, dev_args, relabel)`` where ``relabel`` is the
        (lane_slots, victim_slots) exchange to record at apply time."""
        import jax.numpy as jnp

        n = self.n
        bits_log = [n - 1 - q for q in qubits]
        key = None
        if gate_key is not None:
            key = (gate_key, self._map_key())
            hit = self._prep_cache.get(key)
            if hit is not None:
                return hit
        phys_bits = [self.phys[b] for b in bits_log]
        lane = sorted((b for b in phys_bits if b < 7), reverse=True)
        k_l = len(lane)
        i32 = jnp.int32

        if k_l == 0:
            k_hi = fused_meta(n, phys_bits)[0]
            W, h_offs, rest_mask = build_w(n, U, phys_bits)
            out = ('fused', (k_hi,),
                   (jnp.asarray(W), jnp.asarray(h_offs, i32),
                    jnp.asarray([rest_mask], i32)), None)
        else:
            if k_l > _MAX_KL:
                out = None     # caller splits with a pure-swap prepass
            else:
                victims = self._victims(k_l, set(bits_log))
                k_hi, _, h_offs, rest_mask, Ms = swap_meta(
                    n, phys_bits, victims)
                if k_hi + k_l > _MAX_KE:
                    raise NotImplementedError(
                        f"gate class ke={k_hi + k_l} exceeds the "
                        f"compiled limit {_MAX_KE}; let the scheduler "
                        "split the block")
                W = build_w_swap(n, U, phys_bits, victims)
                out = ('swap', (k_hi + k_l, k_l),
                       (jnp.asarray(W), jnp.asarray(Ms),
                        jnp.asarray(h_offs, i32),
                        jnp.asarray([rest_mask], i32)),
                       (lane, victims))
        if key is not None and out is not None:
            self._prep_cache[key] = out
        return out

    def _kernel(self, kind, cls):
        if kind == 'fused':
            return fused_kernel(self.n, cls[0],
                                interpret=self.interpret)
        return swap_kernel(self.n, cls[0], cls[1],
                           interpret=self.interpret)

    # -- application ---------------------------------------------------
    def apply_gate(self, state, U: np.ndarray,
                   qubits: Tuple[int, ...], gate_key=None):
        """Apply one gate; ``qubits`` are dense indices in [0, n).
        ``gate_key`` (hashable) enables prep memoization across
        repeated applications of the same gate."""
        n = self.n
        bits_log = [n - 1 - q for q in qubits]
        self._tick += 1
        for b in bits_log:
            self._use[b] = self._tick

        prep = None
        for _ in range(6):
            try:
                prep = self._prepare(U, qubits, gate_key=gate_key)
                if prep is not None:
                    break
                # > _MAX_KL lane bits: evict surplus lane bits with a
                # pure-swap prepass (identity gate), then retry.
                state = self._evict_lanes(state, keep=set(bits_log))
            except _NeedHighSlots as e:
                # small-n fallback: park gate high bits on sublanes
                state = self._free_high_slots(state, bits_log,
                                              e.missing)
        if prep is None:
            raise NotImplementedError("lane eviction failed")
        kind, cls, dev_args, relabel = prep
        fn = self._kernel(kind, cls)
        state = fn(state, *dev_args)
        if relabel is not None:
            self._apply_swap_relabel(*relabel)
        return state

    def _identity_swap(self, state, lane_slots, victim_slots):
        """Pure-swap pass: exchange ``lane_slots`` (< 7) with
        ``victim_slots`` (>= 12) under an identity gate.  The kernel
        pairs victims with lane bits SORTED DESCENDING
        (``swap_meta``) — reorder the pairs to match."""
        import jax.numpy as jnp

        pairs = sorted(zip(lane_slots, victim_slots), reverse=True)
        lane_slots = [a for a, _ in pairs]
        victim_slots = [v for _, v in pairs]
        k_l = len(lane_slots)
        phys_bits = list(lane_slots)
        _, _, h_offs, rest_mask, Ms = swap_meta(
            self.n, phys_bits, victim_slots)
        W = build_w_swap(self.n, np.eye(2 ** k_l), phys_bits,
                         victim_slots)
        i32 = jnp.int32
        fn = swap_kernel(self.n, k_l, k_l, interpret=self.interpret)
        state = fn(state, jnp.asarray(W), jnp.asarray(Ms),
                   jnp.asarray(h_offs, i32),
                   jnp.asarray([rest_mask], i32))
        self._apply_swap_relabel(lane_slots, victim_slots)
        return state

    def _evict_lanes(self, state, keep):
        """Move ``_MAX_KL`` of the gate's lane bits out of lanes so
        the next application fits k_l <= ``_MAX_KL``."""
        lanes_to_move = sorted(
            (self.phys[b] for b in keep if self.phys[b] < 7),
            reverse=True)[:_MAX_KL]
        victims = self._victims(len(lanes_to_move), keep)
        return self._identity_swap(state, lanes_to_move, victims)

    def apply_gates(self, state, gates, qubit_index):
        for i, g in enumerate(gates):
            qs = tuple(qubit_index[q] for q in g.qubits)
            U = np.ascontiguousarray(g.matrix())
            state = self.apply_gate(state, U, qs)
        return state

    # -- state ---------------------------------------------------------
    def prepare_state(self, state: str):
        import jax.numpy as jnp

        from hybridq_tpu.simulation.prepare import prepare_state_split

        re, im = prepare_state_split(state, float_type='float32')
        flat = jnp.concatenate([jnp.reshape(re, -1),
                                jnp.reshape(im, -1)])
        return jnp.reshape(flat, (2 ** (self.n - 6), 128))

    def _row_permute(self, state, new_phys):
        """One XLA gather re-homing ROW bits (slots >= 7) so logical
        bit b sits at ``new_phys[b]``; lane slots must agree."""
        import jax
        import jax.numpy as jnp

        n = self.n
        n_rows = 2 ** (n + 1 - 7)
        rows = np.arange(n_rows, dtype=np.int64)
        src = np.zeros_like(rows)
        # stack (top row bit) stays.
        src |= (rows >> (n - 7)) << (n - 7)
        for b in range(n):
            if self.phys[b] < 7:
                if new_phys[b] != self.phys[b]:
                    raise ValueError("lane slots cannot row-permute")
                continue
            src |= (((rows >> (new_phys[b] - 7)) & 1)
                    << (self.phys[b] - 7))
        fn = self._rowmap_cache.get('take')
        if fn is None:
            fn = jax.jit(lambda st, m: jnp.take(st, m, axis=0),
                         donate_argnums=(0,))
            self._rowmap_cache['take'] = fn
        state = fn(state, jnp.asarray(src.astype(np.int32)))
        for b in range(n):
            self.phys[b] = new_phys[b]
            self.logi[new_phys[b]] = b
        return state

    def _make_free_high(self, state, count):
        """Row-permute lane-destined bits parked on high slots down to
        sublane slots (exchanging with non-lane-destined residents),
        releasing high slots for swap victims."""
        new_phys = list(self.phys)
        hi_parked = [b for b in range(7) if self.phys[b] >= 12]
        sub_other = [self.logi[s] for s in range(7, 12)
                     if self.logi[s] >= 7]
        moved = 0
        for b, o in zip(hi_parked, sub_other):
            if moved >= count:
                break
            new_phys[b], new_phys[o] = new_phys[o], new_phys[b]
            moved += 1
        if moved < count:
            raise RuntimeError(
                f"flush: cannot free {count} high slots (n={self.n})")
        return self._row_permute(state, new_phys)

    def flush(self, state):
        """Restore the canonical layout (logical bit b at slot b):
        identity swaps re-home the lane slots (each iteration settles
        up to ``_MAX_KL`` of them permanently), then one row gather
        canonicalizes the row bits."""
        n = self.n
        lane_dest = set(range(7))
        while self.phys != list(range(n)):
            # Lane-destined bits in WRONG lane slots: park them on
            # high slots first (their own slot may be occupied by
            # another lane-destined bit — break cycles through rows).
            stuck = [a for a in range(7)
                     if self.phys[a] < 7 and self.phys[a] != a]
            if stuck:
                batch = stuck[:_MAX_KL]
                try:
                    victims = self._victims(len(batch), lane_dest)
                except _NeedHighSlots as e:
                    state = self._make_free_high(state, e.missing)
                    continue
                state = self._identity_swap(
                    state, [self.phys[a] for a in batch], victims)
                continue
            wrong = [a for a in range(7) if self.logi[a] != a]
            if wrong:
                batch = wrong[:_MAX_KL]
                # Targets must sit on HIGH slots to be swap victims;
                # row-permute sublane-parked ones up first.
                need = [a for a in batch if self.phys[a] < 12]
                if need:
                    new_phys = list(self.phys)
                    frees = [s for s in range(12, n)
                             if self.logi[s] not in batch]
                    for a in need:
                        s_free = frees.pop()
                        other = self.logi[s_free]
                        new_phys[a], new_phys[other] = \
                            s_free, new_phys[a]
                    state = self._row_permute(state, new_phys)
                state = self._identity_swap(
                    state, batch, [self.phys[a] for a in batch])
                continue
            # Lanes canonical: one row gather fixes the rest.
            state = self._row_permute(state, list(range(n)))
        return state

    def gather(self, state, complex_type='complex64') -> np.ndarray:
        state = self.flush(state)
        flat = np.asarray(state).reshape(2, -1)
        out = flat[0].astype(complex_type)
        out += 1j * flat[1].astype('float32')
        return out.reshape((2,) * self.n)

    # -- AOT warm-up ----------------------------------------------------
    def warm(self, classes=None, max_workers: int = 8,
             verbose: bool = False):
        """AOT-compile the fused kernel classes CONCURRENTLY with one
        serial retry (the shared remote compile service 500s
        intermittently under bursts; a transient 500 earlier masked a
        perfectly compilable class for a whole round)."""
        import sys as _sys
        import time as _t
        from concurrent.futures import ThreadPoolExecutor

        import jax
        import jax.numpy as jnp

        if classes is None:
            classes = ([('fused', (k,)) for k in range(_MAX_KE + 1)] +
                       [('swap', (ke, kl))
                        for kl in (1, 2)
                        for ke in range(kl, _MAX_KE + 1)])
        n = self.n
        t0 = _t.time()

        def sd(shape, dt=jnp.float32):
            return jax.ShapeDtypeStruct(shape, dt)

        def one(spec):
            kind, cls = spec
            st = sd((2 ** (n - 6), 128))
            info = sd((1,), jnp.int32)
            try:
                if kind == 'fused':
                    k_hi = cls[0]
                    args = (st, sd((2 ** (k_hi + 1) * 32,) * 2),
                            sd((2 ** (k_hi + 1),), jnp.int32), info)
                else:
                    ke, kl = cls
                    T = 2 ** kl
                    args = (st, sd((2 ** (ke + 1) * 32,) * 2),
                            sd((T, T, 128, 128)),
                            sd((2 ** (ke + 1),), jnp.int32), info)
                self._kernel(kind, cls).lower(*args).compile()
                return None
            except Exception as e:
                if verbose:
                    print(f"# warm {spec}: {type(e).__name__}: "
                          f"{str(e)[:120]}", file=_sys.stderr,
                          flush=True)
                return spec

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            failed = [s for s in pool.map(one, classes)
                      if s is not None]
        for spec in failed:
            for attempt in range(2):
                _t.sleep(2.0 * (attempt + 1))
                if one(spec) is None:
                    break
        if verbose:
            print(f"# warmed {len(classes)} fused classes in "
                  f"{_t.time() - t0:.0f}s", file=_sys.stderr,
                  flush=True)
