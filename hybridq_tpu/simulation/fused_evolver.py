"""Single-chip evolution engine on the one-pass fused Pallas kernels.

Container: ``[2^(n-6), 128]`` f32 (lanes = 7 minor amplitude bits,
stack bit = top row bit).  Physical layout is tracked as a BIT
PERMUTATION (``phys[logical_bit] -> physical slot``): the fused
kernels read and write every amplitude in place, so applying a gate
never perturbs the layout — except the swap path, which exchanges the
gate's lane slots with victim high slots (lowest physical slot first —
a map-pure policy, see ``_victims``) as a FREE relabel (the data moves
inside the same one-pass traversal that applies the gate).
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


def _econ_park_count(n, phys, logi, bits_log, high,
                     inplace=False) -> int:
    """How many gate high bits to park on free sublane slots BEFORE
    routing (0 = apply directly).  One row gather re-homes any number
    of bits at once, so the choice is the ``c`` minimizing
    ``park + class(k_hi - c)`` vs the direct class — profitable
    whenever the direct class is MXU-bound (fused k_hi >= 3 costs
    2-4x k_hi <= 2; the gather is one HBM pass).  Pure function of the
    slot map, mirrored exactly by ``MapSim.route_gate``."""
    phys_bits = [phys[b] for b in bits_log]
    k_l = sum(1 for b in phys_bits if b < 7)
    if k_l > _MAX_KL:
        return 0            # lane eviction must run first
    k_hi = sum(1 for b in phys_bits if b >= 12)
    free_sub = sum(1 for s in range(7, 12) if logi[s] not in bits_log)
    c_max = min(k_hi, free_sub)
    if c_max <= 0:
        return 0

    def cls_cost(kh):
        if kh + k_l > _MAX_KE:
            return float('inf')
        if k_l == 0:
            return _step_cost(('fused', kh), n, high)
        return _step_cost(('swap', kh + k_l, k_l), n, high)

    best_c, best = 0, cls_cost(k_hi)
    for c in range(1, c_max + 1):
        park = _step_cost(('ipark', c) if inplace else ('park',),
                          n, high)
        v = park + cls_cost(k_hi - c)
        if v < best - 1e-9:
            best_c, best = c, v
    return best_c


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
                 interpret: bool = False, inplace=None):
        self.n = int(n_qubits)
        if self.n < MIN_FUSED_QUBITS:
            raise ValueError(
                f"FusedEvolver needs n >= {MIN_FUSED_QUBITS}")
        # In-place parks: permutation-W kernel passes instead of XLA
        # row gathers.  Default ON everywhere — an ipark(2) pass costs
        # a fused(2) class (~29 ms at 29q) vs the measured ~103 ms row
        # gather, and the cost-model replay of the 29q bench schedule
        # predicts 20.7 vs 15.5 gates/s.  At n >= 30 it is REQUIRED:
        # the gather needs 2x state memory (8.6 GB state on 16 GB HBM).
        self.inplace = bool(True if inplace is None else inplace)
        precision = str(precision).lower()
        if precision not in ('highest', 'high'):
            raise ValueError(
                "fused kernels run precision='highest' (exact f32, "
                "6-pass bf16 dots) or 'high' (3-pass bf16, ~2x faster "
                "MXU-bound classes, ~1e-6-grade instead of ~1e-7)")
        self.high = precision == 'high'
        self.interpret = bool(interpret)
        # phys[b] = physical slot of logical flat bit b; lanes are
        # slots 0-6, rows 7..n-1 (stack is fixed at the top row bit
        # and never tracked).
        self.phys = list(range(self.n))
        self.logi = list(range(self.n))
        self._prep_cache: dict = {}       # (gate_key, map_key) -> prep
        self._rowmap_cache: dict = {}
        # Step classes executed by apply_gate (appended per kernel /
        # row-permute invocation): the scheduler mirror
        # (``simulate_route``) is tested against this trace.
        self.last_steps: list = []

    # -- layout helpers ------------------------------------------------
    def _map_key(self):
        return tuple(self.phys)

    def _victims(self, k: int, exclude) -> list:
        """``k`` victim bits on high slots (>= 12), excluded bits
        skipped; returns their PHYSICAL slots.  Selection is a PURE
        function of the slot map (lowest slot first): with a
        deterministic policy a repeated gate schedule drives the map
        into a short orbit, so the per-(gate, map) prep memo reaches a
        zero-host-work steady state — LRU ticks would make every pass
        a new map state and a fresh W build + tunnel upload (measured
        ~2 s/gate of host stalls vs ~30 ms of kernel)."""
        cands = sorted(
            (self.phys[b] for b in range(self.n)
             if self.phys[b] >= 12 and b not in exclude))
        if len(cands) < k:
            raise _NeedHighSlots(k - len(cands))
        return cands[:k]

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

    def _park_pass(self, state, bits_log, count):
        """In-place alternative to ``_free_high_slots``: exchange
        ``count`` gate high bits with free-sublane residents via ONE
        fused-kernel pass whose W is the pair-SWAP permutation (class
        ``fused(count)``).  The XLA row-gather park needs 2x state
        memory (input + gathered output); this pass writes in place,
        so it is the only park admissible at the 30q single-chip
        ceiling (8.6 GB state on 16 GB HBM)."""
        import jax.numpy as jnp

        gate_hi = [b for b in bits_log if self.phys[b] >= 12][:count]
        free_sub = [s for s in range(7, 12)
                    if self.logi[s] not in bits_log][:count]
        if len(gate_hi) < count or len(free_sub) < count:
            raise RuntimeError(
                "cannot free enough high slots for the swap path "
                f"(n={self.n} too small for this gate)")
        phys_bits = []
        for b, s in zip(gate_hi, free_sub):
            phys_bits += [self.phys[b], s]
        SW = np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                       [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float64)
        U = np.array([[1.0]])
        for _ in range(count):
            U = np.kron(U, SW)
        W, h_offs, rest_mask = build_w(self.n, U, phys_bits)
        fn = fused_kernel(self.n, count, interpret=self.interpret,
                          high=self.high)
        i32 = jnp.int32
        state = fn(state, jnp.asarray(W), jnp.asarray(h_offs, i32),
                   jnp.asarray([rest_mask], i32))
        for b, s in zip(gate_hi, free_sub):
            other = self.logi[s]
            pb = self.phys[b]
            self.phys[b], self.phys[other] = s, pb
            self.logi[s], self.logi[pb] = b, other
        return state

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
            if k_hi > _MAX_KE:
                # park excess high bits on free sublane slots (same
                # row-permute fallback as victim scarcity)
                raise _NeedHighSlots(k_hi - _MAX_KE)
            W, h_offs, rest_mask = build_w(n, U, phys_bits)
            out = ('fused', (k_hi,),
                   (jnp.asarray(W), jnp.asarray(h_offs, i32),
                    jnp.asarray([rest_mask], i32)), None)
        else:
            if k_l > _MAX_KL:
                out = None     # caller splits with a pure-swap prepass
            else:
                k_hi = sum(1 for b in phys_bits if b >= 12)
                if k_hi + k_l > _MAX_KE:
                    raise _NeedHighSlots(k_hi + k_l - _MAX_KE)
                victims = self._victims(k_l, set(bits_log))
                k_hi, _, h_offs, rest_mask, Ms = swap_meta(
                    n, phys_bits, victims)
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
                                interpret=self.interpret,
                                high=self.high)
        return swap_kernel(self.n, cls[0], cls[1],
                           interpret=self.interpret, high=self.high)

    # -- application ---------------------------------------------------
    def apply_gate(self, state, U: np.ndarray,
                   qubits: Tuple[int, ...], gate_key=None):
        """Apply one gate; ``qubits`` are dense indices in [0, n).
        ``gate_key`` (hashable) enables prep memoization across
        repeated applications of the same gate."""
        n = self.n
        bits_log = [n - 1 - q for q in qubits]

        prep = None
        for _ in range(6):
            # Economic parking: one row gather re-homing gate high
            # bits onto free sublane slots (identity-extension = free)
            # when park + the cheaper class beats the direct class
            # (fused k_hi>=3 is MXU-bound and costs 2-4x k_hi<=2).
            c = _econ_park_count(self.n, self.phys, self.logi,
                                 bits_log, self.high, self.inplace)
            if c:
                if self.inplace:
                    state = self._park_pass(state, bits_log, c)
                    self.last_steps.append(('ipark', c))
                else:
                    state = self._free_high_slots(state, bits_log, c)
                    self.last_steps.append(('park',))
            try:
                prep = self._prepare(U, qubits, gate_key=gate_key)
                if prep is not None:
                    break
                # > _MAX_KL lane bits: evict surplus lane bits with a
                # pure-swap prepass (identity gate), then retry.
                state = self._evict_lanes(state, keep=set(bits_log))
            except _NeedHighSlots as e:
                # park gate high bits on free sublane slots
                if self.inplace:
                    state = self._park_pass(state, bits_log, e.missing)
                    self.last_steps.append(('ipark', e.missing))
                else:
                    state = self._free_high_slots(state, bits_log,
                                                  e.missing)
                    self.last_steps.append(('park',))
        if prep is None:
            raise NotImplementedError("lane eviction failed")
        kind, cls, dev_args, relabel = prep
        fn = self._kernel(kind, cls)
        state = fn(state, *dev_args)
        self.last_steps.append((kind,) + cls)
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
        fn = swap_kernel(self.n, k_l, k_l, interpret=self.interpret,
                         high=self.high)
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
        self.last_steps.append(('evict', len(lanes_to_move)))
        return self._identity_swap(state, lanes_to_move, victims)

    def apply_gates(self, state, gates, qubit_index):
        for i, g in enumerate(gates):
            qs = tuple(qubit_index[q] for q in g.qubits)
            U = np.ascontiguousarray(g.matrix())
            state = self.apply_gate(state, U, qs)
        return state

    # -- state ---------------------------------------------------------
    def prepare_state(self, state: str):
        """Token product state built ON DEVICE: no 2^n host transfer
        (the tunnel upload of an 8.6 GB 30q state takes minutes) and
        no concatenate doubling (zeros + row-slice update alias inside
        one jit, so peak memory is ~1.5x the state, admitting the
        single-chip 30q ceiling on a 16 GB part)."""
        import jax
        import jax.numpy as jnp

        from hybridq_tpu.simulation.prepare import (TOKEN_VECTORS,
                                                    _check_state)

        n = self.n
        state = _check_state(state, 2)
        if len(state) != n:
            raise ValueError("Wrong number of qubits for state.")
        # Token amplitudes are real: re = outer(row_amp, lane_amp).
        row_amp = np.array([1.0], dtype=np.float32)
        for s in state[:n - 7]:
            row_amp = np.multiply.outer(
                row_amp, TOKEN_VECTORS[s].astype(np.float32)).reshape(-1)
        lane_amp = np.array([1.0], dtype=np.float32)
        for s in state[n - 7:]:
            lane_amp = np.multiply.outer(
                lane_amp, TOKEN_VECTORS[s].astype(np.float32)).reshape(-1)

        fn = self._rowmap_cache.get('prep')
        if fn is None:
            def build(row_amp, lane_amp):
                st = jnp.zeros((2 ** (n - 6), 128), jnp.float32)
                re = row_amp[:, None] * lane_amp[None, :]
                return st.at[:2 ** (n - 7)].set(re)

            fn = jax.jit(build)
            self._rowmap_cache['prep'] = fn
        return fn(jnp.asarray(row_amp), jnp.asarray(lane_amp))

    def amplitude_location(self, i: int):
        """Physical ``(row_re, col, row_im)`` of logical flat amplitude
        ``i`` under the CURRENT slot map — readback without a flush
        (whose row gather needs 2x state memory, impossible at the
        30q single-chip ceiling)."""
        p = 0
        for b in range(self.n):
            if (i >> b) & 1:
                p |= 1 << self.phys[b]
        r, c = divmod(p, 128)
        return r, c, r + 2 ** (self.n - 7)

    def amplitude(self, state, i: int) -> complex:
        r, c, ri = self.amplitude_location(int(i))
        return complex(
            float(np.asarray(state[r:r + 1, c:c + 1])[0, 0]),
            float(np.asarray(state[ri:ri + 1, c:c + 1])[0, 0]))

    def _row_permute(self, state, new_phys):
        """One XLA gather re-homing ROW bits (slots >= 7) so logical
        bit b sits at ``new_phys[b]``; lane slots must agree."""
        import jax
        import jax.numpy as jnp

        n = self.n
        # Device-cache the row gather index by (from, to) layout: the
        # host build + upload is a 32 MB tunnel transfer per call at
        # 29q (measured seconds); park transitions recur every orbit
        # period, so steady state must hit this cache.
        mkey = (tuple(self.phys), tuple(new_phys))
        src_dev = self._rowmap_cache.get(mkey)
        if src_dev is None:
            n_rows = 2 ** (n + 1 - 7)
            rows = np.arange(n_rows, dtype=np.int64)
            src = np.zeros_like(rows)
            # stack (top row bit) stays.
            src |= (rows >> (n - 7)) << (n - 7)
            for b in range(n):
                if self.phys[b] < 7:
                    if new_phys[b] != self.phys[b]:
                        raise ValueError(
                            "lane slots cannot row-permute")
                    continue
                src |= (((rows >> (new_phys[b] - 7)) & 1)
                        << (self.phys[b] - 7))
            src_dev = jnp.asarray(src.astype(np.int32))
            self._rowmap_cache[mkey] = src_dev
        fn = self._rowmap_cache.get('take')
        if fn is None:
            fn = jax.jit(lambda st, m: jnp.take(st, m, axis=0),
                         donate_argnums=(0,))
            self._rowmap_cache['take'] = fn
        state = fn(state, src_dev)
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


# ---------------------------------------------------------------------
# scheduler: routing mirror + fused-aware gate pairing
# ---------------------------------------------------------------------
#
# The pairing scheduler needs per-gate costs that depend on the
# EVOLVING slot map (a gate's class is set by where its bits live when
# it runs).  ``MapSim`` replicates FusedEvolver's routing and layout
# bookkeeping exactly — branch order, lowest-slot victim choice,
# eviction and parking fallbacks — and is asserted against the recorded
# ``last_steps`` trace (tests/test_fused_evolver.py).

# Measured per-application costs (ms, 28q v5e, probe_fused_perf.py);
# scaled by 2^(n-28) — every class is HBM/MXU bound linearly in state
# size.  Refreshed per device kind by ``FusedEvolver.calibrate`` via
# the shared calibration file.
_FUSED_COST = {0: 9.7, 1: 9.8, 2: 15.4, 3: 23.6, 4: 39.9}
_SWAP_COST = {(1, 1): 22.9, (2, 1): 23.7, (3, 1): 32.3, (4, 1): 47.0,
              (2, 2): 36.7, (3, 2): 40.6, (4, 2): 55.0}
_PARK_COST = 16.0        # one row-gather pass


def _step_cost(step, n: int, high: bool = False) -> float:
    from hybridq_tpu.simulation.kernels import (_calibration,
                                                _device_kind)

    calib = _calibration()
    kind = step[0]
    hs = 'h' if high else ''
    if kind == 'park':
        # XLA row gather: precision-independent.
        base, key = _PARK_COST, f"{_device_kind()}|fpark|0|0|0"
    elif kind == 'ipark':
        # In-place park = one fused(c) permutation pass.
        c = step[1]
        base = _FUSED_COST.get(c, 60.0)
        key = f"{_device_kind()}|ffused{hs}|{c}|{c}|0"
    elif kind == 'evict':
        kl = step[1]
        base = _SWAP_COST.get((kl, kl), 40.0)
        key = f"{_device_kind()}|fswap{hs}|{kl}|{kl}|{kl}"
    elif kind == 'fused':
        base = _FUSED_COST.get(step[1], 60.0)
        key = f"{_device_kind()}|ffused{hs}|{step[1]}|{step[1]}|0"
    else:  # swap
        ke, kl = step[1], step[2]
        base = _SWAP_COST.get((ke, kl), 70.0)
        key = f"{_device_kind()}|fswap{hs}|{ke}|{ke}|{kl}"
    meas = calib.get(key)
    if meas is None and high:
        meas = calib.get(key.replace(hs + '|', '|', 1))
    if meas is not None:
        n_meas, ms = meas
        return max(0.5, float(ms) * 2.0 ** (n - float(n_meas)))
    return max(0.5, base * 2.0 ** (n - 28))


class MapSim:
    """Clonable mirror of FusedEvolver's slot map + routing."""

    __slots__ = ('n', 'phys', 'logi', 'high', 'inplace')

    def __init__(self, n, phys=None, logi=None, high=False,
                 inplace=False):
        self.n = n
        self.phys = list(phys) if phys else list(range(n))
        self.logi = list(logi) if logi else list(range(n))
        self.high = bool(high)
        self.inplace = bool(inplace)

    @classmethod
    def of(cls, ev: 'FusedEvolver') -> 'MapSim':
        return cls(ev.n, ev.phys, ev.logi, ev.high, ev.inplace)

    def clone(self) -> 'MapSim':
        return MapSim(self.n, self.phys, self.logi, self.high,
                      self.inplace)

    def _victims(self, k, exclude):
        cands = sorted(
            (self.phys[b] for b in range(self.n)
             if self.phys[b] >= 12 and b not in exclude))
        if len(cands) < k:
            raise _NeedHighSlots(k - len(cands))
        return cands[:k]

    def _relabel(self, lane_slots, victim_slots):
        pairs = sorted(zip(lane_slots, victim_slots), reverse=True)
        for a, v in pairs:
            la, lv = self.logi[a], self.logi[v]
            self.phys[la], self.phys[lv] = v, a
            self.logi[a], self.logi[v] = lv, la

    def _park(self, bits_log, count):
        gate_hi = [b for b in bits_log if self.phys[b] >= 12]
        free_sub = [s for s in range(7, 12)
                    if self.logi[s] not in bits_log]
        if len(gate_hi) < count or len(free_sub) < count:
            raise RuntimeError("cannot free high slots")
        for b, s in zip(gate_hi[:count], free_sub[:count]):
            other = self.logi[s]
            pb = self.phys[b]
            self.phys[b], self.phys[other] = s, pb
            self.logi[s], self.logi[pb] = b, other

    def route_gate(self, qubits) -> list:
        """Mirror of ``FusedEvolver.apply_gate`` routing: mutates the
        sim and returns the step-class list the engine would execute
        (same tuples as ``FusedEvolver.last_steps``).  Raises on
        impossible gates (the pairing scheduler treats that as an
        illegal merge)."""
        n = self.n
        bits_log = [n - 1 - q for q in qubits]
        steps = []
        for _ in range(6):
            c = _econ_park_count(n, self.phys, self.logi, bits_log,
                                 self.high, self.inplace)
            if c:
                self._park(bits_log, c)
                steps.append(('ipark', c) if self.inplace
                             else ('park',))
            phys_bits = [self.phys[b] for b in bits_log]
            lane = sorted((b for b in phys_bits if b < 7),
                          reverse=True)
            k_l = len(lane)
            try:
                if k_l == 0:
                    k_hi = sum(1 for b in phys_bits if b >= 12)
                    if k_hi > _MAX_KE:
                        raise _NeedHighSlots(k_hi - _MAX_KE)
                    steps.append(('fused', k_hi))
                    return steps
                if k_l <= _MAX_KL:
                    k_hi = sum(1 for b in phys_bits if b >= 12)
                    if k_hi + k_l > _MAX_KE:
                        raise _NeedHighSlots(k_hi + k_l - _MAX_KE)
                    victims = self._victims(k_l, set(bits_log))
                    steps.append(('swap', k_hi + k_l, k_l))
                    self._relabel(lane, victims)
                    return steps
                # eviction prepass
                to_move = sorted(
                    (self.phys[b] for b in bits_log
                     if self.phys[b] < 7), reverse=True)[:_MAX_KL]
                victims = self._victims(len(to_move), set(bits_log))
                steps.append(('evict', len(to_move)))
                self._relabel(to_move, victims)
            except _NeedHighSlots as e:
                self._park(bits_log, e.missing)
                steps.append(('ipark', e.missing) if self.inplace
                             else ('park',))
        raise NotImplementedError("route did not settle")

    def route_cost(self, qubits) -> float:
        """Cost (ms) of applying a gate on ``qubits`` NOW, without
        mutating this sim."""
        sim = self.clone()
        return sum(_step_cost(s, self.n, self.high)
                   for s in sim.route_gate(qubits))


def pair_fused_gates(items, n: int, sim: MapSim = None,
                     max_k: int = 8):
    """Fuse gates into larger blocks when the fused kernel class is
    cheaper (the FusedEvolver analog of ``pair_matrix_gates``,
    tracking the evolving slot map).  ``items`` is a list of
    ``(U, qs)`` with dense qubit indices; gates may jump over earlier
    gates they commute with (disjoint supports).  Returns a new
    ``(U, qs)`` list."""
    from hybridq_tpu.simulation.kernels import _compose_matrix_gates

    items = list(items)
    sim = sim.clone() if sim is not None else MapSim(n)
    used = [False] * len(items)
    out = []
    for i in range(len(items)):
        if used[i]:
            continue
        used[i] = True
        cur = [items[i]]
        qs_set = set(items[i][1])
        try:
            cost = sim.route_cost(tuple(qs_set))
        except (NotImplementedError, RuntimeError):
            cost = 1e9
        min_profit = 0.16 * _step_cost(('fused', 1), n, sim.high)
        while len(qs_set) < max_k:
            blocked: set = set()
            best_j, best_profit, best = None, min_profit, None
            for j in range(i + 1, len(items)):
                if used[j]:
                    continue
                qsj = set(items[j][1])
                if qsj & blocked:
                    blocked |= qsj
                    continue
                union = qs_set | qsj
                if len(union) <= max_k:
                    try:
                        cu = sim.route_cost(tuple(union))
                        cj = sim.route_cost(tuple(qsj))
                    except (NotImplementedError, RuntimeError):
                        blocked |= qsj
                        continue
                    profit = cost + cj - cu
                    if profit > best_profit:
                        best_j, best_profit = j, profit
                        best = (union, cu)
                blocked |= qsj
            if best_j is None:
                break
            used[best_j] = True
            cur.append(items[best_j])
            qs_set, cost = best
        if len(cur) == 1:
            blk = cur[0]
        else:
            blk = _compose_matrix_gates(cur)
        out.append(blk)
        # advance the map exactly as apply_gate will
        sim.route_gate(tuple(blk[1]))
    return out


def _calibrate_args(n, spec):
    """Identity-gate concrete args for one fused class (device)."""
    import jax.numpy as jnp

    i32 = jnp.int32
    kind, cls = spec
    if kind == 'fused':
        k_hi = cls[0]
        bits = tuple(range(n - 1, n - 1 - max(k_hi, 1), -1))[:k_hi] \
            or (8,)
        if k_hi == 0:
            bits = (8,)
        W, h_offs, rest_mask = build_w(n, np.eye(2 ** len(bits)), bits)
        # pad W to the class size when k_hi drops the sublane count
        K2 = 2 ** (k_hi + 1) * 32
        assert W.shape == (K2, K2), (W.shape, K2)
        return (jnp.asarray(W), jnp.asarray(h_offs, i32),
                jnp.asarray([rest_mask], i32))
    ke, kl = cls
    k_hi = ke - kl
    bits = tuple(range(6, 6 - kl, -1)) + \
        tuple(range(n - 1, n - 1 - k_hi, -1))
    victims = tuple(range(n - 1 - k_hi, n - 1 - k_hi - kl, -1))
    _, _, h_offs, rest_mask, Ms = swap_meta(n, bits, victims)
    W = build_w_swap(n, np.eye(2 ** len(bits)), bits, victims)
    return (jnp.asarray(W), jnp.asarray(Ms), jnp.asarray(h_offs, i32),
            jnp.asarray([rest_mask], i32))


class _FusedCalibrator:
    """Mixin-free helper: measure per-class costs on this device and
    persist them for ``_step_cost`` (same calibration file as the XLA
    engine, ``kernels._calibration``)."""

    @staticmethod
    def run(ev: FusedEvolver, reps: int = 4, save: bool = True,
            verbose: bool = False) -> dict:
        import sys as _sys
        import time as _t

        from hybridq_tpu.simulation.kernels import (_CALIB_FILE,
                                                    _calibration,
                                                    _device_kind)

        n = ev.n
        classes = ([('fused', (k,)) for k in range(_MAX_KE + 1)] +
                   [('swap', (ke, kl))
                    for kl in (1, 2)
                    for ke in range(kl, _MAX_KE + 1)])

        def _sync(st):
            return float(np.asarray(st[:1, :1])[0, 0])

        st = ev.prepare_state('0' * n)
        _sync(st)
        t0 = _t.perf_counter()
        _sync(st)
        _sync(st)
        t_sync = (_t.perf_counter() - t0) / 2

        out = {}
        for spec in classes:
            kind, cls = spec
            try:
                args = _calibrate_args(n, spec)
                fn = ev._kernel(kind, cls)
                # TWO settle calls: the first may compile (a compile
                # inside the timed reps once recorded a 7149 ms
                # 'measurement' for a 121 ms class).
                st = fn(st, *args)
                _sync(st)
                st = fn(st, *args)
                _sync(st)
                t0 = _t.perf_counter()
                for _ in range(reps):
                    st = fn(st, *args)
                _sync(st)
            except Exception as e:
                if verbose:
                    print(f"# fused calibrate {spec} failed: "
                          f"{type(e).__name__}", file=_sys.stderr,
                          flush=True)
                continue
            ms = max((_t.perf_counter() - t0 - t_sync) / reps,
                     1e-4) * 1e3
            hs = 'h' if ev.high else ''
            if kind == 'fused':
                key = (f"{_device_kind()}|ffused{hs}|{cls[0]}|"
                       f"{cls[0]}|0")
            else:
                ke, kl = cls
                key = f"{_device_kind()}|fswap{hs}|{ke}|{ke}|{kl}"
            out[key] = [n, round(ms, 3)]
            if verbose:
                print(f"# fused calibrate {spec}: {ms:.1f} ms",
                      file=_sys.stderr, flush=True)
        # park cost: the row-permute gather.  Measure on a FRESH
        # evolver: after the swap classes above, ``ev``'s slot map has
        # relabeled lane slots, and ``_row_permute`` (rightly) refuses
        # to row-permute lane bits — BENCH_r04 recorded exactly that
        # failure and silently fell back to the hardcoded park cost.
        try:
            ev2 = FusedEvolver(n, interpret=ev.interpret)
            st = ev2._row_permute(st, list(range(n)))
            _sync(st)
            t0 = _t.perf_counter()
            for _ in range(reps):
                st = ev2._row_permute(st, list(range(n)))
            _sync(st)
            ms = max((_t.perf_counter() - t0 - t_sync) / reps,
                     1e-4) * 1e3
            out[f"{_device_kind()}|fpark|0|0|0"] = [n, round(ms, 3)]
        except Exception as e:
            if verbose:
                print(f"# fused calibrate park failed: "
                      f"{type(e).__name__}: {str(e)[:120]}",
                      file=_sys.stderr, flush=True)

        if save and out:
            import json
            import os

            _calibration()   # ensure file path resolved
            from hybridq_tpu.simulation import kernels as _k

            calib = dict(_calibration())
            calib.update(out)
            try:
                with open(_k._CALIB_FILE, 'w') as f:
                    json.dump(calib, f, indent=1, sort_keys=True)
                _calibration().update(out)
            except OSError:
                pass
        return out


def calibrate_fused(ev: FusedEvolver, **kw) -> dict:
    """Measure fused-class costs on this device kind and persist them
    to the shared calibration JSON (consumed by ``_step_cost``)."""
    return _FusedCalibrator.run(ev, **kw)
