"""Sliced contraction executor.

Replaces cotengra's ``SlicedContractor`` (reference
``simulation.py:1050-1084``) with a TPU-native design:

  * the contraction tree compiles into a single jitted program of
    tensordots (split-complex: the device backend has no complex dtype,
    and real matmuls feed the MXU directly);
  * slices are *batched on device*: a ``vmap`` over the slice index runs
    many independent slices per pass, ``lax.scan`` accumulates chunk sums
    (chunk size auto-chosen from the largest intermediate so the batch
    stays in HBM);
  * across a device mesh, each chip sums a contiguous range of slices and
    a ``psum`` reduces — the ICI analog of the reference's MPI
    slice-range scatter + sum (``simulation_mpi.py:429-479``).
"""

from __future__ import annotations

import functools
from typing import Dict, FrozenSet, List, Sequence, Tuple

import numpy as np

from hybridq_tpu.simulation.tn.network import Tensor
from hybridq_tpu.simulation.tn.path import ContractionTree

__all__ = ['ContractionPlan', 'SlicedContractor']

_FLAT_PROG_CACHE: dict = {}


class ContractionPlan:
    """Static schedule of pairwise contractions for (tree, sliced).

    Hyperedge-aware: an index shared by both children that is RETAINED
    at the parent (``tree.node_inds``: it appears in a third subtree or
    in the output — quimb-style hyper indices, produced by
    ``TensorNetwork.diagonal_reduce``) is *batched*, not summed.  Each
    step carries a tensordot spec (fast path, no batch) or an einsum
    spec in integer-label form (batched)."""

    def __init__(self, tree: ContractionTree, sliced: FrozenSet[str]):
        self.tree = tree
        self.sliced = tuple(sorted(sliced))
        self.sliced_set = frozenset(sliced)
        sl = self.sliced_set

        # Effective (post-slicing) index list per node.
        self.eff: Dict[int, Tuple[str, ...]] = {}
        for v in range(tree.n_leaves):
            self.eff[v] = tuple(i for i in tree.inputs[v] if i not in sl)
        self.steps: List[tuple] = []
        for v in tree.topo_order():
            if v < tree.n_leaves:
                continue
            a, b = tree.children[v]
            ea, eb = self.eff[a], self.eff[b]
            retained = set(tree.node_inds[v])
            shared = [i for i in ea if i in eb]
            summed = [i for i in shared if i not in retained]
            batch = tuple(i for i in shared if i in retained)
            self.eff[v] = batch + tuple(
                i for i in ea if i not in shared) + tuple(
                i for i in eb if i not in shared)
            if not batch:
                a_axes = tuple(ea.index(i) for i in summed)
                b_axes = tuple(eb.index(i) for i in summed)
                self.steps.append((v, a, b, a_axes, b_axes, None))
            else:
                labels = {i: k for k, i in enumerate(
                    dict.fromkeys(ea + eb))}
                spec = (tuple(labels[i] for i in ea),
                        tuple(labels[i] for i in eb),
                        tuple(labels[i] for i in self.eff[v]))
                self.steps.append((v, a, b, None, None, spec))
        self.root = tree.root

        # Per-leaf sliced axes: (axis_in_original_inds, slice_position).
        self.leaf_slices: Dict[int, Tuple[Tuple[int, int], ...]] = {}
        for v in range(tree.n_leaves):
            entries = []
            for pos, i in enumerate(tree.inputs[v]):
                if i in sl:
                    entries.append((pos, self.sliced.index(i)))
            self.leaf_slices[v] = tuple(entries)

        self.nslices = 1
        for i in self.sliced:
            self.nslices *= tree.size_dict[i]

    def output_perm(self, output_order: Sequence[str]) -> Tuple[int, ...]:
        """Permutation taking the root's index order to
        ``output_order``."""
        root_inds = self.eff[self.root]
        if set(root_inds) != set(output_order):
            raise ValueError("output order inconsistent with root indices")
        return tuple(root_inds.index(i) for i in output_order)


def _pair_contract_jnp(ar, ai, br, bi, a_axes, b_axes, spec, precision):
    """Split-complex pairwise contraction (tensordot fast path, einsum
    integer-label form when the step batches hyperedge indices)."""
    import jax.numpy as jnp

    if spec is None:
        def t(x, y):
            return jnp.tensordot(x, y, axes=(a_axes, b_axes),
                                 precision=precision)
    else:
        la, lb, lo = spec

        def t(x, y):
            return jnp.einsum(x, list(la), y, list(lb), list(lo),
                              precision=precision)
    rr = t(ar, br)
    ii = t(ai, bi)
    ri = t(ar, bi)
    ir = t(ai, br)
    return rr - ii, ri + ir


def _resolve_precision(name: str):
    """Map a precision name to a jax.lax.Precision (lazy jax import)."""
    import jax

    return {
        'default': jax.lax.Precision.DEFAULT,
        'high': jax.lax.Precision.HIGH,
        'highest': jax.lax.Precision.HIGHEST,
    }[str(name).lower()]


def _flat_gather(x_re, x_im, k, sh):
    """Bit-permutation gather of a flat 2^k split pair (shift table
    ``sh`` is a runtime argument).

    The index build is ANCHORED on the gathered data (``+ 0*x[0]``):
    it is otherwise a pure function of the shift-table inputs, and XLA
    hoists every such loop-invariant chain to the program start — on
    the Sycamore-53 depth-20 chain that left 60+ 2^26-element int32
    index vectors live simultaneously (measured: a 277-step prefix
    with ~6.2 GB of hoisted indices ran; 290 steps at ~8.0 GB crashed
    the TPU worker).  The data dependence pins each index vector's
    lifetime to its own step."""
    import jax.numpy as jnp

    z = (x_re[0] * 0.0).astype(jnp.int32)
    i = jnp.arange(2**k, dtype=jnp.int32) + z
    idx = jnp.zeros_like(i)
    for j in range(k):
        idx = idx | (((i >> (k - 1 - j)) & 1) << sh[j])
    return jnp.take(x_re, idx), jnp.take(x_im, idx)


def _apply_flat_step(key, mode, lr, li, rr, ri, precision):
    """One pairwise flat contraction on gathered split operands.

    TPU minor dims narrower than the 128-lane tile pad up to 32x when
    materialized (a [2^24, 4] f32 operand "is" 8.6 GB) — CLAUDE.md's
    small-minor-dim trap, and the cause of the depth-20 worker
    crashes.  Three emissions avoid every narrow-minor operand:

    * ``std``   — [B,M,K] @ [B,K,N] (all minors wide enough);
    * ``tr``    — K >= 128 and N < 64: the rhs gathers K-minor
                  ([B,N,K]) and the dot contracts both minors;
    * ``fold``  — K <= 128 <= M*K, K*N small: the contraction folds
                  into the 128-lane axis as ONE [M*K/128, 128] @
                  [128, 128*N/K] matmul with kron(I, B) built on the
                  fly — no narrow operand OR output ever exists.
    """
    import jax.numpy as jnp
    from jax import lax

    kl, kr, s, nb, gl, gr = key
    B = 2**nb
    M, K, N = 2**(kl - s - nb), 2**s, 2**(kr - s - nb)
    if mode == 'fold':
        a = 128 // K
        rows = (M * K) // 128
        A2r, A2i = lr.reshape(rows, 128), li.reshape(rows, 128)
        Bmr, Bmi = rr.reshape(K, N), ri.reshape(K, N)
        eye = jnp.eye(a, dtype=lr.dtype)
        Wr = jnp.kron(eye, Bmr)
        Wi = jnp.kron(eye, Bmi)

        def mm(x, y):
            return lax.dot_general(
                x, y, (((1,), (0,)), ((), ())), precision=precision)

        cr = mm(A2r, Wr) - mm(A2i, Wi)
        ci = mm(A2r, Wi) + mm(A2i, Wr)
        return cr.reshape(-1), ci.reshape(-1)
    if mode == 'tr':
        Ar, Ai = lr.reshape(B, M, K), li.reshape(B, M, K)
        Br, Bi = rr.reshape(B, N, K), ri.reshape(B, N, K)

        def mm(x, y):
            return lax.dot_general(
                x, y, (((2,), (2,)), ((0,), (0,))),
                precision=precision)
    else:
        Ar, Ai = lr.reshape(B, M, K), li.reshape(B, M, K)
        Br, Bi = rr.reshape(B, K, N), ri.reshape(B, K, N)

        def mm(x, y):
            return lax.dot_general(
                x, y, (((2,), (1,)), ((0,), (0,))),
                precision=precision)

    cr = mm(Ar, Br) - mm(Ai, Bi)
    ci = mm(Ar, Bi) + mm(Ai, Br)
    return cr.reshape(-1), ci.reshape(-1)


def _step_mode(kl, kr, s, nb):
    """Pick the emission (see _apply_flat_step) for a step class."""
    M, K, N = 2**(kl - s - nb), 2**s, 2**(kr - s - nb)
    if nb == 0 and K <= 128 and 128 % K == 0 and M * K >= 128 \
            and N <= 128 and (128 // K) * N <= 512:
        return 'fold'
    if K >= 128 and N < 64:
        return 'tr'
    return 'std'


class SlicedContractor:
    """Executes a ContractionPlan over all slices, on numpy or JAX."""

    def __init__(self, plan: ContractionPlan, tensors: Sequence[Tensor],
                 output_order: Sequence[str], complex_type='complex64',
                 matmul_precision: str = 'highest'):
        if len(tensors) != plan.tree.n_leaves:
            raise ValueError("wrong number of tensors")
        # TPU matmuls default to bfloat16 inputs; a contraction tree in
        # bf16 is ~1e-2 accurate, far off the complex64 reference.
        # 'highest' forces true-f32 MXU passes (matching the reference's
        # numpy/quimb complex64 arithmetic); 'default' opts into bf16.
        self.matmul_precision = str(matmul_precision)
        # Slices per dispatch of the scanned flat executor (the
        # program is compiled once at this chunk length and reused for
        # every range, sentinel-padded).
        self.scan_chunk = 256
        # Per-program limits for the scanned executors: the TPU worker
        # crashes loading programs beyond ~107 MB of generated code
        # (see _flat_scan_cuts); chains estimated above the budget
        # split into pipelined segment programs.
        self.scan_seg_steps = 200
        self.scan_seg_code_mb = 70.0
        self.plan = plan
        self.output_order = tuple(output_order)
        self.perm = plan.output_perm(output_order)
        self.complex_type = np.dtype(complex_type)
        self.float_type = np.real(np.zeros(1, dtype=complex_type)).dtype
        # Reorder each tensor's data to the tree's declared leaf index
        # order (tree.inputs comes from the same tensors, so this is a
        # no-op unless the caller reordered).
        self.datas = []
        for t, inds in zip(tensors, plan.tree.inputs):
            if t.inds != inds:
                perm = tuple(t.inds.index(i) for i in inds)
                d = np.ascontiguousarray(np.transpose(t.data, perm))
            else:
                d = np.ascontiguousarray(t.data)
            # Normalize to the declared leaf shape: a fully-simplified
            # (scalar) tensor can arrive as shape (1,) while its index
            # list is () — tensordot would then grow spurious size-1
            # dims that desync every later step from ``plan.eff``.
            want = tuple(plan.tree.size_dict[i] for i in inds)
            if d.shape != want:
                d = d.reshape(want)
            self.datas.append(d)
        self.nslices = plan.nslices
        self._scan_progs: dict = {}   # per-instance compiled programs

    def _range(self, slice_range):
        """Clamp a ``(start, stop)`` request to the valid slice ids:
        ids >= nslices alias the low slice bits and would silently
        double-count slices."""
        start, stop = slice_range if slice_range is not None \
            else (0, self.nslices)
        return max(0, start), min(stop, self.nslices)

    # -- numpy backend ---------------------------------------------------
    def _leaf_np(self, v, sid):
        d = self.datas[v]
        for pos, j in sorted(self.plan.leaf_slices[v], reverse=True):
            bit = (sid >> j) & 1
            d = np.take(d, bit, axis=pos)
        return d

    def contract_slice_np(self, sid: int) -> np.ndarray:
        vals = {v: self._leaf_np(v, sid)
                for v in range(self.plan.tree.n_leaves)}
        for v, a, b, a_axes, b_axes, spec in self.plan.steps:
            if spec is None:
                vals[v] = np.tensordot(vals.pop(a), vals.pop(b),
                                       axes=(a_axes, b_axes))
            else:
                la, lb, lo = spec
                vals[v] = np.einsum(vals.pop(a), list(la),
                                    vals.pop(b), list(lb), list(lo))
        out = vals[self.plan.root]
        return np.transpose(out, self.perm) if self.perm else out

    def contract_np(self, verbose: bool = False,
                    slice_range=None) -> np.ndarray:
        start, stop = self._range(slice_range)
        if stop <= start:  # empty range: a zero partial sum
            return np.zeros([self.plan.tree.size_dict[i]
                             for i in self.output_order],
                            dtype=self.complex_type)
        out = self.contract_slice_np(start).astype(self.complex_type)
        for sid in range(start + 1, stop):
            out = out + self.contract_slice_np(sid)
        return out

    # -- JAX backend, flat executor ---------------------------------------
    #
    # TPU device arrays of shape (2,)*k are tile-padded catastrophically
    # (the minor (2, 2) dims pad to (8, 128): a 512x blowup; a rank-26
    # intermediate would "be" 32 GB), and programs holding them exceed
    # the compile service's memory.  The flat executor therefore keeps
    # every intermediate as a FLAT (2^k,) split pair plus a host-side
    # index-order tuple, and runs each pairwise contraction as
    #   gather (device-built bit-permutation) -> [M, 2^s] @ [2^s, N]
    # with ONE compiled program per (k_left, k_right, s, gathers) class;
    # the bit-shift tables are runtime arguments, so any tree reuses a
    # bounded program set (the runtime-position philosophy of
    # ``kernels.py``, vs the reference's per-contraction einsum strings,
    # ``simulation.py:726-751``).

    def _flat_schedule(self):
        """Host-side schedule for the flat executor: per step, the
        operand orientation, gather shift tables, and class key."""
        plan = self.plan
        order: Dict[int, Tuple[str, ...]] = {}
        for v in range(plan.tree.n_leaves):
            order[v] = plan.eff[v]
        sched = []
        for v, a, b, _, _, _ in plan.steps:
            ea, eb = order.pop(a), order.pop(b)
            retained = set(plan.eff[v])
            shared = [i for i in ea if i in eb]
            # Hyperedge indices retained at the parent ride as a batch
            # dimension of the step's matmul.
            summed = [i for i in shared if i not in retained]
            batch = [i for i in shared if i in retained]
            s, nb = len(summed), len(batch)
            ka, kb = len(ea), len(eb)
            # Left operand = the one with the larger free side (avoid
            # [tiny, K] @ [K, huge] shapes, which compile poorly).
            if 2**(ka - s - nb) >= 2**(kb - s - nb):
                left, right = a, b
                el, er = ea, eb
            else:
                left, right = b, a
                el, er = eb, ea
            kl, kr = len(el), len(er)
            free_l = [i for i in el if i not in shared]
            free_r = [i for i in er if i not in shared]
            mode = _step_mode(kl, kr, s, nb)
            tl = tuple(batch) + tuple(free_l) + tuple(summed)  # [B,M,K]
            if mode == 'tr':   # K-minor rhs: [B,N,K]
                tr = tuple(batch) + tuple(free_r) + tuple(summed)
            else:
                tr = tuple(batch) + tuple(summed) + tuple(free_r)

            def shifts(ex, tx):
                k = len(ex)
                pos = {i: p for p, i in enumerate(ex)}
                return np.asarray([k - 1 - pos[i] for i in tx],
                                  dtype=np.int32)

            gl = tl != tuple(el)
            gr = tr != tuple(er)
            sched.append({
                'v': v, 'left': left, 'right': right,
                'key': (kl, kr, s, nb, gl, gr), 'mode': mode,
                'shl': shifts(el, tl) if gl else None,
                'shr': shifts(er, tr) if gr else None,
            })
            order[v] = tuple(batch) + tuple(free_l) + tuple(free_r)
        root_order = order[plan.root]
        out_shift = None
        if tuple(root_order) != tuple(self.output_order):
            k = len(root_order)
            pos = {i: p for p, i in enumerate(root_order)}
            out_shift = np.asarray(
                [k - 1 - pos[i] for i in self.output_order],
                dtype=np.int32)
        return sched, out_shift

    @staticmethod
    def _flat_step_prog(kl, kr, s, nb, gl, gr, mode='std',
                        prec='highest'):
        """Compiled flat contraction step for a shape class (see
        ``_apply_flat_step`` for the emissions)."""
        import jax

        key = ('flatstep', kl, kr, s, nb, gl, gr, mode, prec)
        fn = _FLAT_PROG_CACHE.get(key)
        if fn is not None:
            return fn
        precision = _resolve_precision(prec)
        kcls = (kl, kr, s, nb, gl, gr)

        def f(lr, li, rr, ri, shl, shr):
            if gl:
                lr, li = _flat_gather(lr, li, kl, shl)
            if gr:
                rr, ri = _flat_gather(rr, ri, kr, shr)
            return _apply_flat_step(kcls, mode, lr, li, rr, ri,
                                    precision)

        fn = jax.jit(f)
        _FLAT_PROG_CACHE[key] = fn
        return fn

    def _warm_flat_progs(self, sched, verbose: bool = False):
        """AOT-compile every distinct flat step class concurrently (the
        shared remote compile service has minutes-level queueing per
        program; overlapping the waits turns n_classes x queue into
        ~queue)."""
        import sys
        import time as _t
        from concurrent.futures import ThreadPoolExecutor

        import jax
        import jax.numpy as jnp

        prec = self.matmul_precision
        keys = sorted({st['key'] + (st['mode'],) for st in sched})
        todo = [k for k in keys
                if ('flatexec',) + k + (prec,) not in _FLAT_PROG_CACHE]
        if len(todo) <= 1:
            return
        t0 = _t.time()

        def one(key):
            kl, kr, s, nb, gl, gr, mode = key
            fn = self._flat_step_prog(*key[:6], mode=mode, prec=prec)
            f32 = jnp.float32
            i32 = jnp.int32
            args = (jax.ShapeDtypeStruct((2**kl,), f32),
                    jax.ShapeDtypeStruct((2**kl,), f32),
                    jax.ShapeDtypeStruct((2**kr,), f32),
                    jax.ShapeDtypeStruct((2**kr,), f32),
                    jax.ShapeDtypeStruct((kl if gl else 1,), i32),
                    jax.ShapeDtypeStruct((kr if gr else 1,), i32))
            try:
                _FLAT_PROG_CACHE[('flatexec',) + key + (prec,)] = \
                    fn.lower(*args).compile()
            except Exception:
                pass  # advisory: the call path compiles on demand

        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(one, todo))
        if verbose:
            print(f"# warmed {len(todo)} flat step programs in "
                  f"{_t.time() - t0:.0f}s", file=sys.stderr, flush=True)

    def _flat_leaves(self, sid):
        """Per-slice flat split leaves (device; tiny arrays)."""
        import jax.numpy as jnp

        if not hasattr(self, '_leaf_dev'):
            self._leaf_dev = [
                (jnp.asarray(d.real.astype(self.float_type)),
                 jnp.asarray(d.imag.astype(self.float_type)))
                for d in self.datas]
        vals = {}
        for v in range(self.plan.tree.n_leaves):
            re, im = self._leaf_dev[v]
            for pos, j in sorted(self.plan.leaf_slices[v], reverse=True):
                bit = (sid >> j) & 1
                re = jnp.take(re, bit, axis=pos)
                im = jnp.take(im, bit, axis=pos)
            vals[v] = (re.reshape(-1), im.reshape(-1))
        return vals

    def _leaf_gather_meta(self):
        """Host metadata for in-jit leaf slicing: per leaf, the flat
        gather base (full-tensor flat indices of the slice-bits-all-zero
        sub-tensor) plus ``(slice_bit, stride)`` terms so the effective
        leaf for slice ``sid`` is ``flat[base + sum(bit_j(sid)*s_j)]``
        — a traced-``sid``-friendly reformulation of the per-axis
        ``take`` in ``_flat_leaves``."""
        meta = []
        for v in range(self.plan.tree.n_leaves):
            d = self.datas[v]
            entries = sorted(self.plan.leaf_slices[v])
            idx_full = np.arange(d.size, dtype=np.int64).reshape(d.shape)
            sl_pos = [p for p, _ in entries]
            sel = tuple(0 if a in sl_pos else slice(None)
                        for a in range(d.ndim))
            base = idx_full[sel].reshape(-1).astype(np.int32)
            terms = []
            for pos, j in entries:
                stride = int(np.prod(d.shape[pos + 1:], dtype=np.int64))
                terms.append((int(j), stride))
            meta.append((base, tuple(terms)))
        return meta

    def _packed_leaves(self):
        """All leaf tensors packed into ONE split flat pair (re, im)
        plus per-leaf offsets.  The scanned programs then take 2 leaf
        operands instead of 2*n_leaves separate buffers (~800 runtime
        arguments at Sycamore-53 depth 20 — dispatching that arity
        crashed the TPU worker outright; per-step programs with <= 6
        arguments ran the identical math fine)."""
        out = getattr(self, '_packed', None)
        if out is None:
            offs = []
            off = 0
            for d in self.datas:
                offs.append(off)
                off += d.size
            re_all = np.concatenate(
                [d.real.reshape(-1).astype(self.float_type)
                 for d in self.datas])
            im_all = np.concatenate(
                [d.imag.reshape(-1).astype(self.float_type)
                 for d in self.datas])
            out = self._packed = (tuple(offs), re_all, im_all)
        return out

    def contract_jax_flat_scan(self, slice_range=None,
                               verbose: bool = False):
        """ONE compiled program for the whole slice range: ``lax.scan``
        over slice ids with the full flat step chain inlined in the
        body.

        The per-step-dispatch flat executor pays one host->device
        program dispatch per step per slice; on this platform a
        dispatch round-trips a tunnel at ~0.3 s, so a 234-step slice
        costs ~75 s of pure overhead (measured, Sycamore-53 depth-12)
        while the actual compute is milliseconds.  Fusing the chain
        into a single scanned program removes the dispatch term
        entirely — the analog of the reference driving its whole slice
        range from one MPI rank loop (``simulation_mpi.py:459-479``)
        rather than one RPC per tensordot.

        Gather shift tables are passed as runtime arguments (not
        closure constants) so XLA cannot constant-fold the 2^k index
        vectors into the executable."""
        import sys
        import time as _t

        import jax
        import jax.numpy as jnp
        from jax import lax

        start, stop = self._range(slice_range)
        out_shape = [self.plan.tree.size_dict[i]
                     for i in self.output_order]
        if stop <= start:
            return np.zeros(out_shape, dtype=self.complex_type)

        sched, out_shift = self._flat_schedule()
        est_mb = sum(2.0 if max(st['key'][0], st['key'][1]) >= 20
                     else 0.2 for st in sched)
        if len(sched) > self.scan_seg_steps or \
                est_mb > self.scan_seg_code_mb:
            return self._contract_flat_scan_segmented(
                sched, out_shift, start, stop, verbose=verbose)
        precision = _resolve_precision(self.matmul_precision)
        n_leaves = self.plan.tree.n_leaves
        leaf_meta = self._leaf_gather_meta()

        # Runtime inputs: ONE packed leaf pair + the distinct shift
        # tables (see _packed_leaves on why not per-leaf buffers).
        offs, re_h, im_h = self._packed_leaves()
        re_all = jnp.asarray(re_h)
        im_all = jnp.asarray(im_h)
        sizes = [d.size for d in self.datas]
        shift_keys = []
        shift_vals = []
        for st in sched:
            for key in ('shl', 'shr'):
                if st[key] is not None:
                    t = tuple(st[key])
                    if t not in shift_keys:
                        shift_keys.append(t)
                        shift_vals.append(jnp.asarray(st[key]))
        shift_of = {t: i for i, t in enumerate(shift_keys)}

        gather = _flat_gather

        def one_slice(sid, re_all, im_all, shifts):
            vals = {}
            for v in range(n_leaves):
                re = lax.slice(re_all, (offs[v],),
                               (offs[v] + sizes[v],))
                im = lax.slice(im_all, (offs[v],),
                               (offs[v] + sizes[v],))
                base, terms = leaf_meta[v]
                if terms:
                    idx = jnp.asarray(base)
                    for j, stride in terms:
                        idx = idx + ((sid >> j) & 1) * stride
                    re, im = jnp.take(re, idx), jnp.take(im, idx)
                vals[v] = (re, im)
            for st in sched:
                kl, kr, s, nb, gl, gr = st['key']
                lr, li = vals.pop(st['left'])
                rr, ri = vals.pop(st['right'])
                if gl:
                    lr, li = gather(lr, li, kl,
                                    shifts[shift_of[tuple(st['shl'])]])
                if gr:
                    rr, ri = gather(rr, ri, kr,
                                    shifts[shift_of[tuple(st['shr'])]])
                vals[st['v']] = _apply_flat_step(
                    st['key'], st['mode'], lr, li, rr, ri, precision)
            return vals[self.plan.root]

        def run(ids, re_all, im_all, shifts):
            size = int(np.prod(out_shape, dtype=np.int64)) or 1
            acc0 = (jnp.zeros((size,), self.float_type),
                    jnp.zeros((size,), self.float_type))

            def body(acc, sid):
                # Sentinel ids (< 0) pad the last chunk: weight 0.
                w = (sid >= 0).astype(self.float_type)
                re, im = one_slice(jnp.maximum(sid, 0), re_all,
                                   im_all, shifts)
                return (acc[0] + w * re, acc[1] + w * im), None

            (re, im), _ = lax.scan(body, acc0, ids)
            if out_shift is not None:
                k = len(self.output_order)
                i = jnp.arange(2**k, dtype=jnp.int32)
                idx = jnp.zeros_like(i)
                for j in range(k):
                    idx = idx | (((i >> (k - 1 - j)) & 1) <<
                                 int(out_shift[j]))
                re, im = jnp.take(re, idx), jnp.take(im, idx)
            return re, im

        # One compiled program per plan at a FIXED chunk length serves
        # every slice range (sentinel-padded) — ranges of different
        # sizes must not recompile a minutes-long program.  The cache
        # lives ON THIS INSTANCE (not a module-global keyed by
        # id(self.plan): a GC'd plan's id can be reused by a new plan
        # with matching leaf shapes, silently running a stale compiled
        # schedule).  Cross-instance reuse of the identical program is
        # handled by the persistent XLA compile cache instead.
        count = stop - start
        C = min(self.scan_chunk, count) if count < self.scan_chunk \
            else self.scan_chunk
        key = ('flatscan', self.matmul_precision, C)
        fn = self._scan_progs.get(key)
        if fn is None:
            t0 = _t.time()
            ids_s = jax.ShapeDtypeStruct((C,), jnp.int32)
            lv = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                (re_all, im_all, shift_vals))
            fn = jax.jit(run).lower(ids_s, *lv).compile()
            self._scan_progs[key] = fn
            if verbose:
                print(f"# flat-scan executor: compiled "
                      f"{len(sched)}-step chunk-{C} program in "
                      f"{_t.time()-t0:.1f}s", file=sys.stderr,
                      flush=True)

        acc = None
        for lo in range(start, stop, C):
            ids_np = np.full(C, -1, dtype=np.int32)
            m = min(C, stop - lo)
            ids_np[:m] = np.arange(lo, lo + m, dtype=np.int32)
            re, im = fn(jnp.asarray(ids_np), re_all, im_all,
                        shift_vals)
            acc = (re, im) if acc is None else (acc[0] + re,
                                                acc[1] + im)
        out = np.asarray(acc[0]).astype(self.complex_type)
        out += 1j * np.asarray(acc[1]).astype(self.float_type)
        return out.reshape(out_shape)

    def contract_jax_flat_line(self, slice_range=None,
                               verbose: bool = False):
        """Straight-line per-slice executor: the flat step chain
        compiles WITHOUT ``lax.scan`` into a pipeline of straight-line
        segment programs chained per slice through their boundary
        tensors, with the slice sum accumulated on device (chained
        dispatches, no host readback).

        This is the crash-proof executor on this platform: scanned
        bodies holding GB-scale gathered temporaries kill the TPU
        worker (a straight-line program of the SAME steps runs), and
        any program beyond ~90-100 MB of generated code dies loading.
        Segments start at an estimated-code budget and any segment
        whose MEASURED compiled code exceeds the limit is split in
        place (only that segment recompiles); each segment receives
        only its own shift tables (dispatch cost grows with argument
        count)."""
        import sys
        import time as _t

        import jax
        import jax.numpy as jnp
        from jax import lax

        start, stop = self._range(slice_range)
        out_shape = [self.plan.tree.size_dict[i]
                     for i in self.output_order]
        if stop <= start:
            return np.zeros(out_shape, dtype=self.complex_type)

        sched, out_shift = self._flat_schedule()
        precision = _resolve_precision(self.matmul_precision)
        n_leaves = self.plan.tree.n_leaves
        leaf_meta = self._leaf_gather_meta()
        offs, re_h, im_h = self._packed_leaves()
        re_all = jnp.asarray(re_h)
        im_all = jnp.asarray(im_h)
        sizes = [d.size for d in self.datas]
        kdim = {v: len(inds) for v, inds in self.plan.eff.items()}
        n_steps = len(sched)

        # live produced nodes AFTER each step (cut metadata).
        live_after = []
        live_set: set = set()
        for st in sched:
            live_set.discard(st['left'])
            live_set.discard(st['right'])
            live_set.add(st['v'])
            live_after.append(sorted(live_set))
        boundary_elems = [sum(2**kdim[v] for v in la)
                         for la in live_after]

        shift_dev = {}
        for st in sched:
            for key in ('shl', 'shr'):
                if st[key] is not None:
                    t = tuple(st[key])
                    if t not in shift_dev:
                        shift_dev[t] = jnp.asarray(st[key])

        def leaf_val(sid, v):
            re = lax.slice(re_all, (offs[v],), (offs[v] + sizes[v],))
            im = lax.slice(im_all, (offs[v],), (offs[v] + sizes[v],))
            base, terms = leaf_meta[v]
            if terms:
                idx = jnp.asarray(base)
                for j, stride in terms:
                    idx = idx + ((sid >> j) & 1) * stride
                re, im = jnp.take(re, idx), jnp.take(im, idx)
            return re, im

        def seg_shift_keys(a, b):
            out = []
            for st in sched[a:b]:
                for key in ('shl', 'shr'):
                    if st[key] is not None:
                        t = tuple(st[key])
                        if t not in out:
                            out.append(t)
            return out

        def make_seg(a, b, in_nodes, out_nodes, is_last, skeys):
            seg = sched[a:b]
            s_of = {t: i for i, t in enumerate(skeys)}

            def steps_of(sid, bins, shifts):
                vals = dict(zip(in_nodes, bins))

                def fetch(v):
                    if v in vals:
                        return vals.pop(v)
                    return leaf_val(sid, v)

                for st in seg:
                    kl, kr = st['key'][0], st['key'][1]
                    lr, li = fetch(st['left'])
                    rr, ri = fetch(st['right'])
                    if st['key'][4]:
                        lr, li = _flat_gather(
                            lr, li, kl,
                            shifts[s_of[tuple(st['shl'])]])
                    if st['key'][5]:
                        rr, ri = _flat_gather(
                            rr, ri, kr,
                            shifts[s_of[tuple(st['shr'])]])
                    vals[st['v']] = _apply_flat_step(
                        st['key'], st['mode'], lr, li, rr, ri,
                        precision)
                return vals

            if is_last:
                def run(acc, sid, bins, shifts):
                    vals = steps_of(sid, bins, shifts)
                    re, im = vals[self.plan.root]
                    return acc[0] + re, acc[1] + im
            else:
                def run(sid, bins, shifts):
                    vals = steps_of(sid, bins, shifts)
                    return tuple(vals[v] for v in out_nodes)
            return run

        CODE_LIMIT_MB = 80.0
        key = ('flatline', self.matmul_precision)
        cached = self._scan_progs.get(key)
        if cached is None:
            t0 = _t.time()
            f32 = self.float_type
            i32 = jnp.int32
            size = int(np.prod(out_shape, dtype=np.int64)) or 1
            acc_s = (jax.ShapeDtypeStruct((size,), f32),) * 2
            sid_s = jax.ShapeDtypeStruct((), i32)

            bounds, _ = self._flat_scan_cuts(
                sched,
                seg_limit=int(getattr(self, 'line_seg_steps', 240)),
                budget=float(getattr(self, 'line_seg_code_mb', 50.0)),
                w_big=1.4, w_small=0.3)
            cuts = list(bounds)            # [0, c1, ..., n_steps]
            fns = []
            seg_meta = []                  # (skeys, n_out)
            k_seg = 0
            while k_seg + 1 < len(cuts):
                a, b = cuts[k_seg], cuts[k_seg + 1]
                in_nodes = live_after[a - 1] if a else []
                is_last = b == n_steps
                out_nodes = [] if is_last else live_after[b - 1]
                skeys = seg_shift_keys(a, b)
                run = make_seg(a, b, in_nodes, out_nodes, is_last,
                               skeys)
                bound_s = tuple(
                    (jax.ShapeDtypeStruct((2**kdim[v],), f32),) * 2
                    for v in in_nodes)
                sh_s = [jax.ShapeDtypeStruct((len(t),), i32)
                        for t in skeys]
                if is_last:
                    fn = jax.jit(run, donate_argnums=(0,)).lower(
                        acc_s, sid_s, bound_s, sh_s).compile()
                else:
                    fn = jax.jit(run).lower(
                        sid_s, bound_s, sh_s).compile()
                code_mb = 0.0
                try:
                    ma = fn.memory_analysis()
                    code_mb = ma.generated_code_size_in_bytes / 2**20
                except Exception:
                    pass
                if code_mb > CODE_LIMIT_MB and b - a > 1:
                    # split THIS segment at the lowest boundary within
                    # its middle half (an end-point split shaves one
                    # step and recompiles the big remainder each time)
                    lo = a + max(1, (b - a) // 4)
                    hi = max(lo + 1, a + (3 * (b - a)) // 4)
                    mid = min(range(lo, hi),
                              key=lambda j: boundary_elems[j - 1])
                    cuts.insert(k_seg + 1, mid)
                    if verbose:
                        print(f"#   line segment [{a},{b}) code "
                              f"{code_mb:.0f} MB > {CODE_LIMIT_MB:.0f}"
                              f": splitting at {mid}",
                              file=sys.stderr, flush=True)
                    continue
                if verbose:
                    print(f"#   line segment [{a},{b}): code "
                          f"{code_mb:.1f} MB", file=sys.stderr,
                          flush=True)
                fns.append(fn)
                seg_meta.append((skeys, cuts[k_seg], cuts[k_seg + 1]))
                k_seg += 1
            cached = (fns, seg_meta, cuts)
            self._scan_progs[key] = cached
            if verbose:
                print(f"# flat-line executor: compiled {len(fns)} "
                      f"straight-line programs "
                      f"({[b - a for a, b in zip(cuts, cuts[1:])]}"
                      f" steps) in {_t.time()-t0:.1f}s",
                      file=sys.stderr, flush=True)
        fns, seg_meta, cuts = cached

        size = int(np.prod(out_shape, dtype=np.int64)) or 1
        acc = (jnp.zeros((size,), self.float_type),
               jnp.zeros((size,), self.float_type))
        n_seg = len(fns)
        seg_shifts = [[shift_dev[t] for t in skeys]
                      for skeys, _, _ in seg_meta]
        for sid in range(start, stop):
            bound = ()
            for k_seg, fn in enumerate(fns):
                if k_seg == n_seg - 1:
                    acc = fn(acc, jnp.int32(sid), bound,
                             seg_shifts[k_seg])
                else:
                    bound = fn(jnp.int32(sid), bound,
                               seg_shifts[k_seg])
        re, im = acc
        if out_shift is not None:
            k = len(self.output_order)
            i = np.arange(2**k, dtype=np.int32)
            idx = np.zeros_like(i)
            for j in range(k):
                idx = idx | (((i >> (k - 1 - j)) & 1) <<
                             int(out_shift[j]))
            re = np.asarray(re)[idx]
            im = np.asarray(im)[idx]
        out = np.asarray(re).astype(self.complex_type)
        out += 1j * np.asarray(im).astype(self.float_type)
        return out.reshape(out_shape)

    def _flat_scan_cuts(self, sched, seg_limit=None, budget=None,
                        w_big=None, w_small=None):
        """Cut the flat schedule into segments bounded by ESTIMATED
        GENERATED-CODE SIZE, choosing each cut where the crossing live
        set (produced tensors alive at the cut) is smallest.

        The TPU worker crashes outright loading/executing programs
        beyond ~107 MB of generated code (measured on the depth-20
        chain: a 106 MB program ran, 107.5 MB killed the worker; a
        300 MB scanned segment died instantly while its 15 MB sibling
        ran).  Scanned bodies emit ~2 MB per big-gather step and
        ~0.2 MB per small step (fitted to measured segment sizes), so
        the budget ``scan_seg_code_mb`` (default 60) keeps every
        program safely below the cliff.  ``scan_seg_steps`` still caps
        raw step count.  Returns ``(bounds, live_at_cut)``."""
        n_steps = len(sched)
        seg_limit = int(seg_limit if seg_limit is not None
                        else self.scan_seg_steps)
        if w_big is None:
            w_big, w_small = 4.0, 0.4

        def code_mb(st):
            # Fitted to measured scanned-segment code sizes on the
            # depth-20 chain (~4 MB per big-gather step, ~0.4 small);
            # the compile loop verifies actual sizes and re-segments.
            kl, kr = st['key'][0], st['key'][1]
            return w_big if max(kl, kr) >= 20 else w_small

        weights = [code_mb(st) for st in sched]
        budget = float(budget if budget is not None
                       else getattr(self, 'scan_seg_code_mb', 60.0))
        live = {}
        sizes = []
        for st in sched:
            live.pop(st['left'], None)
            live.pop(st['right'], None)
            live[st['v']] = 2 ** len(self.plan.eff[st['v']])
            sizes.append(sum(live.values()))
        # Greedy: cut when the accumulated estimate would cross the
        # budget, placing the cut at the smallest boundary within a
        # lookback window (boundary tensors materialize as [chunk, 2^k]
        # stacks between segment programs).
        lookback = 30
        bounds = [0]
        acc = 0.0
        for i in range(n_steps):
            acc += weights[i]
            steps_in = i + 1 - bounds[-1]
            if (acc > budget or steps_in >= seg_limit) and \
                    i + 1 < n_steps:
                lo = max(bounds[-1] + 1, i + 1 - lookback)
                best = min(range(lo, i + 2),
                           key=lambda j: sizes[j - 1])
                if best > bounds[-1]:
                    bounds.append(best)
                    acc = sum(weights[best:i + 1])
        bounds.append(n_steps)
        live_at_cut = []
        live_set: set = set()
        ci = 1
        for i, st in enumerate(sched):
            live_set.discard(st['left'])
            live_set.discard(st['right'])
            live_set.add(st['v'])
            if ci < len(bounds) - 1 and i + 1 == bounds[ci]:
                live_at_cut.append(sorted(live_set))
                ci += 1
        return bounds, live_at_cut

    def _contract_flat_scan_segmented(self, sched, out_shift, start,
                                      stop, verbose: bool = False):
        """Pipelined variant of ``contract_jax_flat_scan`` for long
        chains: the step chain splits into segment programs, each a
        ``lax.scan`` over the slice chunk whose per-slice outputs are
        the boundary tensors crossing the cut (stacked ``[C, 2^k]``
        device arrays handed to the next segment program).  Needed
        because one monolithic program crashes the TPU worker beyond a
        few hundred steps (observed at 404 steps, Sycamore-53 depth
        20), while each ~half-size segment is a proven program shape.
        Cuts land on minimal live sets, so the inter-segment
        materialization stays small."""
        import sys
        import time as _t

        import jax
        import jax.numpy as jnp
        from jax import lax

        precision = _resolve_precision(self.matmul_precision)
        leaf_meta = self._leaf_gather_meta()
        out_shape = [self.plan.tree.size_dict[i]
                     for i in self.output_order]

        kdim = {v: len(inds) for v, inds in self.plan.eff.items()}
        offs, re_h, im_h = self._packed_leaves()
        re_all_dev = jnp.asarray(re_h)
        im_all_dev = jnp.asarray(im_h)
        sizes = [d.size for d in self.datas]
        shift_keys = []
        shift_vals = []
        for st in sched:
            for key in ('shl', 'shr'):
                if st[key] is not None:
                    t = tuple(st[key])
                    if t not in shift_keys:
                        shift_keys.append(t)
                        shift_vals.append(jnp.asarray(st[key]))
        shift_of = {t: i for i, t in enumerate(shift_keys)}

        gather = _flat_gather

        def leaf_val(sid, v, leaves):
            re_all, im_all = leaves
            re = lax.slice(re_all, (offs[v],), (offs[v] + sizes[v],))
            im = lax.slice(im_all, (offs[v],), (offs[v] + sizes[v],))
            base, terms = leaf_meta[v]
            if terms:
                idx = jnp.asarray(base)
                for j, stride in terms:
                    idx = idx + ((sid >> j) & 1) * stride
                re, im = jnp.take(re, idx), jnp.take(im, idx)
            return re, im

        def make_run(seg, in_nodes, out_nodes, is_last):
            def body(carry, x):
                sid_raw, bins = x
                sid = jnp.maximum(sid_raw, 0)
                vals = dict(zip(in_nodes, bins))

                def fetch(v):
                    if v in vals:
                        return vals.pop(v)
                    return leaf_val(sid, v, leaves_c[0])


                for st in seg:
                    kl, kr, s, nb, gl, gr = st['key']
                    lr, li = fetch(st['left'])
                    rr, ri = fetch(st['right'])
                    if gl:
                        lr, li = gather(
                            lr, li, kl,
                            shifts_c[0][shift_of[tuple(st['shl'])]])
                    if gr:
                        rr, ri = gather(
                            rr, ri, kr,
                            shifts_c[0][shift_of[tuple(st['shr'])]])
                    vals[st['v']] = _apply_flat_step(
                        st['key'], st['mode'], lr, li, rr, ri,
                        precision)
                if is_last:
                    re, im = vals[self.plan.root]
                    w = (sid_raw >= 0).astype(self.float_type)
                    return (carry[0] + w * re, carry[1] + w * im), ()
                return carry, tuple(vals[v] for v in out_nodes)

            def run(ids, bound_in, leaves, shifts):
                # close over runtime args via a one-element list so the
                # scan body sees traced values, not module globals
                leaves_c[0] = leaves
                shifts_c[0] = shifts
                if is_last:
                    size = int(np.prod(out_shape,
                                       dtype=np.int64)) or 1
                    acc0 = (jnp.zeros((size,), self.float_type),
                            jnp.zeros((size,), self.float_type))
                else:
                    acc0 = jnp.zeros((), self.float_type)
                carry, ys = lax.scan(body, acc0, (ids, bound_in))
                if not is_last:
                    return ys
                re, im = carry
                if out_shift is not None:
                    k = len(self.output_order)
                    i = jnp.arange(2**k, dtype=jnp.int32)
                    idx = jnp.zeros_like(i)
                    for j in range(k):
                        idx = idx | (((i >> (k - 1 - j)) & 1) <<
                                     int(out_shift[j]))
                    re, im = jnp.take(re, idx), jnp.take(im, idx)
                return re, im

            leaves_c = [None]
            shifts_c = [None]
            return run

        # Compile with a MEASURED-code-size guard: the worker dies
        # loading programs beyond ~107 MB of generated code, and the
        # host-side per-step estimate is only ~2-3x accurate, so after
        # compiling we check every segment's actual code size and, if
        # any exceeds the limit, shrink the budget proportionally and
        # re-segment (at most twice; compiles hit the persistent cache
        # on retry overlap).
        CODE_LIMIT_MB = 95.0
        t0 = _t.time()
        fns = None
        for attempt in range(3):
            bounds, live_at_cut = self._flat_scan_cuts(sched)
            segs = [sched[a:b] for a, b in zip(bounds, bounds[1:])]
            n_seg = len(segs)
            bound_bytes = max(
                (sum(2**kdim[v] for v in cut) * 8
                 for cut in live_at_cut), default=8)
            # [C, boundary] stacks ~<= 3 GB per cut side (two adjacent
            # cuts' stacks + ~2 GB program temps fit 16 GB HBM).
            C = int(min(self.scan_chunk,
                        max(1, 3 * 2**30 // bound_bytes),
                        max(1, stop - start)))
            key = ('flatscan-seg', self.matmul_precision, C,
                   tuple(bounds))
            fns = self._scan_progs.get(key)
            if fns is not None:
                break
            f32 = self.float_type
            i32 = jnp.int32
            ids_s = jax.ShapeDtypeStruct((C,), i32)
            lv = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                ((re_all_dev, im_all_dev), shift_vals))
            fns = []
            bound_s = ()
            max_code = 0.0
            for k_seg, seg in enumerate(segs):
                in_nodes = live_at_cut[k_seg - 1] if k_seg else []
                out_nodes = live_at_cut[k_seg] \
                    if k_seg < n_seg - 1 else []
                run = make_run(seg, in_nodes, out_nodes,
                               k_seg == n_seg - 1)
                fn = jax.jit(run).lower(ids_s, bound_s, *lv).compile()
                try:
                    ma = fn.memory_analysis()
                    code_mb = ma.generated_code_size_in_bytes / 2**20
                    max_code = max(max_code, code_mb)
                    if verbose:
                        print(f"#   segment {k_seg + 1}: code "
                              f"{code_mb:.1f} MB, temp "
                              f"{ma.temp_size_in_bytes/2**20:.0f} MB",
                              file=sys.stderr, flush=True)
                except Exception:
                    pass
                fns.append(fn)
                bound_s = tuple(
                    (jax.ShapeDtypeStruct((C, 2**kdim[v]), f32),) * 2
                    for v in out_nodes)
            if max_code <= CODE_LIMIT_MB or attempt == 2:
                self._scan_progs[key] = fns
                break
            self.scan_seg_code_mb = max(
                5.0, self.scan_seg_code_mb * 0.85 *
                CODE_LIMIT_MB / max_code)
            if verbose:
                print(f"# segment code {max_code:.0f} MB > "
                      f"{CODE_LIMIT_MB:.0f}; re-segmenting at budget "
                      f"{self.scan_seg_code_mb:.0f} MB",
                      file=sys.stderr, flush=True)
        if verbose:
            print(f"# flat-scan executor: compiled {n_seg} segment "
                  f"programs ({[b - a for a, b in zip(bounds, bounds[1:])]} "
                  f"steps, chunk {C}) in {_t.time()-t0:.1f}s",
                  file=sys.stderr, flush=True)

        sync = bool(getattr(self, 'scan_seg_sync', False))
        acc = None
        for lo in range(start, stop, C):
            ids_np = np.full(C, -1, dtype=np.int32)
            m = min(C, stop - lo)
            ids_np[:m] = np.arange(lo, lo + m, dtype=np.int32)
            ids = jnp.asarray(ids_np)
            bound = ()
            for k_seg, fn in enumerate(fns):
                out = fn(ids, bound, (re_all_dev, im_all_dev),
                         shift_vals)
                bound = out
                if sync:   # debug: pin failures to a segment
                    import jax as _jax
                    leaf0 = _jax.tree.leaves(out)[0]
                    _ = float(np.asarray(leaf0.ravel()[:1])[0])
                    print(f"#   chunk@{lo} segment {k_seg + 1}/"
                          f"{len(fns)} ok", file=sys.stderr,
                          flush=True)
            re, im = out
            acc = (re, im) if acc is None else (acc[0] + re,
                                                acc[1] + im)
        out = np.asarray(acc[0]).astype(self.complex_type)
        out += 1j * np.asarray(acc[1]).astype(self.float_type)
        return out.reshape(out_shape)

    def contract_jax_flat(self, slice_range=None, verbose: bool = False,
                          scan: bool = True):
        """Flat-executor slice sum (see the class comment above).

        ``scan=True`` (default) runs the single-program scanned variant
        — one dispatch for the whole range; the per-step-dispatch loop
        below remains as the fallback when the scanned program fails to
        compile (the shared remote compile service intermittently
        500s)."""
        import sys
        import time as _t

        import jax.numpy as jnp

        start, stop = self._range(slice_range)
        if stop <= start:
            return np.zeros([self.plan.tree.size_dict[i]
                             for i in self.output_order],
                            dtype=self.complex_type)
        if scan:
            try:
                return self.contract_jax_flat_scan(
                    slice_range=slice_range, verbose=verbose)
            except Exception as e:
                print(f"# flat-scan failed "
                      f"({type(e).__name__}: {str(e)[:120]}); "
                      "falling back to per-step dispatch",
                      file=sys.stderr, flush=True)
        sched, out_shift = self._flat_schedule()
        shl_dev = {}
        for st in sched:
            for key in ('shl', 'shr'):
                if st[key] is not None:
                    t = tuple(st[key])
                    if t not in shl_dev:
                        shl_dev[t] = jnp.asarray(st[key])
        dummy = jnp.zeros((1,), jnp.int32)
        self._warm_flat_progs(sched, verbose=verbose)
        acc = None
        first = True
        for sid in range(start, stop):
            t0 = _t.time()
            vals = self._flat_leaves(sid)
            for st in sched:
                lr, li = vals.pop(st['left'])
                rr, ri = vals.pop(st['right'])
                fn = _FLAT_PROG_CACHE.get(
                    ('flatexec',) + st['key'] + (st['mode'],) +
                    (self.matmul_precision,)) or \
                    self._flat_step_prog(*st['key'], mode=st['mode'],
                                         prec=self.matmul_precision)
                shl = shl_dev[tuple(st['shl'])] if st['shl'] is not None \
                    else dummy
                shr = shl_dev[tuple(st['shr'])] if st['shr'] is not None \
                    else dummy
                vals[st['v']] = fn(lr, li, rr, ri, shl, shr)
            re, im = vals[self.plan.root]
            if out_shift is not None:
                k = len(self.output_order)
                i = jnp.arange(2**k, dtype=jnp.int32)
                idx = jnp.zeros_like(i)
                for j in range(k):
                    idx = idx | (((i >> (k - 1 - j)) & 1) <<
                                 int(out_shift[j]))
                re, im = jnp.take(re, idx), jnp.take(im, idx)
            acc = (re, im) if acc is None else (acc[0] + re, acc[1] + im)
            if verbose and first:
                _ = float(np.asarray(acc[0].reshape(-1)[:1])[0])
                print(f"# flat executor: first slice {_t.time()-t0:.1f}s "
                      f"({len(sched)} steps, "
                      f"{len(_FLAT_PROG_CACHE)} programs)",
                      file=sys.stderr, flush=True)
                first = False
        out = np.asarray(acc[0]).astype(self.complex_type)
        out += 1j * np.asarray(acc[1]).astype(self.float_type)
        return out.reshape([self.plan.tree.size_dict[i]
                            for i in self.output_order])

    # -- JAX backend (split-complex, slice-batched) ----------------------
    def _build_jax_fn(self):
        import jax
        import jax.numpy as jnp

        plan = self.plan
        n_leaves = plan.tree.n_leaves
        precision = _resolve_precision(self.matmul_precision)

        def one_slice(sid, leaves):
            # leaves: list of (re, im)
            vals = {}
            for v in range(n_leaves):
                re, im = leaves[v]
                for pos, j in sorted(plan.leaf_slices[v], reverse=True):
                    bit = (sid >> j) & 1
                    re = jnp.take(re, bit, axis=pos)
                    im = jnp.take(im, bit, axis=pos)
                vals[v] = (re, im)
            for v, a, b, a_axes, b_axes, spec in plan.steps:
                ar, ai = vals.pop(a)
                br, bi = vals.pop(b)
                vals[v] = _pair_contract_jnp(ar, ai, br, bi, a_axes,
                                             b_axes, spec, precision)
            re, im = vals[plan.root]
            if self.perm and self.perm != tuple(range(len(self.perm))):
                re = jnp.transpose(re, self.perm)
                im = jnp.transpose(im, self.perm)
            return re, im

        return one_slice

    # -- segmented JAX backend (for big trees) ----------------------------
    SEG_STEPS = 24  # contraction steps per compiled segment

    def _build_segments(self):
        """Split the contraction into segments of ≤SEG_STEPS pairwise
        contractions, each its own (vmapped, cached) jit — one giant
        traced program per tree does not compile in bounded time on a
        shared XLA service."""
        import jax
        import jax.numpy as jnp

        plan = self.plan
        n_leaves = plan.tree.n_leaves
        precision = _resolve_precision(self.matmul_precision)
        steps = plan.steps
        segments = [steps[i:i + self.SEG_STEPS]
                    for i in range(0, len(steps), self.SEG_STEPS)]

        def select_leaves(sid, leaves):
            vals = {}
            for v in range(n_leaves):
                re, im = leaves[v]
                for pos, j in sorted(plan.leaf_slices[v], reverse=True):
                    bit = (sid >> j) & 1
                    re = jnp.take(re, bit, axis=pos)
                    im = jnp.take(im, bit, axis=pos)
                vals[v] = (re, im)
            return vals

        def make_segment(seg, is_last):
            def run(vals):
                vals = dict(vals)
                for v, a, b, a_axes, b_axes, spec in seg:
                    ar, ai = vals.pop(a)
                    br, bi = vals.pop(b)
                    vals[v] = _pair_contract_jnp(ar, ai, br, bi, a_axes,
                                                 b_axes, spec, precision)
                if is_last:
                    re, im = vals[plan.root]
                    if self.perm and self.perm != tuple(
                            range(len(self.perm))):
                        re = jnp.transpose(re, self.perm)
                        im = jnp.transpose(im, self.perm)
                    return {plan.root: (re, im)}
                return vals

            return run

        select = jax.jit(jax.vmap(select_leaves, in_axes=(0, None)))
        fns = [jax.jit(jax.vmap(make_segment(
            seg, i == len(segments) - 1)))
            for i, seg in enumerate(segments)]
        return select, fns

    def _warm_segments(self, select, fns, leaves, chunk,
                       verbose: bool = False):
        """Compile every segment concurrently (AOT lower+compile in a
        thread pool).  The shared remote XLA compile service has
        minutes-level queueing per program; overlapping the waits turns
        n_segments x queue into ~queue."""
        import sys
        import time as _t
        from concurrent.futures import ThreadPoolExecutor

        import jax
        import jax.numpy as jnp

        t0 = _t.time()
        ids = jax.ShapeDtypeStruct((chunk,), jnp.int32)
        lv = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), leaves)
        try:
            lowered = [select.lower(ids, lv)]
            vals = jax.eval_shape(select, ids, lv)
            for fn in fns:
                lowered.append(fn.lower(vals))
                vals = jax.eval_shape(fn, vals)
            with ThreadPoolExecutor(max_workers=8) as pool:
                compiled = list(pool.map(lambda lw: lw.compile(),
                                         lowered))
            if verbose:
                print(f"# warmed {len(lowered)} segment programs in "
                      f"{_t.time() - t0:.0f}s", file=sys.stderr,
                      flush=True)
            return compiled[0], compiled[1:]
        except Exception as e:  # pragma: no cover - warmup is advisory
            if verbose:
                print(f"# segment warmup skipped: "
                      f"{type(e).__name__}: {str(e)[:100]}",
                      file=sys.stderr, flush=True)
            return None

    def contract_jax_segmented(self, slice_range=None,
                               verbose: bool = False):
        """Chunked slice sum with per-segment compiled stages (host
        drives the segment pipeline; every jit is small and cached)."""
        import jax
        import jax.numpy as jnp

        leaves = [(jnp.asarray(d.real.astype(self.float_type)),
                   jnp.asarray(d.imag.astype(self.float_type)))
                  for d in self.datas]
        select, fns = self._build_segments()

        start, stop = self._range(slice_range)
        count = stop - start
        if count <= 0:  # empty range: a zero partial sum
            return np.zeros([self.plan.tree.size_dict[i]
                             for i in self.output_order],
                            dtype=self.complex_type)
        chunk = max(1, min(self._chunk(), count))
        while count % chunk:  # avoid a differently-shaped last chunk
            chunk -= 1
        warmed = self._warm_segments(select, fns, leaves, chunk,
                                     verbose=verbose)
        if warmed is not None:
            select, fns = warmed
        out_shape = [self.plan.tree.size_dict[i]
                     for i in self.output_order]
        acc = (jnp.zeros(out_shape, self.float_type),
               jnp.zeros(out_shape, self.float_type))
        add = jax.jit(lambda a, r, i: (a[0] + r.sum(0), a[1] + i.sum(0)))

        import sys
        import time as _t

        sid = start
        first = True
        while sid < stop:
            ids = jnp.arange(sid, min(sid + chunk, stop),
                             dtype=jnp.int32)
            t0 = _t.time()
            vals = select(ids, leaves)
            for k, fn in enumerate(fns):
                vals = fn(vals)
                if verbose and first:
                    # jit compilation is synchronous at dispatch (only
                    # execution is async), so this timestamps each
                    # segment's compile.
                    print(f"#   segment {k + 1}/{len(fns)} dispatched "
                          f"({_t.time() - t0:.0f}s cumulative)",
                          file=sys.stderr, flush=True)
            re, im = vals[self.plan.root]
            acc = add(acc, re, im)
            first = False
            sid += chunk

        out = np.asarray(acc[0]).astype(self.complex_type)
        out += 1j * np.asarray(acc[1]).astype(self.float_type)
        return out

    def _chunk(self, max_batch_elems: float = 2**25):
        size = max(self.plan.tree.max_size(self.plan.sliced_set), 1)
        chunk = int(max(1, min(self.nslices, max_batch_elems // size)))
        # largest power of two dividing nslices and <= chunk
        while self.nslices % chunk:
            chunk -= 1
        return chunk

    def contract_jax(self, devices=None, verbose: bool = False,
                     slice_range=None):
        """Sum slices on device; if ``devices`` has more than one entry,
        slice ranges are split across a 1-D mesh and psum-reduced over
        ICI.  ``slice_range=(start, stop)`` sums only that range —
        partial sums are the unit of checkpoint/resume (the reference's
        MPI ranks sum slice ranges the same way,
        ``simulation_mpi.py:459-468``)."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        n_dev = 1 if devices is None else len(devices)
        max_rank = max(len(inds) for inds in self.plan.eff.values())
        if n_dev <= 1 and (len(self.plan.steps) > 40 or max_rank > 12):
            # Big tree or high-rank intermediates: traced (2,)*k
            # programs tile-pad catastrophically on TPU and overwhelm
            # the shared compile service — use the flat executor.
            return self.contract_jax_flat(slice_range=slice_range,
                                          verbose=verbose)

        one_slice = self._build_jax_fn()
        leaves = [(jnp.asarray(d.real.astype(self.float_type)),
                   jnp.asarray(d.imag.astype(self.float_type)))
                  for d in self.datas]

        if slice_range is None and n_dev > 1 and \
                self.nslices % n_dev == 0:
            return self._contract_jax_mesh(one_slice, leaves, devices)

        start, stop = self._range(slice_range)
        count = stop - start
        if count <= 0:  # empty range: a zero partial sum
            return np.zeros([self.plan.tree.size_dict[i]
                             for i in self.output_order],
                            dtype=self.complex_type)
        chunk = self._chunk()
        while count % chunk:
            chunk -= 1
        ids = jnp.arange(start, stop, dtype=jnp.int32).reshape(-1, chunk)

        key = ('vmap1', chunk, self.matmul_precision)
        run = self._scan_progs.get(key)
        if run is None:
            def _run(ids, leaves):
                def body(acc, chunk_ids):
                    re, im = jax.vmap(
                        lambda s: one_slice(s, leaves))(chunk_ids)
                    return ((acc[0] + re.sum(0), acc[1] + im.sum(0)),
                            None)

                out_shape = [self.plan.tree.size_dict[i]
                             for i in self.output_order]
                acc0 = (jnp.zeros(out_shape, self.float_type),
                        jnp.zeros(out_shape, self.float_type))
                (re, im), _ = lax.scan(body, acc0, ids)
                return re, im

            run = jax.jit(_run)
            self._scan_progs[key] = run

        re, im = run(ids, leaves)
        out = np.asarray(re).astype(self.complex_type)
        out += 1j * np.asarray(im).astype(self.float_type)
        return out

    def _contract_jax_mesh(self, one_slice, leaves, devices):
        """Each device sums its slice range; one psum over the mesh.
        The compiled shard_map program caches on the instance — a
        fresh closure per call would recompile the whole program every
        contraction (measured ~100x overhead on the CPU mesh)."""
        import jax
        import jax.numpy as jnp
        from jax import lax, shard_map
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        n_dev = len(devices)
        mesh = Mesh(np.asarray(devices), ('s',))
        per_dev = self.nslices // n_dev
        chunk = max(1, min(self._chunk(), per_dev))
        while per_dev % chunk:
            chunk -= 1
        ids = np.arange(self.nslices, dtype=np.int32).reshape(
            n_dev, -1, chunk)
        ids = jax.device_put(
            jnp.asarray(ids), NamedSharding(mesh, P('s', None, None)))
        out_shape = [self.plan.tree.size_dict[i]
                     for i in self.output_order]

        key = ('mesh', tuple(id(d) for d in devices), chunk,
               self.matmul_precision)
        fn = self._scan_progs.get(key)
        if fn is None:
            @functools.partial(shard_map, mesh=mesh,
                               in_specs=(P('s', None, None), P()),
                               out_specs=P())
            def run(ids, leaves):
                def body(acc, chunk_ids):
                    re, im = jax.vmap(
                        lambda s: one_slice(s, leaves))(chunk_ids)
                    return ((acc[0] + re.sum(0), acc[1] + im.sum(0)),
                            None)

                acc0 = (jnp.zeros(out_shape, self.float_type),
                        jnp.zeros(out_shape, self.float_type))
                # Per-device partial sums vary across the mesh; mark
                # the carry as varying so scan's carry types match.
                acc0 = lax.pcast(acc0, ('s',), to='varying')
                (re, im), _ = lax.scan(body, acc0, ids[0])
                return (lax.psum(re, 's'), lax.psum(im, 's'))

            fn = jax.jit(run)
            self._scan_progs[key] = fn

        re, im = fn(ids, tuple(leaves))
        out = np.asarray(re).astype(self.complex_type)
        out += 1j * np.asarray(im).astype(self.float_type)
        return out

    def contract(self, backend='jax', devices=None,
                 verbose: bool = False, slice_range=None) -> np.ndarray:
        if backend in ('jax', 'tpu'):
            return self.contract_jax(devices=devices, verbose=verbose,
                                     slice_range=slice_range)
        return self.contract_np(verbose=verbose,
                                slice_range=slice_range)
