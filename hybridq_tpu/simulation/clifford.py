"""Clifford / Pauli-string expansion engine.

Evolves an operator P through a circuit C as a sum of Pauli strings:
``C† P C = Σ_s phase_s · P_s`` — the density-matrix expansion used for
Clifford+T simulation (reference
``hybridq/circuit/simulation/clifford.py``; output parity with its
``update_pauli_string``: ``matrix(circuit + pauli + circuit.inv())``
equals the weighted Pauli sum).

The reference implements branching with a numba scalar kernel plus
multiprocessing/MPI task parallelism.  Here the branch frontier is a
*vectorized batch*: Pauli strings are rows of a uint8 code array
(0=I, 1=X, 2=Y, 3=Z) and each gate updates the whole batch with numpy
array ops grouped by local substring — the same data layout a device
(vmap) variant would use.  Memory is bounded by depth-first splitting of
oversized batches, mirroring the reference's BFS→DFS strategy
(``clifford.py:549-729``).
"""

from __future__ import annotations

from collections import defaultdict
from itertools import product

import numpy as np

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import BaseGate, Gate
from hybridq_tpu.utils import kron, sort

__all__ = ['update_pauli_string', 'expectation_value']

_PAULI_NAMES = 'IXYZ'
_PAULIS = [Gate(g).matrix().astype('complex128') for g in _PAULI_NAMES]
_PAULI_BYTES = np.frombuffer(b'IXYZ', dtype=np.uint8)
_PAULI_BASIS_CACHE: dict = {}


def _pauli_basis(k: int) -> np.ndarray:
    """Stacked k-qubit Pauli basis [4^k, 2^k, 2^k] (cached)."""
    out = _PAULI_BASIS_CACHE.get(k)
    if out is None:
        out = np.stack([kron(*(_PAULIS[int(c)] for c in digits))
                        for digits in product(range(4), repeat=k)])
        _PAULI_BASIS_CACHE[k] = out
    return out


def _string_keys(codes: np.ndarray):
    """Vectorized Pauli-string keys for a [B, n] uint8 code batch."""
    chars = _PAULI_BYTES[codes]
    return [row.tobytes().decode('ascii') for row in chars]


def _pauli_rows(U: np.ndarray, eps: float):
    """Sparse Pauli-transfer rows of a k-qubit gate.

    ``rows[s] = (codes_t, coeffs)`` with
    ``U† P_s U = Σ_t coeffs[t] P_t`` (reference ``_process_gate``,
    ``clifford.py:491-546``).  Coefficients are real for unitary gates;
    entries below ``eps`` are dropped (the branching cutoff).
    """
    dim = U.shape[0]
    k = int(round(np.log2(dim)))
    paulis = _pauli_basis(k)
    Ud = U.conj().T
    # M[s] = U† P_s U, coeffs[s, t] = Re tr(P_t M_s) / dim — one batched
    # einsum instead of 16^k Python-loop matmuls.
    M = np.einsum('ij,sjk,kl->sil', Ud, paulis, U, optimize=True)
    coeffs_all = np.real(np.einsum('tij,sji->st', paulis, M,
                                   optimize=True)) / dim
    rows = []
    for s in range(4**k):
        coeffs = coeffs_all[s]
        sel = np.abs(coeffs) > eps
        ts = np.nonzero(sel)[0].astype(np.int64)
        # Largest-weight first: deeper branches die sooner under
        # branch_atol (reference explores largest first).
        order = np.argsort(-np.abs(coeffs[sel]))
        rows.append((ts[order], coeffs[sel][order]))
    return rows, k


def _digits(vals, k):
    """4-ary digits of vals, most significant first: [len(vals), k]."""
    out = np.empty((len(vals), k), dtype=np.uint8)
    for j in range(k):
        out[:, k - 1 - j] = (vals >> (2 * j)) & 3
    return out


def _apply_gate_batch(codes, phases, qs, rows, k, branch_atol):
    """Apply one gate's Pauli-transfer to the whole branch batch."""
    # Local substring code: qs[0] is the most significant digit.
    local = np.zeros(len(codes), dtype=np.int64)
    for j, q in enumerate(qs):
        local = (local << 2) | codes[:, q]

    out_codes = []
    out_phases = []
    for s in np.unique(local):
        mask = local == s
        ts, cs = rows[s]
        if len(ts) == 0:
            continue
        nb = int(mask.sum())
        nt = len(ts)
        rep = np.repeat(codes[mask], nt, axis=0)
        tdig = _digits(ts, k)
        for j, q in enumerate(qs):
            rep[:, q] = np.tile(tdig[:, j], nb)
        ph = (phases[mask][:, None] * cs[None, :]).ravel()
        out_codes.append(rep)
        out_phases.append(ph)

    if not out_codes:
        return codes[:0], phases[:0]
    codes = np.concatenate(out_codes)
    phases = np.concatenate(out_phases)
    if branch_atol:
        sel = np.abs(phases) > branch_atol
        if not sel.all():
            codes, phases = codes[sel], phases[sel]
    return codes, phases


def _merge_batch(codes, phases):
    """Sum phases of identical strings (linearity of the evolution)."""
    if len(codes) < 2:
        return codes, phases
    uniq, inv = np.unique(codes, axis=0, return_inverse=True)
    summed = np.zeros(len(uniq), dtype=phases.dtype)
    np.add.at(summed, inv, phases)
    return uniq, summed


def _check_memory(max_virtual_memory):
    """Abort when system virtual memory use crosses the threshold
    (reference ``clifford.py:719-722``)."""
    if max_virtual_memory is None:
        return
    import psutil

    pct = psutil.virtual_memory().percent
    if pct > max_virtual_memory:
        raise MemoryError(
            f"Memory above threshold: {pct}% > {max_virtual_memory}%")


_GATE_TABLE_CACHE: dict = {}


def _gate_tables(rows, k):
    """Dense (padded) Pauli-transfer tables for the device kernel:
    ``ts_tab[s, t]`` target codes, ``cs_tab[s, t]`` coefficients (0 pads).
    """
    nt = max((len(ts) for ts, _ in rows), default=1) or 1
    ts_tab = np.zeros((4**k, nt), dtype=np.int32)
    cs_tab = np.zeros((4**k, nt), dtype=np.float32)
    for s, (ts, cs) in enumerate(rows):
        ts_tab[s, :len(ts)] = ts
        cs_tab[s, :len(cs)] = cs
    return ts_tab, cs_tab


_JAX_KERNEL_CACHE: dict = {}


def _jax_expand_kernel(k: int, nt: int, n: int):
    """Jitted full-batch Pauli-transfer expansion (device variant of
    ``_apply_gate_batch``): uint8 frontier rows expand by a fixed factor
    ``nt``; compaction happens host-side between gates.  Elementwise +
    gather only, so the batch axis shards cleanly over a mesh."""
    key = (k, nt, n)
    fn = _JAX_KERNEL_CACHE.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    def expand(codes, phases, qs, ts_tab, cs_tab):
        # local substring code: qs[0] most significant
        sub = jnp.take(codes, qs, axis=1).astype(jnp.int32)   # [B, k]
        w = 4 ** jnp.arange(k - 1, -1, -1, dtype=jnp.int32)
        local = (sub * w[None, :]).sum(axis=1)                # [B]
        ts = jnp.take(ts_tab, local, axis=0)                  # [B, nt]
        cs = jnp.take(cs_tab, local, axis=0)                  # [B, nt]
        new_phases = phases[:, None] * cs                     # [B, nt]
        out = jnp.broadcast_to(codes[:, None, :],
                               (codes.shape[0], nt, n))
        cols = jnp.arange(n, dtype=jnp.int32)
        for j in range(k):
            dig = ((ts >> (2 * (k - 1 - j))) & 3).astype(jnp.uint8)
            sel = (cols == qs[j])[None, None, :]
            out = jnp.where(sel, dig[:, :, None], out)
        return (out.reshape(-1, n), new_phases.reshape(-1))

    fn = jax.jit(expand)
    _JAX_KERNEL_CACHE[key] = fn
    return fn


def _apply_gate_batch_jax(codes, phases, qs, rows, k, branch_atol,
                          devices=None):
    """Device-batched gate application: pad the batch to a power of two,
    shard over ``devices`` along the batch axis, expand on device, then
    compact on host."""
    import jax
    import jax.numpy as jnp

    ts_tab, cs_tab = _gate_tables(rows, k)
    nt = ts_tab.shape[1]
    n = codes.shape[1]
    B = len(codes)
    ndev = len(devices) if devices else 1
    # Pad to a multiple of devices (and a power of two for program reuse).
    Bp = max(ndev, 1 << int(np.ceil(np.log2(max(B, 1)))))
    Bp = ((Bp + ndev - 1) // ndev) * ndev
    codes_p = np.zeros((Bp, n), dtype=np.uint8)
    codes_p[:B] = codes
    phases_p = np.zeros((Bp,), dtype=phases.dtype)
    phases_p[:B] = phases

    fn = _jax_expand_kernel(k, nt, n)
    args = (codes_p, phases_p, np.asarray(qs, dtype=np.int32),
            ts_tab, cs_tab)
    if devices and ndev > 1:
        mesh = jax.sharding.Mesh(np.asarray(devices), ('b',))
        sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec('b'))
        rep = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())
        args = (jax.device_put(args[0], sh), jax.device_put(args[1], sh),
                jax.device_put(args[2], rep), jax.device_put(args[3], rep),
                jax.device_put(args[4], rep))
    out_codes, out_phases = fn(*args)
    out_codes = np.asarray(out_codes)
    out_phases = np.asarray(out_phases)
    sel = np.abs(out_phases) > (branch_atol or 0.0)
    return out_codes[sel], out_phases[sel]


def _distributed_merge(db, n):
    """Sum per-process partial dicts across ``jax.distributed``
    processes (the DCN analog of the reference's binary-tree dict
    merge over MPI send/recv, ``clifford.py:1280-1386``): each process
    encodes its strings as padded (codes, phases) arrays and a
    ``process_allgather`` replicates them; every process returns the
    identical merged dict (scatter + tree-merge + bcast in one step).
    """
    from jax.experimental import multihost_utils as mhu

    keys = sorted(db)
    codes = np.zeros((len(keys), n), dtype=np.int32)
    for i, kk in enumerate(keys):
        codes[i] = [_PAULI_NAMES.index(c) for c in kk]
    phases = np.asarray([db[kk] for kk in keys], dtype=np.float64)
    sizes = np.asarray(mhu.process_allgather(
        np.asarray([len(keys)], dtype=np.int64))).reshape(-1)
    m = max(int(sizes.max()), 1)
    cp = np.zeros((m, n), np.int32)
    cp[:len(keys)] = codes
    pp = np.zeros((m,), np.float64)
    pp[:len(keys)] = phases
    all_codes = np.asarray(mhu.process_allgather(cp))
    all_phases = np.asarray(mhu.process_allgather(pp))
    out = defaultdict(float)
    for p in range(all_codes.shape[0]):
        cnt = int(sizes[p])
        for key, ph in zip(
                _string_keys(all_codes[p][:cnt].astype(np.uint8)),
                all_phases[p][:cnt]):
            out[key] += float(ph)
    return out


_WORKER_GATES = None


def _init_worker(gates):
    """Pool initializer: ship the preprocessed gate tables once per
    worker instead of once per task."""
    global _WORKER_GATES
    _WORKER_GATES = gates


def _dfs_chunk(args):
    """Worker: depth-first evolution of one branch chunk; returns
    (dict, n_explored, largest_batch).  Top-level for pickling
    (reference Pool DFS, ``clifford.py:587-729``)."""
    (gi0, codes, phases, branch_atol, atol, max_batch,
     merge_every, max_virtual_memory) = args
    gates = _WORKER_GATES
    db = defaultdict(float)
    n_explored = 0
    largest = len(codes)
    stack = [(gi0, codes, phases)]
    while stack:
        gi, codes, phases = stack.pop()
        while gi < len(gates) and len(codes):
            qs, rows, k = gates[gi]
            codes, phases = _apply_gate_batch(codes, phases, qs, rows,
                                              k, branch_atol)
            gi += 1
            if merge_every and gi % merge_every == 0:
                codes, phases = _merge_batch(codes, phases)
            largest = max(largest, len(codes))
            _check_memory(max_virtual_memory)
            if len(codes) > max_batch:
                half = len(codes) // 2
                stack.append((gi, codes[half:], phases[half:]))
                codes, phases = codes[:half], phases[:half]
        if not len(codes):
            continue
        n_explored += len(codes)
        codes, phases = _merge_batch(codes, phases)
        # No atol cut here: chunk contributions to the same string
        # must sum before the caller's final filter.
        for key, ph in zip(_string_keys(codes), phases):
            db[key] += float(ph)
    return dict(db), n_explored, largest


def update_pauli_string(circuit, pauli_string, phase: float = 1,
                        parallel=False, return_info: bool = False,
                        use_mpi=None, compress: int = 4,
                        simplify: bool = True,
                        remove_id_gates: bool = True,
                        float_type='float32', verbose: bool = False,
                        backend: str = 'numpy', devices=None,
                        **kwargs):
    """Expand ``C† P C`` in Pauli strings.

    Returns a dict mapping Pauli strings (over the sorted circuit qubits)
    to real amplitudes; with ``return_info=True`` also an info dict.

    ``parallel``: False/1 = single process; True = all cores; int = that
    many worker processes.  The frontier is grown breadth-first, split
    into chunks, and each chunk's depth-first evolution runs in a
    process pool with a final dict merge (reference BFS→DFS Pool
    strategy, ``clifford.py:549-729, 1227-1386``).

    ``backend='jax'`` runs the batch expansion on devices (the batch
    axis shards over ``devices``, default all); compaction and the
    final dict stay host-side.

    ``use_mpi``: ``None`` (default) autodetects a ``jax.distributed``
    runtime and splits the branch frontier across processes (each
    process evolves its share, partial dicts merge with one
    all-gather — the analog of the reference's MPI scatter +
    binary-tree merge, ``clifford.py:1227-1386``); ``False`` disables,
    ``True`` forces.  Composes with ``parallel`` and ``backend``: each
    process's share still runs on its local pool or devices.

    ``max_virtual_memory`` (default 80): abort with ``MemoryError``
    when system memory use exceeds this percentage (reference
    ``clifford.py:719-722``).
    """
    float_type = np.dtype(float_type)
    kwargs.setdefault('eps',
                      1e-7 if float_type == np.dtype('float32') else 1e-8)
    kwargs.setdefault('atol',
                      1e-8 if float_type == np.dtype('float32') else 1e-12)
    kwargs.setdefault('branch_atol', kwargs['atol'])
    kwargs.setdefault('max_breadth_first_branches', 2**18)
    kwargs.setdefault('merge_interval', 4)
    kwargs.setdefault('max_virtual_memory', 80)

    circuit = utils.flatten(Circuit(circuit))
    if remove_id_gates:
        circuit = Circuit(g for g in circuit if g.name != 'I')

    # A plain token string means a single Pauli string with unit phase.
    if isinstance(pauli_string, str):
        pauli_string = {pauli_string: 1.0}

    # Determine qubits (circuit plus Pauli support).
    if isinstance(pauli_string, dict):
        pauli_qubits = []
    else:
        pauli_string = Circuit(pauli_string)
        pauli_qubits = pauli_string.all_qubits
    qubits = sort(set(circuit.all_qubits) | set(pauli_qubits))
    n = len(qubits)
    qubit_index = {q: i for i, q in enumerate(qubits)}

    # Initial branches.
    if isinstance(pauli_string, dict):
        codes0 = []
        phases0 = []
        for key, ph in pauli_string.items():
            key = str(key).upper()
            if len(key) != n or set(key) - set(_PAULI_NAMES):
                raise ValueError(f"'{key}' is not a valid Pauli string.")
            codes0.append([_PAULI_NAMES.index(c) for c in key])
            phases0.append(ph * phase)
        codes = np.asarray(codes0, dtype=np.uint8)
        phases = np.asarray(phases0, dtype=float_type)
    else:
        code = np.zeros(n, dtype=np.uint8)
        for g in pauli_string:
            if g.name not in _PAULI_NAMES:
                raise ValueError(
                    "'pauli_string' must contain only Pauli gates.")
            (q,) = g.qubits
            code[qubit_index[q]] = _PAULI_NAMES.index(g.name)
        codes = code[None]
        phases = np.asarray([phase], dtype=float_type)

    # Preprocess circuit: simplify then lightcone-prune against the Pauli
    # support (gates outside the cone cancel between C† and C;
    # reference ``clifford.py:1056-1081``).
    if simplify and len(circuit):
        support = [qubits[i] for i in range(n)
                   if np.any(codes[:, i] != 0)]
        circuit = utils.simplify(circuit, remove_id_gates=remove_id_gates)
        if support:
            circuit = utils.popright(Circuit(circuit),
                                     pinned_qubits=support)

    # Compress and precompute Pauli-transfer rows.  Heisenberg evolution
    # C† P C applies the LAST gate's transfer first (the reference
    # iterates ``reversed(circuit)``, ``clifford.py:1104``); each block's
    # transfer U†PU is exact as a unit, so only the block order reverses.
    blocks = utils.compress(circuit, compress) if compress else \
        [Circuit([g]) for g in circuit]
    blocks = list(reversed(blocks))
    gates = []
    for b in blocks:
        g = utils.to_matrix_gate(b, complex_type='complex128') \
            if len(b) > 1 else b[0]
        if not g.provides('matrix'):
            raise NotImplementedError(
                f"Gate '{g.name}' not supported by the Clifford engine.")
        rows, k = _pauli_rows(np.asarray(g.matrix(), dtype='complex128'),
                              kwargs['eps'])
        qs = tuple(qubit_index[q] for q in g.qubits)
        gates.append((qs, rows, k))

    # Depth-first evolution with bounded batches.
    max_batch = int(kwargs['max_breadth_first_branches'])
    merge_every = int(kwargs['merge_interval'])
    max_vm = kwargs['max_virtual_memory']
    db = defaultdict(float)
    info = {'n_explored_branches': 0, 'largest_batch': len(codes)}

    # Worker count: True = all cores, int = that many, False/1 = serial.
    if parallel is True:
        import os as _os
        n_workers = _os.cpu_count() or 1
    else:
        n_workers = max(int(parallel or 1), 1)

    # Cross-process branch distribution (the jax.distributed analog of
    # the reference's MPI BFS scatter + tree merge,
    # ``clifford.py:1227-1386``): ``use_mpi=None`` autodetects a
    # distributed runtime, True forces, False disables.  Every process
    # runs the SAME deterministic BFS until the frontier is wide enough
    # to split, takes its process-index share, evolves it with any
    # local backend below, and the partial dicts merge with one
    # all-gather at the end (``_distributed_merge``).
    if use_mpi is None:
        try:
            from hybridq_tpu import parallel as _par
            distributed = _par.is_distributed()
        except Exception:
            distributed = False
    else:
        distributed = bool(use_mpi)
    gi0 = 0
    if distributed:
        from hybridq_tpu import parallel as _par
        _pid, _nproc = _par.process_index(), _par.process_count()
        while gi0 < len(gates) and len(codes) and \
                len(codes) < 4 * _nproc * n_workers:
            qs, rows, k = gates[gi0]
            codes, phases = _apply_gate_batch(codes, phases, qs, rows,
                                              k, kwargs['branch_atol'])
            gi0 += 1
            codes, phases = _merge_batch(codes, phases)
            info['largest_batch'] = max(info['largest_batch'],
                                        len(codes))
        share = np.array_split(np.arange(len(codes)), _nproc)[_pid]
        codes, phases = codes[share], phases[share]

    if backend == 'jax':
        # Device-batched frontier: expansion runs on devices (batch axis
        # sharded over the mesh); split/merge/compaction stay host-side.
        import jax as _jax

        devs = list(devices) if devices is not None else _jax.devices()
        stack = [(gi0, codes, phases)]
        while stack:
            gi, codes, phases = stack.pop()
            while gi < len(gates) and len(codes):
                qs, rows, k = gates[gi]
                codes, phases = _apply_gate_batch_jax(
                    codes, phases, qs, rows, k, kwargs['branch_atol'],
                    devices=devs)
                gi += 1
                if merge_every and gi % merge_every == 0:
                    codes, phases = _merge_batch(codes, phases)
                info['largest_batch'] = max(info['largest_batch'],
                                            len(codes))
                _check_memory(max_vm)
                if len(codes) > max_batch:
                    half = len(codes) // 2
                    stack.append((gi, codes[half:], phases[half:]))
                    codes, phases = codes[:half], phases[:half]
            if not len(codes):
                continue
            info['n_explored_branches'] += len(codes)
            codes, phases = _merge_batch(codes, phases)
            for key, ph in zip(_string_keys(codes), phases):
                db[key] += float(ph)
    elif n_workers > 1 and len(gates):
        # BFS until the frontier is wide enough to split, then DFS the
        # chunks in a process pool and merge the result dicts
        # (reference clifford.py:549-729, 1227-1386).
        import multiprocessing as _mp

        gi = gi0
        while gi < len(gates) and len(codes) and \
                len(codes) < 4 * n_workers:
            qs, rows, k = gates[gi]
            codes, phases = _apply_gate_batch(codes, phases, qs, rows,
                                              k, kwargs['branch_atol'])
            gi += 1
            codes, phases = _merge_batch(codes, phases)
            info['largest_batch'] = max(info['largest_batch'], len(codes))
        if gi >= len(gates) or not len(codes):
            tasks = []
            info['n_explored_branches'] += len(codes)
            codes, phases = _merge_batch(codes, phases)
            for key, ph in zip(_string_keys(codes), phases):
                db[key] += float(ph)
        else:
            chunks = max(1, min(4 * n_workers, len(codes)))
            idx = np.array_split(np.arange(len(codes)), chunks)
            tasks = [(gi, codes[ix], phases[ix],
                      kwargs['branch_atol'], kwargs['atol'], max_batch,
                      merge_every, max_vm) for ix in idx if len(ix)]
        if tasks:
            with _mp.get_context('fork').Pool(
                    n_workers, initializer=_init_worker,
                    initargs=(gates,)) as pool:
                for part, n_exp, largest in pool.imap_unordered(
                        _dfs_chunk, tasks):
                    for key, val in part.items():
                        db[key] += val
                    info['n_explored_branches'] += n_exp
                    info['largest_batch'] = max(info['largest_batch'],
                                                largest)
    else:
        stack = [(gi0, codes, phases)]
        while stack:
            gi, codes, phases = stack.pop()
            while gi < len(gates) and len(codes):
                qs, rows, k = gates[gi]
                codes, phases = _apply_gate_batch(codes, phases, qs,
                                                  rows, k,
                                                  kwargs['branch_atol'])
                gi += 1
                if merge_every and gi % merge_every == 0:
                    codes, phases = _merge_batch(codes, phases)
                info['largest_batch'] = max(info['largest_batch'],
                                            len(codes))
                _check_memory(max_vm)
                if len(codes) > max_batch:
                    half = len(codes) // 2
                    stack.append((gi, codes[half:], phases[half:]))
                    codes, phases = codes[:half], phases[:half]
            if not len(codes):
                continue
            info['n_explored_branches'] += len(codes)
            codes, phases = _merge_batch(codes, phases)
            for row, ph in zip(codes, phases):
                db[''.join(_PAULI_NAMES[c] for c in row)] += float(ph)

    # Merge partial dicts across jax.distributed processes (all
    # processes participate — the allgather is a collective — and all
    # return the identical merged dict).  Must run BEFORE the atol
    # filter: per-process contributions to one string must sum first.
    if distributed:
        db = _distributed_merge(db, n)

    # Drop negligible strings.
    atol = kwargs['atol']
    for key in [k for k, v in db.items() if abs(v) < atol]:
        del db[key]

    info['n_strings'] = len(db)
    return (db, info) if return_info else db


def expectation_value(circuit, op, initial_state: str, **kwargs):
    """⟨ψ| C† op C |ψ⟩ with ψ a product state given by tokens '01+-'
    (reference ``clifford.py:1403-1556``)."""
    return_info = kwargs.pop('return_info', False)
    circuit = Circuit(circuit)
    qubits = circuit.all_qubits
    if len(initial_state) == 1:
        initial_state = initial_state * len(qubits)
    if len(initial_state) != len(qubits):
        raise ValueError("'initial_state' has the wrong number of qubits.")

    # Prepend the state-preparation circuit so the expectation reduces to
    # counting X/Y-free strings on |0...0>.
    prep = Circuit()
    for q, s in zip(qubits, initial_state):
        if s == '0':
            pass
        elif s == '1':
            prep.append(Gate('X', [q]))
        elif s == '+':
            prep.append(Gate('H', [q]))
        elif s == '-':
            prep.extend([Gate('X', [q]), Gate('H', [q])])
        else:
            raise ValueError(f"Unexpected token '{s}'")

    out = update_pauli_string(prep + circuit, op, return_info=return_info,
                              **kwargs)
    db, info = out if return_info else (out, None)
    value = sum(v for k, v in db.items() if not set(k) & set('XY'))
    return (value, info) if return_info else value
