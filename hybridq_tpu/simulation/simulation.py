"""Engine dispatch + state-vector evolution front-end.

Mirrors the public contract of the reference
``hybridq/circuit/simulation/simulation.py``:

  * ``simulate(circuit, optimize=...)`` dispatches on the ``optimize``
    string: ``'evolution'`` (state-vector) with sub-engines, or
    ``'tn'``/``'cotengra'`` (sliced tensor-network contraction).
  * evolution sub-engines:
      - ``'evolution'`` / ``'evolution-tpu'`` / ``'evolution-hybridq'``:
        the native engine — here a jit-compiled XLA evolution (the
        reference's C++/AVX core becomes
        ``hybridq_tpu.simulation.statevector``).
      - ``'evolution-einsum[-opt]'``: opt_einsum contraction per block with
        a pluggable backend ('numpy', 'jax').
  * ``expectation_value(state, op, qubits_order)``.

The distributed (mesh-sharded) state-vector engine lives in
``hybridq_tpu.simulation.sharded`` and is selected automatically when the
state is sharded, or explicitly with ``optimize='evolution-sharded'``.
"""

from __future__ import annotations

import time as _time_mod
from warnings import warn

import numpy as np

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import BaseGate, FunctionalGate, Gate, StochasticGate
from hybridq_tpu.simulation.prepare import prepare_state, prepare_state_jax

__all__ = ['simulate', 'expectation_value']


def _preprocess_circuit(circuit, initial_state, final_state, simplify,
                        remove_id_gates, atol, verbose, allow_sampling,
                        sampling_seed):
    """Shared front-end: flatten, sample stochastic gates, simplify
    (reference ``simulation.py:232-305``)."""
    circuit = utils.flatten(Circuit(circuit))

    if sampling_seed is not None:
        rng = np.random.default_rng(int(sampling_seed))
    else:
        rng = np.random.default_rng(np.random.randint(2**63))
    circuit = Circuit(
        g.sample(rng=rng) if isinstance(g, StochasticGate) and allow_sampling
        else g for g in circuit)

    qubits = circuit.all_qubits
    n_qubits = len(qubits)

    def _prep(state):
        if state is None:
            return None
        if isinstance(state, str):
            if len(state) == 1:
                state *= n_qubits
            if len(state) != n_qubits:
                raise ValueError(
                    "Wrong number of qubits for initial/final state.")
            return state
        state = np.asarray(state)
        if any(x != 2 for x in state.shape):
            raise ValueError("Only qubits of dimension 2 are supported.")
        if state.ndim != n_qubits:
            raise ValueError(
                "Wrong number of qubits for initial/final state.")
        return state

    initial_state = _prep(initial_state)
    final_state = _prep(final_state)

    if remove_id_gates:
        circuit = Circuit(g for g in circuit if g.name != 'I')
    if simplify:
        circuit = utils.simplify(
            circuit, remove_id_gates=remove_id_gates, atol=atol,
            verbose=verbose,
            **(simplify if isinstance(simplify, dict) else {}))
    if circuit and circuit.all_qubits != qubits:
        raise ValueError("Active qubits have changed after simplification. "
                         "Forcing stop.")
    return circuit, qubits, initial_state, final_state


def simulate(circuit, initial_state=None, final_state=None,
             optimize='evolution', backend='jax', complex_type='complex64',
             tensor_only: bool = False, simplify=True,
             remove_id_gates: bool = True, use_mpi=None, atol: float = 1e-8,
             verbose: bool = False, **kwargs):
    """Simulate a circuit (state-vector evolution or tensor-network
    contraction).  See the module docstring for the ``optimize`` grammar."""
    kwargs.setdefault('allow_sampling', False)
    kwargs.setdefault('sampling_seed', None)

    # Persistent XLA compile cache (one-time compile per program per
    # machine; see utils/cache.py).
    from hybridq_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    # Optional on-device tracing (the reference has only info dicts;
    # SURVEY §5 calls for jax.profiler traces).
    profile_dir = kwargs.pop('profile_dir', None)
    if profile_dir:
        import jax

        with jax.profiler.trace(str(profile_dir)):
            return simulate(circuit, initial_state=initial_state,
                            final_state=final_state, optimize=optimize,
                            backend=backend, complex_type=complex_type,
                            tensor_only=tensor_only, simplify=simplify,
                            remove_id_gates=remove_id_gates,
                            use_mpi=use_mpi, atol=atol, verbose=verbose,
                            **kwargs)

    if tensor_only and isinstance(optimize, str) and 'evolution' in optimize:
        raise ValueError(
            f"'tensor_only' is not supported for optimize={optimize}")

    is_circuit = True
    try:
        circuit = Circuit(circuit)
    except Exception:
        is_circuit = False

    if is_circuit:
        circuit, qubits, initial_state, final_state = _preprocess_circuit(
            circuit, initial_state, final_state, simplify, remove_id_gates,
            atol, verbose, kwargs['allow_sampling'], kwargs['sampling_seed'])

    if isinstance(optimize, str) and 'evolution' in optimize:
        sub = '-'.join(optimize.split('-')[1:]) or 'tpu'
        if sub == 'hybridq':  # reference alias for its native engine
            sub = 'tpu'
        kwargs.setdefault('compress', 4)
        kwargs.setdefault('max_largest_intermediate', 2**30)
        kwargs.setdefault('return_info', False)
        kwargs.setdefault('block_until_ready', True)
        kwargs.setdefault('return_numpy_array', True)
        return _simulate_evolution(circuit, qubits, initial_state,
                                   final_state, sub, backend, complex_type,
                                   verbose, **kwargs)

    # Tensor-network contraction path.
    from hybridq_tpu.simulation.tn import simulate_tn
    kwargs.setdefault('compress', 2)
    return simulate_tn(circuit, initial_state, final_state, optimize,
                       backend, complex_type, tensor_only, verbose, **kwargs)


def _segment_blocks(blocks):
    """Group compressed blocks into maximal runs of matrix gates, keeping
    FunctionalGates as singleton separators."""
    segments = []  # list of ('mat', [gates]) | ('fun', gate)
    current = []
    for block in blocks:
        if any(isinstance(g, FunctionalGate) for g in block):
            assert len(block) == 1
            if current:
                segments.append(('mat', current))
                current = []
            segments.append(('fun', block[0]))
        else:
            current.append(block)
    if current:
        segments.append(('mat', current))
    return segments


def _simulate_evolution(circuit, qubits, initial_state, final_state, sub,
                        backend, complex_type, verbose, **kwargs):
    n_qubits = len(qubits)
    qubit_index = {q: i for i, q in enumerate(qubits)}
    info = {}

    if 2**n_qubits > kwargs['max_largest_intermediate']:
        raise MemoryError("Memory for the given number of qubits exceeds "
                          "the 'max_largest_intermediate'.")
    if final_state is not None:
        warn("'final_state' cannot be specified in optimize='evolution'. "
             "Ignoring 'final_state'.")
    if initial_state is None:
        raise ValueError(
            "'initial_state' must be specified for optimize='evolution'.")

    complex_type = np.dtype(complex_type)

    # Compress into k-qubit blocks, never merging FunctionalGates.
    compress_opt = kwargs['compress']
    max_k = compress_opt['max_n_qubits'] if isinstance(compress_opt, dict) \
        else compress_opt
    compress_kw = ({k: v for k, v in compress_opt.items()
                    if k != 'max_n_qubits'}
                   if isinstance(compress_opt, dict) else {})
    blocks = utils.compress(circuit, max_k,
                            skip_compression=[FunctionalGate],
                            **compress_kw)

    t0 = _time_mod.time()

    if sub == 'sharded':
        psi = _evolve_sharded(circuit, qubits, initial_state,
                              complex_type, kwargs)
    elif sub in ('tpu', 'indexed'):
        import jax
        if complex_type == np.dtype('complex128') and \
                not jax.config.read('jax_enable_x64'):
            # TPUs have no native f64; without x64 JAX truncates to
            # complex64.  Use the exact einsum path on host instead so a
            # complex128 request keeps full precision.
            psi = _evolve_einsum(blocks, qubits, qubit_index, initial_state,
                                 complex_type, 'numpy', 'auto', kwargs)
        elif _use_fused(sub, n_qubits, complex_type, kwargs):
            # One-pass fused Pallas engine (the fastest single-chip
            # path: one HBM traversal per gate block; measured 2-4x
            # the XLA indexed classes).  Auto-selected on real TPU
            # devices for wide registers; force with
            # optimize='evolution-fused'.
            psi = _evolve_fused(blocks, qubits, qubit_index,
                                initial_state, complex_type, kwargs)
        elif sub == 'indexed' or n_qubits > kwargs.get(
                'traced_engine_max_qubits', 22):
            # Runtime-position kernels: one compile per gate-size class
            # regardless of circuit depth (XLA compile time scales with
            # program size, which is prohibitive for deep circuits on
            # wide registers).
            psi = _evolve_indexed(blocks, qubits, qubit_index,
                                  initial_state, complex_type, kwargs)
        else:
            psi = _evolve_tpu(blocks, qubits, qubit_index, initial_state,
                              complex_type, kwargs)
    elif sub == 'fused':
        psi = _evolve_fused(blocks, qubits, qubit_index, initial_state,
                            complex_type, kwargs)
    elif sub.split('-')[0] == 'einsum':
        opt = '-'.join(sub.split('-')[1:]) or 'auto'
        psi = _evolve_einsum(blocks, qubits, qubit_index, initial_state,
                             complex_type, backend, opt, kwargs)
    else:
        raise ValueError(f"optimize='evolution-{sub}' not implemented.")

    info['runtime (s)'] = _time_mod.time() - t0

    if kwargs['return_numpy_array']:
        psi = np.asarray(psi).astype(complex_type, copy=False)

    return (psi, info) if kwargs['return_info'] else psi


def _evolve_tpu(blocks, qubits, qubit_index, initial_state, complex_type,
                kwargs):
    """Native XLA evolution on a split-complex device state: jit one
    executable per run of matrix blocks; FunctionalGates (measure /
    projection / message) run host-side between compiled segments, as in
    the reference (``simulation.py:522-649``)."""
    import jax.numpy as jnp

    from hybridq_tpu.simulation.prepare import prepare_state_split
    from hybridq_tpu.simulation.statevector import (evolve_statevector,
                                                    merge_complex,
                                                    split_complex)

    n_qubits = len(qubits)
    float_type = np.real(np.zeros(1, dtype=complex_type)).dtype
    if isinstance(initial_state, str):
        state = prepare_state_split(initial_state, float_type=float_type)
    else:
        re_h, im_h = split_complex(initial_state, float_type)
        state = (jnp.asarray(re_h.reshape(-1)),
                 jnp.asarray(im_h.reshape(-1)))

    for kind, payload in _segment_blocks(blocks):
        if kind == 'mat':
            gates = [utils.to_matrix_gate(b, complex_type=complex_type)
                     if len(b) > 1 else b[0] for b in payload]
            state = evolve_statevector(
                state, gates, qubit_index, n_qubits,
                complex_type=complex_type,
                block_until_ready=kwargs['block_until_ready'])
        else:
            host_psi = merge_complex(
                np.asarray(state[0]), np.asarray(state[1]),
                complex_type).reshape((2,) * n_qubits)
            new_psi, new_order = payload(host_psi, tuple(qubits))
            if tuple(new_order) != tuple(qubits):
                raise RuntimeError("'order' has changed.")
            re_h, im_h = split_complex(new_psi, float_type)
            state = (jnp.asarray(re_h.reshape(-1)),
                     jnp.asarray(im_h.reshape(-1)))
    return merge_complex(np.asarray(state[0]), np.asarray(state[1]),
                         complex_type).reshape((2,) * n_qubits)


def _evolve_sharded(circuit, qubits, initial_state, complex_type, kwargs):
    """Mesh-sharded evolution over all (or ``devices=``) devices.

    ``sharded_mode='traced'`` (default) compiles the whole schedule into
    one program — best when it is reused; ``'indexed'`` uses
    runtime-position kernels (one compile per gate-size class, supports
    Measure/Projection natively)."""
    from hybridq_tpu.simulation.sharded import (ShardedEvolver,
                                                ShardedIndexedEvolver)
    # Default to the runtime-position (indexed) variant: it compiles one
    # kernel per gate-size class (the traced engine recompiles per
    # circuit *structure* — the wrong default for one-off circuits) and
    # it is the only variant running Measure/Projection/Message natively
    # (reference ``simulation.py:522-649`` supports them inline).
    # ``sharded_mode='traced'`` opts into whole-schedule tracing for
    # workloads that reuse one circuit shape many times.
    mode = kwargs.get('sharded_mode') or 'indexed'
    cls = ShardedIndexedEvolver if mode == 'indexed' else ShardedEvolver
    ev = cls(n_qubits=len(qubits),
             devices=kwargs.get('devices'),
             complex_type=complex_type,
             compress=kwargs.get('compress', 2) or 2)
    if isinstance(initial_state, str):
        psi = ev.prepare_state(initial_state)
    else:
        psi = ev.scatter_state(
            np.asarray(initial_state, dtype=complex_type))
    psi = ev.evolve(psi, circuit, qubits=qubits)
    return ev.gather(psi)


def _use_fused(sub, n_qubits, complex_type, kwargs) -> bool:
    """Auto-select the fused Pallas engine: real accelerator device,
    wide register, complex64, exact-f32 matmuls (its only mode)."""
    from hybridq_tpu.simulation.fused_evolver import MIN_FUSED_QUBITS

    if kwargs.get('fused_engine') is not None:
        return bool(kwargs['fused_engine']) and \
            n_qubits >= MIN_FUSED_QUBITS
    if sub == 'indexed':
        return False
    if n_qubits < max(20, MIN_FUSED_QUBITS):
        return False
    if complex_type != np.dtype('complex64'):
        return False
    if kwargs.get('matmul_precision', 'highest') not in ('highest',
                                                         'high'):
        return False
    try:
        import jax

        return jax.default_backend() not in ('cpu',)
    except Exception:
        return False


def _evolve_fused(blocks, qubits, qubit_index, initial_state,
                  complex_type, kwargs):
    """One-pass fused Pallas engine (``fused_evolver.py``): a cost-
    model-paired schedule of in-place gate kernels."""
    import jax.numpy as jnp

    from hybridq_tpu.simulation.fused_evolver import (FusedEvolver,
                                                      pair_fused_gates)
    from hybridq_tpu.simulation.statevector import (merge_complex,
                                                    split_complex)

    n_qubits = len(qubits)
    ev = FusedEvolver(n_qubits,
                      precision=kwargs.get('matmul_precision',
                                           'highest'),
                      interpret=bool(kwargs.get('fused_interpret',
                                                False)))

    def pack(re_h, im_h):
        flat = jnp.concatenate(
            [jnp.asarray(np.asarray(re_h).reshape(-1)),
             jnp.asarray(np.asarray(im_h).reshape(-1))])
        return jnp.reshape(flat, (2**(n_qubits - 6), 128))

    if isinstance(initial_state, str):
        state = ev.prepare_state(initial_state)
    else:
        re_h, im_h = split_complex(initial_state, np.dtype('float32'))
        state = pack(re_h, im_h)

    for kind, payload in _segment_blocks(blocks):
        if kind == 'mat':
            items = []
            for b in payload:
                g = utils.to_matrix_gate(b, complex_type=complex_type) \
                    if len(b) > 1 else b[0]
                items.append((np.ascontiguousarray(g.matrix()),
                              tuple(qubit_index[q] for q in g.qubits)))
            from hybridq_tpu.simulation.fused_evolver import MapSim

            items = pair_fused_gates(items, n_qubits, MapSim.of(ev))
            # gate_key engages the (gate, map-state) prep memo: without
            # it every application rebuilds W on host and re-uploads
            # over the slow tunnel (~2 s/gate of host stalls measured,
            # fused_evolver.py module docstring).
            for i, (U, qs) in enumerate(items):
                state = ev.apply_gate(state, np.asarray(U), tuple(qs),
                                      gate_key=('blk', i))
        else:
            state = ev.flush(state)
            flat = np.asarray(state).reshape(2, -1)
            host_psi = merge_complex(
                flat[0].reshape((2,) * n_qubits),
                flat[1].reshape((2,) * n_qubits), complex_type)
            new_psi, new_order = payload(host_psi, tuple(qubits))
            if tuple(new_order) != tuple(qubits):
                raise RuntimeError("'order' has changed.")
            re_h, im_h = split_complex(new_psi, np.dtype('float32'))
            state = pack(re_h, im_h)
    if kwargs['block_until_ready']:
        state.block_until_ready()
    return ev.gather(state, complex_type)


def _evolve_indexed(blocks, qubits, qubit_index, initial_state,
                    complex_type, kwargs):
    """Runtime-position engine: compiled once per gate-size class; the
    state stays in canonical bit order on device."""
    import jax.numpy as jnp

    from hybridq_tpu.simulation.kernels import IndexedEvolver
    from hybridq_tpu.simulation.statevector import (merge_complex,
                                                    split_complex)

    n_qubits = len(qubits)
    ev = IndexedEvolver(n_qubits,
                        float_type=np.real(
                            np.zeros(1, dtype=complex_type)).dtype,
                        precision=kwargs.get('matmul_precision',
                                             'highest'))
    if isinstance(initial_state, str):
        state = ev.prepare_state(initial_state)
    else:
        re_h, im_h = split_complex(initial_state, ev.float_type)
        state = ev.pack(jnp.asarray(np.asarray(re_h).reshape(-1)),
                        jnp.asarray(np.asarray(im_h).reshape(-1)))

    for kind, payload in _segment_blocks(blocks):
        if kind == 'mat':
            gates = [utils.to_matrix_gate(b, complex_type=complex_type)
                     if len(b) > 1 else b[0] for b in payload]
            state = ev.apply_gates(state, gates, qubit_index)
        else:
            state = ev.flush(state)  # restore canonical layout
            flat = ev.unpack_host(state)
            host_psi = merge_complex(
                flat[0].reshape((2,) * n_qubits),
                flat[1].reshape((2,) * n_qubits),
                complex_type)
            new_psi, new_order = payload(host_psi, tuple(qubits))
            if tuple(new_order) != tuple(qubits):
                raise RuntimeError("'order' has changed.")
            re_h, im_h = split_complex(new_psi, ev.float_type)
            state = ev.pack(jnp.asarray(np.asarray(re_h).reshape(-1)),
                            jnp.asarray(np.asarray(im_h).reshape(-1)))
    if kwargs['block_until_ready']:
        state.block_until_ready()
    return ev.gather(state, complex_type)


def _evolve_einsum(blocks, qubits, qubit_index, initial_state, complex_type,
                   backend, opt, kwargs):
    """opt_einsum-based evolution (reference ``simulation.py:680-768``)."""
    from opt_einsum import contract, get_symbol

    n_qubits = len(qubits)
    if isinstance(initial_state, str):
        psi = prepare_state(initial_state, complex_type=complex_type)
    else:
        psi = np.asarray(initial_state, dtype=complex_type)
    if backend == 'jax':
        import jax.numpy as jnp
        psi = jnp.asarray(psi)

    for kind, payload in _segment_blocks(blocks):
        if kind == 'fun':
            host_psi = np.asarray(psi).astype(complex_type, copy=False)
            psi, order = payload(host_psi, tuple(qubits))
            if tuple(order) != tuple(qubits):
                raise RuntimeError("'order' has changed.")
            if backend == 'jax':
                import jax.numpy as jnp
                psi = jnp.asarray(psi)
            continue

        # One contraction per compressed block.
        for block in payload:
            gqubits, gmats = zip(*((b.qubits,
                                    np.reshape(
                                        b.matrix().astype(complex_type),
                                        (2,) * (2 * len(b.qubits))))
                                   for b in
                                   ([utils.to_matrix_gate(
                                       block, complex_type=complex_type)]
                                    if len(block) > 1 else [block[0]])))
            symbol_of = {q: get_symbol(x) for x, q in enumerate(qubits)}
            count = n_qubits
            path = ''.join(symbol_of[q] for q in qubits)
            for qs in gqubits:
                path_in = ''.join(symbol_of[q] for q in qs)
                path_out = ''
                for q in qs:
                    symbol_of[q] = get_symbol(count)
                    count += 1
                    path_out += symbol_of[q]
                path = path_out + path_in + ',' + path
            path += '->' + ''.join(symbol_of[q] for q in qubits)
            if backend == 'jax':
                import jax

                # TPU matmuls default to bf16 inputs; force true f32.
                with jax.default_matmul_precision('highest'):
                    psi = contract(path, *reversed(gmats), psi,
                                   backend=backend, optimize=opt)
                if kwargs['block_until_ready']:
                    psi.block_until_ready()
            else:
                psi = contract(path, *reversed(gmats), psi,
                               backend=backend, optimize=opt)
    return psi


def expectation_value(state, op, qubits_order, complex_type='complex64',
                      backend='jax', verbose: bool = False,
                      **kwargs) -> complex:
    """Expectation value ⟨state| op |state⟩.

    ``qubits_order`` maps the axes of ``state`` to qubit labels.  Unlike
    the reference (``simulation.py:1125-1217``), the state is explicitly
    permuted into sorted-qubit order before evolution, so an unsorted
    ``qubits_order`` is handled correctly.
    """
    from hybridq_tpu.utils import sort

    kwargs['remove_id_gates'] = False
    state = np.asarray(state)
    n_qubits = state.ndim
    qubits_order = list(qubits_order)
    if len(qubits_order) != n_qubits:
        raise ValueError("'qubits_order' must have the same number of "
                         "qubits of 'state'.")
    op = Circuit(op)
    if set(op.all_qubits) - set(qubits_order):
        raise ValueError("'op' has qubits not included in 'qubits_order'.")

    sorted_qubits = sort(qubits_order)
    if sorted_qubits != qubits_order:
        perm = [qubits_order.index(q) for q in sorted_qubits]
        state = np.transpose(state, perm)

    op = op + [Gate('I', qubits=[q])
               for q in set(qubits_order) - set(op.all_qubits)]
    new_state = simulate(op, initial_state=state, optimize='evolution',
                         complex_type=complex_type, backend=backend,
                         verbose=verbose, **kwargs)
    return np.real_if_close(np.sum(np.asarray(new_state) * state.conj()))
