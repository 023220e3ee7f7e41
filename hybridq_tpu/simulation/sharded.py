"""Mesh-sharded state-vector evolution (multi-chip, ICI collectives).

This is the capability the reference *lacks*: its MPI layer never shards
the state vector (``hybridq/circuit/simulation/simulation.py:379-380``
warns exactly this) — evolution is single-node.  Here the 2^n state is
sharded over a ``jax.sharding.Mesh``:

  * the state is **split-complex** — a pair of float arrays ``(re, im)``
    (the TPU backend has no complex dtype; real contractions also map
    straight onto the MXU);
  * the first ``g = log2(n_devices)`` *physical qubit positions* are
    "global" — they are the device-index bits;
  * the remaining ``n - g`` positions are local axes of each shard;
  * a gate acting on a global qubit triggers a *global-local qubit swap*:
    each device exchanges half of its local block with the partner whose
    device index differs in that bit (one ``lax.ppermute`` over ICI — the
    TPU analog of the reference's relabel-and-swap scheduling,
    ``simulation.py:512-630``, with MPI messages replaced by ICI
    neighbor exchange);
  * the host keeps a logical→physical qubit map so data is only moved
    when a gate actually needs it, and the final state is unpermuted once.

The whole gate/swap schedule of a circuit is traced into a single
``shard_map``-jitted executable; gate matrices are runtime arguments so
structurally identical circuits reuse the compiled binary.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

from hybridq_tpu.circuit import Circuit, utils as circuit_utils
from hybridq_tpu.gate import FunctionalGate
from hybridq_tpu.simulation.prepare import TOKEN_VECTORS, _check_state
from hybridq_tpu.simulation.statevector import apply_gate_split

__all__ = ['ShardedEvolver']


def _trace_sharded(state, mats, *, ops, n_local, g, mesh_axis):
    """Traced per-shard program: local gate applications and global-local
    qubit swaps.  ``ops`` is a static schedule of
    ('gate', mat_idx, local_slots) and ('swap', global_bit, local_slot).

    The local shard is a FLAT ``(2^n_local,)`` split pair; every op views
    it through a bounded-rank segment reshape (rank-n arrays are
    pathologically tile-padded on TPU, and XLA compile time grows with
    rank).  A host-side bit layout tracks where each local slot lives.
    """
    import jax.numpy as jnp
    from jax import lax

    from hybridq_tpu.simulation.statevector import (_plan_gate_view,
                                                    _permute_bits,
                                                    apply_gate_split)

    re, im = state
    re = jnp.reshape(re, (-1,))
    im = jnp.reshape(im, (-1,))
    n_dev = 2**g
    layout = list(range(n_local))  # layout[p] = local slot at bit pos p

    def _exchange(arr, bit, p, perm):
        """Trade the non-matching half of local bit position ``p`` with
        the XOR partner (see module docstring)."""
        a = 2**p
        c = 2**(n_local - p - 1)
        v = jnp.reshape(arr, (a, 2, c))
        keep = jnp.take(v, bit, axis=1)
        send = jnp.take(v, 1 - bit, axis=1)
        recv = lax.ppermute(send, mesh_axis, perm)
        s0 = jnp.where(bit == 0, keep, recv)
        s1 = jnp.where(bit == 0, recv, keep)
        return jnp.reshape(jnp.stack([s0, s1], axis=1), (-1,))

    for op in ops:
        if op[0] == 'gate':
            _, mat_idx, slots = op
            Ur, Ui = mats[mat_idx]
            k = len(slots)
            shape, in_axes, layout = _plan_gate_view(layout, slots,
                                                     n_local)
            re_v = jnp.reshape(re, shape)
            im_v = jnp.reshape(im, shape)
            re_v, im_v = apply_gate_split(re_v, im_v, Ur, Ui, in_axes, k)
            re = jnp.reshape(re_v, (-1,))
            im = jnp.reshape(im_v, (-1,))
        else:
            _, b, slot = op
            p = layout.index(slot)
            mask = 1 << (g - 1 - b)
            perm = [(i, i ^ mask) for i in range(n_dev)]
            dev = lax.axis_index(mesh_axis)
            bit = (dev >> (g - 1 - b)) & 1
            re = _exchange(re, bit, p, perm)
            im = _exchange(im, bit, p, perm)

    if layout != list(range(n_local)):
        re = _permute_bits(re, layout, n_local)
        im = _permute_bits(im, layout, n_local)
    return re, im


class ShardedEvolver:
    """Distributed state-vector engine over a 1-D device mesh.

    The global split state is a pair of arrays of shape
    ``(2**g,) + (2,)*(n-g)`` with axis 0 sharded over the mesh.
    ``perm`` maps physical position -> logical qubit index (dense, in
    sorted-qubit order); it changes as swaps are scheduled and is undone
    on ``gather``.
    """

    def __init__(self, n_qubits: int, devices: Optional[Sequence] = None,
                 complex_type='complex64', compress: int = 2):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = list(jax.devices()) if devices is None else list(devices)
        g = int(np.log2(len(devices)))
        if 2**g != len(devices):
            devices = devices[:2**g]
        if n_qubits <= g:
            raise ValueError("Need more qubits than global (device) bits.")
        self.n_qubits = int(n_qubits)
        self.g = g
        self.n_local = self.n_qubits - g
        self.complex_type = np.dtype(complex_type)
        self.float_type = np.real(np.zeros(1, dtype=complex_type)).dtype
        self.compress = compress
        self.mesh = Mesh(np.asarray(devices), ('q',))
        # Global state: [2^g devices, 2^n_local flat] — 2-D only.
        self.spec = P('q', None)
        self.sharding = NamedSharding(self.mesh, self.spec)
        # perm[p] = logical qubit at physical position p.
        self.perm = list(range(self.n_qubits))
        self._compiled = {}

    # -- state construction ---------------------------------------------
    def prepare_state(self, state: str):
        """Build a sharded split-complex product state shard by shard (no
        full host copy)."""
        import jax

        state = _check_state(state, 2)
        if len(state) != self.n_qubits:
            raise ValueError("Wrong number of qubits for state.")
        g, nl = self.g, self.n_local
        shape = (2**g, 2**nl)
        ftype = self.float_type

        def _cb(index):
            d0 = index[0].start or 0
            stop = index[0].stop if index[0].stop else 2**g
            out = []
            for d in range(d0, stop):
                amp = 1.0
                for p in range(g):
                    bit = (d >> (g - 1 - p)) & 1
                    amp *= TOKEN_VECTORS[state[p]][bit]
                local = np.asarray(amp, dtype=ftype).reshape(1)
                for i in range(nl):
                    vec = TOKEN_VECTORS[state[g + i]].astype(ftype)
                    local = (local[:, None] * vec[None, :]).reshape(-1)
                out.append(local)
            return np.stack(out).astype(ftype)

        re = jax.make_array_from_callback(shape, self.sharding, _cb)
        im = jax.make_array_from_callback(
            shape, self.sharding,
            lambda idx: np.zeros((1, 2**nl), dtype=ftype))
        return re, im

    # -- scheduling ------------------------------------------------------
    def _schedule(self, gates, qubit_index):
        """Turn a gate list into a static (ops, mats) schedule with
        global-local swaps inserted on demand."""
        g, n = self.g, self.n_qubits
        perm = list(self.perm)  # physical pos -> logical qubit
        pos_of = {q: p for p, q in enumerate(perm)}
        ops = []
        mats = []

        for gate in gates:
            qs = [qubit_index[q] for q in gate.qubits]
            if len(qs) > self.n_local:
                raise ValueError(
                    f"Gate acts on {len(qs)} qubits but only "
                    f"{self.n_local} local positions exist.")
            for q in qs:
                p = pos_of[q]
                if p < g:
                    # Free local position for the incoming global qubit:
                    # the highest position not used by this gate.
                    target = next(pp for pp in range(n - 1, g - 1, -1)
                                  if perm[pp] not in qs)
                    ops.append(('swap', p, target - g))
                    ql, qg = perm[target], perm[p]
                    perm[p], perm[target] = ql, qg
                    pos_of[ql], pos_of[qg] = p, target
            U = np.ascontiguousarray(
                gate.matrix().astype(self.complex_type))
            mats.append((U.real.astype(self.float_type),
                         U.imag.astype(self.float_type)))
            ops.append(('gate', len(mats) - 1,
                        tuple(pos_of[q] - g for q in qs)))
        return tuple(ops), mats, perm

    def _get_compiled(self, ops):
        import jax
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        fn = self._compiled.get(ops)
        if fn is None:
            traced = functools.partial(_trace_sharded, ops=ops,
                                       n_local=self.n_local, g=self.g,
                                       mesh_axis='q')

            def _local(state, mats):
                re, im = state
                re, im = traced((re[0], im[0]), mats)
                return re[None], im[None]

            mapped = shard_map(_local, mesh=self.mesh,
                               in_specs=((self.spec, self.spec), P()),
                               out_specs=(self.spec, self.spec))
            fn = jax.jit(mapped, donate_argnums=(0,))
            self._compiled[ops] = fn
        return fn

    # -- public API ------------------------------------------------------
    def evolve(self, psi, circuit, qubits=None):
        """Apply ``circuit`` to the sharded split state ``psi=(re, im)``."""
        import jax.numpy as jnp

        circuit = Circuit(circuit)
        if any(isinstance(gg, FunctionalGate) for gg in circuit):
            raise NotImplementedError(
                "FunctionalGates are not supported in the sharded engine "
                "yet; use the single-chip engine.")
        all_qubits = circuit.all_qubits if qubits is None else list(qubits)
        if len(all_qubits) > self.n_qubits:
            raise ValueError("Circuit has more qubits than the evolver.")
        qubit_index = {q: i for i, q in enumerate(all_qubits)}

        if self.compress and self.compress > 1:
            blocks = circuit_utils.compress(
                circuit, min(self.compress, self.n_local))
            gates = [circuit_utils.to_matrix_gate(
                b, complex_type=self.complex_type) if len(b) > 1 else b[0]
                for b in blocks]
        else:
            gates = list(circuit)

        ops, mats, new_perm = self._schedule(gates, qubit_index)
        fn = self._get_compiled(ops)
        out = fn(tuple(psi), [(jnp.asarray(r), jnp.asarray(i))
                              for r, i in mats])
        self.perm = new_perm
        return out

    def gather(self, psi) -> np.ndarray:
        """Return the full complex state on host, axes in sorted-qubit
        order."""
        re, im = psi
        full = (np.asarray(re).astype(self.complex_type) +
                1j * np.asarray(im)).reshape((2,) * self.n_qubits)
        if self.perm != list(range(self.n_qubits)):
            inv = [self.perm.index(q) for q in range(self.n_qubits)]
            full = np.transpose(full, inv)
        return full

    def norm(self, psi) -> float:
        """Global L2 norm (psum over the mesh)."""
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        @jax.jit
        @functools.partial(shard_map, mesh=self.mesh,
                           in_specs=((self.spec, self.spec),),
                           out_specs=P())
        def _n2(state):
            re, im = state
            return jax.lax.psum(jnp.sum(re * re) + jnp.sum(im * im), 'q')

        return float(np.sqrt(np.asarray(_n2(tuple(psi)))))
