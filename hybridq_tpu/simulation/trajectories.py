"""Device-batched noise-trajectory sampling.

The reference samples stochastic channels one trajectory per run
(``simulation.py:250-251``; its tests average 2000 runs).  On TPU the
trajectories are embarrassingly parallel: every unitary-mixing channel
acts on fixed qubits, so all trajectories share one traced program and
differ only in which matrix was drawn — a `vmap` over a batch of sampled
gate matrices (SURVEY §2.3 "trajectory parallelism").

Restricted to circuits whose non-deterministic elements are
StochasticGates / unitary-mixing channels (general Kraus projection is
data-dependent per trajectory and runs through the host path).
"""

from __future__ import annotations

import functools

import numpy as np

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import FunctionalGate, StochasticGate
from hybridq_tpu.simulation.prepare import prepare_state

__all__ = ['sample_trajectories', 'trajectory_density_matrix']

_TRAJ_CACHE: dict = {}


def _batched_evolver(axes_list, n_qubits, n_samples):
    import jax

    from hybridq_tpu.simulation.statevector import _trace_evolution

    key = (tuple(axes_list), n_qubits, n_samples)
    fn = _TRAJ_CACHE.get(key)
    if fn is None:
        traced = functools.partial(_trace_evolution,
                                   axes_list=tuple(axes_list),
                                   n_qubits=n_qubits)
        # state broadcast across samples; matrices batched per sample.
        fn = jax.jit(jax.vmap(traced, in_axes=(None, 0)))
        _TRAJ_CACHE[key] = fn
    return fn


def sample_trajectories(circuit, n_samples: int, initial_state='0',
                        complex_type='complex64', seed=None) -> np.ndarray:
    """Evolve ``n_samples`` noise trajectories in one batched device call.

    Returns the stacked final states, shape ``(n_samples, 2**n)``.
    """
    import jax.numpy as jnp

    circuit = utils.flatten(Circuit(circuit))
    qubits = circuit.all_qubits
    n = len(qubits)
    qubit_index = {q: i for i, q in enumerate(qubits)}
    rng = np.random.default_rng(seed)
    float_type = np.real(np.zeros(1, dtype=complex_type)).dtype

    axes_list = []
    mats = []  # per gate: array [n_samples or 1, 2, 2^k, 2^k] (re, im)
    for g in circuit:
        if isinstance(g, FunctionalGate):
            raise NotImplementedError(
                "FunctionalGates are not supported in batched "
                "trajectories; use simulate(allow_sampling=True) per "
                "sample.")
        if isinstance(g, StochasticGate):
            options = [np.ascontiguousarray(
                og.matrix(order=g.qubits).astype(complex_type))
                for og in g.gates]
            dims = {m.shape for m in options}
            if len(dims) != 1:
                raise NotImplementedError(
                    "Stochastic options must act on the same qubits.")
            idx = rng.choice(len(options), size=n_samples,
                             p=np.real(g.p))
            stack = np.stack(options)[idx]  # [S, 2^k, 2^k]
            m = np.stack([stack.real, stack.imag], axis=1)
        else:
            U = np.ascontiguousarray(g.matrix().astype(complex_type))
            m = np.stack([U.real, U.imag])[None]  # [1, 2, ...]
        axes_list.append(tuple(qubit_index[q] for q in g.qubits))
        mats.append(m.astype(float_type))

    # Broadcast deterministic gates across the batch.
    dev_mats = []
    for m in mats:
        if m.shape[0] == 1:
            m = np.broadcast_to(m, (n_samples,) + m.shape[1:])
        dev_mats.append((jnp.asarray(np.ascontiguousarray(m[:, 0])),
                         jnp.asarray(np.ascontiguousarray(m[:, 1]))))

    psi0 = prepare_state(
        initial_state * n if len(str(initial_state)) == 1
        else initial_state, complex_type=complex_type)
    re0 = jnp.asarray(psi0.real.reshape(-1).astype(float_type))
    im0 = jnp.asarray(psi0.imag.reshape(-1).astype(float_type))

    fn = _batched_evolver(axes_list, n, n_samples)
    re, im = fn((re0, im0), dev_mats)
    out = np.asarray(re).astype(complex_type)
    out += 1j * np.asarray(im).astype(float_type)
    return out.reshape(n_samples, -1)


def trajectory_density_matrix(circuit, n_samples: int, initial_state='0',
                              complex_type='complex64',
                              seed=None) -> np.ndarray:
    """Monte-Carlo density matrix: average of |ψ_s⟩⟨ψ_s| over batched
    trajectories."""
    states = sample_trajectories(circuit, n_samples,
                                 initial_state=initial_state,
                                 complex_type=complex_type, seed=seed)
    return np.einsum('si,sj->ij', states, states.conj()) / n_samples
