"""Device-batched noise-trajectory sampling.

The reference samples stochastic channels one trajectory per run
(``simulation.py:250-251``; its tests average 2000 runs).  On TPU the
trajectories are embarrassingly parallel, so all of them run in ONE
batched device program (`vmap`, SURVEY §2.3 "trajectory parallelism"):

- **unitary-mixing channels** (StochasticGate): the matrix for each
  trajectory is sampled on host and fed as a batched operand — every
  sample shares the same traced contraction.
- **general Kraus channels** (the reference's functional-channel apply,
  ``channel.py:211-298``): the projector choice is data-dependent, so it
  happens *inside* the traced program: all ``K`` candidate projections
  ``K_k|psi>`` are computed (k is tiny), their weighted norms form the
  cumulative distribution, and ``jnp.searchsorted`` on a per-sample
  uniform picks the branch — exactly the host algorithm, vmapped over a
  PRNG uniform batch.

Only arbitrary ``FunctionalGate``\\ s (user callables) remain host-only.
"""

from __future__ import annotations

import functools

import numpy as np

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import FunctionalGate, StochasticGate
from hybridq_tpu.simulation.prepare import prepare_state

__all__ = ['sample_trajectories', 'trajectory_density_matrix']

_TRAJ_CACHE: dict = {}


def _trace_trajectory(state, mats, uniforms, axes_list, kinds,
                      n_qubits: int, norm_atol: float = 1e-6):
    """One trajectory (traced under jit, vmapped over samples).

    ``mats[i]`` is ``(Ur, Ui)`` for a ``'gate'`` site or
    ``(Kr, Ki, w)`` (stacked Kraus operators ``[K, 2^k, 2^k]`` + real
    weights ``[K]``) for a ``'kraus'`` site; ``uniforms`` holds one
    U(0,1) scalar per kraus site.  State stays flat (see
    ``statevector._trace_evolution`` for the layout scheme)."""
    import jax
    import jax.numpy as jnp

    from hybridq_tpu.simulation.statevector import (_permute_bits,
                                                    _plan_gate_view,
                                                    apply_gate_split)

    re, im = state
    re = jnp.reshape(re, (-1,))
    im = jnp.reshape(im, (-1,))
    layout = list(range(n_qubits))
    u_i = 0

    for m, qs, kind in zip(mats, axes_list, kinds):
        k = len(qs)
        shape, in_axes, layout = _plan_gate_view(layout, qs, n_qubits)
        re_v = jnp.reshape(re, shape)
        im_v = jnp.reshape(im, shape)
        if kind == 'gate':
            Ur, Ui = m
            re_v, im_v = apply_gate_split(re_v, im_v, Ur, Ui, in_axes, k)
        else:  # kraus projection, data-dependent branch choice
            Kr, Ki, w = m
            cre, cim = jax.vmap(
                lambda kr, ki: apply_gate_split(re_v, im_v, kr, ki,
                                                in_axes, k))(Kr, Ki)
            sum_axes = tuple(range(1, cre.ndim))
            n2 = jnp.sum(cre * cre + cim * cim, axis=sum_axes)  # [K]
            p = w * n2
            cum = jnp.cumsum(p)
            u = uniforms[u_i] * cum[-1]
            idx = jnp.clip(jnp.searchsorted(cum, u, side='left'),
                           0, Kr.shape[0] - 1)
            inv = 1.0 / jnp.sqrt(jnp.maximum(n2[idx], norm_atol**2))
            re_v = cre[idx] * inv
            im_v = cim[idx] * inv
            u_i += 1
        re = jnp.reshape(re_v, (-1,))
        im = jnp.reshape(im_v, (-1,))

    if layout != list(range(n_qubits)):
        re = _permute_bits(re, layout, n_qubits)
        im = _permute_bits(im, layout, n_qubits)
    return re, im


def _batched_evolver(axes_list, kinds, n_qubits, n_samples, mats_axes):
    import jax

    key = (tuple(axes_list), tuple(kinds), n_qubits, n_samples,
           tuple(mats_axes))
    fn = _TRAJ_CACHE.get(key)
    if fn is None:
        traced = functools.partial(_trace_trajectory,
                                   axes_list=tuple(axes_list),
                                   kinds=tuple(kinds),
                                   n_qubits=n_qubits)
        # state broadcast; per-site operands batched or broadcast per
        # mats_axes; uniforms batched per sample.
        fn = jax.jit(jax.vmap(traced,
                              in_axes=(None, list(mats_axes), 0)))
        _TRAJ_CACHE[key] = fn
    return fn


def _is_device_kraus(g) -> bool:
    """True for channels whose trajectory mode is cumulative-probability
    Kraus projection with a shared L/R set and diagonal s — the class
    ``MatrixChannel`` lowers to ``_FunctionalChannel``."""
    s = getattr(g, 's', None)
    return (getattr(g, 'LMatrices', None) is not None and s is not None
            and np.ndim(s) == 1)


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
    kinds = []
    mats = []       # host operands per site
    mats_axes = []  # vmap in_axes per site
    n_kraus = 0
    for g in circuit:
        if isinstance(g, FunctionalGate) and not _is_device_kraus(g):
            raise NotImplementedError(
                "arbitrary FunctionalGates are not supported in batched "
                "trajectories; use simulate(allow_sampling=True) per "
                "sample.")
        if isinstance(g, FunctionalGate):  # general Kraus channel
            K = np.stack([np.asarray(m, dtype=complex_type)
                          for m in g.LMatrices])
            w = np.real(np.asarray(g.s)).astype(float_type)
            mats.append((jnp.asarray(K.real.astype(float_type)),
                         jnp.asarray(K.imag.astype(float_type)),
                         jnp.asarray(w)))
            mats_axes.append((None, None, None))
            kinds.append('kraus')
            n_kraus += 1
        elif isinstance(g, StochasticGate):
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
            mats.append((jnp.asarray(stack.real.astype(float_type)),
                         jnp.asarray(stack.imag.astype(float_type))))
            mats_axes.append((0, 0))
            kinds.append('gate')
        else:
            U = np.ascontiguousarray(g.matrix().astype(complex_type))
            mats.append((jnp.asarray(U.real.astype(float_type)),
                         jnp.asarray(U.imag.astype(float_type))))
            mats_axes.append((None, None))
            kinds.append('gate')
        axes_list.append(tuple(qubit_index[q] for q in g.qubits))

    uniforms = jnp.asarray(
        rng.random((n_samples, max(n_kraus, 1))).astype(float_type))

    psi0 = prepare_state(
        initial_state * n if len(str(initial_state)) == 1
        else initial_state, complex_type=complex_type)
    re0 = jnp.asarray(psi0.real.reshape(-1).astype(float_type))
    im0 = jnp.asarray(psi0.imag.reshape(-1).astype(float_type))

    fn = _batched_evolver(axes_list, kinds, n, n_samples, mats_axes)
    re, im = fn((re0, im0), mats, uniforms)
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
