"""Density-matrix + noise layer tests.

Differential strategy (reference ``tests/tests.py:2503-2832``): exact DM
evolution checked against dense matrix algebra; trajectory sampling
checked against exact DM; channels checked for CPTP via Choi.
"""

import numpy as np
import pytest

from hybridq_tpu import dm
from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import Gate
from hybridq_tpu.extras.random import get_rqc
from hybridq_tpu.noise import (AmplitudeDampingChannel,
                               GlobalDepolarizingChannel,
                               GlobalPauliChannel, LocalDephasingChannel,
                               LocalDepolarizingChannel, MatrixChannel,
                               add_depolarizing_noise)
from hybridq_tpu.noise.channel.utils import (choi_matrix, fidelity,
                                             is_channel, is_dm, ptrace,
                                             reconstruct_dm)
from hybridq_tpu.simulation import simulate

ATOL = 1e-4


def _rho_of(psi):
    psi = np.asarray(psi).ravel()
    return np.outer(psi, psi.conj())


def _dm_evolve_dense(circuit, rho):
    """Dense oracle: ρ → U ρ U†."""
    U = utils.matrix(circuit, complex_type='complex128')
    return U @ rho @ U.conj().T


def test_unitary_dm_evolution_matches_dense():
    n = 3
    c = get_rqc(n, 15, indexes=list(range(n)))
    rho0 = _rho_of(np.eye(2**n)[0])
    expected = _dm_evolve_dense(c, rho0)
    got = np.asarray(dm.simulate(c, initial_state='0',
                                 complex_type='complex128'))
    got = got.reshape(2**n, 2**n)
    np.testing.assert_allclose(got, expected, atol=ATOL)
    assert is_dm(got)


def test_kraus_supergate_map():
    # Single Kraus op = unitary: map == U ⊗ U*
    U = Gate('H').matrix()
    k = dm.KrausSuperGate(gates=(
        (Gate('MATRIX', qubits=[0], U=U),),
        (Gate('MATRIX', qubits=[0], U=U),)), s=1)
    np.testing.assert_allclose(k.map(), np.kron(U, U.conj()), atol=1e-8)


def test_matrix_supergate():
    M = np.random.randn(16, 16) + 1j * np.random.randn(16, 16)
    g = dm.MatrixSuperGate(Map=M, l_qubits=[0, 1], r_qubits=[0, 1])
    np.testing.assert_allclose(g.map(), M)
    assert g.qubits == ((0, 1), (0, 1))
    # reorder
    M2 = g.map(order=((1, 0), (0, 1)))
    assert M2.shape == (16, 16)


def test_depolarizing_channel_analytic():
    """E(ρ) = (1-p) ρ + p I/d — checked elementwise
    (reference test_noise_1__GlobalDepolarizingChannel)."""
    p = 0.3
    n = 2
    c = get_rqc(n, 8, indexes=list(range(n)))
    ch = GlobalDepolarizingChannel(qubits=list(range(n)), p=p)
    rho_pure = np.asarray(dm.simulate(c, initial_state='0',
                                      complex_type='complex128')).reshape(
                                          2**n, 2**n)
    rho_noisy = np.asarray(
        dm.simulate(list(c) + [ch], initial_state='0',
                    complex_type='complex128')).reshape(2**n, 2**n)
    np.testing.assert_allclose(
        rho_noisy, (1 - p) * rho_pure + p * np.eye(2**n) / 2**n,
        atol=ATOL)


def test_channels_are_cptp():
    for ch in [
            GlobalDepolarizingChannel([0, 1], 0.25),
            GlobalPauliChannel([0], s=[0.7, 0.1, 0.1, 0.1]),
            LocalDephasingChannel([0], p=0.4)[0],
            LocalDepolarizingChannel([0], p=0.2)[0],
            AmplitudeDampingChannel([0], gamma=0.3, p=0.8)[0],
    ]:
        assert is_channel(ch, atol=1e-6), ch.name


def test_amplitude_damping_analytic():
    """Damping on |1><1| decays toward |0><0|."""
    (ch,) = AmplitudeDampingChannel([0], gamma=0.4, p=1)
    rho = np.asarray(
        dm.simulate([Gate('X', [0]), ch], initial_state='0',
                    complex_type='complex128')).reshape(2, 2)
    np.testing.assert_allclose(rho, np.diag([0.4, 0.6]), atol=ATOL)


def test_trajectory_vs_exact_dm():
    """Stochastic trajectory average converges to the exact DM
    (reference test_circuit__unitary_sample, rtol 1e-2)."""
    n = 2
    c = Circuit([Gate('H', [0]), Gate('CX', [0, 1])])
    noisy = add_depolarizing_noise(c, probs=0.2)
    exact = np.asarray(dm.simulate(noisy, initial_state='0',
                                   complex_type='complex128')).reshape(
                                       2**n, 2**n)

    rng = np.random.default_rng(42)
    samples = []
    for _ in range(800):
        psi = simulate(Circuit(list(noisy)), initial_state='0',
                       allow_sampling=True,
                       sampling_seed=int(rng.integers(2**31)))
        samples.append(np.asarray(psi).ravel())
    rho_avg = reconstruct_dm(samples)
    np.testing.assert_allclose(rho_avg, exact, atol=0.05)


def test_dm_initial_state_circuit_and_array():
    n = 2
    prep = Circuit([Gate('H', [0]), Gate('CX', [0, 1])])
    c = get_rqc(n, 6, indexes=list(range(n)))
    # initial state as array
    psi0 = (utils.matrix(prep, complex_type='complex128')
            @ np.eye(2**n)[0])
    rho0 = _rho_of(psi0).reshape((2,) * (2 * n))
    got = np.asarray(dm.simulate(c, initial_state=rho0,
                                 complex_type='complex128')).reshape(
                                     2**n, 2**n)
    expected = _dm_evolve_dense(c, _rho_of(psi0))
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_ptrace_and_fidelity():
    # Bell state: ptrace of either qubit is maximally mixed
    bell = np.array([1, 0, 0, 1]) / np.sqrt(2)
    np.testing.assert_allclose(ptrace(bell, [0]), np.eye(2) / 2,
                               atol=1e-8)
    # fidelity of identical states
    np.testing.assert_allclose(fidelity(bell, bell), 1, atol=1e-8)
    np.testing.assert_allclose(fidelity(bell, _rho_of(bell)), 1,
                               atol=1e-8)
    rho = np.diag([0.5, 0.5])
    np.testing.assert_allclose(fidelity(np.array([1, 0]), rho), 0.5,
                               atol=1e-8)


def test_choi_matrix_identity():
    """Choi matrix of the identity channel is the maximally entangled
    projector (unnormalized)."""
    ch = MatrixChannel(LMatrices=[np.eye(2)], qubits=[0])
    C = choi_matrix(ch)
    bell = np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(C, np.outer(bell, bell), atol=1e-8)


def test_supercircuit_all_qubits():
    c = dm.Circuit([Gate('H', [1]),
                    dm.MatrixSuperGate(Map=np.eye(4), l_qubits=[0],
                                       r_qubits=[2])])
    assert c.all_qubits == ([0, 1], [1, 2])


def test_reference_dm_parity():
    """Exact DM evolution matches the reference implementation."""
    from tests._ref_oracle import import_reference
    if import_reference() is None:
        pytest.skip('reference unavailable')
    from hybridq.circuit import Circuit as RefCircuit
    from hybridq.gate import Gate as RefGate
    from hybridq.dm.circuit.simulation import simulate as ref_dm_simulate
    from hybridq.noise.channel.channel import (
        GlobalDepolarizingChannel as RefDepol)

    gates = [('H', (0,)), ('CX', (0, 1)), ('T', (1,)), ('X', (1,))]
    c = [Gate(n, list(q)) for n, q in gates] + \
        [GlobalDepolarizingChannel([0, 1], 0.15)]
    rc = [RefGate(n, list(q)) for n, q in gates] + \
        [RefDepol([0, 1], 0.15)]
    mine = np.asarray(dm.simulate(c, initial_state='0',
                                  complex_type='complex128'))
    ref = np.asarray(ref_dm_simulate(rc, initial_state='0',
                                     optimize='evolution-einsum',
                                     complex_type='complex128',
                                     backend='numpy'))
    np.testing.assert_allclose(mine, ref, atol=1e-6)


def test_dm_via_tn_engine():
    """DM evolution through the tensor-network engine (doubled circuit)
    matches the evolution engine."""
    n = 2
    c = Circuit([Gate('H', [0]), Gate('CX', [0, 1]), Gate('T', [1])])
    noisy = add_depolarizing_noise(c, probs=0.1)
    rho_ev = np.asarray(dm.simulate(noisy, initial_state='0',
                                    complex_type='complex128')).reshape(
                                        2**n, 2**n)
    rho_tn = np.asarray(dm.simulate(noisy, initial_state='0',
                                    optimize='tn', backend='numpy',
                                    final_state='.')).reshape(2**n, 2**n)
    np.testing.assert_allclose(rho_tn, rho_ev, atol=1e-4)


def test_batched_trajectories_match_exact_dm():
    """Device-batched trajectory sampling converges to the exact DM."""
    from hybridq_tpu.simulation.trajectories import (
        trajectory_density_matrix)

    n = 3
    c = Circuit([Gate('H', [0]), Gate('CX', [0, 1]), Gate('T', [1]),
                 Gate('CX', [1, 2])])
    noisy = add_depolarizing_noise(c, probs=0.15)
    exact = np.asarray(dm.simulate(noisy, initial_state='0',
                                   complex_type='complex128')).reshape(
                                       2**n, 2**n)
    rho = trajectory_density_matrix(Circuit(list(noisy)), 3000,
                                    initial_state='0', seed=11)
    np.testing.assert_allclose(rho, exact, atol=0.05)


def test_batched_trajectories_general_kraus():
    """Device-batched general-Kraus trajectories (amplitude damping is a
    non-unitary-mixing channel → cumulative-probability Kraus projection
    with jnp.searchsorted inside the traced program) converge to the
    exact DM at 2000 samples.  Reference trajectory semantics:
    ``channel.py:211-298``."""
    from hybridq_tpu.simulation.trajectories import (
        trajectory_density_matrix)

    n = 2
    c = Circuit([Gate('H', [0]), Gate('CX', [0, 1]), Gate('T', [1])])
    chans = AmplitudeDampingChannel([0, 1], gamma=0.35, p=1)
    noisy = Circuit(list(c) + list(chans) + [Gate('RY', [0],
                                                  params=[0.7])])
    exact = np.asarray(dm.simulate(noisy, initial_state='0',
                                   complex_type='complex128')).reshape(
                                       2**n, 2**n)
    rho = trajectory_density_matrix(noisy, 2000, initial_state='0',
                                    seed=5)
    np.testing.assert_allclose(rho, exact, atol=0.05)
    # And mixed stochastic + Kraus sites in one batched program.
    mixed = Circuit(list(add_depolarizing_noise(c, probs=0.1)) +
                    list(AmplitudeDampingChannel([0], gamma=0.5, p=0.6)))
    exact2 = np.asarray(dm.simulate(mixed, initial_state='0',
                                    complex_type='complex128')).reshape(
                                        2**n, 2**n)
    rho2 = trajectory_density_matrix(Circuit(list(mixed)), 3000,
                                     initial_state='0', seed=6)
    np.testing.assert_allclose(rho2, exact2, atol=0.05)
