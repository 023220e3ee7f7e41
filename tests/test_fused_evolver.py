"""FusedEvolver differential tests (Pallas interpret mode on CPU).

The fused one-pass engine (``fused_evolver.py``) is validated against
the dense-matrix oracle and against ``IndexedEvolver`` on random
circuits that exercise every routing class: pure-row gates, swap-path
gates (lane bits 1-2), lane eviction (>2 lane bits), repeated
applications (prep memoization across the evolving slot map), and
flush/gather from a scrambled layout."""

import numpy as np
import pytest

from hybridq_tpu.simulation.fused_evolver import FusedEvolver

ATOL = 5e-5


def _rand_u(k, rng):
    m = rng.standard_normal((2**k, 2**k)) + \
        1j * rng.standard_normal((2**k, 2**k))
    return np.linalg.qr(m)[0]


def _oracle(psi, U, qs, n):
    k = len(qs)
    T = np.moveaxis(psi.reshape((2,) * n), qs, range(k))
    T = (U.astype(complex) @ T.reshape(2**k, -1)).reshape((2,) * n)
    return np.moveaxis(T, range(k), qs).reshape(-1)


def _run(n, gates, seed=0):
    """Apply ``gates`` = [(U, qs)] on FusedEvolver and the oracle."""
    rng = np.random.default_rng(seed)
    psi = rng.standard_normal(2**n) + 1j * rng.standard_normal(2**n)
    psi /= np.linalg.norm(psi)

    ev = FusedEvolver(n, interpret=True)
    re = psi.real.astype('float32')
    im = psi.imag.astype('float32')
    import jax.numpy as jnp

    state = jnp.reshape(jnp.concatenate(
        [jnp.asarray(re), jnp.asarray(im)]), (2**(n - 6), 128))

    want = psi
    for U, qs in gates:
        want = _oracle(want, U, qs, n)
        state = ev.apply_gate(state, U, qs)
    got = ev.gather(state).reshape(-1)
    err = np.max(np.abs(got - want))
    assert err < ATOL, (err, [qs for _, qs in gates])


def test_row_gates(seed):
    """All gate bits >= 7 (qubits <= n-8): pure fused path."""
    n = 14
    rng = np.random.default_rng(seed)
    gates = []
    for _ in range(4):
        qs = tuple(int(q) for q in
                   rng.choice(n - 7, 3, replace=False))
        gates.append((_rand_u(3, rng), qs))
    _run(n, gates, seed)


def test_swap_gates(seed):
    """Gates with 1-2 lane bits: swap path + relabel chains.
    (n=17: swap victims need free HIGH slots (flat >= 12) — tiny n
    has too few; production sizes have n-12 of them.)"""
    n = 17
    rng = np.random.default_rng(seed)
    gates = []
    for i in range(6):
        n_lane = 1 + (i % 2)
        lane_qs = rng.choice(range(n - 7, n), n_lane, replace=False)
        row_qs = rng.choice(n - 7, 3 - n_lane, replace=False)
        qs = tuple(int(q) for q in list(lane_qs) + list(row_qs))
        gates.append((_rand_u(3, rng), qs))
    _run(n, gates, seed)


def test_lane_eviction(seed):
    """A 4-lane-bit gate forces the identity-swap prepass."""
    n = 17
    rng = np.random.default_rng(seed)
    qs = tuple(int(q) for q in
               rng.choice(range(n - 7, n), 4, replace=False))
    gates = [(_rand_u(4, rng), qs)]
    # follow with a mixed gate on the now-relabeled layout
    qs2 = (0, int(n - 1), 5)
    gates.append((_rand_u(3, rng), qs2))
    _run(n, gates, seed)


def test_random_mixed_circuit(seed):
    """Random 1-3q gates anywhere; compares against the oracle and
    exercises memoization by applying the list twice."""
    n = 17
    rng = np.random.default_rng(seed)
    gates = []
    for _ in range(10):
        k = int(rng.integers(1, 4))
        qs = tuple(int(q) for q in rng.choice(n, k, replace=False))
        gates.append((_rand_u(k, rng), qs))
    _run(n, gates * 2, seed)


def test_matches_indexed_evolver(seed):
    """Differential vs the XLA IndexedEvolver on one random circuit."""
    from hybridq_tpu.simulation.kernels import IndexedEvolver

    n = 16
    rng = np.random.default_rng(seed)
    gates = []
    for _ in range(8):
        k = int(rng.integers(1, 5))
        qs = tuple(int(q) for q in rng.choice(n, k, replace=False))
        gates.append((_rand_u(k, rng), qs))

    import jax.numpy as jnp

    ev_f = FusedEvolver(n, interpret=True)
    ev_i = IndexedEvolver(n)
    s_f = ev_f.prepare_state('0' * n)
    s_i = ev_i.prepare_state('0' * n)
    for U, qs in gates:
        s_f = ev_f.apply_gate(s_f, U, qs)
        s_i = ev_i.apply_gate(s_i, U, qs)
    got_f = ev_f.gather(s_f).reshape(-1)
    got_i = ev_i.gather(s_i).reshape(-1)
    np.testing.assert_allclose(got_f, got_i, atol=ATOL)


def test_prepare_state_and_norm():
    n = 14
    ev = FusedEvolver(n, interpret=True)
    st = ev.prepare_state('+' * n)
    psi = ev.gather(st).reshape(-1)
    np.testing.assert_allclose(np.abs(psi),
                               np.full(2**n, 2**(-n / 2)), atol=1e-6)


def test_mapsim_mirrors_engine(seed):
    """MapSim.route_gate must predict exactly the step classes the
    engine executes (the pairing scheduler steers by it)."""
    from hybridq_tpu.simulation.fused_evolver import MapSim

    n = 17
    rng = np.random.default_rng(seed)
    gates = []
    for _ in range(12):
        k = int(rng.integers(1, 5))
        qs = tuple(int(q) for q in rng.choice(n, k, replace=False))
        gates.append((_rand_u(k, rng), qs))

    ev = FusedEvolver(n, interpret=True)
    sim = MapSim.of(ev)
    st = ev.prepare_state('0' * n)
    for U, qs in gates:
        want_steps = sim.route_gate(qs)
        ev.last_steps = []
        st = ev.apply_gate(st, U, qs)
        assert ev.last_steps == want_steps, (qs, ev.last_steps,
                                             want_steps)
        assert sim.phys == ev.phys
        assert sim.logi == ev.logi


def test_pair_fused_gates(seed):
    """Paired blocks evolve identically to the unpaired gate list."""
    from hybridq_tpu.simulation.fused_evolver import pair_fused_gates

    n = 16
    rng = np.random.default_rng(seed)
    gates = []
    for _ in range(8):
        k = int(rng.integers(1, 3))
        qs = tuple(int(q) for q in rng.choice(n, k, replace=False))
        gates.append((_rand_u(k, rng), qs))

    blocks = pair_fused_gates(gates, n)
    assert len(blocks) <= len(gates)

    ev_a = FusedEvolver(n, interpret=True)
    ev_b = FusedEvolver(n, interpret=True)
    sa = ev_a.prepare_state('0' * n)
    sb = ev_b.prepare_state('0' * n)
    for U, qs in gates:
        sa = ev_a.apply_gate(sa, U, qs)
    for U, qs in blocks:
        sb = ev_b.apply_gate(sb, np.asarray(U), tuple(qs))
    np.testing.assert_allclose(ev_a.gather(sa).reshape(-1),
                               ev_b.gather(sb).reshape(-1), atol=ATOL)


def test_inplace_mode_matches_oracle(seed):
    """inplace=True (the 30q mode: parks are permutation-W kernel
    passes, no XLA row gather) must match the oracle, including the
    slot-map-aware ``amplitude`` readback without flush."""
    n = 17
    rng = np.random.default_rng(seed)
    gates = []
    for _ in range(8):
        k = int(rng.integers(1, 5))
        qs = tuple(int(q) for q in rng.choice(n, k, replace=False))
        gates.append((_rand_u(k, rng), qs))

    ev = FusedEvolver(n, interpret=True, inplace=True)
    state = ev.prepare_state('0' * n)
    want = np.zeros(2**n, dtype=complex)
    want[0] = 1
    for U, qs in gates:
        want = _oracle(want, U, qs, n)
        state = ev.apply_gate(state, U, qs)
    # slot-map-aware readback (no flush)
    idx = rng.choice(2**n, 32, replace=False)
    for i in idx:
        got = ev.amplitude(state, int(i))
        assert abs(got - want[int(i)]) < ATOL, (i, got, want[int(i)])
    # full gather still works at small n
    got_all = ev.gather(state).reshape(-1)
    np.testing.assert_allclose(got_all, want, atol=ATOL)


def test_device_prepare_state_tokens():
    """The device-side token builder matches the host product state."""
    from hybridq_tpu.simulation.prepare import prepare_state

    n = 15
    for tokens in ('0' * n, '+' * n, ('01+-' * 4)[:n]):
        ev = FusedEvolver(n, interpret=True)
        st = ev.prepare_state(tokens)
        got = ev.gather(st).reshape(-1)
        want = prepare_state(tokens,
                             complex_type='complex128').reshape(-1)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_mapsim_mirrors_engine_inplace(seed):
    """MapSim must mirror the inplace-mode routing trace too."""
    from hybridq_tpu.simulation.fused_evolver import MapSim

    n = 17
    rng = np.random.default_rng(seed)
    ev = FusedEvolver(n, interpret=True, inplace=True)
    sim = MapSim.of(ev)
    st = ev.prepare_state('0' * n)
    for _ in range(10):
        k = int(rng.integers(1, 5))
        qs = tuple(int(q) for q in rng.choice(n, k, replace=False))
        U = _rand_u(k, rng)
        want_steps = sim.route_gate(qs)
        ev.last_steps = []
        st = ev.apply_gate(st, U, qs)
        assert ev.last_steps == want_steps, (qs, ev.last_steps,
                                             want_steps)
        assert sim.phys == ev.phys
        assert sim.logi == ev.logi


def test_econ_parking_routes_cheap_class():
    """At production n the router parks high gate bits onto free
    sublane slots when one row gather + a cheap class beats the
    MXU-bound direct class (fused k_hi>=3 costs 2-4x k_hi<=2)."""
    from hybridq_tpu.simulation.fused_evolver import MapSim, _step_cost

    n = 29
    sim = MapSim(n)
    # 4q gate on qubits 0..3 -> bits 25..28, all high slots: direct
    # class would be fused(4).
    steps = sim.route_gate((0, 1, 2, 3))
    direct = _step_cost(('fused', 4), n, False)
    routed = sum(_step_cost(s, n, False) for s in steps)
    assert routed < direct, (steps, routed, direct)
    assert steps[0] == ('park',), steps
    # The parked layout must be internally consistent.
    assert sorted(sim.phys) == list(range(n))
    assert all(sim.logi[sim.phys[b]] == b for b in range(n))


def test_simulate_dispatch_fused(seed):
    """optimize='evolution-fused' through the public simulate() API
    (interpret mode) matches the indexed engine."""
    from hybridq_tpu.circuit import Circuit
    from hybridq_tpu.extras.random import get_rqc
    from hybridq_tpu.gate import Gate
    from hybridq_tpu.simulation import simulate

    n = 15
    # Pad coverage explicitly: a short random circuit can miss a qubit
    # label entirely, and '0'*n then mismatches all_qubits (the fixture
    # trap CLAUDE.md warns about — seed-dependent failure at HEAD r4).
    c = Circuit([Gate('H', qubits=[q]) for q in range(n)]) + \
        get_rqc(n, 18, indexes=list(range(n)))
    a = simulate(c, optimize='evolution-fused', initial_state='0' * n,
                 fused_interpret=True)
    b = simulate(c, optimize='evolution-indexed',
                 initial_state='0' * n)
    np.testing.assert_allclose(np.asarray(a).ravel(),
                               np.asarray(b).ravel(), atol=ATOL)
