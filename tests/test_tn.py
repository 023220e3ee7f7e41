"""Tensor-network engine tests: differential against the evolution engine
(reference strategy, ``tests/tests.py:2210-2332``)."""

import numpy as np
import pytest

import jax

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.gate import Gate
from hybridq_tpu.extras.random import get_rqc
from hybridq_tpu.simulation import simulate, prepare_state

ATOL = 1e-4


def _evolution(c, initial_state='0'):
    return np.asarray(
        simulate(c, initial_state=initial_state,
                 complex_type='complex128'))


@pytest.mark.parametrize('n,m', [(4, 20), (6, 30)])
def test_tn_full_amplitudes(n, m):
    c = get_rqc(n, m)
    expected = _evolution(c)
    got = simulate(c, initial_state='0', final_state='.',
                   optimize='tn', backend='numpy')
    np.testing.assert_allclose(np.asarray(got), expected, atol=ATOL)


def test_tn_jax_backend_matches_numpy():
    c = get_rqc(5, 25)
    a = simulate(c, initial_state='0', final_state='.', optimize='tn',
                 backend='numpy')
    b = simulate(c, initial_state='0', final_state='.', optimize='tn',
                 backend='jax')
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL)


def test_tn_single_amplitude():
    c = get_rqc(5, 25)
    psi = _evolution(c)
    amp = simulate(c, initial_state='0', final_state='00000',
                   optimize='tn', backend='numpy')
    np.testing.assert_allclose(complex(np.asarray(amp)), psi[(0,) * 5],
                               atol=ATOL)
    amp2 = simulate(c, initial_state='0', final_state='01011',
                    optimize='tn', backend='numpy')
    np.testing.assert_allclose(complex(np.asarray(amp2)),
                               psi[0, 1, 0, 1, 1], atol=ATOL)


def test_tn_open_final_qubits():
    """Partially open final state: marginals match evolution."""
    n = 5
    c = get_rqc(n, 20)
    psi = _evolution(c)
    got = simulate(c, initial_state='0', final_state='0..' + '0' * (n - 3),
                   optimize='tn', backend='numpy')
    expected = psi[0, :, :, 0, 0]
    np.testing.assert_allclose(np.asarray(got), expected, atol=ATOL)


def test_tn_plus_initial_state():
    c = get_rqc(4, 15)
    psi = _evolution(c, '+')
    got = simulate(c, initial_state='+', final_state='.', optimize='tn',
                   backend='numpy')
    np.testing.assert_allclose(np.asarray(got), psi, atol=ATOL)


def test_tn_forced_slicing_matches():
    """Small max_largest_intermediate forces slicing; result unchanged.
    (The output legs must still fit — the reference also raises if the
    open legs alone exceed the cap — so slice a closed amplitude.)"""
    n = 6
    c = get_rqc(n, 30)
    psi = _evolution(c)
    full = simulate(c, initial_state='0', final_state='0' * n,
                    optimize='tn', backend='numpy')
    # The joint slice+tree search can often restructure this small
    # network below 2^3 width with zero slices, so force harder.
    out, info = simulate(c, initial_state='0', final_state='0' * n,
                         optimize='tn', backend='numpy',
                         max_largest_intermediate=2**2,
                         return_info=True)
    assert info['n_slices'] > 1
    np.testing.assert_allclose(complex(np.asarray(out)),
                               complex(np.asarray(full)), atol=ATOL)
    np.testing.assert_allclose(complex(np.asarray(out)), psi[(0,) * n],
                               atol=ATOL)


def test_tn_sliced_jax_and_mesh():
    n = 6
    c = get_rqc(n, 30)
    psi = _evolution(c)
    got = simulate(c, initial_state='0', final_state='0' * n,
                   optimize='tn', backend='jax',
                   max_largest_intermediate=2**3)
    np.testing.assert_allclose(complex(np.asarray(got)), psi[(0,) * n],
                               atol=ATOL)
    if len(jax.devices()) >= 4:
        got2 = simulate(c, initial_state='0', final_state='0' * n,
                        optimize='tn', backend='jax',
                        max_largest_intermediate=2**3,
                        devices=jax.devices()[:4])
        np.testing.assert_allclose(complex(np.asarray(got2)),
                                   psi[(0,) * n], atol=ATOL)


def test_tn_segmented_flat_scan_matches():
    """The segmented scanned executor (long chains split into pipelined
    segment programs with boundary tensors crossing the cuts) must
    reproduce the numpy contraction, including partial slice ranges."""
    from hybridq_tpu.circuit import utils as cutils
    from hybridq_tpu.simulation.tn.contract import (ContractionPlan,
                                                    SlicedContractor)
    from hybridq_tpu.simulation.tn.network import build_tn
    from hybridq_tpu.simulation.tn.path import find_path
    from hybridq_tpu.simulation.tn.slicer import slice_and_reconfigure

    np.random.seed(7)
    n = 10
    c = Circuit([Gate('H', [q]) for q in range(n)]) + \
        get_rqc(n, 60, indexes=list(range(n)))
    blocks = cutils.compress(c, 2)
    c2 = Circuit(cutils.to_matrix_gate(b) for b in blocks)
    net, oo = build_tn(c2, '0' * n, '0' * n)
    inputs = [t.inds for t in net.tensors]
    sd = {i: d for t in net.tensors for i, d in zip(t.inds,
                                                    t.data.shape)}
    tree = find_path(inputs, oo, sd, max_repeats=4, seed=0)
    tree, sliced, _ = slice_and_reconfigure(tree, target_size=2**5,
                                            time_budget=2)
    plan = ContractionPlan(tree, sliced)
    sc = SlicedContractor(plan, net.tensors, oo)
    want = sc.contract_np()
    sc.scan_seg_steps = 7     # force several segments
    sc.scan_chunk = 8
    got = sc.contract_jax_flat_scan()
    np.testing.assert_allclose(got, want, atol=1e-6)
    if sc.nslices > 1:
        half = sc.nslices // 2
        part = sc.contract_jax_flat_scan(slice_range=(0, half)) + \
            sc.contract_jax_flat_scan(slice_range=(half, sc.nslices))
        np.testing.assert_allclose(part, want, atol=1e-6)


def test_tn_two_phase_plan_reuse():
    """tensor_only=True returns (net, (info, tree)) reusable later with a
    different memory limit (reference ``tests.py:2307-2332``)."""
    n = 5
    c = get_rqc(n, 20)
    expected = _evolution(c)
    net, plan = simulate(c, initial_state='0', final_state='.',
                         optimize='tn', tensor_only=True)
    got = simulate(net, optimize=plan, backend='numpy',
                   max_largest_intermediate=2**(n - 1))
    np.testing.assert_allclose(np.asarray(got), expected, atol=ATOL)


def test_tn_trace_letters():
    """Letter tokens trace qubits: tracing the final leg of an unmeasured
    qubit of a Bell pair gives the reduced density... here we check
    Tr(U) via all-letter initial+final states."""
    c = Circuit([Gate('H', [0])])
    got = simulate(c, initial_state='a', final_state='a', optimize='tn',
                   backend='numpy', compress=0, simplify=False)
    # Tr(H) = 0
    np.testing.assert_allclose(complex(np.asarray(got)),
                               np.trace(Gate('H').matrix()), atol=ATOL)
    c2 = Circuit([Gate('T', [0]), Gate('X', [1])])
    got2 = simulate(c2, initial_state='ab', final_state='ab',
                    optimize='tn', backend='numpy', compress=0,
                    simplify=False)
    np.testing.assert_allclose(
        complex(np.asarray(got2)),
        np.trace(Gate('T').matrix()) * np.trace(Gate('X').matrix()),
        atol=ATOL)


def _fsim_layered(n, depth, seed=0):
    """Supremacy-style mini workload: random 1q sqrt gates + diagonal
    couplers (FSIM(pi/2, phi) / CZ / CPHASE) — the gates the hyperedge
    simplification factorizes."""
    rng = np.random.default_rng(seed)
    one_qb = ['SQRT_X', 'SQRT_Y', 'T', 'H']
    c = Circuit()
    for d in range(depth):
        for q in range(n):
            c.append(Gate(str(rng.choice(one_qb)), [q]))
        for q in range(d % 2, n - 1, 2):
            r = rng.random()
            if r < 0.4:
                c.append(Gate('FSIM', [q, q + 1],
                              params=[np.pi / 2, np.pi / 6]))
            elif r < 0.7:
                c.append(Gate('CZ', [q, q + 1]))
            else:
                c.append(Gate('CPHASE', [q, q + 1],
                              params=[float(rng.random())]))
    return c


def test_tn_full_simplify_hyperedges():
    """simplify_tn='full' (diagonal reduction -> hyperedge indices)
    reproduces the dense evolution on all backends."""
    n = 6
    c = _fsim_layered(n, 6)
    psi = _evolution(c)
    got = simulate(c, initial_state='0', final_state='.', optimize='tn',
                   backend='numpy', simplify_tn='full')
    np.testing.assert_allclose(np.asarray(got), psi, atol=ATOL)
    got2 = simulate(c, initial_state='0', final_state='.', optimize='tn',
                    backend='jax', simplify_tn='full')
    np.testing.assert_allclose(np.asarray(got2), psi, atol=ATOL)


def test_tn_full_simplify_sliced():
    """Hyperedge slicing: force slices through a hyperedge-bearing
    network; every backend (numpy / batched flat executor) agrees."""
    n = 6
    c = _fsim_layered(n, 8, seed=3)
    psi = _evolution(c)
    for backend in ('numpy', 'jax'):
        out, info = simulate(c, initial_state='0', final_state='0' * n,
                             optimize='tn', backend=backend,
                             simplify_tn='full',
                             max_largest_intermediate=2**3,
                             return_info=True)
        assert info['n_slices'] > 1
        np.testing.assert_allclose(complex(np.asarray(out)),
                                   psi[(0,) * n], atol=ATOL)


def test_diagonal_reduce_fsim():
    """FSIM(pi/2, phi) factorizes to a single 2x2 tensor on crossed
    wires; CZ to a phase hyperedge tensor."""
    from hybridq_tpu.simulation.tn.network import Tensor, TensorNetwork

    U = Gate('FSIM', params=[np.pi / 2, np.pi / 6]).matrix()
    t = Tensor(np.reshape(U, (2, 2, 2, 2)), ('ao', 'bo', 'ai', 'bi'))
    net = TensorNetwork([
        t,
        Tensor(np.eye(2), ('ai', 'x')), Tensor(np.eye(2), ('bi', 'y')),
        Tensor(np.eye(2), ('z', 'ao')), Tensor(np.eye(2), ('w', 'bo'))])
    net.diagonal_reduce()
    # The coupler collapses to ONE rank-2 tensor p on crossed wires
    # (U[z,w,x,y] = p(z,w) δ(z,y) δ(w,x)): the input wires merged into
    # the output names (x≡w, y≡z hyperedges), identities to vectors.
    coupler = [tt for tt in net.tensors if tt.rank == 2]
    assert len(coupler) == 1
    p = coupler[0]
    assert set(p.inds) == {'z', 'w'}
    for tt in net.tensors:
        if tt.rank == 1:
            np.testing.assert_allclose(tt.data, np.ones(2), atol=1e-12)
    pzw = p.data if p.inds == ('z', 'w') else p.data.T
    dense = np.zeros((2, 2, 2, 2), dtype=complex)
    for z in range(2):
        for w in range(2):
            dense[z, w, w, z] = pzw[z, w]
    np.testing.assert_allclose(dense.reshape(4, 4), U, atol=1e-12)


def test_tn_return_info():
    c = get_rqc(4, 10)
    out, info = simulate(c, initial_state='0', final_state='.',
                         optimize='tn', backend='numpy',
                         return_info=True)
    for k in ('flops', 'largest_intermediate', 'n_slices',
              'total_flops', 'runtime (s)'):
        assert k in info


def test_tn_random_token_states():
    """Random mix of 0/1/./letter tokens on both boundaries vs a dense
    einsum oracle (the reference's example-mpi-trace workload)."""
    from opt_einsum import contract, get_symbol

    rng = np.random.default_rng(5)
    n = 5
    c = get_rqc(n, 20, indexes=list(range(n))) + Circuit(
        Gate('H', [q]) for q in range(n))
    U = utils.matrix(c, complex_type='complex128')

    for _ in range(4):
        tokens = list('01.ab')
        initial = [str(rng.choice(tokens)) for _ in range(n)]
        final = [str(rng.choice(tokens)) for _ in range(n)]
        # every letter must appear at least twice to be a trace; patch
        # singletons to '0'
        from collections import Counter
        cnt = Counter(x for x in initial + final if x.isalpha())
        initial = ['0' if x.isalpha() and cnt[x] < 2 else x
                   for x in initial]
        final = ['0' if x.isalpha() and cnt[x] < 2 else x
                 for x in final]

        got = simulate(c, initial_state=''.join(initial),
                       final_state=''.join(final), optimize='tn',
                       backend='numpy')

        # Dense oracle via einsum over U[f, i]
        vec = {'0': np.array([1., 0]), '1': np.array([0., 1]),
               '+': np.array([1., 1]) / np.sqrt(2),
               '-': np.array([1., -1]) / np.sqrt(2)}
        T = U.reshape((2,) * (2 * n))
        # symbols: final legs 0..n-1, initial legs n..2n-1
        sym = [get_symbol(i) for i in range(2 * n)]
        letter_sym = {}
        operands = [T]
        subs = []
        out_syms = []
        for i, tok in enumerate(initial):
            s = sym[n + i]
            if tok == '.':
                out_syms.append((1, i, s))
            elif tok in vec:
                operands.append(vec[tok])
                subs.append(s)
            else:
                letter_sym.setdefault(tok, get_symbol(2 * n + len(
                    letter_sym)))
                # traced legs share a symbol
                sym[n + i] = letter_sym[tok]
        for i, tok in enumerate(final):
            s = sym[i]
            if tok == '.':
                out_syms.append((0, i, s))
            elif tok in vec:
                operands.append(vec[tok])
                subs.append(s)
            else:
                letter_sym.setdefault(tok, get_symbol(2 * n + len(
                    letter_sym)))
                sym[i] = letter_sym[tok]
        eq_in = [''.join(sym)] + subs
        # output order: sorted initial open legs then sorted final
        init_open = sorted((i, s) for grp, i, s in out_syms if grp == 1)
        fin_open = sorted((i, s) for grp, i, s in out_syms if grp == 0)
        out = ''.join(s for _, s in init_open) + ''.join(
            s for _, s in fin_open)
        eq = ','.join(eq_in) + '->' + out
        expected = contract(eq, *operands)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_flat_scan_executor_direct():
    """Force the scanned flat executor on a sliced plan and compare
    against the numpy backend (it is bypassed for small trees by
    contract_jax's routing)."""
    from hybridq_tpu.simulation.tn.contract import (ContractionPlan,
                                                    SlicedContractor)
    from hybridq_tpu.simulation.tn.network import build_tn
    from hybridq_tpu.simulation.tn.path import find_path
    from hybridq_tpu.simulation.tn.slicer import slice_and_reconfigure

    n = 6
    c = _fsim_layered(n, 8, seed=7)
    net, output_order = build_tn(c, '0' * n, '0' * n)
    inputs = [t.inds for t in net.tensors]
    size_dict = {i: d for t in net.tensors
                 for i, d in zip(t.inds, t.data.shape)}
    tree = find_path(inputs, output_order, size_dict, max_repeats=4,
                     seed=0)
    tree, sliced, cost = slice_and_reconfigure(
        tree, target_size=2**3, time_budget=3.0)
    assert cost.nslices > 1
    plan = ContractionPlan(tree, sliced)
    sc = SlicedContractor(plan, net.tensors, output_order)
    want = sc.contract_np()
    got = sc.contract_jax_flat_scan()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    # partial-sum ranges add up
    a = sc.contract_jax_flat_scan(slice_range=(0, sc.nslices // 2))
    b = sc.contract_jax_flat_scan(
        slice_range=(sc.nslices // 2, sc.nslices))
    np.testing.assert_allclose(np.asarray(a) + np.asarray(b), want,
                               atol=1e-5)
