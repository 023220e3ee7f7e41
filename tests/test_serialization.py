"""Serialization / checkpoint-resume tests.

The reference relies on dill-serializable generated classes for MPI and
CLI pickling (``hybridq/base/base.py:379-422``); with plain dataclasses,
stdlib pickle must round-trip every object.  The two-phase TN plan is
contraction-plan checkpointing; slice ranges are the resumable unit.
"""

import pickle

import numpy as np

from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.dm.gate import KrausSuperGate, MatrixSuperGate
from hybridq_tpu.extras.random import get_rqc
from hybridq_tpu.gate import Gate, Measure, Projection
from hybridq_tpu.noise import (AmplitudeDampingChannel,
                               GlobalDepolarizingChannel)
from hybridq_tpu.simulation import simulate


def test_gate_pickle_roundtrip():
    gates = [
        Gate('H', [0]),
        Gate('RX', ['a'], params=[0.5])**1.5,
        Gate('ISWAP', [(0, 1), 'b']).conj(),
        Gate('MATRIX', qubits=[0, 1],
             U=np.kron(Gate('H').matrix(), Gate('X').matrix())),
        Gate('STOC', gates=[Gate('X', [0]), Gate('Z', [0])],
             p=[0.3, 0.7]),
        Projection('01', qubits=[0, 1]),
        Measure(qubits=[2]),
    ]
    for g in gates:
        g2 = pickle.loads(pickle.dumps(g))
        assert g2.name == g.name
        assert g2.qubits == g.qubits
        if g.provides('matrix'):
            np.testing.assert_allclose(g2.matrix(), g.matrix())


def test_circuit_pickle_roundtrip():
    c = get_rqc(4, 30, use_random_indexes=True)
    c2 = pickle.loads(pickle.dumps(c))
    assert len(c2) == len(c)
    np.testing.assert_allclose(
        utils.matrix(c2, complex_type='complex128'),
        utils.matrix(c, complex_type='complex128'), atol=1e-8)


def test_channel_and_supergate_pickle():
    for obj in [
            GlobalDepolarizingChannel([0, 1], 0.2),
            AmplitudeDampingChannel([0], gamma=0.3)[0],
            MatrixSuperGate(Map=np.eye(4), l_qubits=[0], r_qubits=[1]),
            KrausSuperGate(gates=((Gate('X', [0]),), (Gate('X', [0]),)),
                           s=1),
    ]:
        o2 = pickle.loads(pickle.dumps(obj))
        np.testing.assert_allclose(np.asarray(o2.map()),
                                   np.asarray(obj.map()), atol=1e-10)


def test_tn_plan_pickle_and_reuse():
    """tensor_only plan survives pickling (de-facto contraction-plan
    checkpointing, reference ``tests.py:2307-2332``)."""
    n = 5
    c = get_rqc(n, 20)
    net, plan = simulate(c, initial_state='0', final_state='.',
                         optimize='tn', tensor_only=True)
    blob = pickle.dumps((net, plan))
    net2, plan2 = pickle.loads(blob)
    out = simulate(net2, optimize=plan2, backend='numpy')
    expected = np.asarray(
        simulate(c, initial_state='0', complex_type='complex128'))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_slice_range_checkpoint_resume():
    """Summing disjoint slice ranges reproduces the full contraction —
    partial sums are resumable checkpoints."""
    import pytest

    n = 7
    c = get_rqc(n, 50)
    # Two-phase: one plan, reused for the full sum and both ranges (path
    # search is randomized, so ranges must come from the same plan).
    net, plan = simulate(c, initial_state='0', final_state='0' * n,
                         optimize='tn', tensor_only=True)
    full, info = simulate(net, optimize=plan, backend='numpy',
                          max_largest_intermediate=2**2,
                          return_info=True)
    ns = info['n_slices']
    if ns < 2:
        pytest.skip('path needed no slicing for this random circuit')
    half = ns // 2
    part1 = simulate(net, optimize=plan, backend='numpy',
                     max_largest_intermediate=2**2,
                     slice_range=(0, half))
    part2 = simulate(net, optimize=plan, backend='numpy',
                     max_largest_intermediate=2**2,
                     slice_range=(half, ns))
    np.testing.assert_allclose(
        complex(np.asarray(part1)) + complex(np.asarray(part2)),
        complex(np.asarray(full)), atol=1e-5)
