"""Extras + architecture tests: layouts, OTOC workloads, MessageGate."""

import itertools

import numpy as np
import pytest

from hybridq_tpu.architecture.utils import get_layout_from_drawing
from hybridq_tpu.architecture.google import sycamore
from hybridq_tpu.architecture.ibm import eagle, rochester
from hybridq_tpu.architecture.rigetti import aspen_7, aspen_11
from hybridq_tpu.circuit import Circuit, utils
from hybridq_tpu.extras.gate import MessageGate
from hybridq_tpu.extras.otoc import generate_OTOC, generate_U
from hybridq_tpu.gate import Gate
from hybridq_tpu.simulation import simulate


def test_layout_parser_reference_example():
    drawing = r"""
      X-X
     /  |
    X   X
    |   |
    X-X-X
    """
    qubits, couplings = get_layout_from_drawing(drawing)
    assert qubits == [(0, 0), (0, 1), (1, 0), (1, 2), (2, 0), (2, 1),
                      (2, 2)]
    assert ((0, 1), (0, 0)) in [tuple(c) for c in couplings] or \
        ((0, 0), (0, 1)) in [tuple(c) for c in couplings]


def test_device_layouts():
    assert len(sycamore.layout) == 53  # Sycamore-53 (one dead qubit of gmon54)
    assert len(rochester.layout) == 53
    assert len(eagle.layout) == 127
    assert len(aspen_7.layout) == 25
    assert len(aspen_11.layout) == 40
    # couplings connect only layout qubits
    for mod in (sycamore, rochester, eagle, aspen_7, aspen_11):
        qs = set(mod.layout)
        assert all(a in qs and b in qs for a, b in mod.couplings)


def test_layout_parity_with_reference():
    from tests._ref_oracle import import_reference
    if import_reference() is None:
        pytest.skip('reference unavailable')
    from hybridq.architecture.google import sycamore as ref_syc
    assert sycamore.layout == ref_syc.layout
    assert sycamore.couplings == ref_syc.couplings
    assert sycamore.get_layers().keys() == ref_syc.get_layers().keys()
    for k in 'ABCDEFGH':
        assert sycamore.get_layer(k) == ref_syc.get_layer(k), k


def test_supremacy_layers_partition():
    layers = sycamore.get_layers()
    # A+B+C+D covers every coupling exactly once
    abcd = list(itertools.chain(*(layers[k] for k in 'ABCD')))
    assert sorted(abcd) == sorted(sycamore.couplings)


def test_generate_otoc_small():
    # Tiny 2x2 grid workload
    qpu = [(0, 0), (0, 1), (1, 0), (1, 1)]
    layers = sycamore.get_layers(qpu)
    seq = ['A', 'B', 'C', 'D']

    def ones():
        while True:
            yield Gate('SQRT_X')

    def twos():
        while True:
            yield Gate('ISWAP')

    c = generate_OTOC(layout=layers, depth=3, sequence=seq,
                      one_qb_gates=ones(), two_qb_gates=twos(),
                      butterfly_op='X', ancilla=(0, 0),
                      targets=[(1, 0), (0, 1)])
    assert len(c) > 0
    tags = {g.tags.get('sequence') for g in c}
    assert {'initial', 'first_control', 'butterfly',
            'second_control'} <= tags
    # OTOC circuit must be a valid unitary circuit
    U = utils.matrix(c, complex_type='complex128')
    np.testing.assert_allclose(U @ U.conj().T, np.eye(U.shape[0]),
                               atol=1e-4)


def test_message_gate(capsys):
    c = Circuit([Gate('H', [0]), MessageGate('hello-from-sim',
                                             qubits=[0])])
    psi = simulate(c, initial_state='0')
    err = capsys.readouterr().err
    assert 'hello-from-sim' in err
    np.testing.assert_allclose(np.abs(np.asarray(psi).ravel()),
                               [1 / np.sqrt(2)] * 2, atol=1e-5)


def test_to_cirq_gated():
    from hybridq_tpu.extras.io import to_cirq
    try:
        import cirq  # noqa
        has_cirq = True
    except ImportError:
        has_cirq = False
    c = Circuit([Gate('H', [0]), Gate('CX', [0, 1])])
    if has_cirq:
        cc = to_cirq(c)
        np.testing.assert_allclose(
            cc.unitary(), utils.matrix(c, complex_type='complex128'),
            atol=1e-6)
    else:
        with pytest.raises(ImportError):
            to_cirq(c)
