"""CLI tests (in-process, CPU)."""

import pickle

import numpy as np
import pytest

from hybridq_tpu import cli
from hybridq_tpu.circuit import utils
from hybridq_tpu.extras.io.qasm import from_qasm
from hybridq_tpu.simulation import prepare_state


def test_cli_simulate(tmp_path):
    out = tmp_path / 'out.pickle'
    cli.main(['/root/reference/examples/circuit_simple.qasm', str(out)])
    with open(out, 'rb') as f:
        results = pickle.load(f)
    psi = np.asarray(results['simulate'])
    assert 'runtime (s)' in results

    # Cross-engine oracle (the circuit is too wide for a dense matrix).
    from hybridq_tpu.simulation import simulate
    with open('/root/reference/examples/circuit_simple.qasm') as f:
        c = from_qasm(f.read())
    expected = simulate(c, initial_state='0',
                        optimize='evolution-einsum', backend='numpy')
    np.testing.assert_allclose(psi.ravel(),
                               np.asarray(expected).ravel(), atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(psi.ravel()), 1, atol=1e-4)


def test_cli_params_json(tmp_path):
    out = tmp_path / 'out.pickle'
    cli.main(['/root/reference/examples/circuit_simple.qasm', str(out),
              '--params', '{"complex-type": "complex64", "compress": 2}'])
    with open(out, 'rb') as f:
        results = pickle.load(f)
    assert np.asarray(results['simulate']).size > 0


def test_cli_bad_args():
    with pytest.raises(SystemExit):
        cli.main(['--no-such-flag'])
