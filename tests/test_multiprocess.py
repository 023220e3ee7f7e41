"""Multi-process wiring test: runs examples/example-multiprocess.py,
which launches two ``jax.distributed`` worker processes (the analog of
the reference's ``mpiexec -n 2`` CI examples,
``.github/workflows/python-example.yml:23-32``)."""

import json
import os
import subprocess
import sys


def test_multiprocess_example():
    script = os.path.join(os.path.dirname(__file__), os.pardir,
                          'examples', 'example-multiprocess.py')
    env = dict(os.environ)
    # The example manages its own platform/device configuration.
    env.pop('XLA_FLAGS', None)
    out = subprocess.run([sys.executable, script], env=env,
                         capture_output=True, text=True, timeout=800)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result['prob_check'] == 'ok'
    assert result['sliced_amplitude_check'] == 'ok'
    assert result['n_processes'] == 2
