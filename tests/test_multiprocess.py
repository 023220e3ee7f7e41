"""Multi-process wiring test: runs examples/example-multiprocess.py,
which launches two ``jax.distributed`` worker processes (the analog of
the reference's ``mpiexec -n 2`` CI examples,
``.github/workflows/python-example.yml:23-32``)."""

import json
import os
import subprocess
import sys


import pytest


@pytest.mark.parametrize('n_proc,dev_per_proc', [(2, 4), (8, 1)])
def test_multiprocess_example(n_proc, dev_per_proc):
    """2 procs x 4 devices (the reference's mpiexec -n 2 analog) AND
    8 procs x 1 device, where EVERY collective hop crosses a process
    boundary — in-process multi-device meshes hide ppermute bugs."""
    script = os.path.join(os.path.dirname(__file__), os.pardir,
                          'examples', 'example-multiprocess.py')
    env = dict(os.environ)
    # The example manages its own platform/device configuration.
    env.pop('XLA_FLAGS', None)
    env['HYBRIDQ_TPU_EXAMPLE_NPROC'] = str(n_proc)
    env['HYBRIDQ_TPU_EXAMPLE_DEVS'] = str(dev_per_proc)
    out = subprocess.run([sys.executable, script], env=env,
                         capture_output=True, text=True, timeout=800)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result['prob_check'] == 'ok'
    assert result['sliced_amplitude_check'] == 'ok'
    assert result['clifford_merge_check'] == 'ok'
    assert result['n_processes'] == n_proc


def test_local_slice_range_tiles():
    from hybridq_tpu.parallel import local_slice_range

    for n_slices in (1, 2, 7, 64, 65):
        for n_procs in (1, 2, 3, 8):
            ranges = [local_slice_range(n_slices, pid=p, n_procs=n_procs)
                      for p in range(n_procs)]
            assert ranges[0][0] == 0 and ranges[-1][1] == n_slices
            for (a, b), (c, d) in zip(ranges, ranges[1:]):
                assert b == c
            sizes = [b - a for a, b in ranges]
            assert max(sizes) - min(sizes) <= 1  # balanced
