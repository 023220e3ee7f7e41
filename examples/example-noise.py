"""Noisy density-matrix evolution: exact vs trajectory sampling
(analog of the reference SC21 notebook workload)."""

import importlib.util
import os
import sys

if importlib.util.find_spec('hybridq_tpu') is None:
    # Fresh checkout without the editable install: run in-place.
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

import sys

import numpy as np

if '--cpu' in sys.argv:
    import jax
    jax.config.update('jax_platforms', 'cpu')

from hybridq_tpu import dm
from hybridq_tpu.circuit import Circuit
from hybridq_tpu.gate import Gate
from hybridq_tpu.noise import add_depolarizing_noise
from hybridq_tpu.noise.channel.utils import is_dm, reconstruct_dm
from hybridq_tpu.simulation import simulate

c = Circuit([Gate('H', [0]), Gate('CX', [0, 1]), Gate('T', [1]),
             Gate('CX', [1, 2])])
noisy = add_depolarizing_noise(c, probs=0.15)

rho = np.asarray(dm.simulate(noisy, initial_state='0',
                             complex_type='complex128')).reshape(8, 8)
assert is_dm(rho)
print(f'# exact rho: trace={np.real(np.trace(rho)):.6f}, '
      f'purity={np.real(np.trace(rho @ rho)):.4f}')

# Trajectory average converges to the exact density matrix.
rng = np.random.default_rng(0)
samples = [
    np.asarray(simulate(Circuit(list(noisy)), initial_state='0',
                        allow_sampling=True,
                        sampling_seed=int(rng.integers(2**31)))).ravel()
    for _ in range(400)
]
rho_avg = reconstruct_dm(samples)
err = np.abs(rho_avg - rho).max()
print(f'# trajectory average error after 400 samples: {err:.4f}')
assert err < 0.1
print('# OK')
