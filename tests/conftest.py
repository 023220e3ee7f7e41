"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding code
paths compile and execute without TPU hardware (the driver separately
dry-runs the multi-chip path; the benchmark runs on the real chip).
"""

import os

# In this environment jax is pre-imported at interpreter startup (the axon
# TPU platform ignores JAX_PLATFORMS), so the env var alone is not enough:
# force the CPU platform through the live config as well.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def seed(request):
    """Draw and print a fresh seed per test for reproducibility (same
    strategy as the reference test suite)."""
    env_seed = os.environ.get('HYBRIDQ_TPU_TEST_SEED')
    s = int(env_seed) if env_seed else np.random.randint(2**31)
    print(f"\n# Used seed [{request.node.name}]: {s}", flush=True)
    np.random.seed(s)
    return s
