"""Pallas fused gate kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridq_tpu.simulation.kernels import IndexedEvolver
from hybridq_tpu.simulation.pallas_kernels import apply_gate_rows

ATOL = 1e-4


def _rand_state(n, rng):
    re = rng.standard_normal(2**n).astype('float32')
    im = rng.standard_normal(2**n).astype('float32')
    return re, im


@pytest.mark.parametrize('qs', [(0,), (3, 0), (1, 3, 0, 2)])
def test_pallas_matches_indexed(qs):
    n, L = 14, 10
    rng = np.random.default_rng(1)
    k = len(qs)
    U = np.linalg.qr(rng.standard_normal((2**k, 2**k)) +
                     1j * rng.standard_normal((2**k, 2**k)))[0]
    re_h, im_h = _rand_state(n, rng)

    # XLA oracle (pallas disabled)
    ev = IndexedEvolver(n, row_bits=L, use_pallas=False, defer=False)
    exp = ev.apply_gate((jnp.asarray(re_h), jnp.asarray(im_h)), U, qs)

    row_pos = [n - 1 - q - L for q in qs]
    assert all(p >= 0 for p in row_pos)
    got = apply_gate_rows(jnp.asarray(re_h), jnp.asarray(im_h),
                          jnp.asarray(U.real.astype('float32')),
                          jnp.asarray(U.imag.astype('float32')),
                          row_pos, n, L)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(exp[0]),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(exp[1]),
                               atol=ATOL)


def test_evolver_dispatches_to_pallas():
    """IndexedEvolver with pallas enabled matches the XLA path on a mixed
    sequence (hi gates go through Pallas, lo/mixed through XLA)."""
    n, L = 14, 10
    rng = np.random.default_rng(2)
    gates = []
    for qs in [(0, 1), (2, 3), (12, 13), (0, 12)]:
        U = np.linalg.qr(rng.standard_normal((4, 4)) +
                         1j * rng.standard_normal((4, 4)))[0]
        gates.append((U, qs))

    re_h, im_h = _rand_state(n, rng)
    ev_ref = IndexedEvolver(n, row_bits=L, use_pallas=False, defer=False)
    ev_pal = IndexedEvolver(n, row_bits=L, use_pallas=True)
    assert ev_pal.use_pallas

    s_ref = (jnp.asarray(re_h), jnp.asarray(im_h))
    s_pal = (jnp.asarray(re_h), jnp.asarray(im_h))
    for U, qs in gates:
        s_ref = ev_ref.apply_gate(s_ref, U, qs)
        s_pal = ev_pal.apply_gate(s_pal, U, qs)
    np.testing.assert_allclose(np.asarray(s_pal[0]),
                               np.asarray(s_ref[0]), atol=ATOL)
    np.testing.assert_allclose(np.asarray(s_pal[1]),
                               np.asarray(s_ref[1]), atol=ATOL)
