"""Pallas fused gate kernel tests (interpret mode on CPU).

The Pallas kernel is a standalone single-pass row-gate applier (see
``pallas_kernels.py``); it is not the default engine path on this part
(its streaming bandwidth ceiling is below plain XLA ops — SCALING.md),
so it is tested directly against a numpy oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hybridq_tpu.simulation.pallas_kernels import apply_gate_rows

ATOL = 1e-4


def _rand_state(n, rng):
    re = rng.standard_normal(2**n).astype('float32')
    im = rng.standard_normal(2**n).astype('float32')
    return re, im


def _oracle(re_h, im_h, U, qs, n):
    psi = re_h.astype(complex) + 1j * im_h.astype(complex)
    k = len(qs)
    T = np.moveaxis(psi.reshape((2,) * n), qs, range(k))
    T = (U.astype(complex) @ T.reshape(2**k, -1)).reshape((2,) * n)
    return np.moveaxis(T, range(k), qs).reshape(-1)


@pytest.mark.parametrize('qs', [(0,), (3, 0), (1, 3, 0, 2)])
def test_pallas_matches_oracle(qs):
    n, L = 14, 10
    rng = np.random.default_rng(1)
    k = len(qs)
    U = np.linalg.qr(rng.standard_normal((2**k, 2**k)) +
                     1j * rng.standard_normal((2**k, 2**k)))[0]
    re_h, im_h = _rand_state(n, rng)

    expected = _oracle(re_h, im_h, U, qs, n)

    # apply_gate_rows wants the gate matrix pre-ordered to row-bit
    # positions (most significant first) and the positions sorted the
    # same way.
    row_pos = [n - 1 - q - L for q in qs]
    assert all(p >= 0 for p in row_pos)
    got = apply_gate_rows(jnp.asarray(re_h), jnp.asarray(im_h),
                          jnp.asarray(U.real.astype('float32')),
                          jnp.asarray(U.imag.astype('float32')),
                          row_pos, n, L)
    got_psi = np.asarray(got[0]) + 1j * np.asarray(got[1])
    np.testing.assert_allclose(got_psi, expected, atol=ATOL)
