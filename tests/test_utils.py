"""Unit tests for utilities: heterogeneous sort, svd, kron, isunitary."""

import numpy as np
import pytest

from hybridq_tpu.utils import sort, argsort, svd, kron, isunitary


def test_sort_heterogeneous():
    labels = [3, 'b', (1, 2), 1, 'a', (0, 5)]
    s = sort(labels)
    # All ints first, then strings, then tuples (type-name ordering).
    assert s == [1, 3, 'a', 'b', (0, 5), (1, 2)]
    # argsort consistency
    idx = argsort(labels)
    assert [labels[i] for i in idx] == s


def test_sort_stability_and_key():
    labels = ['x', 'a', 'm']
    assert sort(labels, reverse=True) == ['x', 'm', 'a']
    assert sort([3, 1, 2], key=lambda v: -v) == [3, 2, 1]


@pytest.mark.parametrize('shape,axes', [((2, 2, 2, 2), (0, 2)),
                                        ((2, 2, 2, 2, 2, 2), (0, 1, 3))])
def test_svd_reconstruction(shape, axes):
    a = np.random.random(shape) + 1j * np.random.random(shape)
    s, uh, vh = svd(a, axes)
    alt = tuple(x for x in range(a.ndim) if x not in axes)
    at = np.transpose(a, tuple(axes) + alt)
    rec = sum(
        s[k] * np.multiply.outer(uh[k], vh[k]) for k in range(len(s)))
    np.testing.assert_allclose(rec, at, atol=1e-10)


def test_kron_and_isunitary():
    H = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    X = np.array([[0, 1], [1, 0]])
    np.testing.assert_allclose(kron(H, X), np.kron(H, X))
    np.testing.assert_allclose(kron(H, X, X), np.kron(np.kron(H, X), X))
    assert isunitary(H)
    assert isunitary(kron(H, X))
    assert not isunitary(np.array([[1, 0], [0, 2]]))
    assert not isunitary(np.ones((2, 3)))
