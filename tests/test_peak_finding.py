"""Peak-finding tests — reference doctest golden vectors
(lib/nx_signal/peak_finding.ex) and scipy.signal.argrelextrema cross-checks."""

import jax.numpy as jnp
import numpy as np
import scipy.signal as sps

from nx_signal_tpu.ops.peak_finding import argrelextrema, argrelmax, argrelmin


def test_argrelmin_1d():
    x = np.array([2, 1, 2, 3, 2, 0, 1, 0])
    res = argrelmin(x)
    assert int(res.valid_indices) == 2
    np.testing.assert_array_equal(np.asarray(res.indices[:2]), [[1], [5]])
    assert np.all(np.asarray(res.indices[2:]) == -1)


def test_argrelmin_order3():
    x = np.array([2, 1, 2, 3, 2, 0, 1, 0])
    res = argrelmin(x, order=3)
    assert int(res.valid_indices) == 1
    np.testing.assert_array_equal(np.asarray(res.indices[:1]), [[1]])


def test_argrelmax_1d():
    x = np.array([2, 1, 2, 3, 2, 0, 1, 0])
    res = argrelmax(x)
    assert int(res.valid_indices) == 2
    np.testing.assert_array_equal(np.asarray(res.indices[:2]), [[3], [6]])


def test_argrelmax_order3():
    x = np.array([2, 1, 2, 3, 2, 0, 1, 0])
    res = argrelmax(x, order=3)
    assert int(res.valid_indices) == 1
    np.testing.assert_array_equal(np.asarray(res.indices[:1]), [[3]])


def test_argrelmin_2d():
    x = np.array([[1, 2, 1, 2], [6, 2, 0, 0], [5, 3, 4, 4]])
    res = argrelmin(x)
    assert int(res.valid_indices) == 2
    np.testing.assert_array_equal(np.asarray(res.indices[:2]), [[1, 2], [1, 3]])
    res = argrelmin(x, axis=1)
    np.testing.assert_array_equal(np.asarray(res.indices[:2]), [[0, 2], [2, 1]])


def test_argrelmax_2d():
    x = np.array([[1, 2, 1, 2], [6, 2, 0, 0], [5, 3, 4, 4]])
    res = argrelmax(x)
    assert int(res.valid_indices) == 1
    np.testing.assert_array_equal(np.asarray(res.indices[0]), [1, 0])
    res = argrelmax(x, axis=1)
    np.testing.assert_array_equal(np.asarray(res.indices[0]), [0, 1])


def test_custom_comparator():
    # reference doctest (peak_finding.ex:295-311)
    x = np.array([0, 1, 3, 2, 0, 1, 0, 0, 0, 2, 1])
    comparator = lambda a, b: jnp.greater_equal(a, b * 2)
    res = argrelextrema(x, comparator)
    assert int(res.valid_indices) == 3
    np.testing.assert_array_equal(np.asarray(res.indices[:3]), [[5], [7], [9]])


def test_vs_scipy(rng):
    x = rng.normal(size=200)
    for order in (1, 2, 5):
        res = argrelmax(x, order=order)
        expected = sps.argrelmax(x, order=order)[0]
        n = int(res.valid_indices)
        assert n == len(expected)
        np.testing.assert_array_equal(np.asarray(res.indices[:n, 0]), expected)


def test_vs_scipy_axis1(rng):
    x = rng.normal(size=(20, 30))
    res = argrelmin(x, axis=1, order=2)
    rows, cols = sps.argrelmin(x, axis=1, order=2)
    n = int(res.valid_indices)
    assert n == len(rows)
    got = np.asarray(res.indices[:n])
    expected = np.stack([rows, cols], axis=1)
    # both are in row-major order of the flat mask
    np.testing.assert_array_equal(got, expected)
