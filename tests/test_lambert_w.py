"""Lambert W tests: scipy.special.lambertw as the oracle at the reference's
tolerance (atol 1e-13, rtol 1e-10 in c128; internal_test.exs:70)."""

import numpy as np
import pytest
import scipy.special as sp

from nx_signal_tpu.ops.lambert_w import lambert_w

ATOL, RTOL = 1e-13, 1e-10


def check(z, k):
    got = np.asarray(lambert_w(np.asarray(z, dtype=np.complex128), k))
    expected = sp.lambertw(np.asarray(z, dtype=np.complex128), k)
    np.testing.assert_allclose(got, expected, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("k", [0, -1, 1, 2])
def test_real_grid(k):
    z = np.array([0.1, 0.5, 1.5, 2.0, 10.0, 100.0, 1e6])
    check(z, k)


def test_branch0_special_values():
    z = np.array([0.0, 1.0])
    got = np.asarray(lambert_w(z, 0))
    np.testing.assert_allclose(got[0], 0.0, atol=ATOL)
    np.testing.assert_allclose(got[1], 0.56714329040978387299997, atol=ATOL)


def test_zero_other_branch():
    got = np.asarray(lambert_w(np.array([0.0]), 1))
    assert np.isneginf(got[0].real)


@pytest.mark.parametrize("k", [0, -1, 1])
def test_complex_grid(k):
    re = np.array([-2.0, -0.5, -0.2, 0.3, 1.0, 5.0])
    im = np.array([-3.0, -0.4, 0.0, 0.4, 3.0])
    z = (re[:, None] + 1j * im[None, :]).ravel()
    check(z, k)


def test_near_branch_point():
    z = np.array([-1 / np.e + 1e-3, -1 / np.e + 0.1, -0.3, -0.1])
    check(z, 0)
    check(z + 0j, -1)


def test_negative_real_axis_branch_minus1():
    z = np.array([-0.3, -0.2, -0.05])
    check(z, -1)


def test_large_and_small():
    check(np.array([1e-8, 1e8, 1e-300 + 0j]), 0)


def test_infinities():
    got = np.asarray(lambert_w(np.array([np.inf + 0j]), 0))
    assert np.isposinf(got[0].real)
