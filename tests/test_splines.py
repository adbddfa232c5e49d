"""scipy-oracle tests for the B-spline family (ops/splines.py)."""

import numpy as np
import pytest
import scipy.signal as sps

from nx_signal_tpu.ops.splines import (
    cspline1d,
    cspline1d_eval,
    cspline2d,
    gauss_spline,
    qspline1d,
    qspline1d_eval,
    qspline2d,
    sepfir2d,
    spline_filter,
    symiirorder1,
    symiirorder2,
)

def _rng(seed=7):
    return np.random.default_rng(seed)


class TestBasis:
    def test_gauss_spline(self):
        x = np.linspace(-3, 3, 41)
        for n in (1, 3, 5):
            np.testing.assert_allclose(np.asarray(gauss_spline(x, n)),
                                       sps.gauss_spline(x, n), atol=1e-7)


class TestSymiir:
    def test_order1_vs_scipy(self):
        x = _rng(1).normal(size=120)
        for c0, z1 in [(1.0, 0.5), (2.5, -0.3), (0.7, 0.8)]:
            got = np.asarray(symiirorder1(x, c0, z1))
            want = sps.symiirorder1(x, c0, z1)
            np.testing.assert_allclose(got, want, atol=1e-9)

    def test_order1_batched(self):
        x = _rng(2).normal(size=(3, 90))
        got = np.asarray(symiirorder1(x, 1.5, 0.4))
        want = sps.symiirorder1(x, 1.5, 0.4)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_order1_validation(self):
        with pytest.raises(ValueError, match="z1"):
            symiirorder1(np.zeros(10), 1.0, 1.5)
        with pytest.raises(ValueError, match="converge"):
            symiirorder1(np.zeros(4), 1.0, 0.99999)

    def test_order2_vs_scipy(self):
        x = _rng(3).normal(size=150)
        for r, omega in [(0.5, 0.3), (0.3, 1.1), (0.7, 0.05)]:
            got = np.asarray(symiirorder2(x, r, omega))
            want = sps.symiirorder2(x, r, omega)
            # scipy truncates its boundary sums at ~1e-6; ours are full
            # closed-form sums (more accurate) — agreement is truncation-
            # limited, well inside the repo's 1e-4 gate
            np.testing.assert_allclose(got, want, atol=3e-6)

    def test_order2_validation(self):
        with pytest.raises(ValueError, match="r must be"):
            symiirorder2(np.zeros(10), 1.2, 0.3)


class TestSpline1d:
    def test_cspline1d_exact(self):
        x = _rng(4).normal(size=100)
        np.testing.assert_allclose(np.asarray(cspline1d(x)),
                                   sps.cspline1d(x), atol=1e-9)

    def test_cspline1d_smoothing(self):
        x = _rng(5).normal(size=200)
        got = np.asarray(cspline1d(x, lamb=2.0))
        want = sps.cspline1d(x, lamb=2.0)
        np.testing.assert_allclose(got, want, atol=5e-6)

    def test_qspline1d(self):
        x = _rng(4).normal(size=100)
        np.testing.assert_allclose(np.asarray(qspline1d(x)),
                                   sps.qspline1d(x), atol=1e-9)
        with pytest.raises(ValueError):
            qspline1d(x, lamb=1.0)

    def test_eval_roundtrip_and_offgrid(self):
        sig = np.repeat([0.0, 1.0, 0.0], 40) + _rng(6).normal(size=120) * 0.03
        cj = sps.cspline1d(sig)
        newx = np.linspace(-5, 130, 257)  # includes mirror regions
        got = np.asarray(cspline1d_eval(cj, newx))
        want = sps.cspline1d_eval(cj, newx)
        np.testing.assert_allclose(got, want, atol=1e-7)
        qj = sps.qspline1d(sig)
        got = np.asarray(qspline1d_eval(qj, newx))
        want = sps.qspline1d_eval(qj, newx)
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_eval_dx_x0(self):
        sig = _rng(8).normal(size=64)
        cj = sps.cspline1d(sig)
        newx = np.linspace(2.0, 100.0, 50)
        got = np.asarray(cspline1d_eval(cj, newx, dx=1.75, x0=2.0))
        want = sps.cspline1d_eval(cj, newx, dx=1.75, x0=2.0)
        np.testing.assert_allclose(got, want, atol=1e-7)


class TestSpline2d:
    def test_sepfir2d(self):
        x = _rng(9).normal(size=(20, 24))
        h = np.array([1.0, 4.0, 1.0]) / 6.0
        np.testing.assert_allclose(np.asarray(sepfir2d(x, h, h)),
                                   sps.sepfir2d(x, h, h), atol=1e-9)
        h2 = np.array([0.25, 0.5, 1.0, 0.5, 0.25])
        np.testing.assert_allclose(np.asarray(sepfir2d(x, h2, h)),
                                   sps.sepfir2d(x, h2, h), atol=1e-9)

    def test_cspline2d_exact_and_smooth(self):
        x = _rng(10).normal(size=(80, 90))
        np.testing.assert_allclose(np.asarray(cspline2d(x, 0.0)),
                                   sps.cspline2d(x, 0.0), atol=1e-5)
        # at matched tight precision scipy's IC truncation error vanishes
        np.testing.assert_allclose(
            np.asarray(cspline2d(x, 3.0, precision=1e-10)),
            sps.cspline2d(x, 3.0, precision=1e-10), atol=5e-5)
        # at scipy's loose default precision the agreement is limited by
        # SCIPY's truncated boundary sums (ours are full closed forms)
        np.testing.assert_allclose(np.asarray(cspline2d(x, 3.0)),
                                   sps.cspline2d(x, 3.0), atol=1e-2)

    def test_qspline2d(self):
        x = _rng(11).normal(size=(40, 50))
        np.testing.assert_allclose(np.asarray(qspline2d(x)),
                                   sps.qspline2d(x), atol=1e-5)

    def test_spline_filter(self):
        x = np.eye(24)
        x[12, :] = 1.0
        got = np.asarray(spline_filter(x, lmbda=0.1))
        want = sps.spline_filter(x, lmbda=0.1)
        # agreement limited by scipy's truncated IC sums (precision 1e-6,
        # pole r ~ 0.95 at this lambda, so the truncation error decays
        # slowly from the edges) and scipy's float32 [1,4,1]/6 kernel
        np.testing.assert_allclose(got, want, atol=5e-3)
        np.testing.assert_allclose(got[4:-4, 4:-4], want[4:-4, 4:-4],
                                   atol=1e-4)
