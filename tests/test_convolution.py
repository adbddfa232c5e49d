"""Convolution tests: scipy.signal is the oracle (the reference's vectors
come from scipy/numpy; test/nx_signal/convolutions_test.exs:6-15), plus the
reference's broadcast-axis and dtype-rule behaviors."""

import numpy as np
import pytest
import scipy.signal as sps

from nx_signal_tpu.ops.convolution import convolve, correlate, fftconvolve, oaconvolve
from tests.conftest import assert_all_close

MODES = ["full", "same", "valid"]


class TestConvolveDirect:
    def test_basic(self):
        got = convolve(np.array([1, 2, 3]), np.array([3, 4, 5]))
        assert_all_close(got, [3, 10, 22, 22, 15], atol=1e-6)
        assert np.asarray(got).dtype == np.float32

    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("n,k", [(10, 3), (10, 4), (7, 7), (16, 1)])
    def test_1d_grid(self, mode, n, k, rng):
        a = rng.normal(size=n)
        b = rng.normal(size=k)
        got = convolve(a.astype(np.float32), b.astype(np.float32), mode=mode)
        assert_all_close(got, sps.convolve(a, b, mode=mode), atol=1e-4)

    @pytest.mark.parametrize("mode", MODES)
    def test_2d(self, mode, rng):
        a = rng.normal(size=(8, 9))
        b = rng.normal(size=(3, 4))
        got = convolve(a.astype(np.float32), b.astype(np.float32), mode=mode)
        assert_all_close(got, sps.convolve2d(a, b, mode=mode), atol=1e-4)

    def test_same_even_kernel_matches_scipy(self, rng):
        # 'same' centering with even kernels: extra pad on the left
        a = rng.normal(size=10)
        b = rng.normal(size=4)
        got = convolve(a.astype(np.float32), b.astype(np.float32), mode="same")
        assert_all_close(got, sps.convolve(a, b, mode="same"), atol=1e-4)

    def test_valid_swaps_inputs(self, rng):
        a = rng.normal(size=3).astype(np.float32)
        b = rng.normal(size=10).astype(np.float32)
        got = convolve(a, b, mode="valid")
        assert_all_close(got, sps.convolve(a, b, mode="valid"), atol=1e-4)

    def test_valid_no_dominance_raises(self):
        with pytest.raises(ValueError, match="one must be at least as large"):
            convolve(np.zeros((5, 2)), np.zeros((2, 5)), mode="valid")

    def test_scalar_inputs(self):
        got = convolve(np.float32(3.0), np.float32(4.0))
        assert_all_close(got, 12.0, atol=1e-6)

    def test_mixed_rank_raises(self):
        with pytest.raises(ValueError, match=r"Incompatible ranks"):
            convolve(np.float32(1.0), np.ones(3))
        with pytest.raises(ValueError, match=r"Incompatible ranks"):
            convolve(np.ones(3), np.float32(1.0))
        with pytest.raises(ValueError, match="same rank"):
            convolve(np.ones(3), np.ones((3, 3)))

    def test_invalid_mode_and_method(self):
        with pytest.raises(ValueError, match="expected mode"):
            convolve(np.ones(3), np.ones(3), mode="bogus")
        with pytest.raises(ValueError, match="expected method"):
            convolve(np.ones(3), np.ones(3), method="bogus")

    def test_complex(self, rng):
        a = (rng.normal(size=8) + 1j * rng.normal(size=8)).astype(np.complex64)
        b = (rng.normal(size=3) + 1j * rng.normal(size=3)).astype(np.complex64)
        got = convolve(a, b)
        assert np.iscomplexobj(np.asarray(got))
        assert_all_close(got, np.convolve(a, b), atol=1e-4)

    def test_dtype_rules(self):
        # real -> f32, any complex -> complex (reference:
        # convolutions_test.exs:392-416 "don't complexify")
        r = convolve(np.array([1, 2]), np.array([1, 1]))
        assert np.asarray(r).dtype == np.float32
        c = convolve(np.array([1 + 0j, 2]), np.array([1.0, 1.0]))
        assert np.iscomplexobj(np.asarray(c))


class TestCorrelate:
    def test_basic(self):
        got = correlate(np.array([1, 2, 3]), np.array([3, 4, 5]))
        assert_all_close(got, [5, 14, 26, 18, 9], atol=1e-6)

    @pytest.mark.parametrize("mode", MODES)
    def test_vs_scipy(self, mode, rng):
        a = rng.normal(size=12)
        b = rng.normal(size=5)
        got = correlate(a.astype(np.float32), b.astype(np.float32), mode=mode)
        assert_all_close(got, sps.correlate(a, b, mode=mode), atol=1e-4)

    def test_complex_conjugates(self, rng):
        a = rng.normal(size=8) + 1j * rng.normal(size=8)
        b = rng.normal(size=3) + 1j * rng.normal(size=3)
        got = correlate(a.astype(np.complex64), b.astype(np.complex64))
        assert_all_close(got, sps.correlate(a, b, mode="full"), atol=1e-4)


class TestFFTConvolve:
    def test_basic(self):
        got = fftconvolve(np.array([1, 2, 3]), np.array([3, 4, 5]))
        assert_all_close(got, [3, 10, 22, 22, 15], atol=1e-4)

    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("n,k", [(10, 3), (33, 7), (16, 16), (100, 255)])
    def test_1d_grid(self, mode, n, k, rng):
        a = rng.normal(size=n)
        b = rng.normal(size=k)
        if mode == "valid" and n < k:
            pass  # still fine: swap applies
        got = fftconvolve(a.astype(np.float32), b.astype(np.float32), mode=mode)
        assert_all_close(got, sps.fftconvolve(a, b, mode=mode), atol=1e-3)

    @pytest.mark.parametrize("mode", ["full", "same"])
    def test_2d(self, mode, rng):
        a = rng.normal(size=(8, 9)).astype(np.float32)
        b = rng.normal(size=(3, 4)).astype(np.float32)
        got = fftconvolve(a, b, mode=mode)
        assert_all_close(got, sps.fftconvolve(a, b, mode=mode), atol=1e-3)

    def test_broadcast_axes_skipped(self, rng):
        # axes where either input has extent 1 are broadcast, not convolved
        # (reference: convolution.ex:265-274, convolutions_test.exs:95-143)
        a = rng.normal(size=(1, 10)).astype(np.float32)
        b = rng.normal(size=(4, 3)).astype(np.float32)
        got = fftconvolve(a, b)
        expected = np.stack([sps.fftconvolve(a[0], b[i]) for i in range(4)])
        assert got.shape == (4, 12)
        assert_all_close(got, expected, atol=1e-3)

    def test_complex(self, rng):
        a = (rng.normal(size=9) + 1j * rng.normal(size=9)).astype(np.complex64)
        b = (rng.normal(size=4) + 1j * rng.normal(size=4)).astype(np.complex64)
        got = fftconvolve(a, b)
        assert_all_close(got, sps.fftconvolve(a, b), atol=1e-3)

    def test_real_output_for_real_inputs(self, rng):
        got = fftconvolve(rng.normal(size=8).astype(np.float32),
                          rng.normal(size=3).astype(np.float32))
        assert not np.iscomplexobj(np.asarray(got))

    def test_rank_mismatch(self):
        with pytest.raises(ValueError, match="Rank of in1 and in2"):
            fftconvolve(np.ones(3), np.ones((3, 3)))

    def test_direct_fft_agree(self, rng):
        a = rng.normal(size=50).astype(np.float32)
        b = rng.normal(size=7).astype(np.float32)
        for mode in MODES:
            d = convolve(a, b, mode=mode, method="direct")
            f = convolve(a, b, mode=mode, method="fft")
            assert_all_close(d, f, atol=1e-4)


class TestOAConvolve:
    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("n,k", [(1000, 31), (480000, 255), (100, 100)])
    def test_vs_scipy(self, mode, n, k, rng):
        a = rng.normal(size=n).astype(np.float32)
        b = rng.normal(size=k).astype(np.float32)
        got = oaconvolve(a, b, mode=mode)
        expected = sps.oaconvolve(a.astype(np.float64), b.astype(np.float64), mode=mode)
        assert_all_close(got, expected, atol=1e-2, rtol=1e-3)

    def test_matches_fftconvolve(self, rng):
        a = rng.normal(size=2048).astype(np.float32)
        b = rng.normal(size=127).astype(np.float32)
        assert_all_close(oaconvolve(a, b), fftconvolve(a, b), atol=1e-3)

    def test_batched_channels(self, rng):
        a = rng.normal(size=(4, 500)).astype(np.float32)
        b = rng.normal(size=(1, 33)).astype(np.float32)
        got = oaconvolve(a, b)
        expected = np.stack([sps.oaconvolve(a[i], b[0]) for i in range(4)])
        assert_all_close(got, expected, atol=1e-3)

    def test_complex(self, rng):
        a = (rng.normal(size=300) + 1j * rng.normal(size=300)).astype(np.complex64)
        b = (rng.normal(size=17) + 1j * rng.normal(size=17)).astype(np.complex64)
        assert_all_close(oaconvolve(a, b), sps.oaconvolve(a, b), atol=1e-3)

    def test_kernel_longer_than_signal(self, rng):
        a = rng.normal(size=10).astype(np.float32)
        b = rng.normal(size=50).astype(np.float32)
        assert_all_close(oaconvolve(a, b), sps.oaconvolve(a, b), atol=1e-3)
