"""Direct tests for ops.transforms and utils.shapes (previously covered
only indirectly through fftconvolve)."""

import numpy as np
import pytest

from nx_signal_tpu.ops.transforms import fft_nd, ifft_nd, irfft_nd, rfft_nd
from nx_signal_tpu.utils.shapes import (
    conv_output_length,
    fft_fast_length,
    next_fast_len,
    next_power_of_two,
)


class TestFFTND:
    def test_roundtrip(self, rng):
        x = rng.normal(size=(4, 8)) + 1j * rng.normal(size=(4, 8))
        got = np.asarray(ifft_nd(fft_nd(x)))
        np.testing.assert_allclose(got, x, atol=1e-12)

    def test_per_axis_lengths(self, rng):
        # reference semantics (transforms.ex:5-21): pad/truncate per axis
        x = rng.normal(size=(4, 8))
        got = np.asarray(fft_nd(x, axes=[0, 1], lengths=[8, 16]))
        expected = np.fft.fftn(x, s=[8, 16], axes=[0, 1])
        np.testing.assert_allclose(got, expected, atol=1e-10)

    def test_subset_of_axes(self, rng):
        x = rng.normal(size=(3, 5, 7))
        got = np.asarray(fft_nd(x, axes=[2]))
        np.testing.assert_allclose(got, np.fft.fft(x, axis=2), atol=1e-10)

    def test_rfft_irfft_roundtrip(self, rng):
        x = rng.normal(size=(4, 16))
        sp = rfft_nd(x, axes=[1])
        back = np.asarray(irfft_nd(sp, axes=[1], lengths=[16]))
        np.testing.assert_allclose(back, x, atol=1e-12)

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError, match="lengths must match axes"):
            fft_nd(np.zeros((4, 4)), axes=[0], lengths=[4, 4])


class TestShapeMath:
    def test_next_power_of_two(self):
        assert [next_power_of_two(n) for n in (1, 2, 3, 48, 512, 513)] == \
            [1, 2, 4, 64, 512, 1024]

    def test_fft_fast_length_is_pow2(self):
        for n in (7, 100, 480255, 1 << 20):
            m = fft_fast_length(n)
            assert m >= n and (m & (m - 1)) == 0

    def test_next_fast_len_is_smooth(self):
        for n in (7, 97, 1000, 480255):
            m = next_fast_len(n)
            assert m >= n
            for p in (2, 3, 5):
                while m % p == 0:
                    m //= p
            assert m == 1

    def test_conv_output_length(self):
        assert conv_output_length(10, 3, "full") == 12
        assert conv_output_length(10, 3, "same") == 10
        assert conv_output_length(10, 3, "valid") == 8
        with pytest.raises(ValueError):
            conv_output_length(10, 3, "bogus")


class TestChecks:
    def test_count_nonfinite(self):
        from nx_signal_tpu.utils.checks import count_nonfinite

        x = np.array([1.0, np.nan, np.inf, 2.0])
        assert int(count_nonfinite(x)) == 2
        assert int(count_nonfinite(np.array([1 + 1j * np.nan]))) == 1
        assert int(count_nonfinite(np.array([1, 2, 3]))) == 0

    def test_assert_all_finite(self):
        import jax
        from nx_signal_tpu.utils.checks import assert_all_finite

        assert_all_finite(np.ones(4), "ok")  # no raise
        with pytest.raises(FloatingPointError, match="bad .*1 non-finite"):
            jax.block_until_ready(
                assert_all_finite(np.array([1.0, np.nan]), "bad")
            )
