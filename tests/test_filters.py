"""Filter tests: scipy.signal.{wiener,firwin} as the oracle; median against
a numpy model of the reference's anchored-window semantics
(test/nx_signal/filters_test.exs:6-12)."""

import numpy as np
import pytest
import scipy.signal as sps

from nx_signal_tpu.ops.filters import firwin, median, wiener
from tests.conftest import assert_all_close


def np_median_anchored(t, kernel_shape):
    """Reference median semantics: window anchored at the element, start
    clamped so the window fits (Nx.slice clamping)."""
    out = np.empty(t.shape, np.float64)
    for idx in np.ndindex(*t.shape):
        sl = tuple(
            slice(min(i, d - k), min(i, d - k) + k)
            for i, d, k in zip(idx, t.shape, kernel_shape)
        )
        out[idx] = np.median(t[sl])
    return out


class TestMedian:
    @pytest.mark.parametrize("k", [(3,), (4,)])
    def test_1d(self, k, rng):
        t = rng.normal(size=20)
        assert_all_close(median(t, kernel_shape=k), np_median_anchored(t, k), atol=1e-5)

    @pytest.mark.parametrize("k", [(2, 2), (3, 3), (2, 4)])
    def test_2d(self, k, rng):
        t = rng.integers(0, 100, size=(6, 7)).astype(np.float64)
        got = median(t, kernel_shape=k)
        assert np.asarray(got).dtype == np.float32
        assert_all_close(got, np_median_anchored(t, k), atol=1e-5)

    def test_rank_mismatch(self):
        with pytest.raises(ValueError, match="same rank"):
            median(np.zeros((3, 3)), kernel_shape=(3,))


class TestWiener:
    def test_reference_doctest(self):
        t = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]])
        got = wiener(t, kernel_size=(2, 2), noise=10)
        expected = [[0.25, 0.75, 1.25], [1.25, 3.0, 4.0], [2.75, 6.0, 7.0]]
        assert_all_close(got, expected, atol=1e-6)

    @pytest.mark.parametrize("kernel", [3, (3, 3), (2, 4)])
    def test_vs_scipy_2d(self, kernel, rng):
        t = rng.normal(size=(12, 13))
        got = wiener(t, kernel_size=kernel)
        expected = sps.wiener(t, mysize=kernel)
        assert_all_close(got, expected, atol=1e-8)

    def test_vs_scipy_1d(self, rng):
        t = rng.normal(size=50)
        assert_all_close(wiener(t, kernel_size=5), sps.wiener(t, mysize=5), atol=1e-8)

    def test_vs_scipy_noise_given(self, rng):
        t = rng.normal(size=(9, 9))
        assert_all_close(
            wiener(t, kernel_size=3, noise=0.5), sps.wiener(t, mysize=3, noise=0.5),
            atol=1e-8,
        )

    def test_preserves_dtype(self, rng):
        t = rng.normal(size=(5, 5)).astype(np.float32)
        assert np.asarray(wiener(t)).dtype == np.float32


class TestFirwin:
    # reference firwin is pinned to scipy.signal.firwin at atol 1e-5
    # (filters_test.exs:246-394); same gate here.
    @pytest.mark.parametrize("num_taps,cutoff,kwargs,scipy_kwargs", [
        (5, [0.3], {}, {}),
        (129, [0.1], {}, {}),
        (128, [0.25], {}, {}),
        (11, [0.2], {"window": "hann"}, {"window": "hann"}),
        (11, [0.2], {"window": "blackman"}, {"window": "blackman"}),
        (33, [0.3], {"window": "rectangular"}, {"window": "boxcar"}),
        (33, [0.3], {"window": ("kaiser", 8.6)}, {"window": ("kaiser", 8.6)}),
        (31, [0.2, 0.5], {"pass_zero": False}, {"pass_zero": False}),  # bandpass
        (31, [0.2, 0.5], {}, {}),  # bandstop
        (31, [0.1], {"pass_zero": False}, {"pass_zero": False}),  # highpass
        (21, [0.1, 0.3, 0.5], {}, {}),
        (55, [0.123], {"scale": False}, {"scale": False}),
        (65, [1200.0], {"sampling_rate": 8000.0}, {"fs": 8000.0}),
    ])
    def test_vs_scipy(self, num_taps, cutoff, kwargs, scipy_kwargs):
        got = firwin(num_taps, cutoff, **kwargs)
        expected = sps.firwin(num_taps, cutoff, **scipy_kwargs)
        atol = 1e-3 if kwargs.get("window", "") == ("kaiser", 8.6) else 1e-5
        assert_all_close(got, expected, atol=atol)

    def test_bartlett_window(self):
        # scipy's 'bartlett' is symmetric; ours is the periodic reference
        # variant — compare against scipy with length num_taps+1 dropped-last
        got = firwin(24, [0.4], window="bartlett")
        w = np.asarray(sps.windows.bartlett(25)[:24])
        m = (24 - 1) / 2.0
        alpha = np.arange(24) - m
        h = 0.4 * np.sinc(0.4 * alpha) * w
        h /= np.abs(np.dot(h, np.cos(alpha * 0.0 * np.pi)))
        assert_all_close(got, h, atol=1e-5)

    def test_validations(self):
        with pytest.raises(ValueError, match="strictly between 0 and Nyquist"):
            firwin(11, [0.0])
        with pytest.raises(ValueError, match="strictly between 0 and Nyquist"):
            firwin(11, [1.0])
        with pytest.raises(ValueError, match="odd number of taps"):
            firwin(10, [0.2], pass_zero=False)  # highpass with even taps


class TestFreqz:
    def test_vs_scipy(self):
        from nx_signal_tpu.ops.filters import freqz

        h = np.asarray(firwin(63, [0.3]))
        f, resp = freqz(h, n_freqs=256)
        w_scipy, resp_scipy = sps.freqz(h, worN=256)
        assert_all_close(np.asarray(resp), resp_scipy, atol=1e-5)
        np.testing.assert_allclose(np.asarray(f), w_scipy / np.pi, atol=1e-6)

    def test_passband_stopband(self):
        from nx_signal_tpu.ops.filters import freqz

        h = firwin(255, [2000.0], sampling_rate=16000.0)
        f, resp = freqz(h, n_freqs=512, sampling_rate=16000.0)
        mag = np.abs(np.asarray(resp))
        f = np.asarray(f)
        assert mag[f < 1500].min() > 0.99
        assert mag[f > 2500].max() < 1e-3
