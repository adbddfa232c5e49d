"""Wavelet family (ricker/morlet/morlet2/qmf), cwt, and find_peaks_cwt.

Oracles: scipy.signal.find_peaks_cwt is public in scipy 1.17 and its
internal _ricker/_cwt carry the removed legacy semantics — used here as
the golden reference (tests only; the library never imports scipy)."""

import numpy as np
import pytest
import scipy.signal as sps
from scipy.signal._peak_finding import _cwt as scipy_cwt
from scipy.signal._peak_finding import _ricker as scipy_ricker

from nx_signal_tpu.ops.find_peaks import find_peaks_cwt
from nx_signal_tpu.ops.wavelets import cwt, morlet, morlet2, qmf, ricker
from tests.conftest import assert_all_close


class TestWaveletGenerators:
    @pytest.mark.parametrize("points,a", [(100, 4.0), (11, 1.0), (64, 9.5),
                                          (7, 0.8)])
    def test_ricker_vs_scipy(self, points, a):
        np.testing.assert_allclose(np.asarray(ricker(points, a)),
                                   scipy_ricker(points, a).astype(np.float32),
                                   rtol=1e-6)

    def test_ricker_peak_and_symmetry(self):
        w = np.asarray(ricker(101, 10.0))
        assert np.argmax(w) == 50
        np.testing.assert_allclose(w, w[::-1], atol=1e-12)

    def test_morlet2_analytic(self):
        # morlet2(M, s, w) = sqrt(1/s) pi^-1/4 exp(i w x) exp(-x^2/2),
        # x = (arange(M) - (M-1)/2)/s
        m, s, w = 64, 5.0, 6.0
        x = (np.arange(m) - (m - 1) / 2.0) / s
        want = (np.pi ** -0.25) * np.sqrt(1 / s) * \
            np.exp(1j * w * x) * np.exp(-0.5 * x * x)
        assert_all_close(morlet2(m, s, w), want, atol=1e-6, rtol=1e-6)

    def test_morlet_complete_is_zero_mean_corrected(self):
        m = 201
        inc = np.asarray(morlet(m, w=5.0, s=1.0, complete=False))
        com = np.asarray(morlet(m, w=5.0, s=1.0, complete=True))
        x = np.linspace(-2 * np.pi, 2 * np.pi, m)
        corr = np.exp(-0.5 * 25.0) * np.exp(-0.5 * x * x) * np.pi ** -0.25
        assert_all_close(inc - com, corr, atol=1e-6, rtol=1e-5)

    def test_qmf(self):
        h = np.array([1.0, 2.0, 3.0, 4.0])
        np.testing.assert_allclose(np.asarray(qmf(h)),
                                   [4.0, -3.0, 2.0, -1.0])
        with pytest.raises(ValueError):
            qmf(np.ones((2, 2)))


class TestCwt:
    def _sig(self, rng, n=512):
        t = np.arange(n) / n
        return (np.sin(2 * np.pi * 5 * t) +
                0.5 * rng.normal(size=n)).astype(np.float64)

    @pytest.mark.parametrize("widths", [
        np.arange(1, 11), np.array([2.5, 4.0, 7.3]), np.array([1])])
    def test_vs_scipy_ricker(self, rng, widths):
        x = self._sig(rng)
        ours = np.asarray(cwt(x, ricker, widths))
        want = scipy_cwt(x, scipy_ricker, widths)
        np.testing.assert_allclose(ours, want, atol=2e-5, rtol=1e-4)

    def test_complex_wavelet_dtype(self, rng):
        x = self._sig(rng, 256)
        out = cwt(x, lambda n, s: morlet2(n, s, 5.0), np.arange(2, 8))
        assert np.iscomplexobj(np.asarray(out))
        assert out.shape == (6, 256)

    def test_kernel_longer_than_ten_widths_clamped(self, rng):
        # width*10 > len(data): kernel clamps to data length (scipy rule)
        x = self._sig(rng, 64)
        ours = np.asarray(cwt(x, ricker, [20.0]))
        want = scipy_cwt(x, scipy_ricker, [20.0])
        np.testing.assert_allclose(ours, want, atol=2e-5, rtol=1e-4)

    def test_rank_validation(self):
        with pytest.raises(ValueError):
            cwt(np.zeros((2, 8)), ricker, [1.0])


class TestFindPeaksCwt:
    def _peaky(self, rng, n=512, centers=(100, 250, 400), width=10.0):
        x = np.zeros(n)
        for c in centers:
            x += np.exp(-((np.arange(n) - c) ** 2) / (2 * width ** 2))
        return x + 0.05 * rng.normal(size=n)

    def test_vs_scipy_defaults(self, rng):
        x = self._peaky(rng)
        ours = find_peaks_cwt(x, np.arange(3, 20))
        want = sps.find_peaks_cwt(x, np.arange(3, 20))
        np.testing.assert_array_equal(ours, np.asarray(want))

    def test_vs_scipy_explicit_options(self, rng):
        x = self._peaky(rng, centers=(80, 200, 330, 450), width=8.0)
        kw = dict(max_distances=np.full(12, 3.0), gap_thresh=2,
                  min_length=4, min_snr=1.5, noise_perc=15, window_size=40)
        ours = find_peaks_cwt(x, np.arange(2, 14), **kw)
        want = sps.find_peaks_cwt(x, np.arange(2, 14), **kw)
        np.testing.assert_array_equal(ours, np.asarray(want))

    def test_vs_scipy_noisy_sine(self, rng):
        t = np.linspace(0, 10 * np.pi, 1000)
        x = np.sin(t) + 0.3 * rng.normal(size=1000)
        ours = find_peaks_cwt(x, np.arange(5, 40), min_snr=2.0)
        want = sps.find_peaks_cwt(x, np.arange(5, 40), min_snr=2.0)
        np.testing.assert_array_equal(ours, np.asarray(want))

    def test_clean_peaks_found(self, rng):
        x = self._peaky(rng)
        locs = find_peaks_cwt(x, np.arange(3, 20), min_snr=3.0)
        assert len(locs) == 3
        for c in (100, 250, 400):
            assert np.min(np.abs(locs - c)) <= 6

    def test_custom_wavelet(self, rng):
        x = self._peaky(rng)
        our_w = lambda n, s: np.real(np.asarray(morlet2(int(np.ceil(n)), s)))
        sp_w = lambda n, s: scipy_morlet2(n, s)
        # independent wavelet implementations on each side: ours feeds our
        # find_peaks_cwt, the local stand-in feeds scipy's — agreement
        # requires BOTH the ridge logic and the wavelet itself to match
        ours = find_peaks_cwt(x, np.arange(3, 16), wavelet=our_w)
        want = sps.find_peaks_cwt(x, np.arange(3, 16), wavelet=sp_w)
        np.testing.assert_array_equal(ours, np.asarray(want))

    def test_validation(self):
        with pytest.raises(ValueError):
            find_peaks_cwt(np.ones(32), [])
        with pytest.raises(ValueError):
            find_peaks_cwt(np.ones(32), [2.0, 3.0], max_distances=[1.0])


def scipy_morlet2(n, s):
    # local morlet2 stand-in for the custom-wavelet test (scipy removed
    # theirs); must be real-valued for ridge logic
    num = int(np.ceil(n))
    x = (np.arange(num) - (num - 1) / 2.0) / s
    return np.real((np.pi ** -0.25) * np.sqrt(1 / s) *
                   np.exp(1j * 5.0 * x) * np.exp(-0.5 * x * x))
