"""Spectral estimation vs the scipy.signal oracle (SURVEY.md §4 test
strategy: scipy golden comparisons at the reference's tolerance gate)."""

import numpy as np
import pytest
import scipy.signal as sps

from nx_signal_tpu.spectral import coherence, csd, periodogram, welch


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def rel_close(got, exp, tol=1e-4):
    got = np.asarray(got)
    exp = np.asarray(exp)
    scale = np.max(np.abs(exp)) or 1.0
    np.testing.assert_allclose(got, exp, atol=tol * scale, rtol=tol)


class TestWelch:
    @pytest.mark.parametrize("scaling", ["density", "spectrum"])
    @pytest.mark.parametrize("onesided", [True, False])
    def test_vs_scipy(self, rng, scaling, onesided):
        x = rng.normal(size=4096).astype(np.float32)
        f, p = welch(x, sampling_rate=1000.0, segment_length=256,
                     scaling=scaling, onesided=onesided)
        fe, pe = sps.welch(x.astype(np.float64), fs=1000.0, nperseg=256,
                           scaling=scaling, return_onesided=onesided)
        np.testing.assert_allclose(np.asarray(f), fe, atol=1e-3)
        rel_close(p, pe)

    def test_median_average(self, rng):
        x = rng.normal(size=8192).astype(np.float32)
        f, p = welch(x, sampling_rate=2.0, segment_length=512,
                     average="median")
        fe, pe = sps.welch(x.astype(np.float64), fs=2.0, nperseg=512,
                           average="median")
        rel_close(p, pe)

    def test_no_detrend(self, rng):
        x = (rng.normal(size=4096) + 3.0).astype(np.float32)
        f, p = welch(x, segment_length=256, detrend=False)
        fe, pe = sps.welch(x.astype(np.float64), nperseg=256, detrend=False)
        rel_close(p, pe)

    def test_detrend_removes_dc(self, rng):
        x = rng.normal(size=4096).astype(np.float32)
        _, p0 = welch(x, segment_length=256)
        _, p1 = welch(x + 100.0, segment_length=256)
        rel_close(p1, p0, tol=1e-3)

    @pytest.mark.parametrize("detrend", ["constant", "linear"])
    def test_detrend_modes_vs_scipy(self, rng, detrend):
        # signal with a strong trend so the detrend visibly matters
        x = (rng.normal(size=4096) + np.linspace(0.0, 30.0, 4096)
             ).astype(np.float32)
        f, p = welch(x, sampling_rate=500.0, segment_length=256,
                     detrend=detrend)
        fe, pe = sps.welch(x.astype(np.float64), fs=500.0, nperseg=256,
                           detrend=detrend)
        np.testing.assert_allclose(np.asarray(f), fe, atol=1e-3)
        rel_close(p, pe)

    def test_detrend_linear_odd_geometry(self, rng):
        x = (rng.normal(size=3000) + 0.01 * np.arange(3000)
             ).astype(np.float32)
        f, p = welch(x, segment_length=200, overlap_length=37,
                     fft_length=256, detrend="linear")
        fe, pe = sps.welch(x.astype(np.float64), nperseg=200, noverlap=37,
                           nfft=256, detrend="linear")
        rel_close(p, pe)

    def test_detrend_callable(self, rng):
        x = (rng.normal(size=2048) + 5.0).astype(np.float32)

        def dt(seg):
            return seg - seg.mean(axis=-1, keepdims=True)

        f, p = welch(x, segment_length=256, detrend=dt)
        fe, pe = sps.welch(x.astype(np.float64), nperseg=256,
                           detrend=lambda s: s - s.mean(axis=-1,
                                                        keepdims=True))
        rel_close(p, pe)

    def test_overlap_and_nfft(self, rng):
        x = rng.normal(size=4000).astype(np.float32)
        f, p = welch(x, sampling_rate=100.0, segment_length=200,
                     overlap_length=150, fft_length=256)
        fe, pe = sps.welch(x.astype(np.float64), fs=100.0, nperseg=200,
                           noverlap=150, nfft=256)
        np.testing.assert_allclose(np.asarray(f), fe, atol=1e-3)
        rel_close(p, pe)

    def test_array_window(self, rng):
        x = rng.normal(size=2048).astype(np.float32)
        w = sps.get_window("blackman", 128, fftbins=True)
        f, p = welch(x, window=w.astype(np.float32))
        fe, pe = sps.welch(x.astype(np.float64), window=w, nperseg=128)
        rel_close(p, pe)

    def test_batched_channels(self, rng):
        x = rng.normal(size=(3, 2048)).astype(np.float32)
        f, p = welch(x, segment_length=256)
        assert np.asarray(p).shape == (3, 129)
        for ch in range(3):
            _, pe = sps.welch(x[ch].astype(np.float64), nperseg=256)
            rel_close(np.asarray(p)[ch], pe)

    def test_sine_peak_location(self, rng):
        fs = 1000.0
        t = np.arange(8192) / fs
        x = np.sin(2 * np.pi * 123.0 * t).astype(np.float32)
        f, p = welch(x, sampling_rate=fs, segment_length=1024)
        peak = float(np.asarray(f)[int(np.argmax(np.asarray(p)))])
        assert abs(peak - 123.0) < fs / 1024

    def test_errors(self, rng):
        x = rng.normal(size=512).astype(np.float32)
        with pytest.raises(ValueError, match="scaling"):
            welch(x, segment_length=128, scaling="bogus")
        with pytest.raises(ValueError, match="average"):
            welch(x, segment_length=128, average="bogus")
        with pytest.raises(ValueError, match="detrend"):
            welch(x, segment_length=128, detrend="quadratic")
        with pytest.raises(ValueError, match="overlap_length"):
            welch(x, segment_length=128, overlap_length=128)
        with pytest.raises(ValueError, match="fft_length"):
            welch(x, segment_length=128, fft_length=64)
        with pytest.raises(ValueError, match="exceeds signal length"):
            welch(x, segment_length=1024)
        with pytest.raises(ValueError, match="onesided"):
            welch(x.astype(np.complex64), segment_length=128)


class TestPeriodogram:
    @pytest.mark.parametrize("window", ["rectangular", "hann"])
    def test_vs_scipy(self, rng, window):
        x = rng.normal(size=1024).astype(np.float32)
        f, p = periodogram(x, sampling_rate=100.0, window=window)
        scipy_win = "boxcar" if window == "rectangular" else window
        fe, pe = sps.periodogram(x.astype(np.float64), fs=100.0,
                                 window=scipy_win)
        np.testing.assert_allclose(np.asarray(f), fe, atol=1e-3)
        rel_close(p, pe)

    def test_parseval(self, rng):
        # integral of the PSD approximates the signal variance
        x = rng.normal(size=4096).astype(np.float32)
        f, p = periodogram(x, sampling_rate=1.0)
        total = np.trapezoid(np.asarray(p), np.asarray(f))
        assert abs(total - np.var(x)) < 0.05 * np.var(x)


class TestCSD:
    def test_vs_scipy(self, rng):
        x = rng.normal(size=4096).astype(np.float32)
        y = (0.5 * x + 0.1 * rng.normal(size=4096)).astype(np.float32)
        f, p = csd(x, y, sampling_rate=10.0, segment_length=256)
        fe, pe = sps.csd(x.astype(np.float64), y.astype(np.float64),
                         fs=10.0, nperseg=256)
        rel_close(np.real(np.asarray(p)), np.real(pe))
        rel_close(np.imag(np.asarray(p)), np.imag(pe),
                  tol=1e-3)  # imag part is near-cancelling noise

    def test_complex_twosided(self, rng):
        x = (rng.normal(size=2048) + 1j * rng.normal(size=2048)).astype(
            np.complex64)
        f, p = csd(x, x, segment_length=256, onesided=False)
        fe, pe = sps.csd(x.astype(np.complex128), x.astype(np.complex128),
                         nperseg=256, return_onesided=False)
        np.testing.assert_allclose(np.asarray(f), fe, atol=1e-6)
        rel_close(np.real(np.asarray(p)), np.real(pe))

    def test_welch_is_csd_diag(self, rng):
        x = rng.normal(size=2048).astype(np.float32)
        _, pw = welch(x, segment_length=256)
        _, pc = csd(x, x, segment_length=256)
        np.testing.assert_allclose(np.asarray(pw), np.real(np.asarray(pc)),
                                   rtol=1e-6)


class TestCoherence:
    def test_vs_scipy(self, rng):
        x = rng.normal(size=8192).astype(np.float32)
        y = (x + 0.5 * rng.normal(size=8192)).astype(np.float32)
        f, c = coherence(x, y, sampling_rate=1000.0, segment_length=256)
        fe, ce = sps.coherence(x.astype(np.float64), y.astype(np.float64),
                               fs=1000.0, nperseg=256)
        rel_close(c, ce, tol=1e-3)

    def test_bounds_and_identity(self, rng):
        x = rng.normal(size=4096).astype(np.float32)
        _, c = coherence(x, x, segment_length=256)
        np.testing.assert_allclose(np.asarray(c), 1.0, atol=1e-4)
        y = rng.normal(size=4096).astype(np.float32)
        _, c2 = coherence(x, y, segment_length=256)
        c2 = np.asarray(c2)
        assert np.all(c2 >= 0.0) and np.all(c2 <= 1.0 + 1e-6)
