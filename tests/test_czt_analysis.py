"""Chirp-Z transform, zoom FFT, and filter analysis (freqz/sosfreqz/
group_delay) — scipy.signal oracle, with a direct-definition f64 oracle
for czt off the unit circle where scipy's own Bluestein loses all accuracy
(see ops/czt.py docstring). All new relative to the reference."""

import numpy as np
import pytest
import scipy.signal as sps

import jax

import nx_signal_tpu.ops.czt as czt_mod
from nx_signal_tpu.ops.czt import czt, zoom_fft
from nx_signal_tpu.ops.filters import freqz, group_delay, sosfreqz
from tests.conftest import assert_all_close


def czt_direct(x, m, w, a):
    """O(nm) direct-definition oracle in f64."""
    x = np.asarray(x, dtype=complex)
    n = np.arange(x.shape[-1], dtype=np.float64)
    k = np.arange(m, dtype=np.float64)
    weights = (a ** (-n))[:, None] * w ** (n[:, None] * k[None, :])
    return x @ weights


class TestCZT:
    def test_default_is_fft(self, rng):
        x = rng.normal(size=(2, 100)) + 1j * rng.normal(size=(2, 100))
        assert_all_close(czt(x), np.fft.fft(x, axis=-1), atol=1e-5, rtol=1e-5)

    def test_unit_circle_vs_scipy(self, rng):
        x = rng.normal(size=128)
        w = np.exp(-2j * np.pi / 57)
        a = np.exp(0.1j)
        assert_all_close(czt(x, 57, w, a), sps.czt(x, 57, w, a),
                         atol=1e-5, rtol=1e-5)

    def test_spiral_vs_direct(self, rng):
        # |w| != 1: scipy's Bluestein is catastrophically inaccurate here
        # (chirps span e^(+-|log w| n^2/2)); gate against the direct oracle
        x = rng.normal(size=(2, 100)) + 1j * rng.normal(size=(2, 100))
        w = np.exp(-0.01 - 2j * np.pi / 37)
        a = 0.98 * np.exp(0.3j)
        assert_all_close(czt(x, 37, w, a), czt_direct(x, 37, w, a),
                         atol=1e-5, rtol=1e-5)

    def test_bluestein_path(self, rng, monkeypatch):
        monkeypatch.setattr(czt_mod, "_MAX_MATMUL_NM", 1)
        x = rng.normal(size=(2, 100)) + 1j * rng.normal(size=(2, 100))
        assert_all_close(czt(x), np.fft.fft(x, axis=-1), atol=1e-5, rtol=1e-5)
        w = np.exp(-2j * np.pi / 57)
        assert_all_close(czt(x, 57, w, np.exp(0.1j)),
                         sps.czt(x, 57, w, np.exp(0.1j)), atol=1e-5, rtol=1e-5)

    def test_axis(self, rng):
        x = rng.normal(size=(50, 3))
        got = czt(x, 20, axis=0)
        want = sps.czt(x, 20, axis=0)
        assert_all_close(got, want, atol=1e-5, rtol=1e-5)

    def test_validation(self):
        with pytest.raises(ValueError, match="positive"):
            czt(np.zeros(8), 0)

    def test_jit(self, rng):
        x = rng.normal(size=64)
        got = jax.jit(lambda s: czt(s, 32))(x)
        assert_all_close(got, sps.czt(x, 32), atol=1e-5, rtol=1e-5)


class TestZoomFFT:
    def test_band_parity(self, rng):
        x = rng.normal(size=512)
        assert_all_close(zoom_fft(x, [0.1, 0.4], 128, fs=2.0),
                         sps.zoom_fft(x, [0.1, 0.4], 128, fs=2.0),
                         atol=1e-5, rtol=1e-5)

    def test_scalar_fn(self, rng):
        x = rng.normal(size=256)
        assert_all_close(zoom_fft(x, 0.5, 64), sps.zoom_fft(x, 0.5, 64),
                         atol=1e-5, rtol=1e-5)

    def test_endpoint(self, rng):
        x = rng.normal(size=256)
        assert_all_close(
            zoom_fft(x, [0.2, 0.3], 33, fs=2.0, endpoint=True),
            sps.zoom_fft(x, [0.2, 0.3], 33, fs=2.0, endpoint=True),
            atol=1e-5, rtol=1e-5,
        )

    def test_matches_padded_fft(self, rng):
        # zoom over [0, Nyquist) with m = N/2 lands on the FFT bin grid
        x = rng.normal(size=128)
        got = np.asarray(zoom_fft(x, [0.0, 1.0], 64, fs=2.0))
        want = np.fft.fft(x)[:64]
        assert_all_close(got, want, atol=1e-5, rtol=1e-5)

    def test_validation(self):
        with pytest.raises(ValueError, match="fs/2"):
            zoom_fft(np.zeros(64), [0.5, 1.5], 32, fs=2.0)
        with pytest.raises(ValueError, match="pair"):
            zoom_fft(np.zeros(64), [0.1, 0.2, 0.3], 32)


class TestFilterAnalysis:
    def test_freqz_ba(self):
        b, a = sps.cheby1(5, 1.0, 0.4)
        f, h = freqz(b, a, n_freqs=512)
        w_ref, h_ref = sps.freqz(b, a, worN=512, fs=2.0)
        assert_all_close(f, w_ref, atol=1e-10, rtol=1e-10)
        assert_all_close(h, h_ref, atol=1e-10, rtol=1e-8)

    def test_freqz_whole(self):
        b = sps.firwin(31, 0.3)
        f, h = freqz(b, n_freqs=256, whole=True, sampling_rate=8000.0)
        w_ref, h_ref = sps.freqz(b, worN=256, whole=True, fs=8000.0)
        assert_all_close(f, w_ref, atol=1e-8, rtol=1e-8)
        assert_all_close(h, h_ref, atol=1e-10, rtol=1e-8)

    def test_sosfreqz(self):
        sos = sps.butter(8, 0.3, output="sos")
        f, h = sosfreqz(sos, n_freqs=512)
        _, h_ref = sps.sosfreqz(sos, worN=512, fs=2.0)
        assert_all_close(h, h_ref, atol=1e-10, rtol=1e-8)
        with pytest.raises(ValueError, match="n_sections"):
            sosfreqz(np.zeros((2, 5)))

    def test_group_delay_fir(self):
        # linear-phase FIR: constant delay (M-1)/2
        b = sps.firwin(31, 0.4)
        f, gd = group_delay(b, n_freqs=256)
        _, gd_ref = sps.group_delay((b, [1.0]), w=256, fs=2.0)
        assert_all_close(gd, gd_ref, atol=1e-5, rtol=1e-5)
        passband = np.asarray(f) < 0.3
        assert_all_close(np.asarray(gd)[passband], 15.0, atol=1e-5)

    def test_group_delay_iir(self):
        b, a = sps.cheby1(5, 1.0, 0.4)
        f, gd = group_delay(b, a, n_freqs=512)
        _, gd_ref = sps.group_delay((b, a), w=512, fs=2.0)
        # deep-stopband nulls are ill-conditioned for any evaluator (|C|^2 ~
        # 1e-12 in f64); gate tightly only where the response is live
        _, h = sps.freqz(b, a, worN=512)
        live = np.abs(h) > 1e-4 * np.abs(h).max()
        np.testing.assert_allclose(np.asarray(gd)[live], gd_ref[live],
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gd), gd_ref, atol=0.05, rtol=0.05)
