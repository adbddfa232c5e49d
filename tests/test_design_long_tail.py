"""scipy.signal long-tail design surface: tf-domain lowpass transforms
(lp2lp/lp2hp/lp2bp/lp2bs), sos2zpk, lfiltic, analog/zpk frequency
responses (freqs/freqs_zpk/freqz_zpk), CZT/ZoomFFT class forms and
czt_points, BadCoefficients. scipy is the oracle throughout. All new
relative to the reference (nx_signal has no IIR/analog design surface)."""

import numpy as np
import pytest
import scipy.signal as sps

from nx_signal_tpu.ops.czt import CZT, ZoomFFT, czt_points
from nx_signal_tpu.ops.filters import freqs, freqs_zpk, freqz_zpk
from nx_signal_tpu.ops.iir import lfilter, lfiltic
from nx_signal_tpu.ops.iir_design import (
    butter, cheby1, ellip, lp2bp, lp2bs, lp2hp, lp2lp, sos2zpk, tf2zpk,
)
from nx_signal_tpu.ops.ltisys import BadCoefficients, normalize
from tests.conftest import assert_all_close


def _tf_response_close(ba1, ba2, atol=1e-8):
    """Compare two analog transfer functions by response on a shared grid
    (coefficient vectors may differ by a common scale/trailing zeros)."""
    w = np.logspace(-2, 2, 101)
    _, h1 = sps.freqs(np.asarray(ba1[0]), np.asarray(ba1[1]), worN=w)
    _, h2 = sps.freqs(np.asarray(ba2[0]), np.asarray(ba2[1]), worN=w)
    np.testing.assert_allclose(h1, h2, atol=atol, rtol=1e-7)


class TestLp2Tf:
    # prototype systems: generic rational, all-pole, improper-free pairs
    SYSTEMS = [
        ([1.0], [1.0, np.sqrt(2.0), 1.0]),
        ([1.0, 0.5], [1.0, 2.0, 2.0, 1.0]),
        ([2.0, 0.0, 1.0], [1.0, 1.2, 0.9, 0.3]),
    ]

    @pytest.mark.parametrize("b,a", SYSTEMS)
    @pytest.mark.parametrize("wo", [1.0, 0.35, 4.2])
    def test_lp2lp(self, b, a, wo):
        _tf_response_close(lp2lp(b, a, wo), sps.lp2lp(b, a, wo))

    @pytest.mark.parametrize("b,a", SYSTEMS)
    @pytest.mark.parametrize("wo", [1.0, 0.35, 4.2])
    def test_lp2hp(self, b, a, wo):
        _tf_response_close(lp2hp(b, a, wo), sps.lp2hp(b, a, wo))

    @pytest.mark.parametrize("b,a", SYSTEMS)
    @pytest.mark.parametrize("wo,bw", [(1.0, 1.0), (2.0, 0.5), (0.7, 1.3)])
    def test_lp2bp(self, b, a, wo, bw):
        _tf_response_close(lp2bp(b, a, wo, bw), sps.lp2bp(b, a, wo, bw))

    @pytest.mark.parametrize("b,a", SYSTEMS)
    @pytest.mark.parametrize("wo,bw", [(1.0, 1.0), (2.0, 0.5), (0.7, 1.3)])
    def test_lp2bs(self, b, a, wo, bw):
        _tf_response_close(lp2bs(b, a, wo, bw), sps.lp2bs(b, a, wo, bw))


class TestSos2Zpk:
    @pytest.mark.parametrize("sos", [
        sps.butter(6, 0.3, output="sos"),
        sps.ellip(5, 0.5, 40, [0.2, 0.6], btype="bandpass", output="sos"),
        np.array([[1.0, 0.5, 0.0, 1.0, -0.3, 0.0]]),  # first-order section
    ])
    def test_vs_scipy(self, sos):
        z, p, k = sos2zpk(sos)
        zs, ps, ks = sps.sos2zpk(sos)
        assert len(z) == len(zs) and len(p) == len(ps)
        np.testing.assert_allclose(sorted(z, key=lambda r: (r.real, r.imag)),
                                   sorted(zs, key=lambda r: (r.real, r.imag)),
                                   atol=1e-10)
        np.testing.assert_allclose(sorted(p, key=lambda r: (r.real, r.imag)),
                                   sorted(ps, key=lambda r: (r.real, r.imag)),
                                   atol=1e-10)
        np.testing.assert_allclose(k, ks, atol=1e-12)

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            sos2zpk(np.zeros((2, 5)))


class TestLfiltic:
    @pytest.mark.parametrize("b,a", [
        (sps.butter(4, 0.25)), (sps.cheby1(3, 1.0, 0.4)),
        ([0.5, 0.25], [1.0, -0.5]),
        ([1.0, 2.0, 3.0, 4.0], [1.0, -0.2]),  # M > N
    ])
    def test_vs_scipy(self, b, a, rng):
        y = rng.normal(size=6)
        x = rng.normal(size=6)
        np.testing.assert_allclose(lfiltic(b, a, y, x),
                                   sps.lfiltic(b, a, y, x), atol=1e-12)
        np.testing.assert_allclose(lfiltic(b, a, y),
                                   sps.lfiltic(b, a, y), atol=1e-12)

    def test_short_histories_zero_extended(self):
        b, a = sps.butter(5, 0.3)
        np.testing.assert_allclose(lfiltic(b, a, [1.0], [2.0]),
                                   sps.lfiltic(b, a, [1.0], [2.0]),
                                   atol=1e-12)

    def test_continuation(self, rng):
        # filtering the second half with lfiltic-derived state must equal
        # filtering the whole signal at once
        b, a = sps.butter(3, 0.2)
        x = rng.normal(size=64)
        full = np.asarray(lfilter(b, a, x))
        split = 40
        n_hist = max(len(a), len(b)) - 1
        zi = lfiltic(b, a, full[split - n_hist:split][::-1],
                     x[split - n_hist:split][::-1])
        tail, _ = lfilter(b, a, x[split:], zi=zi)
        assert_all_close(tail, full[split:], atol=1e-5, rtol=1e-5)

    def test_unnormalized_a0(self):
        np.testing.assert_allclose(
            lfiltic([1.0, 0.5], [2.0, -0.6], [1.0], [1.0]),
            sps.lfiltic([1.0, 0.5], [2.0, -0.6], [1.0], [1.0]), atol=1e-12)


class TestAnalogResponses:
    def test_freqs_auto_grid(self):
        b, a = butter(4, 100.0, analog=True)
        w, h = freqs(b, a, 150)
        ws, hs = sps.freqs(np.asarray(b), np.asarray(a), 150)
        np.testing.assert_allclose(np.asarray(w), ws, rtol=1e-10)
        assert_all_close(h, hs, atol=1e-6, rtol=1e-6)

    def test_freqs_explicit_grid(self):
        b, a = cheby1(5, 1.0, 30.0, analog=True)
        grid = np.logspace(0, 3, 77)
        w, h = freqs(b, a, grid)
        _, hs = sps.freqs(np.asarray(b), np.asarray(a), grid)
        assert_all_close(h, hs, atol=1e-6, rtol=1e-6)

    def test_freqs_zpk(self):
        z, p, k = ellip(4, 0.5, 40.0, 50.0, analog=True, output="zpk")
        grid = np.logspace(0, 3, 61)
        _, h = freqs_zpk(z, p, k, grid)
        _, hs = sps.freqs_zpk(z, p, k, grid)
        assert_all_close(h, hs, atol=1e-6, rtol=1e-6)
        # auto grid: same findfreqs range as scipy
        w_auto, _ = freqs_zpk(z, p, k, 40)
        ws_auto, _ = sps.freqs_zpk(z, p, k, 40)
        np.testing.assert_allclose(np.asarray(w_auto), ws_auto, rtol=1e-10)

    @pytest.mark.parametrize("whole", [False, True])
    def test_freqz_zpk(self, whole):
        z, p, k = butter(6, 0.35, output="zpk")
        f, h = freqz_zpk(z, p, k, n_freqs=256, whole=whole)
        ws, hs = sps.freqz_zpk(z, p, k, worN=256, whole=whole)
        np.testing.assert_allclose(2 * np.pi * np.asarray(f) / 2.0, ws,
                                   atol=1e-9)
        assert_all_close(h, hs, atol=1e-5, rtol=1e-5)

    def test_freqz_zpk_no_zeros(self):
        # pure all-pole system: empty z
        _, h = freqz_zpk(np.array([]), np.array([0.5 + 0.1j, 0.5 - 0.1j]),
                         2.0, n_freqs=64)
        _, hs = sps.freqz_zpk([], [0.5 + 0.1j, 0.5 - 0.1j], 2.0, worN=64)
        assert_all_close(h, hs, atol=1e-6, rtol=1e-6)


class TestCztClasses:
    def test_czt_points(self):
        for m, w, a in [(10, None, 1.0 + 0.0j),
                        (7, np.exp(-0.02 - 2j * np.pi / 7), 0.9 * np.exp(0.2j)),
                        (16, np.exp(-2j * np.pi / 31), 1.0 + 0.0j)]:
            assert_all_close(czt_points(m, w, a), sps.czt_points(m, w, a),
                             atol=1e-6, rtol=1e-6)

    def test_czt_class_matches_function_and_scipy(self, rng):
        x = rng.normal(size=(3, 64)) + 1j * rng.normal(size=(3, 64))
        w = np.exp(-2j * np.pi / 50)
        a = np.exp(0.15j)
        transform = CZT(64, 50, w, a)
        ours = transform(x)
        theirs = sps.CZT(64, 50, w, a)(x)
        assert_all_close(ours, theirs, atol=1e-4, rtol=1e-4)
        assert_all_close(transform.points(), sps.CZT(64, 50, w, a).points(),
                         atol=1e-6, rtol=1e-6)

    def test_czt_class_length_check(self, rng):
        transform = CZT(32)
        with pytest.raises(ValueError):
            transform(rng.normal(size=31))

    def test_zoom_fft_class(self, rng):
        x = rng.normal(size=128)
        transform = ZoomFFT(128, [0.1, 0.3], 40, fs=2.0)
        theirs = sps.ZoomFFT(128, [0.1, 0.3], 40, fs=2)(x)
        assert_all_close(transform(x), theirs, atol=1e-4, rtol=1e-4)
        assert transform.f1 == pytest.approx(0.1)
        assert transform.f2 == pytest.approx(0.3)

    def test_zoom_fft_class_scalar_band(self, rng):
        x = rng.normal(size=100)
        assert_all_close(ZoomFFT(100, 0.8)(x), sps.ZoomFFT(100, 0.8)(x),
                         atol=1e-4, rtol=1e-4)


class TestBadCoefficients:
    def test_warns_on_leading_zero_numerator(self):
        with pytest.warns(BadCoefficients):
            b, a = normalize([0.0, 1.0, 0.5], [1.0, -0.3, 0.1])
        np.testing.assert_allclose(b, [1.0, 0.5])

    def test_clean_numerator_does_not_warn(self):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error", BadCoefficients)
            normalize([1.0, 0.5], [1.0, -0.3])
