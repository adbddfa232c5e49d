"""Waveform tests: scipy.signal is the oracle (the reference's own test
vectors were generated from scipy; test/nx_signal/waveforms_test.exs:5-82)."""

import numpy as np
import pytest
import scipy.signal as sps

from nx_signal_tpu.ops import waveforms
from nx_signal_tpu.ops.waveforms import gausspulse, sweep_poly
from tests.conftest import assert_all_close

T = np.linspace(0, 10, 101, dtype=np.float64)


@pytest.mark.parametrize("width", [0.0, 0.25, 0.5, 0.77, 1.0])
def test_sawtooth(width):
    got = waveforms.sawtooth(T.astype(np.float32), width=width)
    expected = sps.sawtooth(T, width=width)
    assert_all_close(got, expected, atol=1e-4)


def test_sawtooth_validates_width():
    with pytest.raises(ValueError, match="width must be between 0 and 1"):
        waveforms.sawtooth(T, width=1.5)


@pytest.mark.parametrize("duty", [0.1, 0.5, 1.0])
def test_square(duty):
    t = np.arange(10) * (2 * np.pi / 10)
    got = waveforms.square(t, duty=duty)
    expected = sps.square(t, duty=duty)
    np.testing.assert_array_equal(np.asarray(got), expected.astype(np.int32))


def test_square_time_varying_duty():
    t = np.arange(10) * (2 * np.pi / 10)
    duty = np.array([0.1, 0, 0.3, 0, 0.5, 0, 0.7, 0, 0.9, 0])
    got = waveforms.square(t, duty=duty)
    # reference doctest (waveforms.ex:87-93)
    np.testing.assert_array_equal(np.asarray(got), [1, -1, 1, -1, 1, -1, 1, -1, 1, -1])


def test_gaussian_pulse():
    t = np.linspace(-1, 1, 51)
    got = waveforms.gaussian_pulse(t, center_frequency=1000, bandwidth=0.5)
    i, q, e = sps.gausspulse(t, fc=1000, bw=0.5, retquad=True, retenv=True)
    assert_all_close(got.envelope, e, atol=1e-4)
    assert_all_close(got.in_phase, i, atol=1e-4)
    assert_all_close(got.quadrature, q, atol=1e-4)


def test_gaussian_pulse_validations():
    with pytest.raises(ValueError, match="Center frequency"):
        waveforms.gaussian_pulse(T, center_frequency=-1)
    with pytest.raises(ValueError, match="Bandwidth must be"):
        waveforms.gaussian_pulse(T, bandwidth=0)
    with pytest.raises(ValueError, match="Bandwidth reference level"):
        waveforms.gaussian_pulse(T, bandwidth_reference_level=1)


@pytest.mark.parametrize("method,kwargs", [
    ("linear", {}),
    ("quadratic", {}),
    ("quadratic", {"vertex_zero": False}),
    ("logarithmic", {}),
    ("hyperbolic", {}),
])
def test_chirp(method, kwargs):
    t = np.linspace(0, 10, 100)
    got = waveforms.chirp(t.astype(np.float32), 10.0, 10.0, 1.0, method=method, **kwargs)
    expected = sps.chirp(t, 10.0, 10.0, 1.0, method=method, **kwargs)
    # loose: f32 phase accumulation over many cycles
    assert_all_close(got, expected, atol=5e-3)


def test_chirp_logarithmic_nan():
    got = waveforms.chirp(T, -1.0, 10.0, 1.0, method="logarithmic")
    assert np.all(np.isnan(np.asarray(got)))


def test_chirp_invalid_method():
    with pytest.raises(ValueError, match="invalid method"):
        waveforms.chirp(T, 1.0, 1.0, 1.0, method="nope")


def test_polynomial_sweep():
    t = np.linspace(0, 2, 50)
    coefs = np.array([0.05, -0.75, 2.0, 5.0])
    got = waveforms.polynomial_sweep(t.astype(np.float32), coefs.astype(np.float32))
    expected = sps.sweep_poly(t, np.poly1d(coefs))
    assert_all_close(got, expected, atol=1e-3)


def test_polynomial_sweep_phi_degrees():
    t = np.linspace(0, 1, 20)
    got = waveforms.polynomial_sweep(t, np.array([1.0, 0.0]), phi=180, phi_unit="degrees")
    expected = sps.sweep_poly(t, np.poly1d([1.0, 0.0]), phi=180)
    assert_all_close(got, expected, atol=1e-4)


def test_unit_impulse():
    got = waveforms.unit_impulse(7)
    np.testing.assert_array_equal(np.asarray(got), sps.unit_impulse(7))
    got = waveforms.unit_impulse((3, 5), index="midpoint", dtype=np.int32)
    expected = np.zeros((3, 5), np.int32)
    expected[1, 2] = 1
    np.testing.assert_array_equal(np.asarray(got), expected)
    got = waveforms.unit_impulse((3, 5), index=np.array([[2, 3]]), dtype=np.int32)
    expected = np.zeros((3, 5), np.int32)
    expected[2, 3] = 1
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_sinc():
    t = np.array([0.0, 0.25, 0.5, 1.0, -2.5])
    assert_all_close(waveforms.sinc(t.astype(np.float32)), np.sinc(t), atol=1e-6)


class TestHilbert:
    def test_vs_scipy(self, rng):
        from nx_signal_tpu.ops.transforms import hilbert

        for n in (100, 128, 999, 1024):
            x = rng.normal(size=n)
            got = np.asarray(hilbert(x))
            np.testing.assert_allclose(got, sps.hilbert(x), atol=1e-10)

    def test_envelope(self):
        from nx_signal_tpu.ops.transforms import hilbert

        t = np.arange(8000) / 8000
        msg = 1 + 0.5 * np.sin(2 * np.pi * 5 * t)
        x = (msg * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        env = np.abs(np.asarray(hilbert(x)))
        np.testing.assert_allclose(env[200:-200], msg[200:-200], atol=1e-2)

    def test_rejects_complex(self):
        from nx_signal_tpu.ops.transforms import hilbert

        with pytest.raises(ValueError, match="real input"):
            hilbert(np.zeros(8, np.complex64))


class TestScipyNamedWrappers:
    """scipy-spelled entry points over the reference-shaped generators."""

    def test_gausspulse_vs_scipy(self):
        t = np.linspace(-0.01, 0.01, 401)
        got = np.asarray(gausspulse(t, fc=1000.0, bw=0.5))
        np.testing.assert_allclose(got, sps.gausspulse(t, fc=1000.0, bw=0.5),
                                   atol=1e-6)
        gi, gq, ge = gausspulse(t, fc=500.0, bw=0.4, retquad=True,
                                retenv=True)
        si, sq, se = sps.gausspulse(t, fc=500.0, bw=0.4, retquad=True,
                                    retenv=True)
        np.testing.assert_allclose(np.asarray(gi), si, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gq), sq, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ge), se, atol=1e-6)

    def test_gausspulse_cutoff(self):
        got = gausspulse("cutoff", fc=1000.0, bw=0.5, tpr=-60.0)
        want = sps.gausspulse("cutoff", fc=1000.0, bw=0.5, tpr=-60.0)
        assert abs(got - want) < 1e-12
        with pytest.raises(ValueError, match="cutoff"):
            gausspulse("bogus")

    def test_sweep_poly_vs_scipy(self):
        t = np.linspace(0.0, 2.0, 501)
        coefs = [0.05, -0.75, 2.5, 1.0]
        got = np.asarray(sweep_poly(t, coefs, phi=30.0))
        want = sps.sweep_poly(t, np.poly1d(coefs), phi=30.0)
        np.testing.assert_allclose(got, want, atol=1e-4)
        # np.poly1d input accepted directly
        got2 = np.asarray(sweep_poly(t, np.poly1d(coefs), phi=30.0))
        np.testing.assert_allclose(got2, want, atol=1e-4)

    def test_freqz_sos_alias(self):
        from nx_signal_tpu.ops.filters import freqz_sos, sosfreqz

        sos = sps.butter(4, 0.3, output="sos")
        f1, h1 = sosfreqz(sos, n_freqs=64)
        f2, h2 = freqz_sos(sos, n_freqs=64)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
