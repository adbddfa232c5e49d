"""Savitzky-Golay, Lomb-Scargle, vectorstrength, and 2-D boundary
convolution tests — scipy.signal is the oracle (SURVEY.md §4)."""

import numpy as np
import pytest
import scipy.signal as sps

import jax.numpy as jnp
from nx_signal_tpu.ops.convolution import convolve2d, correlate2d
from nx_signal_tpu.ops.filters import savgol_coeffs, savgol_filter
from nx_signal_tpu.spectral.estimation import lombscargle, vectorstrength
from tests.conftest import assert_all_close


@pytest.mark.parametrize("w,p,d,delta,pos,use", [
    (5, 2, 0, 1.0, None, "conv"),
    (11, 3, 1, 0.5, None, "conv"),
    (9, 4, 2, 2.0, None, "dot"),
    (8, 3, 0, 1.0, None, "conv"),   # even window
    (7, 3, 1, 1.0, 2, "dot"),       # off-center pos
    (5, 2, 3, 1.0, None, "conv"),   # deriv > polyorder -> zeros
])
def test_savgol_coeffs(w, p, d, delta, pos, use):
    got = savgol_coeffs(w, p, deriv=d, delta=delta, pos=pos, use=use,
                        dtype=jnp.float64)
    expected = sps.savgol_coeffs(w, p, deriv=d, delta=delta, pos=pos, use=use)
    assert_all_close(got, expected, atol=1e-10, rtol=1e-10)


@pytest.mark.parametrize("mode", ["interp", "mirror", "nearest", "constant",
                                  "wrap"])
@pytest.mark.parametrize("w,p,d", [(5, 2, 0), (11, 3, 0), (9, 4, 2),
                                   (21, 5, 1)])
def test_savgol_filter(rng, mode, w, p, d):
    x = np.cumsum(rng.standard_normal(200))
    got = savgol_filter(jnp.asarray(x), w, p, deriv=d, mode=mode, delta=0.7)
    expected = sps.savgol_filter(x, w, p, deriv=d, mode=mode, delta=0.7)
    assert_all_close(got, expected, atol=1e-8, rtol=1e-6)


@pytest.mark.parametrize("axis", [-1, 0, 1])
def test_savgol_filter_batched(rng, axis):
    x = np.cumsum(rng.standard_normal((24, 20, 64)), axis=-1)
    got = savgol_filter(jnp.asarray(x), 9, 3, axis=axis)
    expected = sps.savgol_filter(x, 9, 3, axis=axis)
    assert_all_close(got, expected, atol=1e-8, rtol=1e-6)


def test_savgol_filter_validation(rng):
    x = jnp.asarray(rng.standard_normal(32))
    with pytest.raises(ValueError, match="odd"):
        savgol_filter(x, 8, 3)
    with pytest.raises(ValueError, match="polyorder"):
        savgol_filter(x, 5, 5)
    with pytest.raises(ValueError, match="mode"):
        savgol_filter(x, 5, 2, mode="bogus")
    with pytest.raises(ValueError, match="interp"):
        savgol_filter(x, 33, 2, mode="interp")


@pytest.mark.parametrize("precenter", [False, True])
@pytest.mark.parametrize("normalize", [False, True])
def test_lombscargle(rng, precenter, normalize):
    t = np.sort(rng.uniform(0, 10, 300))
    y = np.sin(2 * np.pi * 1.3 * t) + 0.5 * rng.standard_normal(300)
    freqs = np.linspace(0.1, 30, 256)
    got = lombscargle(t, y, freqs, precenter=precenter, normalize=normalize)
    # scipy 1.17 deprecates precenter= (removal in 1.19); center manually
    # for the oracle call — identical semantics (subtract the mean)
    y_oracle = y - y.mean() if precenter else y
    expected = sps.lombscargle(t, y_oracle, freqs, normalize=normalize)
    assert_all_close(got, expected, atol=1e-9 * np.max(np.abs(expected)),
                     rtol=1e-8)


def test_lombscargle_finds_the_tone(rng):
    t = np.sort(rng.uniform(0, 50, 500))
    f0 = 0.7  # Hz
    y = np.sin(2 * np.pi * f0 * t)
    freqs = np.linspace(0.05, 2.0, 400) * 2 * np.pi
    p = np.asarray(lombscargle(t, y, freqs))
    assert abs(freqs[np.argmax(p)] / (2 * np.pi) - f0) < 0.01


def test_vectorstrength(rng):
    ev = rng.uniform(0, 100, 500)
    s, ph = vectorstrength(ev, 7.3)
    s2, ph2 = sps.vectorstrength(ev, 7.3)
    assert float(s) == pytest.approx(s2, abs=1e-10)
    assert float(ph) == pytest.approx(ph2, abs=1e-10)
    s, ph = vectorstrength(ev, [3.0, 7.3, 11.1])
    s2, ph2 = sps.vectorstrength(ev, [3.0, 7.3, 11.1])
    assert_all_close(s, s2, atol=1e-10)
    assert_all_close(ph, ph2, atol=1e-10)
    # perfectly periodic events -> strength 1
    s, _ = vectorstrength(np.arange(20) * 2.5, 2.5)
    assert float(s) == pytest.approx(1.0, abs=1e-6)


SHAPES_2D = [((8, 9), (3, 3)), ((8, 9), (4, 2)), ((5, 5), (5, 5)),
             ((10, 7), (3, 6)), ((4, 4), (7, 7))]


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
@pytest.mark.parametrize("s1,s2", SHAPES_2D)
def test_convolve2d(rng, mode, boundary, s1, s2):
    a = rng.standard_normal(s1)
    b = rng.standard_normal(s2)
    got = convolve2d(a, b, mode=mode, boundary=boundary)
    expected = sps.convolve2d(a, b, mode=mode, boundary=boundary)
    assert got.shape == expected.shape
    assert_all_close(got, expected, atol=1e-5, rtol=1e-5)


def test_convolve2d_fillvalue(rng):
    a = rng.standard_normal((6, 7))
    b = rng.standard_normal((3, 4))
    got = convolve2d(a, b, mode="same", boundary="fill", fillvalue=1.5)
    expected = sps.convolve2d(a, b, mode="same", boundary="fill",
                              fillvalue=1.5)
    assert_all_close(got, expected, atol=1e-5)


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
@pytest.mark.parametrize("s1,s2", SHAPES_2D)
def test_correlate2d(rng, mode, boundary, s1, s2):
    a = rng.standard_normal(s1)
    b = rng.standard_normal(s2)
    got = correlate2d(a, b, mode=mode, boundary=boundary)
    expected = sps.correlate2d(a, b, mode=mode, boundary=boundary)
    assert got.shape == expected.shape
    assert_all_close(got, expected, atol=1e-5, rtol=1e-5)


def test_correlate2d_complex(rng):
    a = rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))
    b = rng.standard_normal((3, 4)) + 1j * rng.standard_normal((3, 4))
    got = correlate2d(a, b, mode="full")
    expected = sps.correlate2d(a, b, mode="full")
    assert_all_close(got, expected, atol=1e-5)
    # valid with swap: scipy pins 'reversed, not conjugated'
    a2 = a[:3, :3]
    b2 = rng.standard_normal((6, 7)) + 1j * rng.standard_normal((6, 7))
    got = correlate2d(a2, b2, mode="valid")
    expected = sps.correlate2d(a2, b2, mode="valid")
    assert_all_close(got, expected, atol=1e-5)


def test_convolve2d_validation(rng):
    with pytest.raises(ValueError, match="rank 2"):
        convolve2d(rng.standard_normal(5), rng.standard_normal((2, 2)))
    with pytest.raises(ValueError, match="boundary"):
        convolve2d(rng.standard_normal((4, 4)), rng.standard_normal((2, 2)),
                   boundary="bogus")
    with pytest.raises(ValueError, match="valid"):
        convolve2d(rng.standard_normal((4, 8)), rng.standard_normal((6, 3)),
                   mode="valid")
