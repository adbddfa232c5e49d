"""FIR design (beyond firwin) tests: scipy.signal is the oracle.

kaiserord/firwin2/firls/minimum_phase match scipy to near machine
precision. remez is gated on *optimality*: both implementations are
grid-limited approximations of the continuum minimax optimum, so taps are
compared loosely and the real gate is that our achieved minimax error is
no worse than scipy's (ratio <= 1.01)."""

import numpy as np
import pytest
import scipy.signal as sps

import jax.numpy as jnp
from nx_signal_tpu.ops import fir_design as fd
from nx_signal_tpu.ops.filters import firwin_2d
from tests.conftest import assert_all_close


@pytest.mark.parametrize("ripple,width", [(65, 0.05), (21.5, 0.1), (30, 0.02),
                                          (80, 0.08)])
def test_kaiserord(ripple, width):
    nt, beta = fd.kaiserord(ripple, width)
    nt2, beta2 = sps.kaiserord(ripple, width)
    assert nt == nt2
    assert beta == pytest.approx(beta2, abs=1e-12)


def test_kaiser_helpers():
    assert fd.kaiser_beta(65) == pytest.approx(sps.kaiser_beta(65), abs=1e-12)
    assert fd.kaiser_beta(30) == pytest.approx(sps.kaiser_beta(30), abs=1e-12)
    assert fd.kaiser_beta(10) == 0.0
    assert fd.kaiser_atten(101, 0.03) == pytest.approx(
        sps.kaiser_atten(101, 0.03), abs=1e-12)
    with pytest.raises(ValueError, match="too small"):
        fd.kaiserord(5, 0.1)


FIRWIN2_CASES = [
    (129, [0.0, 0.3, 0.5, 1.0], [1.0, 1.0, 0.0, 0.0], {}),
    (128, [0.0, 0.3, 0.5, 1.0], [1.0, 1.0, 0.0, 0.0], {}),
    (65, [0.0, 0.2, 0.2, 0.6, 0.6, 1.0], [0.0, 0.0, 1.0, 1.0, 0.0, 0.0], {}),
    (101, [0.0, 0.5, 1.0], [0.0, 1.0, 0.0], dict(antisymmetric=True)),
    (100, [0.0, 0.5, 1.0], [0.0, 1.0, 1.0], dict(antisymmetric=True)),
]


@pytest.mark.parametrize("nt,f,g,kw", FIRWIN2_CASES)
def test_firwin2(nt, f, g, kw):
    got = fd.firwin2(nt, f, g, dtype=jnp.float64, **kw)
    expected = sps.firwin2(nt, f, g, **kw)
    assert_all_close(got, expected, atol=1e-10, rtol=1e-10)


def test_firwin2_kaiser_window():
    got = fd.firwin2(33, [0.0, 1.0], [1.0, 0.0], window=("kaiser", 8.0),
                     dtype=jnp.float64)
    expected = sps.firwin2(33, [0.0, 1.0], [1.0, 0.0], window=("kaiser", 8.0))
    # our kaiser I0 path evaluates in f32 internally
    assert_all_close(got, expected, atol=1e-6)


def test_firwin2_hz_units():
    got = fd.firwin2(65, [0.0, 2000.0, 3000.0, 8000.0], [1.0, 1.0, 0.0, 0.0],
                     sampling_rate=16000.0, dtype=jnp.float64)
    expected = sps.firwin2(65, [0.0, 2000.0, 3000.0, 8000.0],
                           [1.0, 1.0, 0.0, 0.0], fs=16000.0)
    assert_all_close(got, expected, atol=1e-10)


def test_firwin2_validation():
    with pytest.raises(ValueError, match="start with 0"):
        fd.firwin2(65, [0.1, 1.0], [1.0, 0.0])
    with pytest.raises(ValueError, match="Type II"):
        fd.firwin2(64, [0.0, 1.0], [1.0, 1.0])
    with pytest.raises(ValueError, match="Type IV"):
        fd.firwin2(64, [0.0, 1.0], [1.0, 1.0], antisymmetric=True)
    with pytest.raises(ValueError, match="Type III"):
        fd.firwin2(65, [0.0, 1.0], [1.0, 1.0], antisymmetric=True)
    with pytest.raises(ValueError, match="nondecreasing"):
        fd.firwin2(65, [0.0, 0.5, 0.4, 1.0], [1.0, 1.0, 0.0, 0.0])


FIRLS_CASES = [
    (11, [0, 0.1, 0.4, 0.5], [1, 1, 0, 0], None),
    (31, [0, 0.2, 0.3, 0.8, 0.9, 1.0], [0, 0, 1, 1, 0, 0], [1.0, 2.0, 0.5]),
    (101, [0, 0.5, 0.55, 1.0], [1, 0.8, 0, 0], None),
]


@pytest.mark.parametrize("nt,b,d,w", FIRLS_CASES)
def test_firls(nt, b, d, w):
    got = fd.firls(nt, b, d, weight=w, dtype=jnp.float64)
    expected = sps.firls(nt, b, d, weight=w)
    assert_all_close(got, expected, atol=1e-7, rtol=1e-6)


def test_firls_hz_units():
    got = fd.firls(31, [0, 1000, 2000, 8000], [1, 1, 0, 0],
                   sampling_rate=16000.0, dtype=jnp.float64)
    expected = sps.firls(31, [0, 1000, 2000, 8000], [1, 1, 0, 0], fs=16000.0)
    assert_all_close(got, expected, atol=1e-10)


def test_firls_validation():
    with pytest.raises(ValueError, match="odd"):
        fd.firls(10, [0, 0.5, 0.6, 1.0], [1, 1, 0, 0])
    with pytest.raises(ValueError, match="pairs"):
        fd.firls(11, [0, 0.5, 0.6], [1, 1, 0])


REMEZ_CASES = [
    (72, [0, 0.1, 0.2, 0.5], [1, 0], [1.0, 1.0]),
    (73, [0, 0.1, 0.2, 0.5], [1, 0], [1.0, 1.0]),
    (65, [0, 0.1, 0.15, 0.35, 0.4, 0.5], [0, 1, 0], [1.0, 1.0, 1.0]),
    (21, [0, 0.2, 0.3, 0.5], [1, 0], [1.0, 2.0]),
    (64, [0, 0.15, 0.25, 0.5], [1, 0], [1.0, 1.0]),
    (18, [0, 0.15, 0.3, 0.5], [1, 0], [1.0, 1.0]),
]


def _minimax_err(h, bands, desired, weight):
    errs = []
    for (lo, hi), d, w in zip(np.reshape(bands, (-1, 2)), desired, weight):
        f = np.linspace(lo, hi, 4000)
        _, resp = sps.freqz(h, worN=2 * np.pi * f)
        errs.append(np.max(w * np.abs(np.abs(resp) - d)))
    return max(errs)


@pytest.mark.parametrize("nt,b,d,w", REMEZ_CASES)
def test_remez_optimality(nt, b, d, w):
    got = np.asarray(fd.remez(nt, b, d, weight=w, sampling_rate=1.0,
                              dtype=jnp.float64))
    expected = sps.remez(nt, b, d, weight=w, fs=1.0)
    # taps agree to grid resolution; the real gate is minimax optimality
    np.testing.assert_allclose(got, expected, atol=2e-3)
    e_ours = _minimax_err(got, b, d, w)
    e_scipy = _minimax_err(expected, b, d, w)
    assert e_ours <= e_scipy * 1.01, (e_ours, e_scipy)
    # linear phase: symmetric taps
    np.testing.assert_allclose(got, got[::-1], atol=1e-12)


def test_remez_validation():
    with pytest.raises(ValueError, match="pairs"):
        fd.remez(33, [0, 0.1, 0.2], [1, 0])
    with pytest.raises(ValueError, match="one gain per band"):
        fd.remez(33, [0, 0.1, 0.2, 0.5], [1, 0, 1], sampling_rate=1.0)
    with pytest.raises(ValueError, match="Nyquist"):
        fd.remez(32, [0, 0.2, 0.3, 0.5], [0, 1], sampling_rate=1.0)


def test_minimum_phase():
    h = sps.remez(151, [0, 0.2, 0.3, 0.5], [1, 0], fs=1.0)
    got = fd.minimum_phase(h, dtype=jnp.float64)
    expected = sps.minimum_phase(h, method="homomorphic")
    assert got.shape == expected.shape
    assert_all_close(got, expected, atol=1e-8)
    # minimum-phase property: all zeros at or inside the unit circle
    roots = np.roots(np.asarray(got))
    assert np.all(np.abs(roots) <= 1.0 + 1e-6)


class TestFirwin2D:
    """firwin_2d vs scipy (separable and circular modes)."""

    def test_separable(self):
        ours = np.asarray(firwin_2d((5, 7), ("hamming", "hann"), fc=0.4))
        ref = sps.firwin_2d((5, 7), ("hamming", "hann"), fc=0.4)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_separable_kaiser(self):
        ours = np.asarray(firwin_2d((9, 9), (("kaiser", 5.0), "blackman"),
                                    fc=0.3))
        ref = sps.firwin_2d((9, 9), (("kaiser", 5.0), "blackman"), fc=0.3)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_circular(self):
        ours = np.asarray(firwin_2d((9, 9), "hamming", fc=0.4, circular=True))
        ref = sps.firwin_2d((9, 9), "hamming", fc=0.4, circular=True)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_circular_nonsquare_shape(self):
        ours = np.asarray(firwin_2d((5, 8), "hamming", fc=0.4, circular=True))
        ref = sps.firwin_2d((5, 8), "hamming", fc=0.4, circular=True)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_dc_gain(self):
        h = np.asarray(firwin_2d((11, 11), ("hamming", "hamming"), fc=0.5))
        np.testing.assert_allclose(h.sum(), 1.0, atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            firwin_2d((5,), ("hamming", "hamming"), fc=0.4)
        with pytest.raises(ValueError):
            firwin_2d((5, 5), "hamming", fc=None, circular=True)
        with pytest.raises(ValueError):
            firwin_2d((5, 5), "hamming", fc=0.4)  # single spec, separable
        with pytest.raises(ValueError):
            firwin_2d((5, 5), ("hamming", "hamming"), fc=0.4,
                      pass_zero="sideways")
