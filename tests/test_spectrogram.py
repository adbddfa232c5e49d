"""spectrogram() vs scipy.signal.spectrogram (matched window/boundary
settings: scipy with boundary=None, padded=False equals our 'valid'
framing)."""

import numpy as np
import pytest
import scipy.signal as sps

from nx_signal_tpu.spectral.spectrogram import spectrogram


def test_psd_vs_scipy(rng):
    fs = 8000.0
    x = rng.normal(size=8000).astype(np.float32)
    f, t, got = spectrogram(x, fs, window_length=256, overlap_length=32, mode="psd")
    f_s, t_s, exp = sps.spectrogram(
        x, fs=fs, window=sps.windows.hann(256, sym=False), nperseg=256,
        noverlap=32, detrend=False, mode="psd",
    )
    assert got.shape == exp.shape
    np.testing.assert_allclose(np.asarray(f), f_s, atol=1e-3)
    scale = np.abs(exp).max()
    np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5 * scale)


def test_magnitude_is_abs_of_complex(rng):
    x = rng.normal(size=4096).astype(np.float32)
    _, _, mag = spectrogram(x, 1000.0, window_length=128, mode="magnitude")
    _, _, z = spectrogram(x, 1000.0, window_length=128, mode="complex")
    np.testing.assert_allclose(np.asarray(mag), np.abs(np.asarray(z)), atol=1e-6)


def test_complex_mode_and_batch(rng):
    x = rng.normal(size=(3, 4096)).astype(np.float32)
    f, t, z = spectrogram(x, 1000.0, window_length=128, mode="complex")
    assert z.shape[0] == 3 and z.shape[1] == 65  # onesided bins
    assert np.iscomplexobj(np.asarray(z))


def test_invalid_mode():
    with pytest.raises(ValueError, match="mode must be one of"):
        spectrogram(np.zeros(512), 100.0, mode="bogus")


def test_tone_lands_in_right_bin():
    fs = 16000.0
    t = np.arange(16000) / fs
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    f, tt, sxx = spectrogram(x, fs, window_length=512)
    peak_bin = int(np.asarray(sxx).mean(axis=-1).argmax())
    assert abs(float(f[peak_bin]) - 1000.0) < fs / 512
