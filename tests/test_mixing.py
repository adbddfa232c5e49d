"""Mixdown/DDC tests: tones move to the right baseband frequency and
out-of-band energy is rejected."""

import numpy as np

from nx_signal_tpu.ops.mixing import demodulate_channel, mix_down


def test_mix_down_shifts_tone():
    fs, fc, off = 48000.0, 10000.0, 500.0
    t = np.arange(48000) / fs
    x = np.cos(2 * np.pi * (fc + off) * t).astype(np.float32)
    y = np.asarray(mix_down(x, fc, fs))
    spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
    freqs = np.fft.fftfreq(len(y), 1 / fs)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - off) < 2.0  # tone lands at +off in baseband


def test_demodulate_channel():
    fs, fc = 48000.0, 12000.0
    t = np.arange(4 * 48000) / fs
    wanted = np.cos(2 * np.pi * (fc + 300.0) * t)
    interferer = np.cos(2 * np.pi * 4000.0 * t)
    x = (wanted + interferer).astype(np.float32)
    y = np.asarray(demodulate_channel(x, fc, fs, bandwidth=4000.0, decimation=6))
    assert y.shape[0] == len(t) // 6
    fs2 = fs / 6
    spec = np.abs(np.fft.fft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    freqs = np.fft.fftfreq(len(y) - 2000, 1 / fs2)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 300.0) < 5.0
    # interferer (at -8 kHz relative) must be filtered out (aliased region)
    inband = spec[np.abs(freqs - 300.0) < 50].max()
    elsewhere = spec[np.abs(freqs - 300.0) > 500].max()
    assert inband > 100 * elsewhere


def test_batched_channels(rng):
    fs = 16000.0
    x = rng.normal(size=(3, 8000)).astype(np.float32)
    y = np.asarray(mix_down(x, 1000.0, fs))
    assert y.shape == x.shape and np.iscomplexobj(y)
    y0 = np.asarray(mix_down(x[0], 1000.0, fs))
    np.testing.assert_allclose(y[0], y0, atol=1e-6)
