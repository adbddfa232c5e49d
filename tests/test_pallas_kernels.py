"""Pallas kernel tests (interpreter mode on CPU; the real-TPU path is
exercised by bench/profiling runs on hardware)."""

import numpy as np
import pytest

from nx_signal_tpu.kernels.dft import framed_dft
from nx_signal_tpu.kernels.pallas_dft import framed_dft_pallas
from nx_signal_tpu.ops import windows


@pytest.mark.parametrize("onesided", [True, False])
@pytest.mark.parametrize("channels,length,frame,stride", [
    (2, 4096, 512, 128),
    (1, 2048, 256, 128),
    (3, 5000, 512, 256),   # length not tile-aligned
])
def test_pallas_framed_dft_matches_xla(onesided, channels, length, frame, stride, rng):
    x = rng.normal(size=(channels, length)).astype(np.float32)
    w = np.asarray(windows.hann(frame))
    zp = framed_dft_pallas(x, w, stride=stride, n_fft=frame, onesided=onesided,
                           interpret=True)
    zr = framed_dft(x, w, stride=stride, n_fft=frame, onesided=onesided)
    assert zp.shape == zr.shape
    scale = np.abs(np.asarray(zr)).max()
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zr), atol=1e-5 * scale)


def test_pallas_framed_dft_1d_input(rng):
    x = rng.normal(size=4096).astype(np.float32)
    w = np.asarray(windows.hann(512))
    zp = framed_dft_pallas(x, w, stride=128, n_fft=512, onesided=True, interpret=True)
    zr = framed_dft(x, w, stride=128, n_fft=512, onesided=True)
    assert zp.ndim == 2
    scale = np.abs(np.asarray(zr)).max()
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zr), atol=1e-5 * scale)
