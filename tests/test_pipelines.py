"""Model-pipeline tests: the composite workloads stay consistent with their
component ops."""

import numpy as np
import pytest

from nx_signal_tpu.models.pipeline import (
    FIRFilterChain,
    LogMelFrontend,
    SpectrogramPipeline,
    WidebandReceiver,
    stft_fir_chain,
)
from nx_signal_tpu.ops.filters import firwin
from nx_signal_tpu.ops.windows import hann


@pytest.fixture
def signal(rng):
    return rng.normal(size=(2, 16384)).astype(np.float32)


def test_chain_fused_matches_separate(signal):
    taps = firwin(255, [2000.0], sampling_rate=16000.0)
    w = np.asarray(hann(512))
    kw = dict(fft_length=512, overlap_length=384, sampling_rate=16000.0)
    y, power = stft_fir_chain(signal, taps, w, **kw)
    power_fused = stft_fir_chain(signal, taps, w, return_filtered=False, **kw)
    assert power_fused.shape == power.shape
    scale = np.abs(np.asarray(power)).max()
    np.testing.assert_allclose(np.asarray(power_fused), np.asarray(power),
                               atol=1e-4 * scale)


def test_spectrogram_pipeline(signal):
    db, times, freqs = SpectrogramPipeline(sampling_rate=16000.0)(signal)
    assert db.shape[0] == 2 and db.shape[-1] == 1024
    assert float(np.asarray(db).max()) <= 1e-4  # dBFS peaks at ~0

def test_log_mel_frontend(signal):
    mel = LogMelFrontend()(signal)
    assert mel.shape[0] == 2 and mel.shape[-1] == 80
    assert np.isfinite(np.asarray(mel)).all()


def test_fir_filter_chain(signal):
    out = FIRFilterChain(sampling_rate=16000.0)(signal)
    assert out.shape == signal.shape


def test_wideband_receiver(rng):
    x = rng.normal(size=1 << 16).astype(np.float32)
    out = WidebandReceiver(n_channels=32, frame_length=64, hop=32,
                           sampling_rate=3.2e6)(x)
    assert out.shape[0] == 32
    assert np.isfinite(np.asarray(out)).all()
