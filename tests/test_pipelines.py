"""Model-pipeline tests: the composite workloads stay consistent with their
component ops."""

import jax.numpy as jnp
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


class TestChannelizePowerStream:
    """models/pipeline.py: the config-5 ingest pipeline composed
    end-to-end — native raw decode -> StreamingPFB -> on-device band
    power."""

    def test_matches_offline_power(self, rng):
        from nx_signal_tpu.models.pipeline import channelize_power_stream
        from nx_signal_tpu.ops.resample import pfb_analyze

        m, tpc = 32, 4
        x = rng.normal(size=(2, 8192)).astype(np.float32)
        blocks = [x[:, :3000], x[:, 3000:5050], x[:, 5050:]]  # ragged
        power, frames = channelize_power_stream(blocks, m,
                                                taps_per_channel=tpc)
        assert frames == 8192 // m
        lead = (tpc - 1) * m
        ref = pfb_analyze(jnp.asarray(np.pad(x, [(0, 0), (lead, 0)])), m,
                          taps_per_channel=tpc)
        ref_p = np.asarray(jnp.sum(ref.real**2 + ref.imag**2, axis=-2))
        np.testing.assert_allclose(np.asarray(power), ref_p,
                                   rtol=1e-4, atol=1e-4 * ref_p.max())

    def test_from_prefetching_raw_reader(self, rng, tmp_path):
        from nx_signal_tpu.io.raw import PrefetchingRawReader, write_raw
        from nx_signal_tpu.models.pipeline import channelize_power_stream
        from nx_signal_tpu.ops.resample import pfb_analyze

        m, tpc = 64, 8
        x = rng.uniform(-0.9, 0.9, size=(1, 50000)).astype(np.float32)
        p = str(tmp_path / "cap.i16")
        write_raw(p, x, dtype="i16")
        with PrefetchingRawReader(p, dtype="i16", channels=1,
                                  block_frames=8192) as pf:
            power, frames = channelize_power_stream(pf, m,
                                                    taps_per_channel=tpc)
        assert frames == 50000 // m
        # the decoded i16 stream, zero-prepended, is the offline oracle
        decoded = np.round(np.clip(x * 32768, -32768, 32767)) / 32768
        lead = (tpc - 1) * m
        full = np.pad(decoded.astype(np.float32),
                      [(0, 0), (lead, 0)])[:, :lead + (50000 // m) * m]
        ref = pfb_analyze(jnp.asarray(full), m, taps_per_channel=tpc)
        ref_p = np.asarray(jnp.sum(ref.real**2 + ref.imag**2, axis=-2))
        np.testing.assert_allclose(np.asarray(power), ref_p,
                                   rtol=1e-4, atol=1e-4 * ref_p.max())

    def test_drop_tail_and_validation(self, rng):
        from nx_signal_tpu.models.pipeline import channelize_power_stream

        x = rng.normal(size=(1, 1000)).astype(np.float32)
        power, frames = channelize_power_stream([x[:, :640], x[:, 640:]],
                                                16, taps_per_channel=4,
                                                drop_tail=True)
        assert frames == 40   # 640-sample chunk: one jit shape only
        with pytest.raises(ValueError, match="empty block stream"):
            channelize_power_stream([], 16)
        with pytest.raises(ValueError, match="shorter than one"):
            channelize_power_stream([np.zeros((1, 8), np.float32)], 16)
