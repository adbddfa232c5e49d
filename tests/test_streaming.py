"""Streaming processor tests: chunked output must equal the batch ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nx_signal_tpu.ops.convolution import convolve
from nx_signal_tpu.ops import windows
from nx_signal_tpu.parallel.streaming import StreamingFIR, StreamingISTFT, StreamingSTFT
from nx_signal_tpu.spectral import istft, stft
from tests.conftest import assert_all_close


class TestStreamingFIR:
    @pytest.mark.parametrize("k,chunk", [(31, 100), (255, 512), (17, 64)])
    def test_matches_batch_full(self, k, chunk, rng):
        x = rng.normal(size=1024).astype(np.float32)
        taps = rng.normal(size=k).astype(np.float32)
        proc = StreamingFIR(jnp.asarray(taps))
        state = proc.init_state()
        outs = []
        for i in range(0, 1024, chunk):
            state, y = proc.process(state, jnp.asarray(x[i : i + chunk]))
            outs.append(np.asarray(y))
        got = np.concatenate(outs)
        expected = np.asarray(convolve(x, taps, mode="full"))[:1024]
        assert_all_close(got, expected, atol=1e-5)

    def test_with_scan(self, rng):
        x = rng.normal(size=(8, 128)).astype(np.float32)  # 8 chunks of 128
        taps = rng.normal(size=33).astype(np.float32)
        proc = StreamingFIR(jnp.asarray(taps))

        def step(state, chunk):
            return proc.process(state, chunk)

        _, ys = jax.lax.scan(step, proc.init_state(), jnp.asarray(x))
        got = np.asarray(ys).reshape(-1)
        expected = np.asarray(convolve(x.reshape(-1), taps, mode="full"))[:1024]
        assert_all_close(got, expected, atol=1e-5)

    def test_batched_channels(self, rng):
        x = rng.normal(size=(3, 256)).astype(np.float32)
        taps = rng.normal(size=21).astype(np.float32)
        proc = StreamingFIR(jnp.asarray(taps))
        state = proc.init_state(batch_shape=(3,))
        state, y1 = proc.process(state, jnp.asarray(x[:, :128]))
        state, y2 = proc.process(state, jnp.asarray(x[:, 128:]))
        got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
        expected = np.asarray(convolve(x, taps[None], mode="full"))[:, :256]
        assert_all_close(got, expected, atol=1e-5)


class TestStreamingSTFT:
    def test_matches_batch(self, rng):
        x = rng.normal(size=2048).astype(np.float32)
        w = windows.hann(256)
        hop = 128
        proc = StreamingSTFT(jnp.asarray(w), hop=hop)
        state = proc.init_state()
        zs = []
        for i in range(0, 2048, 512):
            state, z = proc.process(state, jnp.asarray(x[i : i + 512]))
            zs.append(np.asarray(z))
        got = np.concatenate(zs, axis=0)
        expected, _, _ = stft(
            np.concatenate([np.zeros(256 - hop, np.float32), x]), np.asarray(w),
            fft_length=256, overlap_length=256 - hop, sampling_rate=100,
        )
        # streaming prepends a zero carry of (frame-hop) samples; batch
        # equivalent is the zero-padded signal
        n = got.shape[0]
        assert_all_close(got, np.asarray(expected)[:n], atol=1e-4)

    def test_chunk_not_multiple_of_hop(self):
        proc = StreamingSTFT(jnp.asarray(windows.hann(64)), hop=32)
        with pytest.raises(ValueError, match="multiple of the"):
            proc.process(proc.init_state(), jnp.zeros(100))


class TestStreamingISTFT:
    def test_roundtrip_interior(self, rng):
        x = rng.normal(size=4096).astype(np.float32)
        w = windows.hann(256)
        hop = 64
        enc = StreamingSTFT(jnp.asarray(w), hop=hop)
        dec = StreamingISTFT(jnp.asarray(w), hop=hop)
        es, ds = enc.init_state(), dec.init_state()
        outs = []
        for i in range(0, 4096, 512):
            es, z = enc.process(es, jnp.asarray(x[i : i + 512]))
            ds, y = dec.process(ds, z)
            outs.append(np.asarray(y))
        got = np.real(np.concatenate(outs))
        # streaming pipeline delay: encoder carry prepends frame-hop zeros
        delay = 256 - hop
        expected = np.concatenate([np.zeros(delay, np.float32), x])
        m = min(len(got), len(expected))
        # interior matches (first half-window distorted, as in batch istft)
        assert_all_close(got[256:m], expected[256:m], atol=1e-3)


def test_streaming_istft_rejects_bin_mismatch():
    dec = StreamingISTFT(jnp.asarray(windows.hann(256)), hop=64)
    with pytest.raises(ValueError, match="fft_length == window length"):
        dec.process(dec.init_state(), jnp.zeros((4, 512), jnp.complex64))


class TestStreamingIIR:
    def test_chunks_equal_whole(self, rng):
        import scipy.signal as sps
        from nx_signal_tpu.parallel.streaming import StreamingIIR

        sos = sps.butter(6, 0.25, output="sos")
        x = rng.normal(size=(3, 256)).astype(np.float32)
        proc = StreamingIIR(jnp.asarray(sos, dtype=jnp.float32))
        state = proc.init_state(batch_shape=(3,), dtype=jnp.float32)
        outs = []
        for i in range(0, 256, 64):
            state, y = proc.process(state, x[:, i : i + 64])
            outs.append(np.asarray(y))
        got = np.concatenate(outs, axis=-1)
        want = sps.sosfilt(sos, x.astype(np.float64))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_scan_composition(self, rng):
        """The processor composes with lax.scan over stacked chunks."""
        import scipy.signal as sps
        from nx_signal_tpu.parallel.streaming import StreamingIIR

        sos = sps.butter(4, 0.3, output="sos")
        x = rng.normal(size=512)
        chunks = jnp.asarray(x.reshape(8, 64))
        proc = StreamingIIR(jnp.asarray(sos))
        state = proc.init_state(dtype=chunks.dtype)
        _, ys = jax.lax.scan(proc.process, state, chunks)
        np.testing.assert_allclose(
            np.asarray(ys).reshape(-1), sps.sosfilt(sos, x), atol=1e-9, rtol=1e-7
        )
