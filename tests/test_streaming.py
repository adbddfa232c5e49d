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


class TestStreamingPFB:
    """Streaming channelizer: per-chunk outputs vs offline pfb_analyze on
    the concatenated stream. Dropping `lead_frames` output frames must
    reproduce the batch result; the tolerance is the f32 GEMM gate (CPU
    GEMM reduction order varies with batch extent — CLAUDE.md; the
    checkpoint-resume test below IS bitwise because both runs use
    identical per-call extents)."""

    @pytest.mark.parametrize("m,tpc,chunks", [
        (8, 4, (256, 128, 384)),
        (64, 8, (1024, 1024)),
        (16, 6, (160, 320, 160, 320)),
    ])
    def test_matches_offline(self, m, tpc, chunks, rng):
        from nx_signal_tpu.ops.resample import pfb_analyze
        from nx_signal_tpu.parallel.streaming import StreamingPFB

        n = sum(chunks)
        x = rng.normal(size=n).astype(np.float32)
        pfb = StreamingPFB(m, taps_per_channel=tpc)
        state = pfb.init_state()
        outs, i = [], 0
        for c in chunks:
            state, z = pfb.process(state, jnp.asarray(x[i:i + c]))
            assert z.shape == (c // m, m)
            outs.append(np.asarray(z))
            i += c
        got = np.concatenate(outs, axis=0)[pfb.lead_frames:]
        ref = np.asarray(pfb_analyze(jnp.asarray(x), m, taps_per_channel=tpc))
        assert got.shape == ref.shape
        assert_all_close(got, ref, atol=2e-5)

    def test_batched_and_strategies(self, rng):
        from nx_signal_tpu.ops.resample import pfb_analyze
        from nx_signal_tpu.parallel.streaming import StreamingPFB

        x = rng.normal(size=(3, 768)).astype(np.float32)
        for strategy in ("matmul", "factored", "einsum"):
            pfb = StreamingPFB(64, taps_per_channel=4, strategy=strategy)
            state = pfb.init_state(batch_shape=(3,))
            state, z1 = pfb.process(state, jnp.asarray(x[:, :384]))
            state, z2 = pfb.process(state, jnp.asarray(x[:, 384:]))
            got = np.concatenate([z1, z2], axis=-2)[:, pfb.lead_frames:]
            ref = np.asarray(pfb_analyze(
                jnp.asarray(x), 64, taps_per_channel=4, strategy=strategy))
            assert_all_close(got, ref, atol=2e-5)

    def test_checkpoint_resume_bitwise(self, rng, tmp_path):
        """Serialize mid-stream state, restore into a fresh object, and
        continue: outputs must be BIT-identical to the uninterrupted run
        (identical per-call shapes -> identical reduction order)."""
        from nx_signal_tpu.io.checkpoint import load_state, save_state
        from nx_signal_tpu.parallel.streaming import StreamingPFB

        x = rng.normal(size=1024).astype(np.float32)
        pfb = StreamingPFB(16, taps_per_channel=8)
        # uninterrupted
        state = pfb.init_state()
        ref = []
        for i in range(0, 1024, 256):
            state, z = pfb.process(state, jnp.asarray(x[i:i + 256]))
            ref.append(np.asarray(z))
        # interrupted at the halfway point
        state = pfb.init_state()
        got = []
        for i in range(0, 512, 256):
            state, z = pfb.process(state, jnp.asarray(x[i:i + 256]))
            got.append(np.asarray(z))
        path = tmp_path / "pfb_state"
        save_state(str(path), {"carry": state})
        restored = load_state(str(path))[0]["carry"]
        pfb2 = StreamingPFB(16, taps_per_channel=8)
        state = jnp.asarray(restored)
        for i in range(512, 1024, 256):
            state, z = pfb2.process(state, jnp.asarray(x[i:i + 256]))
            got.append(np.asarray(z))
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a, b)

    def test_chunk_validation(self):
        from nx_signal_tpu.parallel.streaming import StreamingPFB

        pfb = StreamingPFB(16, taps_per_channel=4)
        with pytest.raises(ValueError, match="multiple of n_channels"):
            pfb.process(pfb.init_state(), jnp.zeros(100))


class TestStreamingResamplePoly:
    """Streaming rational resampler: concatenated outputs (after the
    `lead_out` warm-up) vs offline resample_poly, with zero-chunk flushing
    for the stream tail."""

    @pytest.mark.parametrize("up,down", [(1, 3), (2, 3), (3, 1), (7, 5),
                                         (160, 441)])
    def test_matches_offline(self, up, down, rng):
        from nx_signal_tpu.ops.resample import resample_poly
        from nx_signal_tpu.parallel.streaming import StreamingResamplePoly

        sr = StreamingResamplePoly(up, down)
        n = 4000 - (4000 % down)
        x = rng.normal(size=n).astype(np.float32)
        chunk = 10 * down
        state = sr.init_state()
        outs = []
        for i in range(0, n, chunk):
            state, y = sr.process(state, jnp.asarray(x[i:i + chunk]))
            outs.append(np.asarray(y))
        ref = np.asarray(resample_poly(jnp.asarray(x), up, down))
        # flush the filter tail with zero chunks
        need = sr.lead_out + ref.shape[0]
        while sum(o.shape[-1] for o in outs) < need:
            state, y = sr.process(state, jnp.zeros(chunk, np.float32))
            outs.append(np.asarray(y))
        got = np.concatenate(outs)[sr.lead_out:need]
        assert_all_close(got, ref, atol=2e-5)

    def test_matches_scipy(self, rng):
        import scipy.signal as sps
        from nx_signal_tpu.parallel.streaming import StreamingResamplePoly

        x = rng.normal(size=1998).astype(np.float32)
        sr = StreamingResamplePoly(2, 3)
        state = sr.init_state()
        outs = []
        for i in range(0, 1998, 333):
            state, y = sr.process(state, jnp.asarray(x[i:i + 333]))
            outs.append(np.asarray(y))
        ref = sps.resample_poly(x.astype(np.float64), 2, 3,
                                window=("kaiser", 5.0))
        need = sr.lead_out + ref.shape[0]
        while sum(o.shape[-1] for o in outs) < need:
            state, y = sr.process(state, jnp.zeros(333, np.float32))
            outs.append(np.asarray(y))
        got = np.concatenate(outs)[sr.lead_out:need]
        assert_all_close(got, ref, atol=1e-4)

    def test_batched_identity_and_validation(self, rng):
        from nx_signal_tpu.parallel.streaming import StreamingResamplePoly

        # identity rate: passthrough with empty state
        sr = StreamingResamplePoly(4, 4)
        state = sr.init_state()
        assert state.shape == (0,) and sr.lead_out == 0
        x = rng.normal(size=32).astype(np.float32)
        state, y = sr.process(state, jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(y), x)
        # batched channels
        sr = StreamingResamplePoly(1, 2)
        xb = rng.normal(size=(3, 200)).astype(np.float32)
        state = sr.init_state(batch_shape=(3,))
        state, y = sr.process(state, jnp.asarray(xb))
        assert y.shape == (3, 100)
        with pytest.raises(ValueError, match="multiple of the reduced"):
            sr.process(state, jnp.zeros((3, 33)))
        with pytest.raises(ValueError, match="up and down"):
            StreamingResamplePoly(0, 3)

    def test_checkpoint_resume_bitwise(self, rng, tmp_path):
        from nx_signal_tpu.io.checkpoint import load_state, save_state
        from nx_signal_tpu.parallel.streaming import StreamingResamplePoly

        x = rng.normal(size=1200).astype(np.float32)
        sr = StreamingResamplePoly(2, 3)
        state = sr.init_state()
        ref = []
        for i in range(0, 1200, 300):
            state, y = sr.process(state, jnp.asarray(x[i:i + 300]))
            ref.append(np.asarray(y))
        state = sr.init_state()
        got = []
        for i in range(0, 600, 300):
            state, y = sr.process(state, jnp.asarray(x[i:i + 300]))
            got.append(np.asarray(y))
        path = tmp_path / "srp_state"
        save_state(str(path), {"carry": state})
        state = jnp.asarray(load_state(str(path))[0]["carry"])
        sr2 = StreamingResamplePoly(2, 3)
        for i in range(600, 1200, 300):
            state, y = sr2.process(state, jnp.asarray(x[i:i + 300]))
            got.append(np.asarray(y))
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a, b)

    def test_scan_composition(self, rng):
        from nx_signal_tpu.ops.resample import resample_poly
        from nx_signal_tpu.parallel.streaming import StreamingResamplePoly

        sr = StreamingResamplePoly(1, 4)
        x = rng.normal(size=2048).astype(np.float32)
        chunks = jnp.asarray(x.reshape(8, 256))
        _, ys = jax.lax.scan(sr.process, sr.init_state(), chunks)
        got = np.asarray(ys).reshape(-1)[sr.lead_out:]
        ref = np.asarray(resample_poly(jnp.asarray(x), 1, 4))
        n = min(got.shape[0], ref.shape[0])
        assert_all_close(got[:n], ref[:n], atol=2e-5)


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
