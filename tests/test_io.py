"""Native audio IO tests: WAV round-trips (native vs scipy.io.wavfile as
oracle) and the SPSC ring buffer."""

import threading

import numpy as np
import pytest
import scipy.io.wavfile as swav

from nx_signal_tpu.io import RingBuffer, WavReader, read_wav, stream_wav, write_wav
from nx_signal_tpu.io import wav as wav_mod


@pytest.fixture
def tone():
    t = np.arange(8000) / 8000.0
    return np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 880 * t)]).astype(
        np.float32
    )


needs_native = pytest.mark.skipif(
    wav_mod._load() is None,
    reason="native IO library unavailable (no compiler on this platform)",
)


def test_native_library_builds():
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no g++ — the pure-Python wave fallback is the "
                    "supported path on this platform (e.g. Windows CI)")
    assert wav_mod._load() is not None, "native wav_io failed to compile"


class TestWavRoundtrip:
    @needs_native  # the stdlib-wave fallback only writes PCM16
    def test_float32(self, tone, tmp_path):
        p = tmp_path / "t.wav"
        write_wav(p, tone, 8000, float32=True)
        data, rate = read_wav(p)
        assert rate == 8000
        np.testing.assert_allclose(data, tone, atol=0)

    def test_pcm16(self, tone, tmp_path):
        p = tmp_path / "t.wav"
        write_wav(p, tone, 8000)
        data, rate = read_wav(p)
        np.testing.assert_allclose(data, tone, atol=1.0 / 16000)  # 16-bit LSB

    def test_mono_1d(self, tmp_path):
        x = np.sin(np.arange(1000) / 10).astype(np.float32)
        p = tmp_path / "m.wav"
        write_wav(p, x, 16000)
        data, rate = read_wav(p)
        assert data.shape == (1, 1000)

    def test_reads_scipy_written_pcm16(self, tone, tmp_path):
        p = tmp_path / "s.wav"
        pcm = (tone.T * 32767).astype(np.int16)
        swav.write(p, 8000, pcm)
        data, rate = read_wav(p)
        assert rate == 8000
        np.testing.assert_allclose(data, tone, atol=1.0 / 16000)  # 16-bit LSB

    def test_reads_scipy_written_int32_and_float(self, tone, tmp_path):
        p = tmp_path / "s32.wav"
        swav.write(p, 8000, (tone.T * 2147483000).astype(np.int32))
        data, _ = read_wav(p)
        np.testing.assert_allclose(data, tone, atol=1e-3)
        p2 = tmp_path / "f32.wav"
        swav.write(p2, 8000, tone.T.astype(np.float32))
        data2, _ = read_wav(p2)
        np.testing.assert_allclose(data2, tone, atol=0)

    def test_scipy_reads_ours(self, tone, tmp_path):
        p = tmp_path / "ours.wav"
        write_wav(p, tone, 8000, float32=True)
        rate, data = swav.read(p)
        assert rate == 8000
        np.testing.assert_allclose(data.T, tone, atol=0)


class TestChunkedReads:
    def test_stream_matches_full(self, tone, tmp_path):
        p = tmp_path / "t.wav"
        write_wav(p, tone, 8000, float32=True)
        chunks = list(stream_wav(p, 999))
        got = np.concatenate(chunks, axis=1)
        np.testing.assert_allclose(got, tone, atol=0)
        assert chunks[-1].shape[1] == 8000 - 999 * 8

    def test_seek(self, tone, tmp_path):
        p = tmp_path / "t.wav"
        write_wav(p, tone, 8000, float32=True)
        with WavReader(p) as r:
            r.seek(4000)
            block = r.read(100)
            np.testing.assert_allclose(block, tone[:, 4000:4100], atol=0)

    def test_missing_file(self):
        with pytest.raises(OSError):
            WavReader("/nonexistent/file.wav")


@needs_native
class TestRingBuffer:
    def test_basic(self):
        rb = RingBuffer(1024)
        assert rb.capacity >= 1024
        data = np.arange(100, dtype=np.float32)
        assert rb.push(data) == 100
        assert len(rb) == 100
        out = rb.pop(100)
        np.testing.assert_array_equal(out, data)
        assert len(rb) == 0

    def test_partial_pop_and_wraparound(self):
        rb = RingBuffer(128)
        cap = rb.capacity
        for round_ in range(5):
            x = np.full(cap - 3, float(round_), np.float32)
            assert rb.push(x) == cap - 3
            got = rb.pop(cap)
            np.testing.assert_array_equal(got, x)

    def test_full_buffer_partial_push(self):
        rb = RingBuffer(64)
        cap = rb.capacity
        assert rb.push(np.zeros(cap, np.float32)) == cap
        assert rb.push(np.ones(10, np.float32)) == 0  # full

    def test_producer_consumer_threads(self):
        rb = RingBuffer(1 << 14)
        total = 1 << 18
        src = np.random.default_rng(0).normal(size=total).astype(np.float32)
        received = []

        def producer():
            sent = 0
            while sent < total:
                sent += rb.push(src[sent : sent + 4096])

        t = threading.Thread(target=producer)
        t.start()
        got = 0
        while got < total:
            out = rb.pop(4096)
            received.append(out)
            got += len(out)
        t.join()
        np.testing.assert_array_equal(np.concatenate(received), src)


def test_reads_wave_format_extensible_float32(tone, tmp_path):
    """ffmpeg/sox emit WAVE_FORMAT_EXTENSIBLE for float output; the
    sub-format GUID carries the real tag and must be honored."""
    import struct

    p = tmp_path / "ext.wav"
    interleaved = tone.T.astype("<f4").tobytes()
    channels, bits, rate = 2, 32, 8000
    block = channels * bits // 8
    # fmt chunk: extensible (0xFFFE) + 22-byte extension, float GUID
    guid = struct.pack("<H", 3) + bytes(14)  # KSDATAFORMAT_SUBTYPE_IEEE_FLOAT
    fmt = struct.pack("<HHIIHH", 0xFFFE, channels, rate, rate * block, block, bits)
    fmt += struct.pack("<HHI", 22, bits, 0x3) + guid
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(interleaved)) + interleaved
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    p.write_bytes(blob)
    data, rate_read = read_wav(p)
    assert rate_read == 8000
    np.testing.assert_allclose(data, tone, atol=0)


def test_rejects_inconsistent_block_align(tmp_path):
    import struct

    p = tmp_path / "bad.wav"
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 2, 2, 32)  # block_align too small
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 64) + bytes(64)
    p.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    with pytest.raises(OSError):
        WavReader(p)


@needs_native
class TestPrefetchingWavReader:
    def test_blocks_match_batch_read(self, tmp_path):
        from nx_signal_tpu.io.wav import PrefetchingWavReader, read_wav, write_wav

        rng = np.random.default_rng(0)
        data = rng.normal(size=(2, 44100)).astype(np.float32) * 0.5
        path = str(tmp_path / "pf.wav")
        write_wav(path, data, 44100, float32=True)

        whole, sr = read_wav(path)
        got = []
        with PrefetchingWavReader(path, block_frames=4096) as pf:
            assert pf.channels == 2 and pf.sample_rate == 44100
            assert pf.num_frames == 44100
            for block in pf:
                assert block.shape[0] == 2
                got.append(block)
        streamed = np.concatenate(got, axis=1)
        np.testing.assert_array_equal(streamed, np.asarray(whole))
        # 44100 = 10 full blocks of 4096 + a short 3140-frame tail
        assert got[-1].shape[1] == 44100 - 10 * 4096

    def test_overlapped_production(self, tmp_path):
        """The producer runs ahead: after a slow consumer step, several
        blocks are already buffered."""
        import time

        from nx_signal_tpu.io.wav import PrefetchingWavReader, write_wav

        rng = np.random.default_rng(1)
        data = rng.normal(size=(1, 200_000)).astype(np.float32) * 0.1
        path = str(tmp_path / "pf2.wav")
        write_wav(path, data, 48000, float32=True)

        with PrefetchingWavReader(path, block_frames=8192,
                                  depth_blocks=8) as pf:
            first = pf.next_block()
            assert first is not None
            time.sleep(0.2)  # let the decode thread fill the ring
            assert pf.buffered_samples > 3 * 8192

    def test_open_failure(self, tmp_path):
        from nx_signal_tpu.io.wav import PrefetchingWavReader

        with pytest.raises(OSError):
            PrefetchingWavReader(str(tmp_path / "missing.wav"), 1024)
        from nx_signal_tpu.io.wav import write_wav
        p = str(tmp_path / "x.wav")
        write_wav(p, np.zeros((1, 10), np.float32), 8000)
        with pytest.raises(ValueError):
            PrefetchingWavReader(p, 0)


class TestRawStream:
    """Headerless raw/IQ stream IO (io/raw.py) — the SDR ingest path
    (BASELINE config 5's wideband capture format). The `raw_mode`
    fixture runs the chunked/seek/closed tests on BOTH the native C++
    path and the numpy fallback (same edge semantics required)."""

    @pytest.fixture(params=["native", "fallback"])
    def raw_mode(self, request, monkeypatch):
        if request.param == "fallback":
            import nx_signal_tpu.io.raw as raw_mod

            monkeypatch.setattr(raw_mod, "_load", lambda: None)
        return request.param

    @pytest.mark.parametrize("dtype,atol", [
        ("f32", 0.0), ("i16", 1 / 32768), ("i8", 1 / 128),
        ("u8", 1 / 128), ("i32", 1e-7),
    ])
    def test_roundtrip_all_dtypes(self, dtype, atol, tmp_path, raw_mode):
        from nx_signal_tpu.io.raw import read_raw, write_raw

        rng = np.random.default_rng(0)
        x = rng.uniform(-0.99, 0.99, size=(3, 777)).astype(np.float32)
        p = str(tmp_path / f"cap.{dtype}")
        write_raw(p, x, dtype=dtype)
        y = read_raw(p, dtype=dtype, channels=3)
        assert y.shape == x.shape and y.dtype == np.float32
        np.testing.assert_allclose(y, x, atol=atol + 1e-7)

    def test_chunked_reads_and_seek(self, tmp_path, raw_mode):
        from nx_signal_tpu.io.raw import RawStreamReader, write_raw

        x = np.linspace(-0.9, 0.9, 2000, dtype=np.float32)[None]
        p = str(tmp_path / "cap.i16")
        write_raw(p, x, dtype="i16")
        with RawStreamReader(p, dtype="i16", channels=1) as r:
            assert (r.channels, r.num_frames) == (1, 2000)
            b1 = r.read(500)
            r.seek(1500)
            b2 = r.read(1000)   # truncated at EOF
            r.seek(r.num_frames)          # seek TO EOF is legal…
            assert r.read(10).shape == (1, 0)
            with pytest.raises(ValueError, match="seek"):
                r.seek(r.num_frames + 1)  # …one past is not, both paths
            with pytest.raises(ValueError, match="seek"):
                r.seek(-1)
        assert b1.shape == (1, 500) and b2.shape == (1, 500)
        np.testing.assert_allclose(b2, x[:, 1500:], atol=1e-4)

    def test_closed_reader_raises(self, tmp_path, raw_mode):
        from nx_signal_tpu.io.raw import RawStreamReader, write_raw

        p = str(tmp_path / "cap.f32")
        write_raw(p, np.zeros((1, 16), np.float32), dtype="f32")
        r = RawStreamReader(p, dtype="f32", channels=1)
        r.close()
        with pytest.raises(ValueError, match="closed"):
            r.read(4)
        with pytest.raises(ValueError, match="closed"):
            r.seek(0)
        r.close()   # idempotent

    def test_iq_roundtrip(self, tmp_path):
        from nx_signal_tpu.io.raw import read_iq, write_iq

        rng = np.random.default_rng(1)
        z = (rng.normal(size=100)
             + 1j * rng.normal(size=100)).astype(np.complex64) * 0.3
        p = str(tmp_path / "cap.iq")
        write_iq(p, z, dtype="i16")
        z2 = read_iq(p, dtype="i16")
        assert z2.dtype == np.complex64
        np.testing.assert_allclose(z2, z, atol=1e-4)

    def test_prefetching_reader_blocks(self, tmp_path, raw_mode):
        from nx_signal_tpu.io.raw import PrefetchingRawReader, write_raw

        rng = np.random.default_rng(2)
        x = rng.uniform(-0.9, 0.9, size=(2, 10000)).astype(np.float32)
        p = str(tmp_path / "cap.u8")
        write_raw(p, x, dtype="u8")
        with PrefetchingRawReader(p, dtype="u8", channels=2,
                                  block_frames=3000) as pf:
            blocks = list(pf)
        assert [b.shape for b in blocks] == [(2, 3000)] * 3 + [(2, 1000)]
        got = np.concatenate(blocks, axis=1)
        np.testing.assert_allclose(got, x, atol=1 / 128 + 1e-7)

    def test_validation(self, tmp_path):
        from nx_signal_tpu.io.raw import RawStreamReader, read_raw

        with pytest.raises(ValueError, match="dtype"):
            read_raw(str(tmp_path / "x.bin"), dtype="bogus")
        with pytest.raises(ValueError, match="channels"):
            RawStreamReader(str(tmp_path / "x.bin"), channels=0)
        with pytest.raises(OSError):
            RawStreamReader(str(tmp_path / "missing.bin"))
