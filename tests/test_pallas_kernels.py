"""Pallas kernel tests (interpreter mode on CPU; the real-TPU path is
exercised by bench/profiling runs on hardware)."""

import numpy as np
import pytest

from nx_signal_tpu.kernels.dft import fir_framed_dft, framed_dft
from nx_signal_tpu.kernels.pallas_dft import (
    fir_framed_dft_power_pallas,
    framed_dft_pallas,
)
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


@pytest.mark.parametrize(
    "dma", ["blocks", "window", "concat", "concat_pad", "pipeline"])
@pytest.mark.parametrize("channels,length,taps,frame,stride,nfft", [
    (2, 5000, 255, 512, 128, 512),   # the bench chain's exact shape family
    (1, 3000, 63, 384, 128, 512),    # ext % stride != 0, nfft > frame
    (3, 4096, 100, 256, 128, 256),   # even tap count, short frame
])
def test_pallas_fused_power_matches_xla(channels, length, taps, frame,
                                        stride, nfft, dma, rng):
    # the fused FIR+DFT+power kernel (ROOFLINE.md §3 item 1) vs the XLA
    # conv-of-blocks production path, all three DMA schedules
    x = rng.normal(size=(channels, length)).astype(np.float32)
    t = rng.normal(size=taps).astype(np.float32)
    w = np.asarray(windows.hann(frame))
    ref = np.asarray(fir_framed_dft(x, t, w, stride=stride, n_fft=nfft,
                                    onesided=True, output="power",
                                    precision="highest", kernel="xla"))
    got = np.asarray(fir_framed_dft_power_pallas(
        x, t, w, stride=stride, n_fft=nfft, dma=dma, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())


def test_pallas_fused_power_high_precision_split(rng):
    # the manual 3-pass bf16 hi/lo operand split ('high') stays inside the
    # 1e-4 gate on every DMA schedule
    x = rng.normal(size=(2, 5000)).astype(np.float32)
    t = rng.normal(size=255).astype(np.float32)
    w = np.asarray(windows.hann(512))
    ref = np.asarray(fir_framed_dft(x, t, w, stride=128, n_fft=512,
                                    onesided=True, output="power",
                                    precision="highest", kernel="xla"))
    for dma in ("blocks", "window", "concat", "concat_pad", "pipeline"):
        got = np.asarray(fir_framed_dft_power_pallas(
            x, t, w, stride=128, n_fft=512, precision="high", dma=dma,
            interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-4 * np.abs(ref).max())


def test_pallas_fused_power_1d_and_validation(rng):
    x = rng.normal(size=4000).astype(np.float32)
    t = rng.normal(size=100).astype(np.float32)
    w = np.asarray(windows.hann(256))
    got = np.asarray(fir_framed_dft_power_pallas(
        x, t, w, stride=128, n_fft=256, interpret=True))
    ref = np.asarray(fir_framed_dft(x, t, w, stride=128, n_fft=256,
                                    onesided=True, output="power",
                                    precision="highest"))
    assert got.ndim == 2
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())
    with pytest.raises(ValueError):
        fir_framed_dft_power_pallas(x, t, w, stride=100, n_fft=256,
                                    interpret=True)


@pytest.mark.parametrize("batch,m,n,overlap", [
    ((2,), 30, 512, 384),    # the ISTFT hop-128 shape family
    ((), 12, 256, 128),      # 1-D squeeze
    ((3, 2), 25, 512, 256),  # stacked batch dims
    ((1,), 9, 128, 0),       # no overlap (C=1 degenerate)
])
def test_pallas_overlap_add_bitwise(batch, m, n, overlap, rng):
    # the Pallas OLA kernel must be BIT-identical to the deterministic
    # left-fold (the property sharded ISTFT relies on)
    from nx_signal_tpu.kernels.pallas_dft import overlap_add_pallas
    from nx_signal_tpu.spectral.framing import overlap_and_add

    f = rng.normal(size=(*batch, m, n)).astype(np.float32)
    ref = np.asarray(overlap_and_add(f, overlap_length=overlap))
    got = np.asarray(overlap_add_pallas(f, overlap_length=overlap,
                                        interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_pallas_overlap_add_validation(rng):
    from nx_signal_tpu.kernels.pallas_dft import overlap_add_pallas

    f = rng.normal(size=(4, 512)).astype(np.float32)
    with pytest.raises(ValueError):
        overlap_add_pallas(f, overlap_length=512, interpret=True)
    with pytest.raises(ValueError):   # stride 100 not lane-aligned
        overlap_add_pallas(f, overlap_length=412, interpret=True)


# ------------------------- shared-block partial DFT (the 2x FLOP cut)

class TestSharedPallas:
    """fir_framed_dft_power_shared_pallas: the shared hop-block partial
    DFT (ROOFLINE.md §4's 2x-fewer-FLOPs algorithm) with its twiddle
    combine + spectral window + power as in-VMEM epilogue stages — the
    formulation VERDICT r03 names as the last perf lever on the chain."""

    @pytest.mark.parametrize("dma", ["window", "pipeline"])
    @pytest.mark.parametrize(
        "shape,length,taps,stride,nfft,wname,tile_m", [
            ((2,), 5000, 255, 128, 512, "hann", None),   # bench geometry
            ((3, 2), 9000, 63, 128, 512, "blackman", 64),  # 3-D batch, c=2
            ((1,), 4000, 1, 256, 512, "hamming", None),  # J=2, 1-tap FIR
            ((2,), 20000, 129, 128, 1024, "hann", None),  # J=8
        ])
    def test_matches_xla_chain(self, shape, length, taps, stride, nfft,
                               wname, tile_m, dma, rng):
        from nx_signal_tpu.kernels.dft import recognize_cosine_window
        from nx_signal_tpu.kernels.pallas_dft import (
            fir_framed_dft_power_shared_pallas)
        x = rng.normal(size=(*shape, length)).astype(np.float32)
        t = rng.normal(size=taps).astype(np.float32)
        w = np.asarray(getattr(windows, wname)(nfft))
        coeffs = recognize_cosine_window(w, nfft)
        assert coeffs is not None
        ref = np.asarray(fir_framed_dft(
            x, t, w, stride=stride, n_fft=nfft, onesided=True,
            output="power", precision="highest", kernel="xla"))
        got = np.asarray(fir_framed_dft_power_shared_pallas(
            x, t, stride=stride, n_fft=nfft, window_coeffs=coeffs,
            tile_m=tile_m, dma=dma, interpret=True))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())

    def test_high_precision_split(self, rng):
        from nx_signal_tpu.kernels.dft import recognize_cosine_window
        from nx_signal_tpu.kernels.pallas_dft import (
            fir_framed_dft_power_shared_pallas)
        x = rng.normal(size=(2, 5000)).astype(np.float32)
        t = rng.normal(size=255).astype(np.float32)
        w = np.asarray(windows.hann(512))
        coeffs = recognize_cosine_window(w, 512)
        ref = np.asarray(fir_framed_dft(
            x, t, w, stride=128, n_fft=512, onesided=True, output="power",
            precision="highest", kernel="xla"))
        for dma in ("window", "pipeline"):
            got = np.asarray(fir_framed_dft_power_shared_pallas(
                x, t, stride=128, n_fft=512, window_coeffs=coeffs,
                precision="high", dma=dma, interpret=True))
            np.testing.assert_allclose(got, ref,
                                       atol=1e-4 * np.abs(ref).max())

    def test_dispatch_and_validation(self, rng):
        x = rng.normal(size=(2, 5000)).astype(np.float32)
        t = rng.normal(size=255).astype(np.float32)
        w = np.asarray(windows.hann(512))
        # kernel='pallas_shared' routes through fir_framed_dft (interpret
        # is not plumbed, so only check the eligibility errors on CPU)
        with pytest.raises(ValueError, match="pallas_shared"):
            fir_framed_dft(x, t, w, stride=128, n_fft=512, onesided=True,
                           output="complex", kernel="pallas_shared")
        with pytest.raises(ValueError, match="cosine"):
            w_bad = np.asarray(windows.kaiser(512, beta=8.0))
            fir_framed_dft(x, t, w_bad, stride=128, n_fft=512,
                           onesided=True, output="power",
                           kernel="pallas_shared")
        with pytest.raises(ValueError, match="frame_length == n_fft"):
            fir_framed_dft(x, t, np.asarray(windows.hann(384)), stride=128,
                           n_fft=512, onesided=True, output="power",
                           kernel="pallas_shared")
        from nx_signal_tpu.kernels.pallas_dft import (
            fir_framed_dft_power_shared_pallas)
        with pytest.raises(ValueError, match="dma"):
            fir_framed_dft_power_shared_pallas(
                x, t, stride=128, n_fft=512, window_coeffs=(0.5, -0.5),
                dma="bogus")
