"""Seeded randomized scipy-parity sweeps — cheap geometry fuzzing over
the dimensions the curated cases sample sparsely (rate ratios, hop/frame
combinations, orders, tap counts). Deterministic (fixed seeds) so
failures reproduce; budgeted to stay fast-tier."""

import numpy as np
import pytest
import scipy.signal as sps

from nx_signal_tpu.ops.iir import sosfilt
from nx_signal_tpu.ops.iir_design import butter, cheby1
from nx_signal_tpu.ops.resample import pfb_analyze, resample_poly, upfirdn
from nx_signal_tpu.ops.windows import get_window
from nx_signal_tpu.spectral.stft import istft, stft


@pytest.mark.parametrize("seed", range(12))
def test_upfirdn_random_geometry(seed):
    rng = np.random.default_rng(100 + seed)
    up = int(rng.integers(1, 12))
    down = int(rng.integers(1, 12))
    n = int(rng.integers(3, 4000))
    k = int(rng.integers(1, 80))
    x = rng.normal(size=n)
    h = rng.normal(size=k)
    got = np.asarray(upfirdn(h, x, up, down))
    want = sps.upfirdn(h, x, up, down)
    assert got.shape == want.shape, (up, down, n, k)
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=1e-6 * scale,
                               err_msg=f"up={up} down={down} n={n} k={k}")


@pytest.mark.parametrize("seed", range(8))
def test_resample_poly_random_ratio(seed):
    rng = np.random.default_rng(200 + seed)
    up = int(rng.integers(1, 10))
    down = int(rng.integers(1, 10))
    n = int(rng.integers(64, 3000))
    x = rng.normal(size=n)
    got = np.asarray(resample_poly(x, up, down))
    want = sps.resample_poly(x, up, down)
    assert got.shape == want.shape, (up, down, n)
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=1e-4 * scale,
                               err_msg=f"up={up} down={down} n={n}")


@pytest.mark.parametrize("seed", range(8))
def test_stft_istft_random_geometry_roundtrip(seed):
    rng = np.random.default_rng(300 + seed)
    frame = int(rng.choice([64, 128, 256, 512]))
    hop = int(rng.choice([f for f in (16, 32, 64, 128, 256)
                          if f < frame and frame % f == 0]))
    n = int(rng.integers(4, 12)) * frame
    wname = str(rng.choice(["hann", "hamming", "blackman"]))
    w = np.asarray(get_window(wname, frame, periodic=True))
    x = rng.normal(size=n).astype(np.float32)
    z, _, _ = stft(x, w, overlap_length=frame - hop, fft_length=frame,
                   sampling_rate=1000.0, onesided=True)
    y = np.asarray(istft(z, w, overlap_length=frame - hop, fft_length=frame,
                         onesided=True))
    lo, hi = frame, min(y.shape[-1], n) - frame
    if hi > lo:
        err = np.abs(y[lo:hi] - x[lo:hi]).max()
        assert err < 1e-4, (frame, hop, wname, err)


@pytest.mark.parametrize("seed", range(6))
def test_iir_design_apply_random(seed):
    rng = np.random.default_rng(400 + seed)
    order = int(rng.integers(2, 8))
    wn = float(rng.uniform(0.05, 0.45))
    kind = str(rng.choice(["butter", "cheby1"]))
    if kind == "butter":
        sos = np.asarray(butter(order, wn, output="sos"))
        sos_ref = sps.butter(order, wn, output="sos")
    else:
        sos = np.asarray(cheby1(order, 1.0, wn, output="sos"))
        sos_ref = sps.cheby1(order, 1.0, wn, output="sos")
    np.testing.assert_allclose(sos, sos_ref, atol=1e-8,
                               err_msg=f"{kind} n={order} wn={wn}")
    x = rng.normal(size=2000)
    got = np.asarray(sosfilt(sos, x))
    want = sps.sosfilt(sos_ref, x)
    np.testing.assert_allclose(got, want,
                               atol=1e-5 * max(1.0, np.abs(want).max()))


@pytest.mark.parametrize("seed", range(5))
def test_pfb_random_vs_einsum(seed):
    rng = np.random.default_rng(500 + seed)
    m = int(rng.choice([8, 16, 32, 64, 128]))
    tpc = int(rng.integers(2, 12))
    n = int(rng.integers(2, 6)) * m * tpc + int(rng.integers(0, m))
    x = rng.normal(size=n).astype(np.float32)
    ref = np.asarray(pfb_analyze(x, m, taps_per_channel=tpc,
                                 strategy="einsum"))
    got = np.asarray(pfb_analyze(x, m, taps_per_channel=tpc))
    assert got.shape == ref.shape, (m, tpc, n)
    scale = max(1e-30, np.abs(ref).max())
    np.testing.assert_allclose(got, ref, atol=2e-6 * scale,
                               err_msg=f"m={m} tpc={tpc} n={n}")
