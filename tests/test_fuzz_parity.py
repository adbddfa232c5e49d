"""Seeded randomized scipy-parity sweeps — cheap geometry fuzzing over
the dimensions the curated cases sample sparsely (rate ratios, hop/frame
combinations, orders, tap counts). Deterministic (fixed seeds) so
failures reproduce; budgeted to stay fast-tier."""

import jax.numpy as jnp
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


@pytest.mark.parametrize("seed", range(10))
def test_convolution_random_modes(seed):
    from nx_signal_tpu.ops.convolution import convolve

    rng = np.random.default_rng(600 + seed)
    n = int(rng.integers(8, 2000))
    k = int(rng.integers(1, min(n, 200)))
    mode = str(rng.choice(["full", "same", "valid"]))
    method = str(rng.choice(["direct", "fft"]))
    cplx = bool(rng.integers(0, 2))
    x = rng.normal(size=n)
    h = rng.normal(size=k)
    if cplx:
        x = x + 1j * rng.normal(size=n)
        h = h + 1j * rng.normal(size=k)
    got = np.asarray(convolve(x, h, mode=mode, method=method))
    want = sps.convolve(x, h, mode=mode)
    assert got.shape == want.shape, (n, k, mode, method, cplx)
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=1e-4 * scale,
                               err_msg=f"n={n} k={k} {mode}/{method}")


@pytest.mark.parametrize("seed", range(8))
def test_short_time_fft_random_geometry(seed):
    from nx_signal_tpu.spectral.short_time_fft import ShortTimeFFT

    rng = np.random.default_rng(700 + seed)
    wl = int(rng.choice([32, 48, 64, 100, 128]))
    hop = int(rng.integers(1, wl))
    mfft = wl + int(rng.integers(0, wl))
    fft_mode = str(rng.choice(["onesided", "twosided", "centered"]))
    n = int(rng.integers(wl + 1, 2000))
    w = rng.normal(size=wl) ** 2 + 0.1
    x = rng.normal(size=n)
    ours = ShortTimeFFT(w, hop=hop, fs=100.0, mfft=mfft, fft_mode=fft_mode)
    ref = sps.ShortTimeFFT(w, hop=hop, fs=100.0, mfft=mfft,
                           fft_mode=fft_mode)
    za = np.asarray(ours.stft(x))
    zb = ref.stft(x)
    assert za.shape == zb.shape, (wl, hop, mfft, fft_mode, n)
    scale = max(1.0, np.abs(zb).max())
    np.testing.assert_allclose(za, zb, atol=1e-4 * scale,
                               err_msg=f"wl={wl} hop={hop} mfft={mfft} "
                                       f"{fft_mode} n={n}")


@pytest.mark.parametrize("seed", range(10))
def test_find_peaks_random_conditions(seed):
    from nx_signal_tpu.ops.find_peaks import find_peaks

    rng = np.random.default_rng(800 + seed)
    n = int(rng.integers(32, 1500))
    x = np.cumsum(rng.normal(size=n))  # random walk: plateaus unlikely,
    # rich peak structure
    kwargs, skwargs = {}, {}
    if rng.integers(0, 2):
        h = float(rng.uniform(np.min(x), np.max(x)))
        kwargs["height"] = skwargs["height"] = h
    if rng.integers(0, 2):
        d = int(rng.integers(1, 50))
        kwargs["distance"] = skwargs["distance"] = d
    if rng.integers(0, 2):
        p = float(rng.uniform(0.1, 3.0))
        kwargs["prominence"] = skwargs["prominence"] = p
    if rng.integers(0, 2):
        wmin = float(rng.uniform(1.0, 10.0))
        kwargs["width"] = skwargs["width"] = wmin
    got = find_peaks(jnp.asarray(x, jnp.float64), **kwargs)
    idx = np.asarray(got.indices)[: int(got.valid_count)]
    want, props = sps.find_peaks(x, **skwargs)
    np.testing.assert_array_equal(idx, want,
                                  err_msg=f"n={n} kwargs={kwargs}")
    if "prominence" in kwargs and len(want):
        np.testing.assert_allclose(
            np.asarray(got.properties["prominences"])[: len(want)],
            props["prominences"], atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_sharded_geometry_random(seed):
    """Random mesh shape x signal length: the sharded FIR conv path must
    stay BITWISE equal to single-device (lax.conv per-sample dots are
    shape-independent even on CPU)."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from nx_signal_tpu.ops.convolution import _direct_convolve
    from nx_signal_tpu.parallel.mesh import make_dsp_mesh
    from nx_signal_tpu.parallel.sharded import sharded_convolve_same

    rng = np.random.default_rng(900 + seed)
    c, b = [(1, 8), (2, 4), (4, 2), (8, 1)][int(rng.integers(0, 4))]
    mesh = make_dsp_mesh(c, b)
    length = int(rng.integers(600, 5000))
    k = int(rng.integers(3, min(120, length // b)))
    channels = c * int(rng.integers(1, 3))
    x = rng.normal(size=(channels, length)).astype(np.float32)
    taps = rng.normal(size=k).astype(np.float32)
    got = sharded_convolve_same(x, taps, mesh=mesh, method="conv")
    want = _direct_convolve(x, taps[None, :], "same", use_matmul=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                  err_msg=f"mesh=({c},{b}) n={length} k={k}")


@pytest.mark.parametrize("seed", range(6))
def test_streaming_random_chunking(seed):
    """Random chunk partitions through StreamingPFB / StreamingResamplePoly
    must reproduce the offline ops regardless of where the block
    boundaries fall."""
    from nx_signal_tpu.ops.resample import pfb_analyze, resample_poly
    from nx_signal_tpu.parallel.streaming import (StreamingPFB,
                                                  StreamingResamplePoly)

    rng = np.random.default_rng(1000 + seed)
    if rng.integers(0, 2):
        m = int(rng.choice([8, 16, 32, 64]))
        tpc = int(rng.integers(2, 8))
        n_chunks = int(rng.integers(2, 6))
        chunks = [int(rng.integers(1, 6)) * m for _ in range(n_chunks)]
        while sum(chunks) < m * tpc:   # offline oracle needs >= one window
            chunks.append(int(rng.integers(1, 6)) * m)
        x = rng.normal(size=sum(chunks)).astype(np.float32)
        pfb = StreamingPFB(m, taps_per_channel=tpc)
        state = pfb.init_state()
        outs, i = [], 0
        for c in chunks:
            state, z = pfb.process(state, jnp.asarray(x[i:i + c]))
            outs.append(np.asarray(z))
            i += c
        got = np.concatenate(outs, axis=0)[pfb.lead_frames:]
        ref = np.asarray(pfb_analyze(jnp.asarray(x), m,
                                     taps_per_channel=tpc))
        assert got.shape == ref.shape, (m, tpc, chunks)
        scale = max(1e-30, np.abs(ref).max())
        np.testing.assert_allclose(got, ref, atol=2e-5 * scale,
                                   err_msg=f"m={m} tpc={tpc} {chunks}")
    else:
        up = int(rng.integers(1, 8))
        down = int(rng.integers(1, 8))
        if up == down:
            up += 1
        sr = StreamingResamplePoly(up, down)
        d = sr._down if not sr._identity else down
        chunk = int(rng.integers(1, 20)) * d
        n = int(rng.integers(4, 12)) * chunk
        x = rng.normal(size=n).astype(np.float32)
        state = sr.init_state()
        outs = []
        for i in range(0, n, chunk):
            state, y = sr.process(state, jnp.asarray(x[i:i + chunk]))
            outs.append(np.asarray(y))
        ref = np.asarray(resample_poly(jnp.asarray(x), up, down))
        need = sr.lead_out + ref.shape[0]
        while sum(o.shape[-1] for o in outs) < need:
            state, y = sr.process(state, jnp.zeros(chunk, np.float32))
            outs.append(np.asarray(y))
        got = np.concatenate(outs)[sr.lead_out:need]
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(got, ref, atol=2e-5 * scale,
                                   err_msg=f"up={up} down={down} "
                                           f"chunk={chunk} n={n}")
