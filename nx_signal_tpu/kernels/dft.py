"""Fused framing + window + DFT as MXU block-matmuls.

The STFT hot path (SURVEY.md §3.1: the "fused window-multiply+frame"
kernel). Instead of materializing the (frames, frame_length) matrix and
calling the FFT (measured on v5e: 4.1 ms framing + 9.4 ms XLA rfft for
16ch x 10s @ 48 kHz), the whole transform is expressed as

    z = frames @ (diag(window) @ F)      F = DFT matrix [frame_length, bins]

and `frames` is never built: framing decomposes into C = ceil(frame/hop)
contiguous reshape-blocks of the signal (spectral/framing.py), so

    z = sum_r  x_block_r  @  W[r*hop : r*hop + w_r, :]

— C reshape+matmul+accumulate steps, zero gathers, zero materialization,
all on the MXU (measured: DFT-matmul alone beats XLA's 512-pt FFT ~3x;
fusing removes the framing pass entirely). O(N^2) vs O(N log N) only wins
for small N — `good_matmul_fft_length` gates the dispatch; large FFTs stay
on XLA's FFT.

Real and imaginary parts ride one stacked [Wr | Wi] matrix so each block is
a single f32 matmul with `precision` control (default HIGHEST: full-f32
MXU passes; DEFAULT's bf16 passes are ~35% faster at ~1e-3 accuracy).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from nx_signal_tpu.spectral.framing import _frame_block_widths
from nx_signal_tpu.utils.dtypes import DEFAULT_FLOAT

__all__ = ["framed_dft", "framed_idft", "fir_framed_dft", "good_matmul_fft_length", "blocked_frame_matmul", "toeplitz_band"]

_MAX_MATMUL_FFT = 1024


def toeplitz_band(taps, out_cols: int, xp=jnp):
    """Banded Toeplitz matrix of 1-D convolution: T[t, j] = taps[j + K-1 - t]
    for j <= t <= j+K-1, else 0 — shape (out_cols + K - 1, out_cols), so
    frames_ext @ T applies the filter. `xp` selects numpy (host-side weight
    folding) or jnp."""
    taps = xp.asarray(taps).reshape(-1)
    k = taps.shape[0]
    t_idx = xp.arange(out_cols + k - 1)[:, None]
    j_idx = xp.arange(out_cols)[None, :]
    m = j_idx + (k - 1) - t_idx
    zero = xp.zeros((), taps.dtype) if xp is jnp else taps.dtype.type(0)
    return xp.where((m >= 0) & (m < k), xp.take(taps, xp.clip(m, 0, k - 1)), zero)


def good_matmul_fft_length(n_fft: int) -> bool:
    """True when the O(N^2) MXU DFT beats XLA's FFT for this size."""
    return n_fft <= _MAX_MATMUL_FFT


def blocked_frame_matmul(x, weights, *, window_length: int, stride: int,
                         num_frames: int, precision="highest",
                         strategy: str = "conv"):
    """Compute `as_windowed(x, window_length, stride)[:num_frames] @ weights`
    with gather-free framing (the C = ceil(window/stride) contiguous
    slice+reshape blocks of spectral/framing.py).

    Execution strategies (all MXU; measured on v5e, scripts/
    conv6_experiment.py + profile_chain.py, see ROOFLINE.md):

    * 'conv' (default, fastest): reshape the signal into NON-overlapping
      (num_frames + C - 1, stride) hop blocks — a free view — and run ONE
      `lax.conv` over the block axis with a C-tap kernel whose tap r holds
      weight rows [r*stride, (r+1)*stride). The frame matrix is never
      materialized: the C-fold input reuse happens inside the conv
      emitter's VMEM window instead of through an HBM frames buffer.
      Measured +33-49% over 'materialize' and bitwise-identical on TPU.

    * 'materialize': build the (num_frames, window_length) frame matrix
      (C-fold HBM expansion) and run one K = window_length matmul. Still
      ~4x better than 'blocked' (the single large-K GEMM sustains
      ~47 TF/s real vs ~12).

    * 'blocked': C separate (num_frames, w_r) @ (w_r, out) matmuls
      accumulating in HBM. Lowest peak memory; slowest (partial-sum
      round-trips).
    """
    x = jnp.asarray(x)
    weights = jnp.asarray(weights)
    widths = _frame_block_widths(window_length, stride)
    c_blocks = len(widths)
    needed = (num_frames + c_blocks - 1) * stride
    batch = x.shape[:-1]
    if needed > x.shape[-1]:
        x = jnp.pad(x, [(0, 0)] * len(batch) + [(0, needed - x.shape[-1])])
    if strategy == "conv" and c_blocks > 1:
        out_cols = weights.shape[-1]
        pad_rows = c_blocks * stride - window_length
        w = jnp.pad(weights, [(0, pad_rows), (0, 0)]) if pad_rows else weights
        kernel = w.reshape(c_blocks, stride, out_cols)          # WIO
        blocks = x[..., :needed].reshape(*batch, num_frames + c_blocks - 1,
                                         stride)
        flat = blocks.reshape(-1, num_frames + c_blocks - 1, stride)
        out = lax.conv_general_dilated(
            flat, kernel, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), precision=precision,
        )
        return out.reshape(*batch, num_frames, out_cols)
    if strategy in ("conv", "materialize") and c_blocks > 1:
        blocks = []
        for r, w_r in enumerate(widths):
            block = x[..., r * stride : (r + num_frames) * stride]
            block = block.reshape(*batch, num_frames, stride)
            blocks.append(block if w_r == stride else block[..., :w_r])
        frames = jnp.concatenate(blocks, axis=-1)
        if batch:
            # flatten leading batch axes into M: one large GEMM tiles the
            # MXU better than a stack of per-channel matmuls sharing the RHS
            flat = frames.reshape(-1, frames.shape[-1])
            out = jnp.matmul(flat, weights, precision=precision)
            return out.reshape(*batch, num_frames, weights.shape[-1])
        return jnp.matmul(frames, weights, precision=precision)
    acc = None
    for r, w_r in enumerate(widths):
        block = x[..., r * stride : (r + num_frames) * stride]
        block = block.reshape(*batch, num_frames, stride)
        if w_r < stride:
            block = block[..., :w_r]
        part = jnp.matmul(
            block, weights[r * stride : r * stride + w_r], precision=precision
        )
        acc = part if acc is None else acc + part
    return acc


def _dft_weights(window, frame_length: int, n_fft: int, onesided: bool, dtype):
    """[Wr | Wi] stacked (frame_length, 2*bins): the window-scaled DFT
    matrix restricted to the first frame_length input rows (zero-padding to
    n_fft is implicit).

    Concrete windows build in f64 numpy on host. A TRACED window (e.g. built
    inside an enclosing jit) takes a jnp path instead — the phase is reduced
    mod n_fft in exact integer arithmetic first so f32 cos/sin only ever see
    arguments in [-2pi, 0] (naive n*k/N angles reach ~3e3 rad, where f32
    range reduction loses most of the mantissa); XLA constant-folds the
    whole matrix at compile time when the window is a trace-constant."""
    bins = n_fft // 2 + 1 if onesided else n_fft
    if isinstance(window, jax.core.Tracer):
        k = jnp.arange(bins, dtype=jnp.int32)[None, :]
        n = jnp.arange(frame_length, dtype=jnp.int32)[:, None]
        angle = (-2.0 * np.pi / n_fft) * ((n * k) % n_fft).astype(dtype)
        w = window.astype(dtype)[:, None]
        return jnp.concatenate([w * jnp.cos(angle), w * jnp.sin(angle)], axis=1)
    bins_idx = np.arange(bins)[None, :]
    n = np.arange(frame_length)[:, None]
    angle = -2.0 * np.pi * n * bins_idx / n_fft
    w = np.asarray(window, dtype=np.float64)[:, None]
    wr = w * np.cos(angle)
    wi = w * np.sin(angle)
    return np.concatenate([wr, wi], axis=1).astype(dtype)


def framed_dft(x, window, *, stride: int, n_fft: int, onesided: bool = False,
               precision="highest", output: str = "complex"):
    """Windowed framed DFT of the (..., L) signal: returns complex
    (..., M, bins) with M = (L - frame_length)//stride + 1 — equal (to f32
    accuracy) to `fft(as_windowed(x, frame, stride) * window, n_fft)`.

    `output='power'` returns |z|^2 real directly from the stacked [Re | Im]
    matmul result (re^2 + im^2) without assembling complex values — the
    epilogue fuses into the matmul's output pass (measured ~8% faster than
    complex + abs()**2 on v5e).

    The signal must already be padded (padding modes are handled by the
    caller, spectral/stft.py).
    """
    x = jnp.asarray(x)
    window = jnp.asarray(window)
    frame_length = window.shape[-1]
    num_frames = (x.shape[-1] - frame_length) // stride + 1
    bins = n_fft // 2 + 1 if onesided else n_fft

    weights = jnp.asarray(
        _dft_weights(window, frame_length, n_fft, onesided, DEFAULT_FLOAT)
    )
    acc = blocked_frame_matmul(
        x.astype(DEFAULT_FLOAT), weights,
        window_length=frame_length, stride=stride, num_frames=num_frames,
        precision=precision,
    )
    if output == "power":
        return acc[..., :bins] ** 2 + acc[..., bins:] ** 2
    return lax.complex(acc[..., :bins], acc[..., bins:])


def _idft_weights(window, frame_length: int, n_fft: int, onesided: bool, dtype):
    """Inverse-DFT weight matrix fused with the synthesis-window multiply.

    Full spectrum: G = (1/N) conj(F)[:, :frame_length] * w  (complex,
    returned as the real 2x2 block matrix [[Gr, Gi], [-Gi, Gr]] so
    [Re z | Im z] @ G -> [Re frames | Im frames]).
    Onesided: real irfft weights with the conjugate-symmetry factor of 2 on
    interior bins; returns (2*bins, frame_length) mapping [Re z | Im z] to
    real frames.
    """
    if isinstance(window, jax.core.Tracer):
        # traced window: jnp build with exact integer phase reduction (see
        # _dft_weights); constant-folded by XLA for trace-constant windows
        n = jnp.arange(frame_length, dtype=jnp.int32)[None, :]
        w = window.astype(dtype)[None, :]
        if onesided:
            bins = n_fft // 2 + 1
            k = jnp.arange(bins, dtype=jnp.int32)[:, None]
            factor = np.full((bins, 1), 2.0, np.float64)
            factor[0, 0] = 1.0
            if n_fft % 2 == 0:
                factor[-1, 0] = 1.0
            factor = jnp.asarray(factor.astype(dtype))
            angle = (2.0 * np.pi / n_fft) * ((k * n) % n_fft).astype(dtype)
            g_re = factor * jnp.cos(angle) / n_fft * w
            g_im = -factor * jnp.sin(angle) / n_fft * w
            return jnp.concatenate([g_re, g_im], axis=0)
        k = jnp.arange(n_fft, dtype=jnp.int32)[:, None]
        angle = (2.0 * np.pi / n_fft) * ((k * n) % n_fft).astype(dtype)
        g_re = jnp.cos(angle) / n_fft * w
        g_im = jnp.sin(angle) / n_fft * w
        top = jnp.concatenate([g_re, g_im], axis=1)
        bot = jnp.concatenate([-g_im, g_re], axis=1)
        return jnp.concatenate([top, bot], axis=0)
    n = np.arange(frame_length)[None, :]
    w = np.asarray(window, dtype=np.float64)[None, :]
    if onesided:
        bins = n_fft // 2 + 1
        k = np.arange(bins)[:, None]
        factor = np.full((bins, 1), 2.0)
        factor[0, 0] = 1.0
        if n_fft % 2 == 0:
            factor[-1, 0] = 1.0
        angle = 2.0 * np.pi * k * n / n_fft
        g_re = factor * np.cos(angle) / n_fft * w
        g_im = -factor * np.sin(angle) / n_fft * w
        return jnp.asarray(np.concatenate([g_re, g_im], axis=0).astype(dtype))
    k = np.arange(n_fft)[:, None]
    angle = 2.0 * np.pi * k * n / n_fft
    g_re = np.cos(angle) / n_fft * w
    g_im = np.sin(angle) / n_fft * w
    top = np.concatenate([g_re, g_im], axis=1)      # z_re @ [Gr | Gi]
    bot = np.concatenate([-g_im, g_re], axis=1)     # z_im @ [-Gi | Gr]
    return jnp.asarray(np.concatenate([top, bot], axis=0).astype(dtype))


def framed_idft(z, window, *, n_fft: int, onesided: bool = False,
                precision="highest"):
    """Inverse of `framed_dft` fused with the synthesis-window multiply:
    (..., M, bins) spectrum -> windowed time frames, as MXU matmuls.

    Full-spectrum input returns complex frames (= ifft(z) * window);
    onesided input returns real frames (irfft reconstruction). The caller
    overlap-adds (spectral/stft.py istft).
    """
    z = jnp.asarray(z)
    frame_length = jnp.asarray(window).shape[-1]
    # mirror (i)fft length semantics: pad/truncate the bin axis
    bins = n_fft // 2 + 1 if onesided else n_fft
    if z.shape[-1] < bins:
        z = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(0, bins - z.shape[-1])])
    elif z.shape[-1] > bins:
        z = z[..., :bins]
    weights = _idft_weights(window, frame_length, n_fft, onesided, DEFAULT_FLOAT)
    stacked = jnp.concatenate(
        [jnp.real(z).astype(DEFAULT_FLOAT), jnp.imag(z).astype(DEFAULT_FLOAT)],
        axis=-1,
    )
    out = jnp.matmul(stacked, weights, precision=precision)
    if onesided:
        return out
    return lax.complex(out[..., :frame_length], out[..., frame_length:])


def fir_framed_dft(x, taps, window, *, stride: int, n_fft: int,
                   onesided: bool = False, precision="highest",
                   output: str = "complex"):
    """FIR filtering fused INTO the framed DFT: the spectrum of
    convolve(x, taps, 'same') computed as one blocked matmul chain, with the
    Toeplitz filter matrix folded into the DFT weights at build time:

        z = frames_ext(x) @ (T @ diag(w) @ F)

    where frames_ext are (frame_length + K - 1)-wide windows of the signal
    (the extra K-1 samples supply the convolution context) and
    T[t, j] = taps[j + K - 1 - t] is the banded 'same'-mode Toeplitz. The
    filtered time signal is never materialized — one HBM read of x per
    reshape-block, one write of z. This is the fast path of the
    STFT+FIR north-star chain when the filtered signal itself is not needed.
    """
    x = jnp.asarray(x)
    traced = isinstance(taps, jax.core.Tracer) or isinstance(window, jax.core.Tracer)
    if traced:
        taps = jnp.asarray(taps).reshape(-1)
        window_arr = jnp.asarray(window)
    else:
        taps = np.asarray(taps, dtype=np.float64).reshape(-1)
        window_arr = np.asarray(window, dtype=np.float64)
    k = taps.shape[0]
    frame_length = window_arr.shape[-1]
    length = x.shape[-1]
    if length < frame_length:
        raise ValueError(
            f"window length {frame_length} exceeds signal length {length}"
        )
    num_frames = (length - frame_length) // stride + 1
    bins = n_fft // 2 + 1 if onesided else n_fft

    ext = frame_length + k - 1
    if traced:
        # jnp weight folding (constant-folded by XLA when taps/window are
        # trace-constants); full-f32 matmul for the host-side-equivalent fold
        toeplitz = toeplitz_band(taps.astype(DEFAULT_FLOAT), frame_length, jnp)
        if isinstance(window_arr, jax.core.Tracer):
            dft_w = _dft_weights(window_arr, frame_length, n_fft, onesided,
                                 DEFAULT_FLOAT)
        else:
            dft_w = jnp.asarray(
                _dft_weights(np.asarray(window_arr, np.float64), frame_length,
                             n_fft, onesided, np.float64).astype(DEFAULT_FLOAT)
            )
        weights = jnp.matmul(toeplitz, dft_w, precision="highest")
    else:
        toeplitz = toeplitz_band(taps, frame_length, np)
        dft_w = _dft_weights(window_arr, frame_length, n_fft, onesided, np.float64)
        weights = jnp.asarray((toeplitz @ dft_w).astype(DEFAULT_FLOAT))

    # 'same' alignment: frame m of the filtered signal starts at
    # y[m*stride] = full_conv[m*stride + (k-1)//2]; the extended frame
    # covers x[m*stride - pad_left, ...] with pad_left = (k-1) - (k-1)//2
    pad_left = (k - 1) - (k - 1) // 2
    batch = x.shape[:-1]
    xp = jnp.pad(x.astype(DEFAULT_FLOAT), [(0, 0)] * len(batch) + [(pad_left, k - 1)])
    acc = blocked_frame_matmul(
        xp, weights, window_length=ext, stride=stride, num_frames=num_frames,
        precision=precision,
    )
    if output == "power":
        return acc[..., :bins] ** 2 + acc[..., bins:] ** 2
    return lax.complex(acc[..., :bins], acc[..., bins:])
