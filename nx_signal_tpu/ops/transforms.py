"""N-D FFT helpers with per-axis length control.

Reference: lib/nx_signal/transforms.ex (fft_nd/ifft_nd as a fold of 1-D FFTs
with optional per-axis lengths). On TPU these map directly onto XLA's batched
FFT; per-axis pad/truncate semantics are preserved via the `s` argument.
"""

import jax.numpy as jnp

__all__ = ["fft_nd", "ifft_nd", "rfft_nd", "irfft_nd", "hilbert"]


def _norm_axes_lengths(x, axes, lengths):
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(int(a) % x.ndim for a in axes)
    if lengths is not None:
        lengths = tuple(int(n) for n in lengths)
        if len(lengths) != len(axes):
            raise ValueError(
                f"lengths must match axes, got {len(lengths)} lengths for {len(axes)} axes"
            )
    return axes, lengths


def fft_nd(x, *, axes=None, lengths=None):
    """Forward FFT over `axes`, padding/truncating each axis to the matching
    entry of `lengths` (reference: transforms.ex:5-12)."""
    x = jnp.asarray(x)
    axes, lengths = _norm_axes_lengths(x, axes, lengths)
    return jnp.fft.fftn(x, s=lengths, axes=axes)


def ifft_nd(x, *, axes=None, lengths=None):
    """Inverse FFT over `axes` (reference: transforms.ex:14-21)."""
    x = jnp.asarray(x)
    axes, lengths = _norm_axes_lengths(x, axes, lengths)
    return jnp.fft.ifftn(x, s=lengths, axes=axes)


def rfft_nd(x, *, axes=None, lengths=None):
    """Real-input forward FFT over `axes` (half-spectrum on the last of
    `axes`) — the TPU-fast path for real convolution: half the FFT work and
    HBM traffic of `fft_nd`."""
    x = jnp.asarray(x)
    axes, lengths = _norm_axes_lengths(x, axes, lengths)
    return jnp.fft.rfftn(x, s=lengths, axes=axes)


def irfft_nd(x, *, axes=None, lengths=None):
    """Inverse of `rfft_nd`; `lengths` are the full (time-domain) lengths."""
    x = jnp.asarray(x)
    axes, lengths = _norm_axes_lengths(x, axes, lengths)
    return jnp.fft.irfftn(x, s=lengths, axes=axes)


def hilbert(x, *, n: int = None, axis: int = -1):
    """Analytic signal via the FFT method (scipy.signal.hilbert semantics):
    real input -> complex output whose real part is x and imaginary part its
    Hilbert transform; |hilbert(x)| is the envelope. Not in the reference;
    completes the envelope/demodulation workflows (ops/mixing.py).

    `n` defaults to the signal length (exact scipy parity). TPU caveat: a
    non-power-of-two FFT lowers to a dense O(N^2) DFT there (CLAUDE.md) —
    for long signals on TPU pass n=utils.shapes.fft_fast_length(length) and
    slice, accepting the slight boundary difference.
    """
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise ValueError("hilbert requires a real input signal")
    n_fft = int(n) if n is not None else x.shape[axis]
    spectrum = jnp.fft.fft(x, n=n_fft, axis=axis)
    h = jnp.zeros(n_fft)
    if n_fft % 2 == 0:
        h = h.at[0].set(1.0).at[n_fft // 2].set(1.0).at[1 : n_fft // 2].set(2.0)
    else:
        h = h.at[0].set(1.0).at[1 : (n_fft + 1) // 2].set(2.0)
    shape = [1] * x.ndim
    shape[axis] = n_fft
    return jnp.fft.ifft(spectrum * h.reshape(shape), axis=axis)
