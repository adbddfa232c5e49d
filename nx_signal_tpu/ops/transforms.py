"""N-D FFT helpers with per-axis length control.

Reference: lib/nx_signal/transforms.ex (fft_nd/ifft_nd as a fold of 1-D FFTs
with optional per-axis lengths). On TPU these map directly onto XLA's batched
FFT; per-axis pad/truncate semantics are preserved via the `s` argument.
"""

import jax.numpy as jnp

__all__ = ["fft_nd", "ifft_nd", "rfft_nd", "irfft_nd"]


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
