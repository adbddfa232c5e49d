"""Pallas TPU kernel: fused framing + window + DFT in one HBM pass.

The Pallas counterpart of kernels/dft.py (the XLA blocked-matmul form).
The host reshapes the signal into stride-wide rows (C*R, stride); one
program computes a TILE_M-frame tile of the spectrum for one channel:
for each of the C = frame/stride reshape-blocks it DMAs the (TILE_M,
stride) row-window starting r rows into the tile (overlapping row windows
— the frame overlap — are re-read from HBM, which is what makes every
in-kernel operand a plain aligned 2-D tile: Mosaic supports neither 1-D->2-D
shape casts nor sublane-unaligned DMA shapes), then accumulates the C
matmuls against the window-scaled DFT weight matrix (resident in VMEM) on
the MXU and writes the (TILE_M, 2*bins) [Re | Im] tile.

Requires stride % 128 == 0 (lane alignment); the dispatcher falls back to
the XLA path otherwise.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nx_signal_tpu.kernels.dft import _dft_weights
from nx_signal_tpu.spectral.framing import _frame_block_widths
from nx_signal_tpu.utils.dtypes import DEFAULT_FLOAT

__all__ = ["framed_dft_pallas", "pallas_dft_supported"]

_TILE_M = 256  # frames per program


def pallas_dft_supported(stride: int, frame_length: int) -> bool:
    """True when the Pallas kernel's alignment constraints hold: hop a
    multiple of the 128-lane width and frame a multiple of the hop."""
    return stride % 128 == 0 and frame_length % stride == 0


def _kernel(x_hbm, w_vmem, o_vmem, x_vmem, sems, *, stride, num_blocks,
            tile_m, out_cols, rows_per_channel):
    c = pl.program_id(0)
    mt = pl.program_id(1)
    row0 = c * rows_per_channel + mt * tile_m
    for r in range(num_blocks):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(row0 + r, tile_m), :], x_vmem.at[r], sems.at[r]
        ).start()
    acc = jnp.zeros((tile_m, out_cols), dtype=jnp.float32)
    for r in range(num_blocks):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(row0 + r, tile_m), :], x_vmem.at[r], sems.at[r]
        ).wait()
        acc = acc + jnp.dot(
            x_vmem[r], w_vmem[pl.ds(r * stride, stride), :],
            preferred_element_type=jnp.float32,
        )
    o_vmem[0, :, :] = acc


def framed_dft_pallas(x, window, *, stride: int, n_fft: int,
                      onesided: bool = False, interpret: bool = False):
    """Windowed framed DFT of a (..., L) signal as a Pallas TPU kernel;
    same contract as kernels.dft.framed_dft (complex (..., M, bins))."""
    x = jnp.asarray(x).astype(DEFAULT_FLOAT)
    window = jnp.asarray(window)
    frame_length = window.shape[-1]
    if not pallas_dft_supported(stride, frame_length):
        raise ValueError(
            "pallas framed_dft requires stride % 128 == 0 and "
            f"frame_length % stride == 0, got stride={stride}, "
            f"frame_length={frame_length}"
        )
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    if x.ndim != 2:
        x = x.reshape(-1, x.shape[-1])
    channels, length = x.shape
    num_frames = (length - frame_length) // stride + 1
    bins = n_fft // 2 + 1 if onesided else n_fft
    out_cols = 2 * bins
    num_blocks = frame_length // stride

    weights = _dft_weights(window, frame_length, n_fft, onesided, DEFAULT_FLOAT)

    tile_m = min(_TILE_M, max(8, -(-num_frames // 8) * 8))
    num_tiles = -(-num_frames // tile_m)
    # rows of width `stride` per channel; sublane-align the row count
    rows_per_channel = -(-(num_tiles * tile_m + num_blocks - 1) // 8) * 8
    padded_len = rows_per_channel * stride
    if padded_len > length:
        x = jnp.pad(x, [(0, 0), (0, padded_len - length)])
    else:
        x = x[:, :padded_len]
    x_rows = x.reshape(channels * rows_per_channel, stride)

    kernel = functools.partial(
        _kernel, stride=stride, num_blocks=num_blocks, tile_m=tile_m,
        out_cols=out_cols, rows_per_channel=rows_per_channel,
    )
    out = pl.pallas_call(
        kernel,
        grid=(channels, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # row-matrix in HBM
            pl.BlockSpec(weights.shape, lambda c, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, out_cols), lambda c, m: (c, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (channels, num_tiles * tile_m, out_cols), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((num_blocks, tile_m, stride), jnp.float32),
            pltpu.SemaphoreType.DMA((num_blocks,)),
        ],
        interpret=interpret,
    )(x_rows, weights)

    out = out[:, :num_frames, :]
    z = lax.complex(out[..., :bins], out[..., bins:])
    return z[0] if squeeze else z
