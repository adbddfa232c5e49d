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
from nx_signal_tpu.utils.dtypes import DEFAULT_FLOAT

__all__ = ["framed_dft_pallas", "fir_framed_dft_power_pallas",
           "overlap_add_pallas", "pallas_dft_supported"]

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


# ---------------------------------------------- fused FIR + DFT + power

def _power_kernel(x_hbm, w_vmem, o_vmem, x_vmem, sems, *, stride, num_blocks,
                  tile_m, bins, rows_per_channel):
    """One program: a TILE_M-frame tile of the one-sided POWER spectrum for
    one channel. Identical block-DMA/matmul pipeline to `_kernel`, plus the
    re^2 + im^2 epilogue computed while the accumulator is still in VMEM —
    the fusion XLA does not do for the conv-of-blocks chain (the
    (.., frames, 2*bins) intermediate materializes in HBM ahead of the
    power reduction, ROOFLINE.md §3 item 1). Here the intermediate never
    leaves VMEM: HBM traffic is one read of x per block window plus one
    write of the bins-wide power tile."""
    c = pl.program_id(0)
    mt = pl.program_id(1)
    row0 = c * rows_per_channel + mt * tile_m
    for r in range(num_blocks):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(row0 + r, tile_m), :], x_vmem.at[r], sems.at[r]
        ).start()
    acc = jnp.zeros((tile_m, 2 * bins), dtype=jnp.float32)
    for r in range(num_blocks):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(row0 + r, tile_m), :], x_vmem.at[r], sems.at[r]
        ).wait()
        acc = acc + jnp.dot(
            x_vmem[r], w_vmem[pl.ds(r * stride, stride), :],
            preferred_element_type=jnp.float32,
        )
    o_vmem[0, :, :] = acc[:, :bins] ** 2 + acc[:, bins:] ** 2


def fir_framed_dft_power_pallas(x, taps, window, *, stride: int, n_fft: int,
                                onesided: bool = True,
                                interpret: bool = False):
    """The full bench chain as ONE Pallas kernel: FIR (Toeplitz-folded into
    the weights, as kernels.dft.fir_framed_dft) + Hann framed DFT + power
    epilogue in a single VMEM pass. Same contract as
    ``fir_framed_dft(..., output='power')``.

    This is the kernel ROOFLINE.md §3 names as the biggest remaining perf
    lever: it removes the conv intermediate's HBM round-trip (~32 B/sample
    at the bench shape) AND the ≥896-channel memory wall in one stroke.
    Interpreter-verified (tests/test_pallas_kernels.py); the chipless axon
    remote compiler still hangs on Mosaic compiles (probed r01/r02/r03 —
    scripts/pallas_probe.py), so the XLA conv-of-blocks path remains the
    production default until the environment gains Mosaic support.
    """
    x = jnp.asarray(x).astype(DEFAULT_FLOAT)
    if stride % 128 != 0:
        raise ValueError(
            f"pallas fused chain requires stride % 128 == 0, got {stride}")
    taps_np = np.asarray(taps, dtype=np.float64).reshape(-1)
    window_np = np.asarray(window, dtype=np.float64)
    k = taps_np.shape[0]
    frame_length = window_np.shape[-1]
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    if x.ndim != 2:
        x = x.reshape(-1, x.shape[-1])
    channels, length = x.shape
    if length < frame_length:
        raise ValueError(
            f"window length {frame_length} exceeds signal length {length}")
    num_frames = (length - frame_length) // stride + 1
    bins = n_fft // 2 + 1 if onesided else n_fft

    # FIR folded into the DFT weights; rows padded to a whole number of
    # stride-wide blocks (zero rows contribute nothing, as in the XLA
    # conv strategy's kernel build)
    from nx_signal_tpu.kernels.dft import toeplitz_band

    ext = frame_length + k - 1
    toeplitz = toeplitz_band(taps_np, frame_length, np)
    dft_w = _dft_weights(window_np, frame_length, n_fft, onesided, np.float64)
    weights = (toeplitz @ dft_w).astype(np.float32)
    num_blocks = -(-ext // stride)
    pad_rows = num_blocks * stride - ext
    if pad_rows:
        weights = np.pad(weights, [(0, pad_rows), (0, 0)])
    weights = jnp.asarray(weights)

    # 'same' alignment: extended frame m starts at xp[m*stride] with
    # xp = pad(x, (pad_left, k - 1)) — identical to fir_framed_dft
    pad_left = (k - 1) - (k - 1) // 2
    tile_m = min(_TILE_M, max(8, -(-num_frames // 8) * 8))
    num_tiles = -(-num_frames // tile_m)
    rows_per_channel = -(-(num_tiles * tile_m + num_blocks - 1) // 8) * 8
    padded_len = rows_per_channel * stride
    xp = jnp.pad(x, [(0, 0), (pad_left, max(0, padded_len - length - pad_left))])
    xp = xp[:, :padded_len]
    x_rows = xp.reshape(channels * rows_per_channel, stride)

    kernel = functools.partial(
        _power_kernel, stride=stride, num_blocks=num_blocks, tile_m=tile_m,
        bins=bins, rows_per_channel=rows_per_channel,
    )
    out = pl.pallas_call(
        kernel,
        grid=(channels, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # row-matrix in HBM
            pl.BlockSpec(weights.shape, lambda c, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, bins), lambda c, m: (c, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (channels, num_tiles * tile_m, bins), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((num_blocks, tile_m, stride), jnp.float32),
            pltpu.SemaphoreType.DMA((num_blocks,)),
        ],
        interpret=interpret,
    )(x_rows, weights)

    out = out[:, :num_frames, :]
    return out[0] if squeeze else out


# ------------------------------------------------------- OLA (scatter-free)

def _ola_kernel(f_hbm, o_vmem, f_vmem, sem, *, hop, c_blocks, tile_b,
                dma_rows, rows_per_channel):
    """One program: a TILE_B-block tile of the overlap-added signal for one
    channel. The host pads the frame stack with C-1 zero rows on top, so
    output block b is the sum over r of padded_frames[b + (C-1-r),
    r*hop:(r+1)*hop] — one contiguous (tile_b + C - 1)-row DMA window and
    C shifted VMEM row-slices added on the VPU, **in increasing frame
    order** (r descending), the exact association of the production
    deterministic fold (spectral/framing.py:_ola_fold) — so the kernel is
    bit-compatible with it, the property the sharded ISTFT tests rely on.
    No scatter: the reference's indexed_add (nx_signal.ex:723-724) becomes
    shifted adds in VMEM."""
    c = pl.program_id(0)
    bt = pl.program_id(1)
    row0 = c * rows_per_channel + bt * tile_b
    pltpu.make_async_copy(
        f_hbm.at[pl.ds(row0, dma_rows), :], f_vmem, sem
    ).start()
    pltpu.make_async_copy(
        f_hbm.at[pl.ds(row0, dma_rows), :], f_vmem, sem
    ).wait()
    acc = jnp.zeros((tile_b, hop), dtype=jnp.float32)
    for r in range(c_blocks - 1, -1, -1):   # increasing frame order
        acc = acc + f_vmem[pl.ds(c_blocks - 1 - r, tile_b),
                           r * hop:(r + 1) * hop]
    o_vmem[0, :, :] = acc


def overlap_add_pallas(frames, *, overlap_length: int, interpret: bool = False):
    """Overlap-add of an (..., M, N) frame stack — the Pallas counterpart
    of spectral.framing.overlap_and_add (reference: nx_signal.ex:684-727),
    bit-compatible with its deterministic left-fold. Requires the TPU-
    aligned geometry stride % 128 == 0 and N % stride == 0 (the bench/ISTFT
    shapes); the general path stays on the XLA fold."""
    frames = jnp.asarray(frames).astype(DEFAULT_FLOAT)
    if frames.ndim < 2:
        raise ValueError("expected a tensor of rank >= 2")
    m, n = frames.shape[-2], frames.shape[-1]
    if overlap_length >= n:
        raise ValueError("overlap_length must be a number less than the "
                         f"window size {n}, got: {overlap_length}")
    hop = n - overlap_length
    if hop % 128 != 0 or n % hop != 0:
        raise ValueError(
            "pallas overlap_add requires stride % 128 == 0 and "
            f"window % stride == 0, got stride={hop}, window={n}")
    c_blocks = n // hop
    out_length = m * hop + overlap_length
    batch = frames.shape[:-2]
    x = frames.reshape(-1, m, n)
    channels = x.shape[0]

    out_blocks = m + c_blocks - 1
    tile_b = min(256, max(8, -(-out_blocks // 8) * 8))
    num_tiles = -(-out_blocks // tile_b)
    halo = -(-(c_blocks - 1) // 8) * 8     # sublane-aligned DMA over-read
    dma_rows = tile_b + halo
    rows_per_channel = num_tiles * tile_b + halo
    # C-1 zero rows on top (early blocks' missing frames), zero tail below
    x = jnp.pad(x, [(0, 0), (c_blocks - 1, rows_per_channel - (c_blocks - 1) - m), (0, 0)])
    x_rows = x.reshape(channels * rows_per_channel, n)

    kernel = functools.partial(
        _ola_kernel, hop=hop, c_blocks=c_blocks, tile_b=tile_b,
        dma_rows=dma_rows, rows_per_channel=rows_per_channel,
    )
    out = pl.pallas_call(
        kernel,
        grid=(channels, num_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tile_b, hop), lambda c, b: (c, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (channels, num_tiles * tile_b, hop), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((dma_rows, n), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_rows)

    sig = out.reshape(channels, num_tiles * tile_b * hop)[:, :out_length]
    return sig.reshape(*batch, out_length) if batch else sig[0]
