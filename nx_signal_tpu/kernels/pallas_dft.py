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

Round-4 status: Mosaic compiles on the real chip (scripts/pallas_probe.py
prints PALLAS_OK; rounds 1-3 it hung the chipless remote compiler). All
kernels are silicon-verified against the XLA paths, the OLA kernel
bitwise (scripts/pallas_bench_r4.py). Five DMA/compute schedules were
benched (ROOFLINE.md §6): 'pipeline' (index-mapped blocks + VMEM carry,
Mosaic's own double-buffering) is the fastest, but XLA's conv-of-blocks
emitter still wins at every channel count within one process — so the
XLA path stays production (`kernels/dft.py fir_framed_dft kernel='auto'`)
and the Pallas chain is the explicit `kernel='pallas'` option.

Round-4b closed the last algorithmic lever: the SHARED-block partial-DFT
kernel (2x fewer FLOPs, `fir_framed_dft_power_shared_pallas`) also loses
— per-stage silicon probes (ROOFLINE.md §7.1) show its K=384 GEMM +
schedule alone exceeds conv's entire chain (74.9 vs 57 ms at 512ch;
Mosaic's dot rate collapses to ~10 TF/s at small K), while the in-VMEM
epilogue is nearly free (6.3 ms). The kernels stay as the documented,
correctness-tested experiment platform; re-attack needs Mosaic codegen
improvements on small-K dots, not another schedule.
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
           "fir_framed_dft_power_shared_pallas",
           "overlap_add_pallas", "pallas_dft_supported"]

_TILE_M = 256  # frames per program


def _norm_precision(precision):
    """'highest' -> exact-f32 MXU dots; 'high'/'default' -> the manual
    bf16 decomposition (Mosaic supports only DEFAULT/HIGHEST dot
    precisions, so bf16_3x is built from 3 native-bf16 passes)."""
    name = getattr(precision, "name", str(precision)).lower()
    if name in ("highest", "precision.highest"):
        return "highest"
    if name in ("high", "precision.high"):
        return "high"
    return "default"


def _split_bf16(w):
    """hi + lo bf16 pair with hi = bf16(w), lo = bf16(w - hi) — the
    operand split of XLA's bf16_3x algorithm (ROOFLINE.md §2)."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _block_dot(x, w_block, mode):
    """One (tile_m, stride) x (stride, out_cols) MXU contraction at the
    requested precision. `w_block` is f32 for 'highest'/'default' and the
    stacked (2, stride, out_cols) bf16 hi/lo pair for 'high'."""
    if mode == "highest":
        return jnp.dot(x, w_block, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if mode == "default":
        return jnp.dot(x, w_block, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    x_hi, x_lo = _split_bf16(x)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (jnp.dot(x_hi, w_block[0], **kw)
            + jnp.dot(x_hi, w_block[1], **kw)
            + jnp.dot(x_lo, w_block[0], **kw))


def pallas_dft_supported(stride: int, frame_length: int) -> bool:
    """True when the Pallas kernel's alignment constraints hold: hop a
    multiple of the 128-lane width and frame a multiple of the hop.

    Examples:

    >>> from nx_signal_tpu.kernels.pallas_dft import pallas_dft_supported
    >>> pallas_dft_supported(128, 512), pallas_dft_supported(100, 512)
    (True, False)
    """
    return stride % 128 == 0 and frame_length % stride == 0


def _kernel(x_hbm, w_vmem, o_vmem, x_vmem, sems, *, stride, num_blocks,
            tile_m, out_cols, rows_per_channel, mode):
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
        w_block = (w_vmem[:, pl.ds(r * stride, stride), :] if mode == "high"
                   else w_vmem[pl.ds(r * stride, stride), :])
        acc = acc + _block_dot(x_vmem[r], w_block, mode)
    o_vmem[0, :, :] = acc


def framed_dft_pallas(x, window, *, stride: int, n_fft: int,
                      onesided: bool = False, precision="highest",
                      interpret: bool = False):
    """Windowed framed DFT of a (..., L) signal as a Pallas TPU kernel;
    same contract as kernels.dft.framed_dft (complex (..., M, bins)).
    `precision` selects the MXU pass count exactly as in kernels.dft
    ('highest' = f32-exact, 'high' = bf16_3x).

    Examples:

    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.ops.windows import hann
    >>> x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4096)), jnp.float32)
    >>> from nx_signal_tpu.kernels.dft import framed_dft
    >>> from nx_signal_tpu.kernels.pallas_dft import framed_dft_pallas
    >>> z = framed_dft_pallas(x, hann(512), stride=128, n_fft=512,
    ...                       onesided=True, interpret=True)
    >>> zr = framed_dft(x, hann(512), stride=128, n_fft=512, onesided=True)
    >>> z.shape, bool(jnp.abs(z - zr).max() < 1e-4 * jnp.abs(zr).max())
    ((2, 29, 257), True)
    """
    x = jnp.asarray(x).astype(DEFAULT_FLOAT)
    window = jnp.asarray(window)
    frame_length = window.shape[-1]
    if not pallas_dft_supported(stride, frame_length):
        raise ValueError(
            "pallas framed_dft requires stride % 128 == 0 and "
            f"frame_length % stride == 0, got stride={stride}, "
            f"frame_length={frame_length}"
        )
    batch = x.shape[:-1]
    x = x[None] if x.ndim == 1 else x.reshape(-1, x.shape[-1])
    channels, length = x.shape
    num_frames = (length - frame_length) // stride + 1
    bins = n_fft // 2 + 1 if onesided else n_fft
    out_cols = 2 * bins
    num_blocks = frame_length // stride

    weights = _dft_weights(window, frame_length, n_fft, onesided, DEFAULT_FLOAT)
    mode = _norm_precision(precision)
    if mode == "high":
        weights = jnp.stack(_split_bf16(jnp.asarray(weights, jnp.float32)))

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
        out_cols=out_cols, rows_per_channel=rows_per_channel, mode=mode,
    )
    out = pl.pallas_call(
        kernel,
        grid=(channels, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # row-matrix in HBM
            pl.BlockSpec(weights.shape, lambda c, m, _nd=weights.ndim: (0,) * _nd,
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
    return z.reshape(*batch, num_frames, bins)


# ---------------------------------------------- fused FIR + DFT + power

def _power_kernel(x_hbm, w_vmem, o_vmem, x_vmem, sems, *, stride, num_blocks,
                  tile_m, bins, rows_per_channel, mode):
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
        w_block = (w_vmem[:, pl.ds(r * stride, stride), :] if mode == "high"
                   else w_vmem[pl.ds(r * stride, stride), :])
        acc = acc + _block_dot(x_vmem[r], w_block, mode)
    o_vmem[0, :, :] = acc[:, :bins] ** 2 + acc[:, bins:] ** 2


def _power_kernel_window(x_hbm, w_vmem, o_vmem, x_vmem, sem, *, stride,
                         num_blocks, tile_m, dma_rows, bins,
                         rows_per_channel, mode):
    """Single-window variant of `_power_kernel`: ONE (tile_m + halo,
    stride) DMA per program instead of num_blocks overlapping block
    windows — the frame overlap becomes sublane-offset VMEM row slices of
    the same resident window, cutting the x HBM read traffic by the
    ~num_blocks factor (6x at the bench geometry). The bf16 hi/lo operand
    split for 'high' precision is computed once per window, not per
    block."""
    c = pl.program_id(0)
    mt = pl.program_id(1)
    row0 = c * rows_per_channel + mt * tile_m
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(row0, dma_rows), :], x_vmem, sem)
    cp.start()
    cp.wait()
    if mode == "high":
        x_hi, x_lo = _split_bf16(x_vmem[...])
    acc = jnp.zeros((tile_m, 2 * bins), dtype=jnp.float32)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    for r in range(num_blocks):
        if mode == "high":
            a_hi = x_hi[r:r + tile_m, :]
            a_lo = x_lo[r:r + tile_m, :]
            w_hi = w_vmem[0, pl.ds(r * stride, stride), :]
            w_lo = w_vmem[1, pl.ds(r * stride, stride), :]
            acc = acc + (jnp.dot(a_hi, w_hi, **kw)
                         + jnp.dot(a_hi, w_lo, **kw)
                         + jnp.dot(a_lo, w_hi, **kw))
        else:
            acc = acc + _block_dot(
                x_vmem[pl.ds(r, tile_m), :],
                w_vmem[pl.ds(r * stride, stride), :], mode)
    o_vmem[0, :, :] = acc[:, :bins] ** 2 + acc[:, bins:] ** 2


def _power_kernel_concat(x_hbm, w_vmem, o_vmem, x_vmem, f_vmem, sem, *,
                         stride, num_blocks, tile_m, dma_rows, bins,
                         rows_per_channel, mode):
    """Concat variant: same single-window DMA as `_power_kernel_window`,
    but the num_blocks shifted row-slices are copied side by side into a
    (tile_m, num_blocks*stride) VMEM scratch so the whole extended frame
    contracts in ONE K = num_blocks*stride MXU dot per pass — trading
    VPU copy traffic for maximal MXU pipeline occupancy."""
    c = pl.program_id(0)
    mt = pl.program_id(1)
    row0 = c * rows_per_channel + mt * tile_m
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(row0, dma_rows), :], x_vmem, sem)
    cp.start()
    cp.wait()
    for r in range(num_blocks):
        f_vmem[:, r * stride:(r + 1) * stride] = x_vmem[pl.ds(r, tile_m), :]
    frames = f_vmem[...]
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    if mode == "high":
        f_hi, f_lo = _split_bf16(frames)
        acc = (jnp.dot(f_hi, w_vmem[0], **kw)
               + jnp.dot(f_hi, w_vmem[1], **kw)
               + jnp.dot(f_lo, w_vmem[0], **kw))
    else:
        acc = _block_dot(frames, w_vmem[...], mode)
    o_vmem[0, :, :] = acc[:, :bins] ** 2 + acc[:, bins:] ** 2


def _power_kernel_pipeline(x_vmem, w_vmem, o_vmem, carry, frames, *,
                           stride, num_blocks, tile_m, bins, num_tiles,
                           mode):
    """Pipelined variant: NO manual DMA — `x_vmem` is an index-mapped
    input block Mosaic prefetches/double-buffers itself, the schedule the
    XLA conv emitter uses. One-tile lag: program p holds block p in
    `x_vmem` and block p-1 in the persistent `carry` scratch, and computes
    output tile p-1 from carry + the first halo rows of the current block
    (both VMEM-resident). The output index map sends consecutive programs
    (p=0, p=1) to the same tile-0 block, so p=0's pass writes nothing
    visible — its buffer is overwritten by p=1 before the single
    write-back."""
    p = pl.program_id(1)
    cur = x_vmem[0]
    for r in range(num_blocks):
        if r == 0:
            frames[:, :stride] = carry[...]
        else:
            src = jnp.concatenate(
                [carry[r:, :], cur[:r, :]], axis=0)
            frames[:, r * stride:(r + 1) * stride] = src
    fr = frames[...]
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    if mode == "high":
        f_hi, f_lo = _split_bf16(fr)
        acc = (jnp.dot(f_hi, w_vmem[0], **kw)
               + jnp.dot(f_hi, w_vmem[1], **kw)
               + jnp.dot(f_lo, w_vmem[0], **kw))
    else:
        acc = _block_dot(fr, w_vmem[...], mode)
    o_vmem[0, :, :] = acc[:, :bins] ** 2 + acc[:, bins:] ** 2
    carry[...] = cur


def fir_framed_dft_power_pallas(x, taps, window, *, stride: int, n_fft: int,
                                onesided: bool = True, precision="highest",
                                tile_m: int = None, dma: str = "window",
                                interpret: bool = False):
    """The full bench chain as ONE Pallas kernel: FIR (Toeplitz-folded into
    the weights, as kernels.dft.fir_framed_dft) + Hann framed DFT + power
    epilogue in a single VMEM pass. Same contract as
    ``fir_framed_dft(..., output='power')``.

    This is the kernel ROOFLINE.md §3 names as the biggest remaining perf
    lever: it removes the conv intermediate's HBM round-trip (~32 B/sample
    at the bench shape) AND the ≥896-channel memory wall in one stroke.
    First compiled on silicon in round 4 (the chipless remote compiler
    gained Mosaic support — scripts/pallas_probe.py): verified vs the XLA
    path at 2e-7 ('highest') / 4e-6 ('high') relative error
    (scripts/pallas_bench_r4.py). Mosaic exposes only DEFAULT/HIGHEST dot
    precisions, so 'high' (bf16_3x) runs as a manual 3-pass hi/lo bf16
    operand split (`_split_bf16`) — same algorithm XLA uses.

    `dma` selects the memory schedule (all bitwise-identical outputs,
    silicon numbers in ROOFLINE.md §6): 'pipeline' — the fastest — has no
    manual DMA at all (index-mapped input blocks Mosaic double-buffers, a
    persistent VMEM carry, one-tile output lag); 'window' (default for
    its minimal VMEM) issues one (tile_m + halo, stride) DMA per program
    and slices the overlap out of VMEM; 'blocks' re-reads each
    overlapping block window from HBM; 'concat'/'concat_pad' copy the
    shifted slices side by side for one K=ext dot per pass (pad =
    lane-aligned Re/Im halves). `tile_m` is the frames-per-program MXU
    tile (default 256).
    
    Examples:

    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.ops.windows import hann
    >>> x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4096)), jnp.float32)
    >>> from nx_signal_tpu.kernels.dft import fir_framed_dft
    >>> from nx_signal_tpu.kernels.pallas_dft import fir_framed_dft_power_pallas
    >>> taps = jnp.asarray(np.random.default_rng(1).normal(size=255), jnp.float32)
    >>> p = fir_framed_dft_power_pallas(x, taps, hann(512), stride=128,
    ...                                 n_fft=512, interpret=True)
    >>> pr = fir_framed_dft(x, taps, hann(512), stride=128, n_fft=512,
    ...                     onesided=True, output='power', kernel='xla')
    >>> p.shape, bool(jnp.abs(p - pr).max() < 1e-4 * pr.max())
    ((2, 29, 257), True)
    """
    x = jnp.asarray(x).astype(DEFAULT_FLOAT)
    if stride % 128 != 0:
        raise ValueError(
            f"pallas fused chain requires stride % 128 == 0, got {stride}")
    if dma not in ("blocks", "window", "concat", "concat_pad", "pipeline"):
        raise ValueError(
            "dma must be one of 'blocks', 'window', 'concat', 'concat_pad', "
            f"'pipeline', got {dma!r}")
    taps_np = np.asarray(taps, dtype=np.float64).reshape(-1)
    window_np = np.asarray(window, dtype=np.float64)
    k = taps_np.shape[0]
    frame_length = window_np.shape[-1]
    batch = x.shape[:-1]
    x = x[None] if x.ndim == 1 else x.reshape(-1, x.shape[-1])
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
    bins_eff = bins
    if dma == "concat_pad":
        # lane-align the Re/Im halves: the power epilogue's
        # acc[:, bins:] slice starts at lane `bins` (257 at the bench
        # shape) — padding each half to a 128 multiple keeps every
        # in-kernel slice relayout-free at the cost of wasted columns
        bins_eff = -(-bins // 128) * 128
        z = np.zeros((weights.shape[0], bins_eff - bins), weights.dtype)
        weights = np.concatenate(
            [weights[:, :bins], z, weights[:, bins:], z], axis=1)
    weights = jnp.asarray(weights)
    mode = _norm_precision(precision)
    if mode == "high":
        weights = jnp.stack(_split_bf16(weights))

    # 'same' alignment: extended frame m starts at xp[m*stride] with
    # xp = pad(x, (pad_left, k - 1)) — identical to fir_framed_dft
    pad_left = (k - 1) - (k - 1) // 2
    if tile_m is None:
        tile_m = _TILE_M
    tile_m = min(tile_m, max(8, -(-num_frames // 8) * 8))
    tile_m = -(-tile_m // 8) * 8   # sublane(8)-align the DMA/tile shapes
    num_tiles = -(-num_frames // tile_m)
    if dma == "pipeline":
        if num_blocks > tile_m:
            raise ValueError("pipeline schedule needs tile_m >= num_blocks")
        rows_per_channel = (num_tiles + 1) * tile_m
    elif dma in ("window", "concat", "concat_pad"):
        halo = -(-(num_blocks - 1) // 8) * 8
        dma_rows = tile_m + halo
        rows_per_channel = num_tiles * tile_m + halo
    else:
        rows_per_channel = -(-(num_tiles * tile_m + num_blocks - 1) // 8) * 8
    padded_len = rows_per_channel * stride
    xp = jnp.pad(x, [(0, 0), (pad_left, max(0, padded_len - length - pad_left))])
    xp = xp[:, :padded_len]
    x_rows = xp.reshape(channels * rows_per_channel, stride)

    if dma == "pipeline":
        x_blocks = xp.reshape(channels, rows_per_channel, stride)
        kernel = functools.partial(
            _power_kernel_pipeline, stride=stride, num_blocks=num_blocks,
            tile_m=tile_m, bins=bins_eff, num_tiles=num_tiles, mode=mode,
        )
        out = pl.pallas_call(
            kernel,
            grid=(channels, num_tiles + 1),
            in_specs=[
                pl.BlockSpec((1, tile_m, stride), lambda c, p: (c, p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(weights.shape,
                             lambda c, p, _nd=weights.ndim: (0,) * _nd,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_m, bins_eff),
                lambda c, p: (c, jnp.maximum(p - 1, 0), 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (channels, num_tiles * tile_m, bins_eff), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tile_m, stride), jnp.float32),
                pltpu.VMEM((tile_m, num_blocks * stride), jnp.float32),
            ],
            interpret=interpret,
        )(x_blocks, weights)
        out = out[:, :num_frames, :bins]
        return out.reshape(*batch, num_frames, bins)

    if dma in ("concat", "concat_pad"):
        kernel = functools.partial(
            _power_kernel_concat, stride=stride, num_blocks=num_blocks,
            tile_m=tile_m, dma_rows=dma_rows, bins=bins_eff,
            rows_per_channel=rows_per_channel, mode=mode,
        )
        scratch = [pltpu.VMEM((dma_rows, stride), jnp.float32),
                   pltpu.VMEM((tile_m, num_blocks * stride), jnp.float32),
                   pltpu.SemaphoreType.DMA]
    elif dma == "window":
        kernel = functools.partial(
            _power_kernel_window, stride=stride, num_blocks=num_blocks,
            tile_m=tile_m, dma_rows=dma_rows, bins=bins,
            rows_per_channel=rows_per_channel, mode=mode,
        )
        scratch = [pltpu.VMEM((dma_rows, stride), jnp.float32),
                   pltpu.SemaphoreType.DMA]
    else:
        kernel = functools.partial(
            _power_kernel, stride=stride, num_blocks=num_blocks,
            tile_m=tile_m, bins=bins, rows_per_channel=rows_per_channel,
            mode=mode,
        )
        scratch = [pltpu.VMEM((num_blocks, tile_m, stride), jnp.float32),
                   pltpu.SemaphoreType.DMA((num_blocks,))]
    out = pl.pallas_call(
        kernel,
        grid=(channels, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # row-matrix in HBM
            pl.BlockSpec(weights.shape, lambda c, m, _nd=weights.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, bins_eff), lambda c, m: (c, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (channels, num_tiles * tile_m, bins_eff), jnp.float32
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x_rows, weights)

    out = out[:, :num_frames, :bins]
    return out.reshape(*batch, num_frames, bins)


# ------------------------------- shared-block partial DFT (2x FLOP cut)

def _shared_epilogue(p, tw_vmem, o_vmem, *, j_taps, tile_m, bins, wcoeffs,
                     combine="sliding", stages="full"):
    """VMEM epilogue shared by both shared-block schedules: twiddle
    combine across the J overlapping blocks (stage B), the cosine-sum
    window as its sparse spectral convolution with conjugate reflection
    at DC/Nyquist (stage C, one-sided even-n_fft layout — the exact math
    of kernels.dft.fir_framed_dft_shared), then the power epilogue.
    `p` is the (nb_pad, 2*bins) stacked [Re | Im] partial-DFT block
    matrix still resident in VMEM — under XLA these stages cost 2x the
    chain (ROOFLINE.md §4, elementwise HBM glue); here they are VPU ops
    on resident tiles.

    `combine` selects the stage-B form: 'direct' slices P at the J row
    offsets and multiplies by per-j twiddle rows (2*J shifted
    multiply-adds over the full (nb_pad, 2*bins) tile); 'sliding'
    exploits tw[j, k] = w_k^j with w_k^J == 1 (stride*J == n_fft): the
    per-BLOCK phase w_k^b and per-FRAME phase w_k^(-m) are both
    period-J in the row index, so the host bakes them into aligned
    (rows, 2*bins) tiles and stage B collapses to two aligned complex
    multiplies plus a J-row sliding SUM — 2*(J-1) shifted adds over
    half-width tiles, ~2.7x less relayout traffic at J=4 (the dominant
    epilogue cost measured on silicon, ROOFLINE.md §7).

    `stages` is the silicon cost-probe hook: 'gemm' stops after the
    GEMM + power (measures stage A alone), 'nowin' skips the spectral
    window conv, 'full' is production."""
    p_re, p_im = p[:, :bins], p[:, bins:]
    if stages == "gemm":
        o_vmem[0, :, :] = (p_re[:tile_m, :] ** 2 + p_im[:tile_m, :] ** 2)
        return
    if combine == "sliding":
        # tw_vmem rows: [0:nb) block-phase Re, [nb:2nb) block-phase Im,
        # [2nb:2nb+tile_m) frame-phase Re, ... (built by the host)
        nb = p.shape[0]
        br = tw_vmem[pl.ds(0, nb), :]
        bi = tw_vmem[pl.ds(nb, nb), :]
        q_re = p_re * br - p_im * bi
        q_im = p_re * bi + p_im * br
        s_re = q_re[:tile_m, :]
        s_im = q_im[:tile_m, :]
        for j in range(1, j_taps):
            s_re = s_re + q_re[j:j + tile_m, :]
            s_im = s_im + q_im[j:j + tile_m, :]
        mr = tw_vmem[pl.ds(2 * nb, tile_m), :]
        mi = tw_vmem[pl.ds(2 * nb + tile_m, tile_m), :]
        # X = S * conj(w^m):  (mr, mi) hold w_k^m
        x_re = s_re * mr + s_im * mi
        x_im = s_im * mr - s_re * mi
    else:
        x_re = jnp.zeros((tile_m, bins), jnp.float32)
        x_im = jnp.zeros((tile_m, bins), jnp.float32)
        for j in range(j_taps):
            twr = tw_vmem[pl.ds(j, 1), :]
            twi = tw_vmem[pl.ds(j_taps + j, 1), :]
            pr = p_re[j:j + tile_m, :]
            pi = p_im[j:j + tile_m, :]
            x_re = x_re + twr * pr - twi * pi
            x_im = x_im + twr * pi + twi * pr
    if stages == "nowin":
        o_vmem[0, :, :] = x_re ** 2 + x_im ** 2
        return
    out_r = wcoeffs[0] * x_re
    out_i = wcoeffs[0] * x_im
    for c, b in enumerate(wcoeffs[1:], start=1):
        if b == 0.0:
            continue
        # X[k-c]: k < c reflects through DC with conjugation
        mr = jnp.concatenate(
            [x_re[:, q:q + 1] for q in range(c, 0, -1)]
            + [x_re[:, :bins - c]], axis=1)
        mi = jnp.concatenate(
            [-x_im[:, q:q + 1] for q in range(c, 0, -1)]
            + [x_im[:, :bins - c]], axis=1)
        # X[k+c]: beyond Nyquist reflects with conjugation (even n_fft)
        pr_ = jnp.concatenate(
            [x_re[:, c:]]
            + [x_re[:, bins - 1 - q:bins - q] for q in range(1, c + 1)],
            axis=1)
        pi_ = jnp.concatenate(
            [x_im[:, c:]]
            + [-x_im[:, bins - 1 - q:bins - q] for q in range(1, c + 1)],
            axis=1)
        out_r = out_r + (b / 2.0) * (mr + pr_)
        out_i = out_i + (b / 2.0) * (mi + pi_)
    o_vmem[0, :, :] = out_r ** 2 + out_i ** 2


def _shared_power_kernel_window(x_hbm, w_vmem, tw_vmem, o_vmem, x_vmem,
                                f_vmem, sem, *, stride, irpb, j_taps,
                                tile_m, nb_pad, dma_rows, bins,
                                rows_per_channel, mode, wcoeffs,
                                combine, stages):
    """Single-window DMA schedule of the shared-block chain: one
    (tile_m + halo, stride) DMA per program; the nb_pad = tile_m-plus-halo
    hop blocks' extended rows are concatenated side by side
    ('concat'-style) and contracted in ONE K = irpb*stride dot — half the
    MXU work of the full-FLOP kernels, because each hop block's partial
    DFT is computed once and reused by all J frames that overlap it."""
    c = pl.program_id(0)
    mt = pl.program_id(1)
    row0 = c * rows_per_channel + mt * tile_m
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(row0, dma_rows), :], x_vmem, sem)
    cp.start()
    cp.wait()
    for r in range(irpb):
        f_vmem[:, r * stride:(r + 1) * stride] = x_vmem[pl.ds(r, nb_pad), :]
    p = _block_dot_split(f_vmem[...], w_vmem, mode)
    _shared_epilogue(p, tw_vmem, o_vmem, j_taps=j_taps, tile_m=tile_m,
                     bins=bins, wcoeffs=wcoeffs, combine=combine,
                     stages=stages)


def _shared_power_kernel_pipeline(x_vmem, w_vmem, tw_vmem, o_vmem, carry,
                                  f_vmem, *, stride, irpb, j_taps, tile_m,
                                  nb_pad, bins, mode, wcoeffs,
                                  combine, stages):
    """Pipelined schedule of the shared-block chain: no manual DMA —
    index-mapped input blocks Mosaic double-buffers, a persistent VMEM
    carry of the previous block, one-tile output lag (the fastest
    full-FLOP schedule, ROOFLINE.md §6 probe4, here on half the FLOPs).
    Program p holds block p in `x_vmem`, block p-1 in `carry`, and
    computes output tile p-1 from carry rows + the halo head of the
    current block."""
    cur = x_vmem[0]
    for r in range(irpb):
        src = jnp.concatenate(
            [carry[r:, :], cur[:r + nb_pad - tile_m, :]], axis=0)
        f_vmem[:, r * stride:(r + 1) * stride] = src
    p = _block_dot_split(f_vmem[...], w_vmem, mode)
    _shared_epilogue(p, tw_vmem, o_vmem, j_taps=j_taps, tile_m=tile_m,
                     bins=bins, wcoeffs=wcoeffs, combine=combine,
                     stages=stages)
    carry[...] = cur


def _block_dot_split(frames, w_vmem, mode):
    """One whole-frame contraction at the requested precision, splitting
    the frame operand once ('high' = manual bf16_3x)."""
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    if mode == "high":
        f_hi, f_lo = _split_bf16(frames)
        return (jnp.dot(f_hi, w_vmem[0], **kw)
                + jnp.dot(f_hi, w_vmem[1], **kw)
                + jnp.dot(f_lo, w_vmem[0], **kw))
    return _block_dot(frames, w_vmem[...], mode)


def fir_framed_dft_power_shared_pallas(
        x, taps, *, stride: int, n_fft: int, window_coeffs,
        precision="highest", tile_m: int = None, dma: str = "window",
        combine: str = "sliding", stages: str = "full",
        interpret: bool = False):
    """The bench chain via SHARED hop-block partial DFTs as one Pallas
    kernel — the 2x-fewer-FLOPs reformulation of
    ``fir_framed_dft(..., output='power')`` for cosine-sum windows with
    frame_length == n_fft and stride | n_fft
    (kernels.dft.fir_framed_dft_shared is the XLA reference math; it
    LOSES 2x under XLA because the twiddle combine and spectral window
    run as elementwise HBM passes, ROOFLINE.md §4 — in-kernel they are
    VPU epilogue ops on the VMEM-resident tile, which is the entire bet).

    Per input sample the MXU work is 2*(stride+K-1 rounded up to whole
    blocks)*(2*bins)/stride FLOP instead of the dense chain's
    2*(n_fft+K-1)*(2*bins)/stride — 3084 vs 6152 at the bench geometry,
    lifting the MXU-bound speed of light from 10.7 to ~21 Gsamples/s
    (ROOFLINE.md §1/§4). Equal to fir_framed_dft up to f32 association
    (NOT bitwise — different summation order).

    `window_coeffs` are the signed cosine-sum coefficients
    (`recognize_cosine_window`); output is the one-sided POWER spectrum
    (the chain's production epilogue). `dma` selects 'window' (one DMA
    + halo per program — the better schedule HERE; 'pipeline' inverts
    for this kernel, ROOFLINE.md §7.1 probe 1). `combine`/`stages` are
    the epilogue form and the silicon cost-probe hook (`_shared_epilogue`).

    SILICON VERDICT (ROOFLINE.md §7.1, probes 1-3): REFUTED as a
    production path. The epilogue bet paid off (combine + window cost
    6.3 ms of 81 at 512ch with 'sliding') but the GEMM+schedule stage
    alone (74.9 ms) exceeds the conv emitter's entire chain (57 ms) —
    Mosaic's dot rate collapses to ~10 TF/s at K=384 (vs 20.7 at
    K=768), so the 2x FLOP cut bought nothing. Kept as the documented
    experiment platform behind `kernel='pallas_shared'`.
    
    Examples:

    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.ops.windows import hann
    >>> x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4096)), jnp.float32)
    >>> from nx_signal_tpu.kernels.dft import fir_framed_dft
    >>> from nx_signal_tpu.kernels.pallas_dft import (
    ...     fir_framed_dft_power_shared_pallas)
    >>> taps = jnp.asarray(np.random.default_rng(1).normal(size=255), jnp.float32)
    >>> p = fir_framed_dft_power_shared_pallas(
    ...     x, taps, stride=128, n_fft=512, window_coeffs=(0.5, -0.5),
    ...     interpret=True)   # (0.5, -0.5) == periodic Hann
    >>> pr = fir_framed_dft(x, taps, hann(512), stride=128, n_fft=512,
    ...                     onesided=True, output='power', kernel='xla')
    >>> p.shape, bool(jnp.abs(p - pr).max() < 1e-4 * pr.max())
    ((2, 29, 257), True)
    """
    x = jnp.asarray(x).astype(DEFAULT_FLOAT)
    if stride % 128 != 0:
        raise ValueError(
            f"pallas shared chain requires stride % 128 == 0, got {stride}")
    if n_fft % stride != 0:
        raise ValueError(
            f"shared-block strategy needs stride | n_fft, got {stride}, {n_fft}")
    if n_fft % 2 != 0:
        raise ValueError("onesided shared-block strategy needs even n_fft")
    if dma not in ("window", "pipeline"):
        raise ValueError(f"dma must be 'window' or 'pipeline', got {dma!r}")
    if combine not in ("sliding", "direct"):
        raise ValueError(f"combine must be 'sliding' or 'direct', got {combine!r}")
    if stages not in ("full", "nowin", "gemm"):
        raise ValueError(f"stages must be 'full', 'nowin' or 'gemm', got {stages!r}")
    wcoeffs = tuple(float(b) for b in window_coeffs)
    bins = n_fft // 2 + 1
    if len(wcoeffs) < 1 or len(wcoeffs) - 1 >= bins - 1:
        raise ValueError("window_coeffs must have 1..bins-1 terms")
    j_taps = n_fft // stride
    batch = x.shape[:-1]
    x = x[None] if x.ndim == 1 else x.reshape(-1, x.shape[-1])
    channels, length = x.shape
    if length < n_fft:
        raise ValueError(
            f"window length {n_fft} exceeds signal length {length}")
    num_frames = (length - n_fft) // stride + 1

    # FIR folded into the per-block partial-DFT weights (stride-wide E
    # matrix — NOT the frame-wide one; that is the FLOP cut)
    from nx_signal_tpu.kernels.dft import _dft_weights, toeplitz_band

    if taps is None:
        taps_np = np.ones(1, dtype=np.float64)
    else:
        taps_np = np.asarray(taps, dtype=np.float64).reshape(-1)
    k = taps_np.shape[0]
    ext = stride + k - 1
    irpb = -(-ext // stride)                    # input rows per block
    ones = np.ones(stride, dtype=np.float64)
    e_mat = _dft_weights(ones, stride, n_fft, True, np.float64)
    weights = (toeplitz_band(taps_np, stride, np) @ e_mat).astype(np.float32)
    pad_rows = irpb * stride - ext
    if pad_rows:
        weights = np.pad(weights, [(0, pad_rows), (0, 0)])
    weights = jnp.asarray(weights)
    mode = _norm_precision(precision)
    if mode == "high":
        weights = jnp.stack(_split_bf16(weights))

    pad_left = (k - 1) - (k - 1) // 2
    if tile_m is None:
        tile_m = _TILE_M
    tile_m = min(tile_m, max(8, -(-num_frames // 8) * 8))
    tile_m = -(-tile_m // 8) * 8
    num_tiles = -(-num_frames // tile_m)
    nb_pad = tile_m + -(-(j_taps - 1) // 8) * 8   # blocks per tile, aligned
    halo = -(-(nb_pad - tile_m + irpb - 1) // 8) * 8

    def _phase(rows):
        # w_k^r = e^(-2i*pi*k*r*stride/n_fft) for local row r; period J in
        # r, and J | tile_m, so local == global phases for every program
        rk = (np.arange(rows)[:, None] * np.arange(bins)[None, :]
              * stride) % n_fft
        a = -2.0 * np.pi * rk / n_fft
        return np.cos(a), np.sin(a)

    if combine == "sliding":
        br, bi = _phase(nb_pad)      # per-block phase w_k^b
        mr, mi = _phase(tile_m)      # per-frame phase w_k^m (conj-applied)
        tw = jnp.asarray(np.concatenate([br, bi, mr, mi]).astype(np.float32))
    else:
        jr, ji = _phase(j_taps)      # per-j twiddle rows (direct combine)
        tw = jnp.asarray(np.concatenate([jr, ji]).astype(np.float32))

    if dma == "pipeline":
        if nb_pad - tile_m + irpb - 1 > tile_m:
            raise ValueError("pipeline schedule needs tile_m >= halo rows")
        rows_per_channel = (num_tiles + 1) * tile_m
    else:
        rows_per_channel = num_tiles * tile_m + halo
    padded_len = rows_per_channel * stride
    xp = jnp.pad(x, [(0, 0), (pad_left, max(0, padded_len - length - pad_left))])
    xp = xp[:, :padded_len]

    if dma == "pipeline":
        x_blocks = xp.reshape(channels, rows_per_channel, stride)
        kernel = functools.partial(
            _shared_power_kernel_pipeline, stride=stride, irpb=irpb,
            j_taps=j_taps, tile_m=tile_m, nb_pad=nb_pad, bins=bins,
            mode=mode, wcoeffs=wcoeffs, combine=combine, stages=stages,
        )
        out = pl.pallas_call(
            kernel,
            grid=(channels, num_tiles + 1),
            in_specs=[
                pl.BlockSpec((1, tile_m, stride), lambda c, p: (c, p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(weights.shape,
                             lambda c, p, _nd=weights.ndim: (0,) * _nd,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tw.shape, lambda c, p: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_m, bins),
                lambda c, p: (c, jnp.maximum(p - 1, 0), 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (channels, num_tiles * tile_m, bins), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tile_m, stride), jnp.float32),
                pltpu.VMEM((nb_pad, irpb * stride), jnp.float32),
            ],
            interpret=interpret,
        )(x_blocks, weights, tw)
        out = out[:, :num_frames, :]
        return out.reshape(*batch, num_frames, bins)

    x_rows = xp.reshape(channels * rows_per_channel, stride)
    dma_rows = tile_m + halo
    kernel = functools.partial(
        _shared_power_kernel_window, stride=stride, irpb=irpb,
        j_taps=j_taps, tile_m=tile_m, nb_pad=nb_pad, dma_rows=dma_rows,
        bins=bins, rows_per_channel=rows_per_channel, mode=mode,
        wcoeffs=wcoeffs, combine=combine, stages=stages,
    )
    out = pl.pallas_call(
        kernel,
        grid=(channels, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # row-matrix in HBM
            pl.BlockSpec(weights.shape,
                         lambda c, m, _nd=weights.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tw.shape, lambda c, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, bins), lambda c, m: (c, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (channels, num_tiles * tile_m, bins), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((dma_rows, stride), jnp.float32),
            pltpu.VMEM((nb_pad, irpb * stride), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_rows, weights, tw)
    out = out[:, :num_frames, :]
    return out.reshape(*batch, num_frames, bins)


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
    shapes); the general path stays on the XLA fold.

    Examples:

    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.kernels.pallas_dft import overlap_add_pallas
    >>> from nx_signal_tpu.spectral.framing import overlap_and_add
    >>> f = jnp.asarray(np.random.default_rng(0).normal(size=(12, 512)), jnp.float32)
    >>> y = overlap_add_pallas(f, overlap_length=384, interpret=True)
    >>> yr = overlap_and_add(f, overlap_length=384)
    >>> y.shape, bool((y == yr).all())   # BIT-identical to the fold
    ((1920,), True)
    """
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
