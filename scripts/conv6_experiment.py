"""Conv-of-blocks formulation of the fused FIR+DFT chain.

The materialized-frames matmul (current production) writes a 6x-expanded
frames buffer (ROOFLINE.md gap 3). Reformulation: reshape the padded signal
into NON-overlapping (M+5, 128) hop blocks and run ONE lax.conv with a
6-tap kernel over the block axis — kernel tap r holds Toeplitz-weight rows
[r*128, (r+1)*128). Frame m = conv output m consumes blocks m..m+5 =
samples [m*128, m*128 + 768): identical math (2 zero-padded weight rows),
but the 6x input reuse happens inside the conv emitter's VMEM window
instead of through an HBM frames buffer.
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from nx_signal_tpu.kernels.dft import _dft_weights, toeplitz_band
from nx_signal_tpu.models.pipeline import stft_fir_chain
from nx_signal_tpu.ops.filters import firwin
from nx_signal_tpu.ops.windows import hann

RATE, SEC = 48000, 10
FRAME, HOP, NFFT = 512, 128, 512
BINS = NFFT // 2 + 1
PREC = "high"
K = 255


def main():
    taps_np = np.asarray(firwin(K, [2000.0], sampling_rate=float(RATE)),
                         np.float64)
    window_np = np.asarray(hann(FRAME), np.float64)
    t = toeplitz_band(taps_np, FRAME, np)
    w_full = t @ _dft_weights(window_np, FRAME, NFFT, True, np.float64)
    ext = FRAME + K - 1                      # 766
    n_blocks_k = -(-ext // HOP)              # 6
    w_pad = np.zeros((n_blocks_k * HOP, 2 * BINS))
    w_pad[:ext] = w_full
    kernel = jnp.asarray(
        w_pad.reshape(n_blocks_k, HOP, 2 * BINS).astype(np.float32))  # WIO

    pad_left = (K - 1) - (K - 1) // 2
    taps = jnp.asarray(taps_np, jnp.float32)
    window = jnp.asarray(window_np, jnp.float32)

    def conv6(x):
        length = x.shape[-1]
        num_frames = (length - FRAME) // HOP + 1
        # frame m reads xp[m*HOP : m*HOP + 768]; need (num_frames-1)*HOP+768
        needed = (num_frames + n_blocks_k - 1) * HOP
        xp = jnp.pad(x, [(0, 0), (pad_left, needed - length - pad_left)])
        blocks = xp.reshape(x.shape[0], -1, HOP)         # (ch, M+5, 128) NWC
        out = lax.conv_general_dilated(
            blocks, kernel, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=(lax.Precision.HIGH if PREC == "high"
                       else lax.Precision.HIGHEST),
        )  # (ch, M, 514)
        return out[..., :BINS] ** 2 + out[..., BINS:] ** 2

    def chain_prod(x):
        return stft_fir_chain(
            x, taps, window, fft_length=NFFT, overlap_length=FRAME - HOP,
            sampling_rate=float(RATE), onesided=True, return_filtered=False,
            precision=PREC)

    for ch in (16, 128):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(ch, SEC * RATE)),
                        jnp.float32)
        n = ch * SEC * RATE
        ref = chain_prod(x[:2])
        got = conv6(x[:2])
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        for name, fn in [("prod(frames matmul)", chain_prod),
                         ("conv6(block conv)", conv6)]:
            f = jax.jit(fn)
            out = f(x)
            jax.block_until_ready(out)
            ts = []
            steps = max(2, 64 // ch)
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(steps):
                    out = f(x)
                jax.block_until_ready(out)
                ts.append((time.perf_counter() - t0) / steps)
            dt = sorted(ts)[2]
            print(f"ch={ch:4d} {name:20s} {dt*1e3:8.3f} ms "
                  f"{n/dt/1e6:9.1f} Ms/s", flush=True)
        print(f"ch={ch} conv6 rel err vs prod: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
