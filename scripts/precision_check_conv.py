"""Numerics + speed of the conv-of-blocks chain across MXU precisions.

The 1e-4 scipy-parity claim for precision='high' was measured on the
matmul formulation (r01); this re-validates it for the conv strategy on
real hardware: max relative error of the power spectrogram vs the
precision='highest' reference, plus per-precision throughput at the bench
shape.
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from nx_signal_tpu.models.pipeline import stft_fir_chain
from nx_signal_tpu.ops.filters import firwin
from nx_signal_tpu.ops.windows import hann

RATE, SEC = 48000, 10
FRAME, HOP, NFFT = 512, 128, 512


def main():
    taps = firwin(255, [2000.0], sampling_rate=float(RATE))
    window = hann(FRAME)

    def chain(x, prec):
        return stft_fir_chain(
            x, taps, window, fft_length=NFFT, overlap_length=FRAME - HOP,
            sampling_rate=float(RATE), onesided=True, return_filtered=False,
            precision=prec)

    # numerics on a small shape (cheap compile)
    xs = jnp.asarray(np.random.default_rng(0).normal(size=(4, RATE)),
                     jnp.float32)
    ref = np.asarray(jax.jit(lambda t: chain(t, "highest"))(xs), np.float64)
    scale = np.max(ref)
    for prec in ("high", "default"):
        got = np.asarray(jax.jit(lambda t: chain(t, prec))(xs), np.float64)
        err = np.max(np.abs(got - ref)) / scale
        print(f"precision={prec:8s} max rel err vs highest: {err:.2e}",
              flush=True)

    # speed at the bench shape
    x = jnp.asarray(np.random.default_rng(0).normal(size=(512, SEC * RATE)),
                    jnp.float32)
    n = 512 * SEC * RATE
    for prec in ("highest", "high", "default"):
        f = jax.jit(lambda t: chain(t, prec))
        out = f(x)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(2):
                out = f(x)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / 2)
        dt = sorted(ts)[2]
        print(f"precision={prec:8s} {dt*1e3:8.2f} ms  {n/dt/1e6:8.1f} Ms/s",
              flush=True)


if __name__ == "__main__":
    main()
