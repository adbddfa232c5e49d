"""Batch-size sweep of the fused STFT+FIR chain on the real TPU.

The profile (scripts/profile_chain.py) showed ~1.6 ms of fixed per-dispatch
latency through the axon tunnel. This sweep measures the fused chain at
increasing channel counts to find the steady-state per-sample throughput the
chip sustains once that latency is amortized — the number a production
deployment (which batches channels to fill the chip) actually sees.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from nx_signal_tpu.models.pipeline import stft_fir_chain
from nx_signal_tpu.ops.filters import firwin
from nx_signal_tpu.ops.windows import hann

RATE = 48000
SECONDS = 10
FRAME, HOP, NFFT = 512, 128, 512


def main():
    taps = firwin(255, [2000.0], sampling_rate=float(RATE))
    window = hann(FRAME)
    results = {}
    for channels in (16, 32, 64, 128):
        n = channels * SECONDS * RATE
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(channels, SECONDS * RATE)),
            jnp.float32)

        f = jax.jit(lambda t: stft_fir_chain(
            t, taps, window, fft_length=NFFT, overlap_length=FRAME - HOP,
            sampling_rate=float(RATE), onesided=True, return_filtered=False,
            precision="high"))
        out = f(x)
        jax.block_until_ready(out)
        steps = max(4, 512 // channels)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                out = f(x)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / steps)
        ms = best * 1e3
        msps = n / best / 1e6
        results[channels] = {"ms": round(ms, 3), "Msamples/s": round(msps, 1)}
        print(f"channels={channels:4d}  {ms:8.3f} ms/step  {msps:9.1f} Ms/s",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
