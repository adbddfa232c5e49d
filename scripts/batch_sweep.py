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
    configs = (16, 32, 64, 128, 256)
    xs, fns = {}, {}
    for channels in configs:
        xs[channels] = jnp.asarray(
            np.random.default_rng(0).normal(size=(channels, SECONDS * RATE)),
            jnp.float32)
        fns[channels] = jax.jit(lambda t: stft_fir_chain(
            t, taps, window, fft_length=NFFT, overlap_length=FRAME - HOP,
            sampling_rate=float(RATE), onesided=True, return_filtered=False,
            precision="high"))
        jax.block_until_ready(fns[channels](xs[channels]))  # compile+warm

    # Interleave configs across rounds so tunnel throughput drift (~±15%,
    # CLAUDE.md) hits all configs equally; report the per-config median.
    times = {c: [] for c in configs}
    for _ in range(5):
        for channels in configs:
            f, x = fns[channels], xs[channels]
            steps = max(2, 128 // channels)
            t0 = time.perf_counter()
            for _ in range(steps):
                out = f(x)
            jax.block_until_ready(out)
            times[channels].append((time.perf_counter() - t0) / steps)
    results = {}
    for channels in configs:
        dt = sorted(times[channels])[len(times[channels]) // 2]
        n = channels * SECONDS * RATE
        results[channels] = {"ms": round(dt * 1e3, 3),
                             "Msamples/s": round(n / dt / 1e6, 1),
                             "all_ms": [round(t * 1e3, 2)
                                        for t in times[channels]]}
        print(f"channels={channels:4d}  {dt * 1e3:8.3f} ms/step  "
              f"{n / dt / 1e6:9.1f} Ms/s  {results[channels]['all_ms']}",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
