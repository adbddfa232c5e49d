"""Round-3 channel ladder for the dense conv-of-blocks chain: re-measure
the 32/64-channel cliff under strategy='conv' (VERDICT r02 item 1b) and
climb past 512 channels (item 1c) — straight 768/1024 and a lax.map
2-chunk 1024 that bounds peak HBM to the 512-channel working set.

Interleaved in ONE process (tunnel throughput drifts between processes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ladder_r3.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from nx_signal_tpu.kernels.dft import fir_framed_dft
from nx_signal_tpu.ops.filters import firwin
from nx_signal_tpu.ops.windows import hann

SECONDS, RATE = 10, 48000
FRAME, HOP, NFFT, NUM_TAPS = 512, 128, 512, 255


def timed(fn, x, reps=5, steps=2):
    out = fn(x)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(x)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def main():
    taps = np.asarray(firwin(NUM_TAPS, [2000.0], sampling_rate=float(RATE)))
    window = np.asarray(hann(FRAME))

    def chain(x):
        return fir_framed_dft(x, taps, window, stride=HOP, n_fft=NFFT,
                              onesided=True, precision="high",
                              output="power")

    dense = jax.jit(chain)

    def chunked(n_chunks):
        def fn(x):
            blocks = x.reshape(n_chunks, x.shape[0] // n_chunks, x.shape[1])
            return lax.map(chain, blocks)
        return jax.jit(fn)

    configs = [
        (32, dense, "dense"), (64, dense, "dense"), (128, dense, "dense"),
        (256, dense, "dense"), (512, dense, "dense"),
        (768, dense, "dense"),
        (1024, dense, "dense"),
        (1024, chunked(2), "map2"),
        (1536, chunked(3), "map3"),
    ]
    for ch, fn, name in configs:
        n = ch * SECONDS * RATE
        try:
            x = jnp.asarray(
                np.random.default_rng(0).normal(size=(ch, SECONDS * RATE)),
                dtype=jnp.float32)
            dt = timed(fn, x)
            print(f"{ch:5d}ch {name:6s} {dt * 1e3:8.2f} ms/step "
                  f"{n / dt / 1e6:8.1f} Ms/s", flush=True)
            del x
        except Exception as e:
            print(f"{ch:5d}ch {name:6s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
