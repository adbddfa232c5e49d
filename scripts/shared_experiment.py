"""Measure the shared-block partial-DFT strategy (fir_framed_dft_shared)
against the dense conv-of-blocks fir_framed_dft on the real chip.

Interleaves the two strategies config-by-config (the tunnel's throughput
drifts between processes but is stable within one — CLAUDE.md), at the
bench chain's shapes: 255-tap FIR + 512-pt Hann framed DFT, hop 128,
one-sided power out, precision='high'.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/shared_experiment.py [channels...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from nx_signal_tpu.kernels.dft import fir_framed_dft, fir_framed_dft_shared
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
    channels = [int(c) for c in sys.argv[1:]] or [16, 128, 512]
    taps = np.asarray(firwin(NUM_TAPS, [2000.0], sampling_rate=float(RATE)))
    window = np.asarray(hann(FRAME))

    dense = jax.jit(lambda x: fir_framed_dft(
        x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
        precision="high", output="power"))
    shared = jax.jit(lambda x: fir_framed_dft_shared(
        x, taps, stride=HOP, n_fft=NFFT, window_coeffs=(0.5, -0.5),
        onesided=True, precision="high", output="power"))

    for ch in channels:
        n = ch * SECONDS * RATE
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(ch, SECONDS * RATE)),
            dtype=jnp.float32)
        for name, fn in [("dense", dense), ("shared", shared)]:
            try:
                dt = timed(fn, x)
                print(f"{ch:5d}ch {name:7s} {dt * 1e3:8.2f} ms/step "
                      f"{n / dt / 1e6:8.1f} Ms/s", flush=True)
            except Exception as e:  # OOM etc.
                print(f"{ch:5d}ch {name:7s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        del x


if __name__ == "__main__":
    main()
