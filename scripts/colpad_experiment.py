"""Column-padding A/B: does padding the fused FIR+DFT weight matrix from
514 to 640 columns (the next 128-lane multiple) speed up the END-TO-END
conv-of-blocks chain the way it speeds up the plain GEMM?

gemm_probe_r3 (2026-08-20, one process): (M, 766) @ (766, 640) ran in
45.66 ms vs 49.51 ms for (766, 514) — 24.5% more FLOPs in 8% less time.
The chain lowers to the TPU convolution emitter, not the dot emitter, so
this A/B measures the real thing: dense 514-column chain vs a 640-column
variant whose power epilogue reads re from cols [0,257) and im from
[320,577) of the padded intermediate.

Interleaved in one process. Usage:
PYTHONPATH=/root/repo:/root/.axon_site python scripts/colpad_experiment.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from nx_signal_tpu.kernels.dft import (
    _dft_weights,
    blocked_frame_matmul,
    fir_framed_dft,
    toeplitz_band,
)
from nx_signal_tpu.ops.filters import firwin
from nx_signal_tpu.ops.windows import hann

SECONDS, RATE = 10, 48000
FRAME, HOP, NFFT, NUM_TAPS = 512, 128, 512, 255
EXT = FRAME + NUM_TAPS - 1
BINS = NFFT // 2 + 1
PAD_HALF = 320            # re block padded 257 -> 320, im likewise


def timed(fn, x, reps=5, steps=2):
    out = fn(x)
    jax.block_until_ready(out)
    float(out.ravel()[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(x)
        jax.block_until_ready(out)
        float(out.ravel()[0])
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def main():
    taps = np.asarray(firwin(NUM_TAPS, [2000.0], sampling_rate=float(RATE)),
                      np.float64)
    window = np.asarray(hann(FRAME), np.float64)
    toe = toeplitz_band(taps, FRAME, np)
    dftw = _dft_weights(window, FRAME, NFFT, True, np.float64)
    w514 = (toe @ dftw).astype(np.float32)
    # padded layout: [re(257) 0(63) | im(257) 0(63)] = 640 columns
    w640 = np.zeros((EXT, 2 * PAD_HALF), np.float32)
    w640[:, :BINS] = w514[:, :BINS]
    w640[:, PAD_HALF:PAD_HALF + BINS] = w514[:, BINS:]
    w640j = jnp.asarray(w640)
    pad_left = (NUM_TAPS - 1) - (NUM_TAPS - 1) // 2

    def dense(x):
        return fir_framed_dft(x, taps, window, stride=HOP, n_fft=NFFT,
                              onesided=True, precision="high",
                              output="power")

    def padded(x):
        num_frames = (x.shape[-1] - FRAME) // HOP + 1
        xp = jnp.pad(x, [(0, 0), (pad_left, NUM_TAPS - 1)])
        acc = blocked_frame_matmul(xp, w640j, window_length=EXT, stride=HOP,
                                   num_frames=num_frames, precision="high")
        return (acc[..., :BINS] ** 2
                + acc[..., PAD_HALF:PAD_HALF + BINS] ** 2)

    jd, jp = jax.jit(dense), jax.jit(padded)

    x0 = jnp.asarray(np.random.default_rng(0).normal(
        size=(64, SECONDS * RATE)), jnp.float32)
    ref, got = jd(x0), jp(x0)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    print(f"correctness 64ch rel err: {err:.2e}", flush=True)
    del x0

    for ch in (256, 768):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(ch, SECONDS * RATE)), jnp.float32)
        n = ch * SECONDS * RATE
        for name, fn in (("dense514", jd), ("padded640", jp),
                         ("dense514#2", jd)):
            dt = timed(fn, x)
            print(f"{ch:4d}ch {name:10s} {dt * 1e3:8.2f} ms/step "
                  f"{n / dt / 1e6:8.1f} Ms/s", flush=True)
        del x


if __name__ == "__main__":
    main()
