"""edge='conv' A/B: does eliminating the padded input COPY (the xp
materialization, ~8 B/sample round trip) by folding the 'same' context
into the conv's spatial padding speed up the end-to-end chain?

Interleaved in one process at 256 and 768 channels. Usage:
PYTHONPATH=/root/repo:/root/.axon_site python scripts/nopad_experiment.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from nx_signal_tpu.kernels.dft import fir_framed_dft
from nx_signal_tpu.ops.filters import firwin
from nx_signal_tpu.ops.windows import hann

SECONDS, RATE = 10, 48000
FRAME, HOP, NFFT, NUM_TAPS = 512, 128, 512, 255


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
    taps = np.asarray(firwin(NUM_TAPS, [2000.0], sampling_rate=float(RATE)))
    window = np.asarray(hann(FRAME))

    def chain(edge):
        def fn(x):
            return fir_framed_dft(x, taps, window, stride=HOP, n_fft=NFFT,
                                  onesided=True, precision="high",
                                  output="power", edge=edge)
        return jax.jit(fn)

    pad, conv = chain("pad"), chain("conv")

    x0 = jnp.asarray(np.random.default_rng(0).normal(
        size=(64, SECONDS * RATE)), jnp.float32)
    ref, got = pad(x0), conv(x0)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    print(f"correctness 64ch rel err: {err:.2e}", flush=True)
    del x0

    for ch in (256, 768):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(ch, SECONDS * RATE)), jnp.float32)
        n = ch * SECONDS * RATE
        for name, fn in (("edge=pad", pad), ("edge=conv", conv),
                         ("edge=pad#2", pad)):
            dt = timed(fn, x)
            print(f"{ch:4d}ch {name:11s} {dt * 1e3:8.2f} ms/step "
                  f"{n / dt / 1e6:8.1f} Ms/s", flush=True)
        del x


if __name__ == "__main__":
    main()
