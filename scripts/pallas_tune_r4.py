"""Tune the fused Pallas kernel at the bench shape (round 4).

The blocks-DMA kernel beat conv at 128ch (1.54x) but lost at 512ch —
the suspects are the 6x overlapping-window re-read and the per-program
matmul size. Sweep dma mode x tile_m at 512ch (precision='high'),
interleaved with the conv reference, in one process (one tunnel window).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_tune_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

RATE, FRAME, HOP, NFFT, NUM_TAPS, SECONDS = 48000, 512, 128, 512, 255, 10
CH = 512


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
    from nx_signal_tpu.kernels.dft import fir_framed_dft
    from nx_signal_tpu.kernels.pallas_dft import fir_framed_dft_power_pallas
    from nx_signal_tpu.ops.filters import firwin
    from nx_signal_tpu.ops.windows import hann

    rng = np.random.default_rng(0)
    taps = firwin(NUM_TAPS, [2000.0], sampling_rate=float(RATE))
    window = hann(FRAME)
    n = SECONDS * RATE
    x = jnp.asarray(rng.normal(size=(CH, n)), jnp.float32)

    ref = jax.jit(lambda x: fir_framed_dft(
        x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
        output="power", precision="high", kernel="xla"))
    ref_out = ref(x)
    jax.block_until_ready(ref_out)

    dt = timed(ref, x)
    print(json.dumps({"config": "conv", "ms": round(dt * 1e3, 2),
                      "msamples_per_s": round(CH * n / dt / 1e6, 1)}),
          flush=True)

    for dma in ("window", "blocks"):
        for tm in (256, 512, 1024):
            if dma == "blocks" and tm == 1024:
                continue   # 6x (1024, 128) scratch: VMEM-heavy, skip
            fn = jax.jit(lambda x, dma=dma, tm=tm: fir_framed_dft_power_pallas(
                x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
                precision="high", dma=dma, tile_m=tm))
            out = fn(x)
            jax.block_until_ready(out)
            err = float(jnp.max(jnp.abs(out - ref_out))
                        / jnp.max(jnp.abs(ref_out)))
            dt = timed(fn, x)
            print(json.dumps({
                "config": f"pallas_{dma}_tm{tm}", "ms": round(dt * 1e3, 2),
                "msamples_per_s": round(CH * n / dt / 1e6, 1),
                "rel_err_vs_conv": round(err, 9)}), flush=True)

    # conv again to bracket drift within the window
    dt = timed(ref, x)
    print(json.dumps({"config": "conv_again", "ms": round(dt * 1e3, 2),
                      "msamples_per_s": round(CH * n / dt / 1e6, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
