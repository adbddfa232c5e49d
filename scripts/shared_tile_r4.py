"""Round-4 shared-kernel probe 3: tile_m granularity at 512ch — the last
counter-argument to the schedule-bound verdict (probe 2: GEMM+schedule
alone = 74.9 ms > conv's entire 57 ms). If per-program overhead is the
floor, 2-4x fewer programs should move it; the full-FLOP kernel moved
only -4% (ROOFLINE §6).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/shared_tile_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from nx_signal_tpu.utils.profiling import hard_sync
import numpy as np

RATE, FRAME, HOP, NFFT, NUM_TAPS, SECONDS, CH = 48000, 512, 128, 512, 255, 10, 512


def timed(fn, x, reps=5, steps=2):
    out = fn(x)
    hard_sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(x)
        hard_sync(out)
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def main():
    from nx_signal_tpu.kernels.dft import (fir_framed_dft,
                                           recognize_cosine_window)
    from nx_signal_tpu.kernels.pallas_dft import (
        fir_framed_dft_power_shared_pallas)
    from nx_signal_tpu.ops.filters import firwin
    from nx_signal_tpu.ops.windows import hann

    rng = np.random.default_rng(0)
    taps = firwin(NUM_TAPS, [2000.0], sampling_rate=float(RATE))
    window = hann(FRAME)
    coeffs = recognize_cosine_window(np.asarray(window), NFFT)
    n = SECONDS * RATE
    x = jnp.asarray(rng.normal(size=(CH, n)), jnp.float32)

    ref = jax.jit(lambda x: fir_framed_dft(
        x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
        output="power", precision="high", kernel="xla"))
    hard_sync(ref(x))
    print(json.dumps({"config": "conv", "ms": round(timed(ref, x) * 1e3, 2)}),
          flush=True)

    for tm in (512, 1024):
        for stages in ("gemm", "full"):
            fn = jax.jit(lambda x, t=tm, s=stages:
                         fir_framed_dft_power_shared_pallas(
                             x, taps, stride=HOP, n_fft=NFFT,
                             window_coeffs=coeffs, precision="high",
                             dma="window", combine="sliding", stages=s,
                             tile_m=t))
            hard_sync(fn(x))
            print(json.dumps({"config": f"shared_tm{tm}_{stages}",
                              "ms": round(timed(fn, x) * 1e3, 2)}),
                  flush=True)

    print(json.dumps({"config": "conv_again",
                      "ms": round(timed(ref, x) * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
