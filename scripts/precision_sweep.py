"""Time the STFT+FIR chain at matmul precision 'highest' vs 'high' vs
'default' on the real TPU, and measure the accuracy delta of each against
the 'highest' output. Round-1 lead #2 in CLAUDE.md: 'high' (bf16_3x) was
never successfully timed because the tunnel wedged.

Run: python scripts/precision_sweep.py  (TPU; background, generous timeout)
"""

import functools
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

CHANNELS = 16
SECONDS = 10
RATE = 48000
STEPS = 20


def main():
    from nx_signal_tpu.models.pipeline import stft_fir_chain
    from nx_signal_tpu.ops.filters import firwin
    from nx_signal_tpu.ops.windows import hann

    n = CHANNELS * SECONDS * RATE
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(CHANNELS, SECONDS * RATE)),
        dtype=jnp.float32,
    )
    taps = firwin(255, [2000.0], sampling_rate=float(RATE))
    window = hann(512)

    def make_step(precision):
        @jax.jit
        def step(x):
            return stft_fir_chain(
                x, taps, window,
                fft_length=512, overlap_length=384,
                sampling_rate=float(RATE),
                fir_method="oa", onesided=True, precision=precision,
            )
        return step

    results = {}
    ref_out = None
    for precision in ("highest", "high", "default"):
        step = make_step(precision)
        t0 = time.perf_counter()
        out = step(x)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        print(f"[{precision}] compile+first run {compile_s:.1f} s",
              file=sys.stderr, flush=True)

        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = step(x)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / STEPS)
        dt = sorted(times)[len(times) // 2]
        msps = n / dt / 1e6

        out_np = np.asarray(out[1])  # the power spectrogram (precision-dependent)
        if precision == "highest":
            ref_out = out_np
            err = 0.0
        else:
            scale = np.max(np.abs(ref_out))
            err = float(np.max(np.abs(out_np - ref_out)) / scale)
        results[precision] = {"msamples_per_s": round(msps, 1),
                              "rel_err_vs_highest": err}
        print(f"[{precision}] {msps:.1f} Msamples/s, rel_err {err:.3e}",
              file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
