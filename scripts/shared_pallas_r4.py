"""Round-4 silicon A/B: the SHARED-BLOCK partial-DFT Pallas kernel vs
the production conv-of-blocks chain — VERDICT r03's top item (the last
named perf lever: 2x fewer MXU FLOPs, epilogue stages in VMEM).

Within ONE process (tunnel throughput swings ±40% between processes —
CLAUDE.md), interleaved with conv brackets:
  conv (XLA, production) | shared 'pipeline' | shared 'window'
at 128 / 512 / 768 channels, precision='high' (the bench setting).

The arithmetic bet (ROOFLINE.md §6): Mosaic sustains ~20.7 TF/s on this
GEMM family vs the conv emitter's ~26 TF/s — but the shared form runs
3084 FLOP/sample instead of 6152, so even at Mosaic's lower rate the
kernel should land ~1.5-1.7x ahead IF the twiddle+window+power epilogue
stays VPU-cheap on the resident tile.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/shared_pallas_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from nx_signal_tpu.utils.profiling import hard_sync
import numpy as np

RATE, FRAME, HOP, NFFT, NUM_TAPS, SECONDS = 48000, 512, 128, 512, 255, 10


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


def report(config, ch, n, dt, err=None):
    rec = {"config": config, "ch": ch, "ms": round(dt * 1e3, 2),
           "msamples_per_s": round(ch * n / dt / 1e6, 1)}
    if err is not None:
        rec["rel_err_vs_conv"] = round(err, 9)
    print(json.dumps(rec), flush=True)


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
    assert coeffs is not None
    n = SECONDS * RATE

    for ch in (128, 512, 768):
        x = jnp.asarray(rng.normal(size=(ch, n)), jnp.float32)
        ref = jax.jit(lambda x: fir_framed_dft(
            x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
            output="power", precision="high", kernel="xla"))
        ref_out = ref(x)
        hard_sync(ref_out)
        report("conv", ch, n, timed(ref, x))

        for dma in ("pipeline", "window"):
            fn = jax.jit(lambda x, dma=dma: fir_framed_dft_power_shared_pallas(
                x, taps, stride=HOP, n_fft=NFFT, window_coeffs=coeffs,
                precision="high", dma=dma))
            out = fn(x)
            hard_sync(out)
            err = float(jnp.max(jnp.abs(out - ref_out))
                        / jnp.max(jnp.abs(ref_out)))
            report(f"shared_{dma}", ch, n, timed(fn, x), err)

        report("conv_again", ch, n, timed(ref, x))
        del x, ref_out


if __name__ == "__main__":
    main()
