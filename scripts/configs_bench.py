"""Throughput for the non-chain BASELINE.json configs on one chip:

  config 2 — STFT -> ISTFT round trip (60 s stereo 44.1 kHz)
  config 3 — polyphase resample 48 kHz -> 16 kHz + DDC mixdown, 64 ch
  config 4/5 — 64-channel polyphase filterbank analysis on a wideband
               stream (the 1024-channel PFB needs pod memory; 64 is the
               single-chip point)

One JSON line per config. Absolute numbers are tunnel-window dependent
(ROOFLINE.md §3.5) — record the window by running bench.py in the same
session. Usage:
PYTHONPATH=/root/repo:/root/.axon_site python scripts/configs_bench.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5, steps=8):   # pipelined (ROOFLINE §8.8)
    from nx_signal_tpu.utils.profiling import hard_sync

    hard_sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        hard_sync(out)
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def emit(name, n_samples, dt, **extra):
    print(json.dumps({
        "metric": name,
        "ms_per_step": round(dt * 1e3, 2),
        "msamples_per_s": round(n_samples / dt / 1e6, 1),
        **extra,
    }), flush=True)


def main():
    from nx_signal_tpu.ops.windows import hann
    from nx_signal_tpu.spectral.stft import istft, stft
    from nx_signal_tpu.ops.resample import pfb_analyze, resample_poly
    from nx_signal_tpu.ops.mixing import mix_down

    rng = np.random.default_rng(0)

    # config 2: 60 s stereo 44.1 kHz round trip (batched to fill the chip)
    ch, n = 64, 60 * 44100
    x = jnp.asarray(rng.normal(size=(ch, n)), jnp.float32)
    w = np.asarray(hann(512))

    @jax.jit
    def roundtrip(x):
        z, _, _ = stft(x, w, sampling_rate=44100.0, fft_length=512,
                       overlap_length=384, onesided=True, precision="high")
        return istft(z, w, overlap_length=384, onesided=True,
                     precision="high")

    emit("stft_istft_roundtrip", ch * n, timed(roundtrip, x),
         channels=ch, seconds=60, rate=44100)
    del x

    # config 3: 48 kHz -> 16 kHz polyphase + DDC mixdown, 64 ch x 60 s
    n3 = 60 * 48000
    x3 = jnp.asarray(rng.normal(size=(64, n3)), jnp.float32)

    @jax.jit
    def resample_chain(x):
        y = mix_down(x, 8000.0, 48000.0)        # complex baseband shift
        return resample_poly(y.real, 1, 3)       # 48k -> 16k

    emit("resample_mixdown_64ch", 64 * n3, timed(resample_chain, x3),
         channels=64, up=1, down=3)
    del x3

    # config 4/5 single-chip point: 64-band PFB on a wideband stream
    n4 = 4_194_304
    x4 = jnp.asarray(rng.normal(size=(8, n4)), jnp.float32)

    @jax.jit
    def pfb(x):
        return pfb_analyze(x, 64, taps_per_channel=8)

    emit("pfb_analyze_64band", 8 * n4, timed(pfb, x4),
         streams=8, bands=64)


if __name__ == "__main__":
    main()
