"""Round-4: framed-DFT execution strategy vs HOP SIZE. The
conv-of-blocks form ties its hop-block lane width to the stride —
at hop 128 (the bench) blocks are lane-aligned and 'conv' beats
'materialize' by 33-49% (r02), but at hop 16/32 the blocks occupy
16/32 of 128 lanes while 'materialize' pays a window/hop-fold HBM
expansion for full-width rows (the upfirdn-tile tradeoff, §7.3).
ShortTimeFFT dispatches arbitrary user hops here, so the crossover
matters. One process, conv/materialize interleaved per hop.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/hop_strategy_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

CH, SECONDS, RATE, FRAME, NFFT = 32, 10, 48000, 512, 512


def timed(fn, x, reps=5, steps=2):
    out = fn(x)
    jax.block_until_ready(out)
    float(jnp.real(out.ravel()[0]))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(x)
        jax.block_until_ready(out)
        float(jnp.real(out.ravel()[0]))
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def main():
    from nx_signal_tpu.kernels.dft import _dft_weights, blocked_frame_matmul
    from nx_signal_tpu.ops.windows import hann

    rng = np.random.default_rng(0)
    n = SECONDS * RATE
    x = jnp.asarray(rng.normal(size=(CH, n)), jnp.float32)
    w = np.asarray(hann(FRAME), np.float64)
    weights = jnp.asarray(
        _dft_weights(w, FRAME, NFFT, True, np.float64).astype(np.float32))

    for hop in (128, 64, 32, 16):   # OOM-riskiest LAST (a wedge kills the rest)
        num_frames = (n - FRAME) // hop + 1
        for strat in ("conv", "materialize"):
            fn = jax.jit(lambda x, h=hop, s=strat, m=num_frames:
                         blocked_frame_matmul(
                             x, weights, window_length=FRAME, stride=h,
                             num_frames=m, precision="high", strategy=s))
            try:
                dt = timed(fn, x)
                print(json.dumps({
                    "config": f"hop{hop}_{strat}",
                    "ms": round(dt * 1e3, 2),
                    "msamples_per_s": round(CH * n / dt / 1e6, 1),
                    "frames": num_frames}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"config": f"hop{hop}_{strat}",
                                  "error": type(e).__name__}), flush=True)


if __name__ == "__main__":
    main()
