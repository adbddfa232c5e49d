"""Round-4 follow-up: 64-band 'factored' PFB at LARGE stream sizes —
separates the fixed-overhead effect (pfb_max_r4: throughput rose 944 ->
2594 Ms/s with size at 1024 bands) from the m=64 half-lane layout
question. If 64-band large-size rates match 1024-band ones, the channel
count (lane occupancy) is immaterial and the residual-vs-HBM-floor is
pure fixed overhead + unfused passes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pfb_scale64_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

STREAMS = 8


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
    from nx_signal_tpu.ops.resample import pfb_analyze

    rng = np.random.default_rng(0)
    for bands, n_per in ((64, 16_777_216), (64, 33_554_432),
                         (128, 33_554_432)):
        x = jnp.asarray(rng.normal(size=(STREAMS, n_per)), jnp.float32)
        fn = jax.jit(lambda x, b=bands: pfb_analyze(
            x, b, taps_per_channel=8, strategy="factored",
            precision="high"))
        dt = timed(fn, x)
        print(json.dumps({
            "config": f"pfb{bands}_factored_{STREAMS}x{n_per}",
            "ms": round(dt * 1e3, 2),
            "msamples_per_s": round(STREAMS * n_per / dt / 1e6, 1),
        }), flush=True)
        del x


if __name__ == "__main__":
    main()
