"""Round-4 config-5 max-scale probe: the 1024-band PFB ('factored'
strategy) on ONE chip, ladder of stream sizes up to the modeled HBM
wall (`pfb_footprint_bytes`) — VERDICT r03 item 4 ("a measured
max-scale PFB number + a footprint model, not a comment"). The largest
config is OOM-risky and runs LAST (an OOM wedges the process —
CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pfb_max_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BANDS, TPC, STREAMS = 1024, 8, 8


def timed(fn, x, reps=5, steps=2):
    out = fn(x)
    jax.block_until_ready(out)
    float(jnp.real(out.ravel()[0]))   # tunnel scalar-fetch barrier (r03b)
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
    from nx_signal_tpu.ops.resample import pfb_analyze, pfb_footprint_bytes

    rng = np.random.default_rng(0)
    for n_per in (4_194_304, 16_777_216, 33_554_432, 50_331_648):
        model_gb = pfb_footprint_bytes(
            "factored", STREAMS, n_per, BANDS, TPC) / 1024 ** 3
        x = jnp.asarray(rng.normal(size=(STREAMS, n_per)), jnp.float32)
        fn = jax.jit(lambda x: pfb_analyze(
            x, BANDS, taps_per_channel=TPC, strategy="factored",
            precision="high"))
        try:
            dt = timed(fn, x)
            print(json.dumps({
                "config": f"pfb1024_factored_{STREAMS}x{n_per}",
                "modeled_gb": round(model_gb, 2),
                "ms": round(dt * 1e3, 2),
                "msamples_per_s": round(STREAMS * n_per / dt / 1e6, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — report the OOM boundary
            print(json.dumps({
                "config": f"pfb1024_factored_{STREAMS}x{n_per}",
                "modeled_gb": round(model_gb, 2),
                "error": type(e).__name__}), flush=True)
            return
        del x


if __name__ == "__main__":
    main()
