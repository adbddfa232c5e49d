"""Round-4 PFB optimization A/B (VERDICT r03 items 2+4): the einsum
formulation (r04 baseline: 519 Msamples/s) vs the two MXU strategies
('matmul' = aliased-DFT conv-of-blocks, 'factored' = shifted-FMA
polyphase sum + m-point DFT matmul), at the 64-band single-chip config
AND at config 5's stated 1024 channels — all within one process,
einsum brackets first/last (tunnel-window discipline, CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pfb_bench_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N4 = 4_194_304
STREAMS = 8


def timed(fn, x, reps=5, steps=2):
    out = fn(x)
    jax.block_until_ready(out)
    float(jnp.real(out.ravel()[0]))   # scalar-fetch barrier: block_until_ready
    times = []                # through the tunnel can return early (r03b)
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
    x = jnp.asarray(rng.normal(size=(STREAMS, N4)), jnp.float32)
    n_total = STREAMS * N4

    for bands in (64, 1024):
        ref_out = None
        for st, prec in (("einsum", "highest"), ("matmul", "highest"),
                         ("matmul", "high"), ("factored", "highest"),
                         ("factored", "high"), ("einsum", "highest")):
            fn = jax.jit(lambda x, st=st, prec=prec: pfb_analyze(
                x, bands, taps_per_channel=8, strategy=st, precision=prec))
            out = fn(x)
            jax.block_until_ready(out)
            rec = {"config": f"pfb{bands}_{st}_{prec}"}
            if st == "einsum" and ref_out is None:
                ref_out = out
            elif ref_out is not None:
                rec["rel_err_vs_einsum"] = round(float(
                    jnp.max(jnp.abs(out - ref_out))
                    / jnp.max(jnp.abs(ref_out))), 9)
            dt = timed(fn, x)
            rec["ms"] = round(dt * 1e3, 2)
            rec["msamples_per_s"] = round(n_total / dt / 1e6, 1)
            print(json.dumps(rec), flush=True)
            del out
        del ref_out


if __name__ == "__main__":
    main()
