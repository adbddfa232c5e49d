"""GEMM shape probe: is the chain-contraction's attainable rate bounded by
the day's tunnel throughput or by the (K=766, N=514) shape itself?

Measures, interleaved in one process at precision='high' (bf16_3x):
  - the chain's exact contraction (M=ch*frames, K=766, N=514)
  - K padded to 768 (8-sublane multiple)
  - N trimmed to 512 / padded to 640 (128-lane multiples)
  - a big square GEMM (the emitter's best case — peak-fraction yardstick)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/gemm_probe_r3.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

M = 256 * 3744          # 256 channels x 3744 frames


def timed(fn, *args, reps=5, steps=2):
    out = fn(*args)
    jax.block_until_ready(out)
    float(out.ravel()[0])   # force a real round-trip before timing
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        # block_until_ready through the axon tunnel has been seen returning
        # early on standalone dots; a scalar fetch forces the execution to
        # have actually landed (adds one ~ms round-trip, negligible here)
        float(out.ravel()[0])
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def main():
    gemm = jax.jit(lambda a, b: jnp.matmul(a, b, precision="high"))
    rng = np.random.default_rng(0)
    shapes = [
        ("chain K=766 N=514", M, 766, 514),
        ("pad   K=768 N=514", M, 768, 514),
        ("trim  K=766 N=512", M, 766, 512),
        ("pad   K=766 N=640", M, 766, 640),
        ("square 8192^3", 8192, 8192, 8192),
    ]
    for name, m, k, n in shapes:
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
        dt = timed(gemm, a, b)
        tf = 2.0 * m * k * n / dt / 1e12
        print(f"{name:20s} {dt * 1e3:8.2f} ms {tf:6.1f} TF/s(real) "
              f"= {tf / 65.7 * 100:4.1f}% of bf16_3x peak", flush=True)
        del a, b


if __name__ == "__main__":
    main()
