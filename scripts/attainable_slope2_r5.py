"""Slope probes v2 (see attainable_slope_r5.py for v1's rationale).

v1 lessons: (a) the doubled chain-anchor GEMM OOM'd the process (5.9 GB
operand + 3.9 GB out on top of live buffers) — v2 halves the anchor and
keeps every family under ~4 GB; (b) the 1 GiB eltwise marginal (2.5 ms
at HBM peak) is smaller than the ~1-2 ms timing jitter of a 37 ms
latency-dominated reading — v2 uses STEPS=8 (dispatch pipelining hides
most of the ~56 ms latency: empty dispatch 56 ms but a 33 ms eltwise
step measured BELOW it at steps=2, so the queue overlaps) and makes the
elementwise marginal 4 GiB (sum of N resident 1 GiB arrays, N=2 vs 6 —
a fused chain would collapse to one pass, distinct inputs cannot).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/attainable_slope2_r5.py
"""

import gc
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SMOKE = "--smoke" in sys.argv
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from nx_signal_tpu.utils.profiling import hard_sync

STEPS = 8
DIV = 256 if SMOKE else 1


def timed(fn, *args, reps=5, steps=STEPS):
    out = fn(*args)
    hard_sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        hard_sync(out)
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def emit(**rec):
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in rec.items()}), flush=True)


def slope(name, dt1, dt2, work_delta, unit, scale):
    rate = work_delta / max(dt2 - dt1, 1e-9) / scale
    emit(probe=name, ms_s1=dt1 * 1e3, ms_s2=dt2 * 1e3,
         **{unit: round(rate, 3)})
    return rate


def main():
    rng = np.random.default_rng(0)

    tiny = jnp.zeros((8, 128), jnp.float32)
    bump = jax.jit(lambda a: a + 1.0)
    dt_tiny = timed(bump, tiny)   # pipelined dispatch floor at STEPS=8
    emit(probe="empty_dispatch_pipelined", ms=dt_tiny * 1e3)

    # ---- elementwise: sum of N distinct 1 GiB arrays, N=2 vs N=6 ----
    n1 = (1 << 30) // 4 // DIV
    arrs = [jnp.asarray(rng.normal(size=n1), jnp.float32) for _ in range(6)]

    def summer(k):
        def f(*xs):
            acc = xs[0]
            for x in xs[1:]:
                acc = acc + x
            return acc
        return jax.jit(f)

    dt2 = timed(summer(2), *arrs[:2])
    dt6 = timed(summer(6), *arrs)
    ew_gbs = slope("eltwise_slope", dt2, dt6, 4.0 * n1 * 4, "gb_per_s", 1e9)
    del arrs
    gc.collect()

    # ---- bare GEMM slopes (sizes halved vs v1; biggest ~2.9 GB) ----
    def gemm_slope(name, m_rows, k, ncol, precision, batch=None):
        dts = []
        for m in (m_rows, 2 * m_rows):
            shape_a = (batch, m, k) if batch else (m, k)
            fa = jnp.asarray(rng.normal(size=shape_a), jnp.float32)
            fw = jnp.asarray(rng.normal(size=(k, ncol)), jnp.float32)
            g = jax.jit(lambda a, w: jnp.matmul(a, w, precision=precision))
            dts.append(timed(g, fa, fw))
            del fa, fw
            gc.collect()
        flops_delta = 2.0 * (batch or 1) * m_rows * k * ncol
        return slope(f"gemm_slope_{name}", dts[0], dts[1], flops_delta,
                     "tf_per_s", 1e12)

    anchor_tfs = gemm_slope("chain_anchor", 480_000 // DIV, 766, 514,
                            "high")
    c3_tfs = gemm_slope("c3_upfirdn", 480_064 // DIV, 442, 128, "highest")
    p64_tfs = gemm_slope("pfb64_dft", 262_137 // DIV, 64, 128, "highest",
                         batch=8)
    p1k_tfs = gemm_slope("pfb1024_dft", 16_377 // DIV, 1024, 2048,
                         "highest", batch=8)

    # ---- config 3 e2e slope: 60 s vs 120 s of 64-channel stream ----
    from nx_signal_tpu.ops.mixing import mix_down
    from nx_signal_tpu.ops.resample import pfb_analyze, resample_poly

    chain = jax.jit(lambda x: resample_poly(
        mix_down(x, 8000.0, 48000.0).real, 1, 3))
    n3 = 60 * 48000 // DIV
    dts = []
    for n in (n3, 2 * n3):
        x3 = jnp.asarray(rng.normal(size=(64, n)), jnp.float32)
        dts.append(timed(chain, x3))
        del x3
        gc.collect()
    c3_msps = slope("c3_e2e_slope", dts[0], dts[1], 64.0 * n3,
                    "msamples_per_s", 1e6)

    # ---- PFB e2e slopes: 8 x 8.39M vs 8 x 16.78M ----
    n4 = (1 << 23) // DIV
    pfb_rates = {}
    for m in (64, 1024):
        pfb = jax.jit(lambda x, m=m: pfb_analyze(x, m, taps_per_channel=8))
        dts = []
        for n in (n4, 2 * n4):
            x = jnp.asarray(rng.normal(size=(8, n)), jnp.float32)
            dts.append(timed(pfb, x))
            del x
            gc.collect()
        pfb_rates[m] = slope(f"pfb{m}_e2e_slope", dts[0], dts[1], 8.0 * n4,
                             "msamples_per_s", 1e6)

    emit(probe="summary", anchor_tfs=round(anchor_tfs, 2),
         eltwise_gbs=round(ew_gbs, 1), c3_gemm_tfs=round(c3_tfs, 2),
         pfb64_gemm_tfs=round(p64_tfs, 2),
         pfb1024_gemm_tfs=round(p1k_tfs, 2),
         c3_e2e_msps=round(c3_msps, 1),
         pfb64_e2e_msps=round(pfb_rates[64], 1),
         pfb1024_e2e_msps=round(pfb_rates[1024], 1))


if __name__ == "__main__":
    main()
