"""Two-size SLOPE probes: latency-free attainable rates for configs 3/4/5.

scripts/attainable_r5.py ran in a ~60 ms-per-dispatch window (the worst
measured; empty_dispatch 59.9 ms), so every ~30-75 ms reading is
latency-dominated. This script measures each family at size S and 2S in
ONE process and reports the DIFFERENTIAL rate work/(dt(2S)-dt(S)),
which cancels the fixed per-dispatch cost exactly. Families:

  - bare elementwise pass (1 GiB / 2 GiB)        -> attainable HBM GB/s
  - bare DFT GEMMs at the PFB's exact shapes     -> attainable TF/s
  - pfb_analyze e2e, 64 and 1024 bands           -> measured Ms/s
  - config-3 resample chain (60 s / 120 s)       -> measured Ms/s
  - the c3 banded upfirdn GEMM                   -> attainable TF/s

Order is OOM-safe. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/attainable_slope_r5.py
"""

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

STEPS = 2
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
         **{unit: rate})
    return rate


def main():
    rng = np.random.default_rng(0)

    # dispatch baseline (context for the slope readings)
    tiny = jnp.zeros((8, 128), jnp.float32)
    bump = jax.jit(lambda a: a + 1.0)
    hard_sync(bump(tiny))
    lat = []
    for _ in range(15):
        t0 = time.perf_counter()
        hard_sync(bump(tiny))
        lat.append(time.perf_counter() - t0)
    emit(probe="empty_dispatch", ms=sorted(lat)[len(lat) // 2] * 1e3)

    # ---- elementwise slope: 1 GiB vs 2 GiB ----
    ew = jax.jit(lambda a: a * 1.000001 + 0.25)
    n1 = (1 << 30) // 4 // DIV
    xa = jnp.asarray(rng.normal(size=n1), jnp.float32)
    dt1 = timed(ew, xa)
    del xa
    xa = jnp.asarray(rng.normal(size=2 * n1), jnp.float32)
    dt2 = timed(ew, xa)
    del xa
    ew_gbs = slope("eltwise_slope", dt1, dt2, 2.0 * n1 * 4, "gb_per_s", 1e9)

    # ---- bare GEMM slopes at the exact contraction shapes ----
    def gemm_slope(name, m_rows, k, ncol, precision, batch=None):
        dts = []
        for m in (m_rows, 2 * m_rows):
            shape_a = (batch, m, k) if batch else (m, k)
            fa = jnp.asarray(rng.normal(size=shape_a), jnp.float32)
            fw = jnp.asarray(rng.normal(size=(k, ncol)), jnp.float32)
            g = jax.jit(lambda a, w: jnp.matmul(a, w, precision=precision))
            dts.append(timed(g, fa, fw))
            del fa, fw
        flops_delta = 2.0 * (batch or 1) * m_rows * k * ncol
        return slope(f"gemm_slope_{name}", dts[0], dts[1], flops_delta,
                     "tf_per_s", 1e12)

    anchor_tfs = gemm_slope("chain_anchor", 959_488 // DIV, 766, 514, "high")
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
    c3_msps = slope("c3_e2e_slope", dts[0], dts[1], 64.0 * n3,
                    "msamples_per_s", 1e6)

    # ---- PFB e2e slopes: 8 x 16.78M vs 8 x 33.55M ----
    n4 = (1 << 24) // DIV
    for m in (64, 1024):
        pfb = jax.jit(lambda x, m=m: pfb_analyze(x, m, taps_per_channel=8))
        dts = []
        for n in (n4, 2 * n4):
            x = jnp.asarray(rng.normal(size=(8, n)), jnp.float32)
            dts.append(timed(pfb, x))
            del x
        slope(f"pfb{m}_e2e_slope", dts[0], dts[1], 8.0 * n4,
              "msamples_per_s", 1e6)

    emit(probe="summary", anchor_tfs=round(anchor_tfs, 2),
         eltwise_gbs=round(ew_gbs, 1), c3_gemm_tfs=round(c3_tfs, 2),
         pfb64_gemm_tfs=round(p64_tfs, 2),
         pfb1024_gemm_tfs=round(p1k_tfs, 2),
         c3_e2e_msps=round(c3_msps, 1))


if __name__ == "__main__":
    main()
