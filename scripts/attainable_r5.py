"""Attainable-rate probes for the non-chain BASELINE configs (round-5
item 1): do for configs 3/4/5 what ROOFLINE §3.5 did for the chain —
within ONE process measure (a) bare GEMMs of each config's exact
contraction shapes, (b) bare elementwise passes at the configs' HBM
byte counts, (c) the empty-dispatch baseline, plus per-stage splits of
the factored PFB — then report measured/attainable instead of
measured/modeled-floor.

Order is OOM-safe (small -> large; everything fits well under ~4 GB).
Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/attainable_r5.py
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SMOKE = "--smoke" in sys.argv   # tiny shapes on CPU: trace/shape check only
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from nx_signal_tpu.utils.profiling import hard_sync

STEPS = 2


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


def main():
    rng = np.random.default_rng(0)

    # ---- (c) empty-dispatch baseline: per-dispatch latency today ----
    tiny = jnp.zeros((8, 128), jnp.float32)
    bump = jax.jit(lambda a: a + 1.0)
    hard_sync(bump(tiny))
    lat = []
    for _ in range(15):
        t0 = time.perf_counter()
        hard_sync(bump(tiny))
        lat.append(time.perf_counter() - t0)
    dispatch_ms = sorted(lat)[len(lat) // 2] * 1e3
    emit(probe="empty_dispatch", ms=dispatch_ms)

    # ---- (b) bare elementwise passes: attainable HBM GB/s ----
    ew = jax.jit(lambda a: a * 1.000001 + 0.25)
    ew_rates = {}
    for mib in (1, 2) if SMOKE else (128, 512, 1024):
        n = mib * (1 << 20) // 4
        xa = jnp.asarray(rng.normal(size=n), jnp.float32)
        dt = timed(ew, xa)
        gbs = 2.0 * n * 4 / dt / 1e9          # read + write
        ew_rates[mib] = gbs
        emit(probe="eltwise", mib=mib, ms=dt * 1e3, gb_per_s=gbs)
        del xa
    ew_attain = max(ew_rates.values())

    # ---- (a) bare GEMMs at each config's exact contraction shapes ----
    def gemm_probe(name, m_rows, k, ncol, precision, batch=None):
        shape_a = (batch, m_rows, k) if batch else (m_rows, k)
        fa = jnp.asarray(rng.normal(size=shape_a), jnp.float32)
        fw = jnp.asarray(rng.normal(size=(k, ncol)), jnp.float32)
        g = jax.jit(lambda a, w: jnp.matmul(a, w, precision=precision))
        dt = timed(g, fa, fw)
        flops = 2.0 * (batch or 1) * m_rows * k * ncol
        tfs = flops / dt / 1e12
        emit(probe="gemm", name=name, ms=dt * 1e3, tf_per_s=tfs,
             m=m_rows, k=k, n=ncol, batch=batch or 1, precision=precision)
        del fa, fw
        return dt, tfs

    div = 64 if SMOKE else 1
    # window anchor: the chain probe family (r03b's 31 TF/s shape)
    _, anchor_tfs = gemm_probe("chain_anchor_766x514", 959_488 // div, 766,
                               514, "high")
    # config 3: upfirdn lane-tile banded contraction (64ch x 60 s @ 48k,
    # down=3, 61-tap phase filter -> window 442, R=128 tile)
    c3_dt, c3_tfs = gemm_probe("c3_upfirdn_442x128", 480_064 // div, 442,
                               128, "highest")
    # config 4: 64-band factored DFT stage (8 x 16.78M streams)
    p64_dt, p64_tfs = gemm_probe("pfb64_dft_64x128", 262_137 // div, 64,
                                 128, "highest", batch=8)
    # config 5: 1024-band factored DFT stage (8 x 16.78M streams)
    p1k_dt, p1k_tfs = gemm_probe("pfb1024_dft_1024x2048", 16_377 // div,
                                 1024, 2048, "highest", batch=8)

    # ---- stage splits of the factored PFB at 8 x 16.78M ----
    from nx_signal_tpu.kernels.dft import _dft_weights
    from nx_signal_tpu.ops.resample import pfb_analyze

    n = (1 << 18) if SMOKE else (1 << 24)   # 16,777,216 per stream
    x = jnp.asarray(rng.normal(size=(8, n)), jnp.float32)

    for m, tpc, sum_mode in ((64, 8, "conv"), (1024, 8, "shifts")):
        nb = n // m
        num_frames = nb - tpc + 1
        proto = jnp.asarray(rng.normal(size=(m * tpc,)), jnp.float32) * 0.01
        w = proto.reshape(tpc, m)
        ones = np.ones(m, dtype=np.float64)
        f_mat = jnp.asarray(
            _dft_weights(ones, m, m, False, np.float64).astype(np.float32))

        if sum_mode == "conv":
            from jax import lax

            def sum_stage(x, w=w, nb=nb, m=m):
                u2 = x[..., :nb * m].reshape(-1, nb, m)
                return lax.conv_general_dilated(
                    u2, w[:, None, :], window_strides=(1,), padding="VALID",
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    feature_group_count=m, precision="highest")
        else:
            def sum_stage(x, w=w, nb=nb, m=m, tpc=tpc, nf=num_frames):
                u = x[..., :nb * m].reshape(8, nb, m)
                s = w[0] * u[..., :nf, :]
                for j in range(1, tpc):
                    s = s + w[j] * u[..., j:j + nf, :]
                return s

        sum_jit = jax.jit(sum_stage)
        dt_sum = timed(sum_jit, x)
        # modeled bytes for the sum stage: read x once + write s once
        sum_bytes = 2.0 * 8 * n * 4
        emit(probe="pfb_sum_stage", bands=m, sum_mode=sum_mode,
             ms=dt_sum * 1e3, gb_per_s=sum_bytes / dt_sum / 1e9,
             vs_eltwise_attainable=(sum_bytes / dt_sum / 1e9) / ew_attain)

        s_in = jnp.asarray(
            rng.normal(size=(8, num_frames, m)), jnp.float32)
        from jax import lax as _lax

        def dft_stage(s, f_mat=f_mat, m=m):
            acc = jnp.matmul(s, f_mat, precision="highest")
            return _lax.complex(acc[..., :m], acc[..., m:])

        dft_jit = jax.jit(dft_stage)
        dt_dft = timed(dft_jit, s_in)
        dft_flops = 2.0 * 8 * num_frames * m * 2 * m
        emit(probe="pfb_dft_stage", bands=m, ms=dt_dft * 1e3,
             tf_per_s=dft_flops / dt_dft / 1e12)
        del s_in

        full = jax.jit(lambda x, m=m, tpc=tpc: pfb_analyze(
            x, m, taps_per_channel=tpc))
        dt_full = timed(full, x)
        msps = 8 * n / dt_full / 1e6
        bare_gemm_dt = p64_dt if m == 64 else p1k_dt
        emit(probe="pfb_e2e", bands=m, ms=dt_full * 1e3,
             msamples_per_s=msps,
             stage_sum_ms=(dt_sum + dt_dft) * 1e3,
             e2e_vs_stage_sum=dt_full / (dt_sum + dt_dft),
             dft_stage_vs_bare_gemm=dt_dft / bare_gemm_dt)

    del x

    # ---- config 3 end-to-end in the same process ----
    from nx_signal_tpu.ops.mixing import mix_down
    from nx_signal_tpu.ops.resample import resample_poly

    n3 = (60 * 48000) // div
    x3 = jnp.asarray(rng.normal(size=(64, n3)), jnp.float32)

    chain = jax.jit(lambda x: resample_poly(
        mix_down(x, 8000.0, 48000.0).real, 1, 3))
    dt_chain = timed(chain, x3)
    msps3 = 64 * n3 / dt_chain / 1e6
    # attainable from the bare banded GEMM + the config's elementwise
    # bytes (mix read+write fused into the GEMM read in production: use
    # x-in + y-out as the minimum unfused traffic)
    c3_min_bytes = 64 * n3 * 4 + 64 * (n3 // 3) * 4
    c3_eltwise_floor_ms = c3_min_bytes / (ew_attain * 1e9) * 1e3
    emit(probe="c3_e2e", ms=dt_chain * 1e3, msamples_per_s=msps3,
         bare_gemm_ms=c3_dt * 1e3,
         e2e_vs_bare_gemm=dt_chain / c3_dt,
         eltwise_floor_ms=c3_eltwise_floor_ms)

    emit(probe="summary", anchor_tfs=anchor_tfs,
         eltwise_attainable_gbs=ew_attain,
         dispatch_ms=dispatch_ms)


if __name__ == "__main__":
    main()
