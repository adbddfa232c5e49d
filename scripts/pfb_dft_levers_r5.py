"""PFB DFT-stage levers (round 5): if the factored PFB's binding cost is
XLA's own rate on the (T, m) @ (m, 2m) contraction (attainable_slope2
evidence), two shape levers might move it without changing the math:

  1. flatten: (8, T, 64) @ (64, 128) batched  vs  (8T, 64) @ (64, 128)
     one GEMM (blocked_frame_matmul already flattens batch for this
     reason — _pfb_factored does not).
  2. block-diagonal K-widening for m=64: J frame rows share one GEMM row,
     weight becomes block-diag (J*64, J*128) — J^2/J = J-fold FLOP waste
     buying a full-depth K (the MXU is 128x128; K=64 idles half the
     array). The upfirdn lane tile won 2.6x from the same trade
     (ROOFLINE.md §7.3); here the waste also pads N, so the win condition
     is stricter.

All within-process, STEPS=8 pipelined timing, bitwise-equivalence checked
for the block-diag rewrite. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/pfb_dft_levers_r5.py
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

STEPS = 8
DIV = 64 if SMOKE else 1


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
    m = 64
    t_frames = 262_144 // DIV          # per stream, 8 streams
    s = jnp.asarray(rng.normal(size=(8, t_frames, m)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(m, 2 * m)), jnp.float32)
    useful_flops = 2.0 * 8 * t_frames * m * 2 * m

    batched = jax.jit(lambda s, f: jnp.matmul(s, f, precision="highest"))
    dt = timed(batched, s, f)
    emit(case="batched_8xTx64", ms=dt * 1e3,
         useful_tfs=useful_flops / dt / 1e12)

    s_flat = s.reshape(8 * t_frames, m)
    flat = jax.jit(lambda s, f: jnp.matmul(s, f, precision="highest"))
    dt = timed(flat, s_flat, f)
    emit(case="flat_8Tx64", ms=dt * 1e3,
         useful_tfs=useful_flops / dt / 1e12)

    f_np = np.asarray(f)
    for j in (2, 4, 8):
        # block-diag weight: rows j*64:(j+1)*64 -> cols j*128:(j+1)*128
        w = np.zeros((j * m, j * 2 * m), np.float32)
        for r in range(j):
            w[r * m:(r + 1) * m, r * 2 * m:(r + 1) * 2 * m] = f_np
        wj = jnp.asarray(w)
        s_j = s_flat.reshape(8 * t_frames // j, j * m)
        gj = jax.jit(lambda s, w: jnp.matmul(s, w, precision="highest"))
        # bitwise check vs the flat GEMM (tiny slice, host side)
        a = np.asarray(gj(s_j[:8], wj)).reshape(8 * j, 2 * m)
        b = np.asarray(flat(s_flat[:8 * j], f))
        ok = bool(np.array_equal(a, b))
        dt = timed(gj, s_j, wj)
        emit(case=f"blockdiag_J{j}_K{j * m}", ms=dt * 1e3,
             useful_tfs=useful_flops / dt / 1e12, bitwise_vs_flat=ok)

    # control: the m=1024 stage, batched vs flat
    m2 = 1024
    t2 = 16_377 // DIV
    s2 = jnp.asarray(rng.normal(size=(8, t2, m2)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(m2, 2 * m2)), jnp.float32)
    useful2 = 2.0 * 8 * t2 * m2 * 2 * m2
    dt = timed(batched, s2, f2)
    emit(case="batched_8xTx1024", ms=dt * 1e3, useful_tfs=useful2 / dt / 1e12)
    s2f = s2.reshape(8 * t2, m2)
    dt = timed(flat, s2f, f2)
    emit(case="flat_8Tx1024", ms=dt * 1e3, useful_tfs=useful2 / dt / 1e12)
    del s, s_flat, s2, s2f

    # ---- e2e strategy SLOPES: r04 chose 'factored' for m>=64 from
    # latency-dominated absolutes; the marginal rate is the real ranking.
    # 'matmul' at m=64 is a K=512 conv-of-blocks contraction (full MXU
    # depth) vs factored's K=64 (5.96 TF/s attainable, slope2 evidence).
    from nx_signal_tpu.ops.resample import pfb_analyze

    n_lo = (1 << 23) // DIV
    for m_e, strategies in ((64, ("factored", "matmul")),
                            (1024, ("factored", "matmul"))):
        for strat in strategies:
            pfb = jax.jit(lambda x, m=m_e, s=strat: pfb_analyze(
                x, m, taps_per_channel=8, strategy=s))
            dts = []
            for n in (n_lo, 2 * n_lo):
                x = jnp.asarray(rng.normal(size=(8, n)), jnp.float32)
                dts.append(timed(pfb, x))
                del x
            rate = 8.0 * n_lo / max(dts[1] - dts[0], 1e-9) / 1e6
            emit(case=f"pfb{m_e}_{strat}_e2e_slope", ms_s1=dts[0] * 1e3,
                 ms_s2=dts[1] * 1e3, msamples_per_s=round(rate, 1))

    # sum-stage lowering slopes at m=64: conv (current) vs shifts
    from jax import lax

    m3, tpc = 64, 8
    proto = jnp.asarray(rng.normal(size=(m3 * tpc,)), jnp.float32) * 0.01
    w3 = proto.reshape(tpc, m3)

    def sum_conv(x, nb):
        u2 = x[..., :nb * m3].reshape(-1, nb, m3)
        return lax.conv_general_dilated(
            u2, w3[:, None, :], window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=m3,
            precision="highest")

    def sum_shifts(x, nb):
        nf = nb - tpc + 1
        u = x[..., :nb * m3].reshape(8, nb, m3)
        s = w3[0] * u[..., :nf, :]
        for j in range(1, tpc):
            s = s + w3[j] * u[..., j:j + nf, :]
        return s

    for name, fn in (("sum_conv", sum_conv), ("sum_shifts", sum_shifts)):
        dts = []
        for n in (n_lo, 2 * n_lo):
            x = jnp.asarray(rng.normal(size=(8, n)), jnp.float32)
            nb = n // m3
            g = jax.jit(lambda x, nb=nb, fn=fn: fn(x, nb))
            dts.append(timed(g, x))
            del x
        gbs = 2.0 * 8 * n_lo * 4 / max(dts[1] - dts[0], 1e-9) / 1e9
        emit(case=f"pfb64_{name}_slope", ms_s1=dts[0] * 1e3,
             ms_s2=dts[1] * 1e3, gb_per_s=round(gbs, 1))


if __name__ == "__main__":
    main()
