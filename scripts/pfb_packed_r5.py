"""Lane-packing probe for the m=64 PFB sum stage (round 5).

pfb_dft_levers_r5 pinned the m=64 bottleneck: the polyphase sliding sum
runs at 52.5 GB/s marginal (conv lowering) vs the 798.7 GB/s elementwise
attainable — every op on a (..., 64) row uses 64 of 128 lanes. The 8
streams are independent, so two of them can share a 128-lane row: pack
(8, nb, 64) -> (4, nb, 128) (one transpose pass), run the identical
sliding sum at full lanes with tiled weights w||w, unpack before the
DFT. This probe measures, at the margin (two sizes, STEPS=8):

  - sum slopes: (8, nb, 64) vs packed (4, nb, 128), conv + shifts
  - the pack/unpack transpose passes alone
  - e2e factored slopes at 64 and 1024 bands with the flat-GEMM DFT
    (adopted this session) — quantifies that adoption end-to-end

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/pfb_packed_r5.py
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
from jax import lax

from nx_signal_tpu.utils.profiling import hard_sync

STEPS = 8
DIV = 64 if SMOKE else 1
N_LO = (1 << 23) // DIV
M, TPC = 64, 8


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


def slope_case(name, builder, unit, work_per_n):
    dts = []
    for n in (N_LO, 2 * N_LO):
        fn, args = builder(n)
        dts.append(timed(fn, *args))
        del args
    rate = work_per_n * N_LO / max(dts[1] - dts[0], 1e-9)
    emit(case=name, ms_s1=dts[0] * 1e3, ms_s2=dts[1] * 1e3,
         **{unit: round(rate, 1)})


def main():
    rng = np.random.default_rng(0)
    proto = (rng.normal(size=(M * TPC,)) * 0.01).astype(np.float32)
    w = jnp.asarray(proto.reshape(TPC, M))
    w2 = jnp.concatenate([w, w], axis=-1)          # (TPC, 128) tiled

    def make_x(n, streams=8):
        return jnp.asarray(rng.normal(size=(streams, n)), jnp.float32)

    def sum_shifts(u, wt, nf):
        s = wt[0] * u[..., :nf, :]
        for j in range(1, TPC):
            s = s + wt[j] * u[..., j:j + nf, :]
        return s

    def sum_conv(u, wt):
        return lax.conv_general_dilated(
            u, wt[:, None, :], window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=wt.shape[-1], precision="highest")

    # control: (8, nb, 64)
    def b_conv64(n):
        x = make_x(n)
        nb = n // M
        return jax.jit(lambda x: sum_conv(
            x[..., :nb * M].reshape(8, nb, M), w)), (x,)

    def b_shifts64(n):
        x = make_x(n)
        nb = n // M
        return jax.jit(lambda x: sum_shifts(
            x[..., :nb * M].reshape(8, nb, M), w, nb - TPC + 1)), (x,)

    # packed: (4, nb, 128) — two streams per row, identical math per lane
    def pack(x, n):
        nb = n // M
        u = x[..., :nb * M].reshape(4, 2, nb, M)
        return jnp.swapaxes(u, 1, 2).reshape(4, nb, 2 * M)

    def b_conv128(n):
        x = make_x(n)
        return jax.jit(lambda x: sum_conv(pack(x, n), w2)), (x,)

    def b_shifts128(n):
        x = make_x(n)
        nb = n // M
        return jax.jit(lambda x: sum_shifts(pack(x, n), w2,
                                            nb - TPC + 1)), (x,)

    def b_pack_only(n):
        x = make_x(n)
        return jax.jit(lambda x: pack(x, n)), (x,)

    for name, b in (("sum_conv_8x64", b_conv64),
                    ("sum_shifts_8x64", b_shifts64),
                    ("sum_conv_packed_4x128", b_conv128),
                    ("sum_shifts_packed_4x128", b_shifts128),
                    ("pack_transpose_only", b_pack_only)):
        slope_case(name, b, "gb_per_s", 2.0 * 8 * 4 / 1e9)

    # e2e factored slopes with the flat-GEMM DFT adoption
    from nx_signal_tpu.ops.resample import pfb_analyze

    for m_e in (64, 1024):
        def b_e2e(n, m=m_e):
            x = make_x(n)
            return jax.jit(lambda x: pfb_analyze(
                x, m, taps_per_channel=8, strategy="factored")), (x,)
        slope_case(f"pfb{m_e}_factored_flatgemm_e2e", b_e2e,
                   "msamples_per_s", 8.0 / 1e6)


if __name__ == "__main__":
    main()
