"""Free-view block-pair packing for the m<128 PFB sum (round 5, probe 3).

§8.4's lane-packing probe interleaved STREAMS, which needs a real
transpose — and the transpose itself ran at the same ~52 GB/s layout
wall. This probe packs CONSECUTIVE HOP BLOCKS of one stream instead,
which is free in row-major layout:

  V0 = x[..., :].reshape(-1, q*m)        # rows = [u[qp], .., u[qp+q-1]]
  Vr = x[..., r*m:].reshape(-1, q*m)     # the same, shifted r blocks

with q = 128//m. Tap j of the sliding sum s[t] = sum_j w[j] (*) u[t+j]
reads row p + j//q of V_{j mod q} — every operand a full-128-lane row,
no transpose anywhere, and the (T//q, q*m) result reshapes back to
(T, m) for free (row-major). Same FLOPs, same bytes, full lanes.

Measures (slopes, STEPS=8): paired sum at m=64 (q=2) and m=32 (q=4)
vs the production conv/shifts lowerings, plus numerical equivalence.
Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/pfb_paired_r5.py
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
TPC = 8


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


def sum_shifts(u, w, nf, tpc=TPC):
    s = w[0] * u[..., :nf, :]
    for j in range(1, tpc):
        s = s + w[j] * u[..., j:j + nf, :]
    return s


def sum_conv(u, w):
    return lax.conv_general_dilated(
        u, w[:, None, :], window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=w.shape[-1], precision="highest")


def sum_paired(x, w_np, m, nb, tpc=TPC):
    """Full-lane sliding sum via free block-group views: view r packs
    blocks [q*p + r, .., q*p + r + q - 1] into 128-lane row p — a plain
    row-major reshape of x offset by r blocks, no transpose. Tap j reads
    view (j % q) at row p + j//q. Returns the first
    floor-to-fit output frames (production would finish the <=2q-frame
    tail on the plain path); multiply-add order matches sum_shifts
    exactly, so rows are bitwise-comparable."""
    q = 128 // m
    max_o = (tpc - 1) // q
    np_rows = (nb - tpc + 1) // q
    # clamp so every view slice stays inside the signal for all r
    while q * (np_rows - 1 + max_o) + (q - 1) + q - 1 > nb - 1:
        np_rows -= 1
    rows_needed = np_rows + max_o
    lead = x.shape[:-1]
    wq = jnp.asarray(np.concatenate([w_np] * q, axis=-1))  # (tpc, q*m)
    packed = [
        x[..., r * m: r * m + rows_needed * q * m].reshape(
            *lead, rows_needed, q * m)
        for r in range(q)
    ]
    s = wq[0] * packed[0][..., :np_rows, :]
    for j in range(1, tpc):
        r, o = j % q, j // q
        s = s + wq[j] * packed[r][..., o:o + np_rows, :]
    return s.reshape(*lead, np_rows * q, m)


def main():
    rng = np.random.default_rng(0)
    for m in (64, 32):
        q = 128 // m
        proto = (rng.normal(size=(TPC, m)) * 0.01).astype(np.float32)
        w = jnp.asarray(proto)

        # numerical equivalence check (tiny, host side)
        xs = jnp.asarray(rng.normal(size=(2, 64 * m)), jnp.float32)
        nb = 64
        u = xs.reshape(2, nb, m)
        ref = np.asarray(sum_shifts(u, w, nb - TPC + 1))
        got = np.asarray(sum_paired(xs, proto, m, nb))
        nrow = got.shape[-2]
        ok = bool(np.array_equal(got, ref[..., :nrow, :]))
        emit(case=f"paired_m{m}_bitwise_vs_shifts", ok=ok,
             rows=nrow, ref_rows=ref.shape[-2])

        cases = {}
        for name in ("conv", "shifts", "paired"):
            dts = []
            for n in (N_LO, 2 * N_LO):
                x = jnp.asarray(rng.normal(size=(8, n)), jnp.float32)
                nb_n = n // m
                if name == "conv":
                    g = jax.jit(lambda x, nb=nb_n: sum_conv(
                        x[..., :nb * m].reshape(-1, nb, m), w))
                elif name == "shifts":
                    g = jax.jit(lambda x, nb=nb_n: sum_shifts(
                        x[..., :nb * m].reshape(8, nb, m), w, nb - TPC + 1))
                else:
                    g = jax.jit(lambda x, nb=nb_n: sum_paired(
                        x, proto, m, nb))
                dts.append(timed(g, x))
                del x
            gbs = 2.0 * 8 * N_LO * 4 / max(dts[1] - dts[0], 1e-9) / 1e9
            cases[name] = gbs
            emit(case=f"sum_{name}_m{m}_slope", ms_s1=dts[0] * 1e3,
                 ms_s2=dts[1] * 1e3, gb_per_s=round(gbs, 1))
        emit(case=f"m{m}_verdict",
             paired_vs_conv=round(cases["paired"] / cases["conv"], 3))


if __name__ == "__main__":
    main()
