"""Component-wise timing of the bench.py north-star chain on the real TPU.

VERDICT.md round 1 asked for evidence of WHERE the 6.15 ms/step goes:
launch overhead, bandwidth, or MXU. This script times each stage of the
STFT+FIR chain (and candidate replacements) separately with
block_until_ready, plus a trivial-dispatch probe and a pure-bandwidth probe,
and prints a per-stage table with derived FLOP/s and B/s so the roofline in
ROOFLINE.md is backed by measurements, not vibes.

Run:  python scripts/profile_chain.py  (TPU via the axon tunnel; first run
compiles ~10 shapes at 20-60 s each unless the compilation cache is warm.)
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from nx_signal_tpu.kernels.dft import (
    blocked_frame_matmul,
    _dft_weights,
    fir_framed_dft,
    framed_dft,
)
from nx_signal_tpu.models.pipeline import stft_fir_chain
from nx_signal_tpu.ops.convolution import oaconvolve, convolve
from nx_signal_tpu.ops.filters import firwin
from nx_signal_tpu.ops.windows import hann

CHANNELS = 16
SECONDS = 10
RATE = 48000
N = CHANNELS * SECONDS * RATE
FRAME, HOP, NFFT = 512, 128, 512
BINS = NFFT // 2 + 1
PREC = "high"
HBM = 819e9  # v5e B/s


def timeit(fn, *args, steps=20, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(CHANNELS, SECONDS * RATE)), jnp.float32)
    taps = firwin(255, [2000.0], sampling_rate=float(RATE))
    window = hann(FRAME)
    num_frames = (SECONDS * RATE - FRAME) // HOP + 1
    frames = jnp.asarray(
        rng.normal(size=(CHANNELS, num_frames, FRAME)), jnp.float32)
    weights = jnp.asarray(
        _dft_weights(np.asarray(window, np.float64), FRAME, NFFT, True,
                     np.float32))

    results = {}

    def rec(name, dt, flops=0.0, bytes_=0.0, note=""):
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "Msamples/s": round(N / dt / 1e6, 1),
            "TFLOP/s": round(flops / dt / 1e12, 2) if flops else None,
            "GB/s": round(bytes_ / dt / 1e9, 1) if bytes_ else None,
            "note": note,
        }
        print(f"{name:34s} {dt * 1e3:8.3f} ms  "
              f"{N / dt / 1e6:9.1f} Ms/s  "
              f"{flops / dt / 1e12:7.2f} TF/s  {bytes_ / dt / 1e9:7.1f} GB/s  {note}",
              flush=True)

    # --- dispatch overhead probe: trivial jitted op on a tiny array
    tiny = jnp.zeros((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda t: t + 1.0)
    dt = timeit(f_tiny, tiny)
    rec("dispatch_overhead(tiny add)", dt, note="pure launch cost")

    # --- bandwidth probe: elementwise copy-scale of the full signal
    f_bw = jax.jit(lambda t: t * 1.000001 + 0.5)
    dt = timeit(f_bw, x)
    rec("bandwidth_probe(x*a+b)", dt, bytes_=2 * 4 * N,
        note=f"roofline {HBM / (2 * 4) / 1e9:.0f} Gs/s")

    # --- FIR alone (overlap-add, same) — bench config
    taps_b = taps.reshape(1, -1)
    f_oa = jax.jit(lambda t: oaconvolve(t, taps_b, mode="same"))
    fir_flops = 2.0 * N * 255  # direct-equivalent FLOPs
    dt = timeit(f_oa, x)
    rec("fir_oaconvolve", dt, flops=fir_flops, bytes_=8 * N)

    # --- FIR alone (direct Toeplitz-matmul path)
    f_dir = jax.jit(lambda t: convolve(t, taps_b, mode="same", method="direct"))
    dt = timeit(f_dir, x)
    rec("fir_direct_toeplitz", dt, flops=fir_flops, bytes_=8 * N)

    # --- framed DFT alone (the STFT core, onesided); default = conv strategy
    st_flops = 2.0 * CHANNELS * num_frames * FRAME * (2 * BINS)
    st_bytes = (4 * N * (FRAME // HOP)            # C=4 reads of x
                + CHANNELS * num_frames * 2 * BINS * 4)  # write z
    f_dft = jax.jit(lambda t: framed_dft(
        t, window, stride=HOP, n_fft=NFFT, onesided=True, precision=PREC))
    dt = timeit(f_dft, x)
    rec("framed_dft(conv strategy)", dt, flops=st_flops, bytes_=st_bytes)

    # --- blocked-accumulation form (the round-1 default, for comparison)
    def dft_blocked(t):
        acc = blocked_frame_matmul(
            t, weights, window_length=FRAME, stride=HOP,
            num_frames=num_frames, precision=PREC, strategy="blocked")
        return lax.complex(acc[..., :BINS], acc[..., BINS:])
    f_dftb = jax.jit(dft_blocked)
    dt = timeit(f_dftb, x)
    rec("framed_dft(blocked accum)", dt, flops=st_flops, bytes_=st_bytes)

    # --- materialized + direct power epilogue (the new chain STFT stage)
    f_dpow = jax.jit(lambda t: framed_dft(
        t, window, stride=HOP, n_fft=NFFT, onesided=True, precision=PREC,
        output="power"))
    dt = timeit(f_dpow, x)
    rec("framed_dft(power out)", dt, flops=st_flops, bytes_=st_bytes)

    # --- framed DFT + power epilogue (what the chain consumes)
    f_dftp = jax.jit(lambda t: jnp.abs(framed_dft(
        t, window, stride=HOP, n_fft=NFFT, onesided=True,
        precision=PREC)) ** 2)
    dt = timeit(f_dftp, x)
    rec("framed_dft+power", dt, flops=st_flops, bytes_=st_bytes)

    # --- power computed WITHOUT complex assembly (epilogue fusion test)
    def dft_power_nocomplex(t):
        acc = blocked_frame_matmul(
            t, weights, window_length=FRAME, stride=HOP,
            num_frames=num_frames, precision=PREC)
        return acc[..., :BINS] ** 2 + acc[..., BINS:] ** 2
    f_npc = jax.jit(dft_power_nocomplex)
    dt = timeit(f_npc, x)
    rec("dft_power_no_complex", dt, flops=st_flops, bytes_=st_bytes)

    # --- single big matmul on pre-framed data (MXU upper bound, K=512)
    f_mm = jax.jit(lambda fr: jnp.matmul(fr, weights, precision=PREC))
    dt = timeit(f_mm, frames)
    rec("pre_framed_matmul(K=512)", dt, flops=st_flops,
        bytes_=frames.size * 4 + CHANNELS * num_frames * 2 * BINS * 4,
        note="upper bound, framing excluded")

    # --- strided-conv formulation of the framed DFT
    def conv_dft(t):
        lhs = t[:, None, :]                                # NCW
        rhs = weights.T[:, None, :]                        # OIW: (2*BINS,1,FRAME)
        out = lax.conv_general_dilated(
            lhs, rhs, window_strides=(HOP,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
            precision=jax.lax.Precision.HIGH if PREC == "high" else None)
        return out  # (CH, 2*BINS, frames)
    f_conv = jax.jit(conv_dft)
    dt = timeit(f_conv, x)
    rec("conv_formulation_dft", dt, flops=st_flops, bytes_=st_bytes)

    # --- full chain, bench configuration (oa FIR + framed DFT + power)
    f_chain = jax.jit(lambda t: stft_fir_chain(
        t, taps, window, fft_length=NFFT, overlap_length=FRAME - HOP,
        sampling_rate=float(RATE), fir_method="oa", onesided=True,
        precision=PREC))
    dt = timeit(f_chain, x)
    rec("chain_bench_config(oa+dft)", dt, flops=fir_flops + st_flops,
        bytes_=16 * N)

    # --- fully fused chain (power only; Toeplitz folded into DFT weights)
    f_fused = jax.jit(lambda t: stft_fir_chain(
        t, taps, window, fft_length=NFFT, overlap_length=FRAME - HOP,
        sampling_rate=float(RATE), onesided=True, return_filtered=False,
        precision=PREC))
    ext_flops = 2.0 * CHANNELS * num_frames * (FRAME + 254) * (2 * BINS)
    dt = timeit(f_fused, x)
    rec("chain_fused(fir_framed_dft)", dt, flops=ext_flops, bytes_=12 * N,
        note="power only")

    # --- direct FIR + framed DFT chain (alternative to oa)
    f_chain_dir = jax.jit(lambda t: stft_fir_chain(
        t, taps, window, fft_length=NFFT, overlap_length=FRAME - HOP,
        sampling_rate=float(RATE), fir_method="direct", onesided=True,
        precision=PREC))
    dt = timeit(f_chain_dir, x)
    rec("chain_direct_fir+dft", dt, flops=fir_flops + st_flops, bytes_=16 * N)

    # --- steady-state: 8 chain steps inside ONE dispatch via lax.scan —
    # amortizes the ~1.6 ms tunnel launch overhead to measure the device's
    # actual sustained throughput (what a production stream loop sees).
    def chain_step(carry, _):
        y, p = stft_fir_chain(
            carry, taps, window, fft_length=NFFT, overlap_length=FRAME - HOP,
            sampling_rate=float(RATE), fir_method="oa", onesided=True,
            precision=PREC)
        # feed the filtered signal back so no step is dead-code-eliminated
        return y, jnp.sum(p)
    f_scan = jax.jit(lambda t: lax.scan(chain_step, t, None, length=8))
    out = f_scan(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f_scan(x)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 8)
    rec("chain_steady_state(scan x8)", best, flops=fir_flops + st_flops,
        bytes_=16 * N, note="launch overhead amortized")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
