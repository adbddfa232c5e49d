"""Benchmark: STFT+FIR chain throughput on one chip (the BASELINE.json
north-star metric).

Workload: 255-tap FIR low-pass fused into a 512-pt Hann framed-DFT (hop
128) producing the one-sided power spectrogram of a 512-channel f32 stream
— the guides/filtering.livemd chain at production batch size. The FIR is
folded into the DFT weights (kernels/dft.py:fir_framed_dft) so the whole
chain is one frames-matmul: the filtered signal is never materialized and
the spectrogram is the only output (the chain's consumer).

Prints ONE JSON line: {"metric", "value" (Msamples/s/chip), "unit",
"vs_baseline"}. The reference publishes no perf numbers (BASELINE.md), so
vs_baseline is the fraction of this chain's speed-of-light bound on the
detected chip — the BINDING resource limit, which for the matmul-DFT
algorithm at precision='high' is the MXU, not HBM (full derivation and
measured evidence: ROOFLINE.md).
"""

import json
import sys
import time

import jax

# Persistent compilation cache: the remote-tunnel TPU compile is slow and
# variable (30 s - several minutes); caching lets repeat runs skip it.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

CHANNELS = 768  # fills the chip; amortizes the tunnel dispatch latency
# (r03 ladder, one process: 128ch 2577 / 256ch 3501 / 512ch 4306 /
# 768ch 4631 Ms/s). 896ch+ dense OOMs — the (ch, frames, 514) conv
# result materializes ahead of the power epilogue; frame_chunks='auto'
# (kernels/dft.py) lifts that wall by chunking the frame axis, but the
# chunked 1024ch point measured 4246 Ms/s < 768ch dense (ROOFLINE.md
# §3.4), so 768 dense stays the bench config ('auto' resolves to the
# dense plan here and only chunks where dense would OOM).
SECONDS = 10
RATE = 48000
# 8 pipelined steps per timing: consecutive same-shape dispatches overlap
# in the runtime queue, so the per-step time converges to the SUSTAINED
# streaming rate — the regime a deployed pipeline actually runs in (and
# the regime the north-star metric names). On remote-attached backends
# this hides the per-dispatch tunnel latency that a back-to-back stream
# also hides (measured 59.9 -> 8.5 ms/step on an empty dispatch,
# ROOFLINE.md §8.1); on locally-attached chips (µs latency) the step
# count is irrelevant. r01-r04 benches used STEPS=2 and paid ~40% of
# each step in tunnel latency on slow-latency days.
STEPS = 8
NUM_TAPS = 255
FRAME, HOP, NFFT = 512, 128, 512
BINS = NFFT // 2 + 1

# (bf16 MXU TFLOP/s, HBM GB/s) per chip
CHIP_PEAKS = {
    "v5 lite": (197e12, 819e9), "v5e": (197e12, 819e9),
    "v5litepod": (197e12, 819e9), "v4": (275e12, 1228e9),
    "v5p": (459e12, 2765e9), "v6e": (918e12, 1640e9),
}


def detect_chip():
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in CHIP_PEAKS.items():
        if key in kind:
            return peaks
    return CHIP_PEAKS["v5e"]


def chain_speed_of_light():
    """Per-sample resource floor of the fused chain (see ROOFLINE.md).

    MXU: the FIR-folded framed DFT does one (766 x 514) f32 matmul row per
    128-sample hop = 6152 FLOP/sample; precision='high' (bf16_3x) runs the
    MXU at peak/3. HBM: read x (4 B) + write one-sided power (257*4/128 B).
    The chain's speed of light is the tighter (smaller) of the two rates.
    """
    mxu_peak, hbm_bw = detect_chip()
    ext = FRAME + NUM_TAPS - 1
    flops_per_sample = 2.0 * ext * (2 * BINS) / HOP
    mxu_rate = (mxu_peak / 3.0) / flops_per_sample
    bytes_per_sample = 4.0 + BINS * 4.0 / HOP
    hbm_rate = hbm_bw / bytes_per_sample
    return min(mxu_rate, hbm_rate), ("MXU" if mxu_rate < hbm_rate else "HBM")


def main():
    from nx_signal_tpu.models.pipeline import stft_fir_chain
    from nx_signal_tpu.ops.filters import firwin
    from nx_signal_tpu.ops.windows import hann

    n = CHANNELS * SECONDS * RATE
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(CHANNELS, SECONDS * RATE)),
        dtype=jnp.float32,
    )
    taps = firwin(NUM_TAPS, [2000.0], sampling_rate=float(RATE))
    window = hann(FRAME)

    @jax.jit
    def step(x):
        # fully-fused Toeplitz-folded FIR + framed-DFT power (the fast path
        # of stft_fir_chain when only the spectrogram is consumed);
        # precision='high' (bf16_3x MXU passes) keeps the power spectrum
        # within 1.4e-5 of 'highest' — inside the 1e-4 scipy-parity gate
        # (scripts/precision_sweep.py, v5e measured)
        return stft_fir_chain(
            x, taps, window,
            fft_length=NFFT, overlap_length=FRAME - HOP,
            sampling_rate=float(RATE),
            onesided=True, return_filtered=False, precision="high",
            frame_chunks="auto",
        )

    # Same-shape pre-framed GEMM probe FIRST (its buffers release before
    # the chain's ~12 GB peak): the chain/GEMM ratio is tunnel-WINDOW-
    # invariant (~90%, ROOFLINE.md §3.5), so cross-round regressions are
    # detectable despite the ±40% absolute swings. Shape matches the
    # r03b probe row (256ch-equivalent frames matrix, 'high' precision).
    gemm_rows = 256 * ((SECONDS * RATE - FRAME) // HOP + 1)
    ext = FRAME + NUM_TAPS - 1
    fa = jnp.asarray(
        np.random.default_rng(1).normal(size=(gemm_rows, ext)), jnp.float32)
    fw = jnp.asarray(
        np.random.default_rng(2).normal(size=(ext, 2 * BINS)), jnp.float32)
    gemm = jax.jit(lambda a, w: jnp.matmul(a, w, precision="high"))
    from nx_signal_tpu.utils.profiling import hard_sync

    hard_sync(gemm(fa, fw))  # tunnel barrier (ROOFLINE.md §5 r03b / §7.2)
    gtimes = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(STEPS):   # amortize dispatch exactly like the chain
            g = gemm(fa, fw)
        hard_sync(g)
        gtimes.append((time.perf_counter() - t0) / STEPS)
    gemm_dt = sorted(gtimes)[len(gtimes) // 2]
    gemm_tfs = 2.0 * gemm_rows * ext * 2 * BINS / gemm_dt / 1e12
    del fa, fw, g

    hard_sync(step(x))  # compile + warm up

    # median of 5 timed batches: the remote-tunnel runtime has large
    # (~±30%) run-to-run variance; hard_sync guards against
    # block_until_ready returning early through the tunnel (seen
    # intermittently — ROOFLINE.md §7.2 note)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = step(x)
        hard_sync(out)
        times.append((time.perf_counter() - t0) / STEPS)
    dt = sorted(times)[len(times) // 2]

    # Two-point within-process chain ladder (round-5 bench self-control):
    # the 256ch point runs the IDENTICAL chain at 1/3 the per-step work,
    # so (a) ladder_768_over_256 is a window-stable internal ratio (both
    # points share the process and therefore the window), and (b)
    # chain256_vs_gemm compares two computations of MATCHED per-dispatch
    # magnitude (the 256ch chain and the 256ch-equivalent GEMM probe) —
    # the amortization mismatch that broke r04's chain_vs_gemm
    # (ROOFLINE.md §7.4: 768ch chain vs 256ch-eq probe read 0.84 -> 1.27
    # across windows because latency fractions differed). Runs AFTER the
    # 768ch headline and frees the 768ch buffers first: the first ritual
    # run OOM'd with the 256ch buffers live under the 768ch ~12 GB peak.
    x256 = jnp.array(x[:256])
    del x, out
    hard_sync(step(x256))   # separate jit specialization, same code
    times256 = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out256 = step(x256)
        hard_sync(out256)
        times256.append((time.perf_counter() - t0) / STEPS)
    dt256 = sorted(times256)[len(times256) // 2]
    del x256, out256
    n256 = 256 * SECONDS * RATE
    chain256_tfs = 6152.0 * (n256 / dt256) / 1e12

    msamples_per_s = n / dt / 1e6
    sol, bound = chain_speed_of_light()
    sol_ms = sol / 1e6
    chain_tfs = 6152.0 * (n / dt) / 1e12
    print(
        json.dumps(
            {
                "metric": "stft_fir_chain_throughput",
                "value": round(msamples_per_s, 1),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(msamples_per_s / sol_ms, 4),
                "gemm_probe_tfs": round(gemm_tfs, 1),
                "chain256_msps": round(n256 / dt256 / 1e6, 1),
                "chain256_vs_gemm": round(chain256_tfs / gemm_tfs, 3),
                "ladder_768_over_256": round(
                    (n / dt) / (n256 / dt256), 3),
            }
        )
    )
    print(
        f"chain: {CHANNELS}ch x {SECONDS}s @ {RATE} Hz, {dt * 1e3:.2f} ms/step, "
        f"SoL({bound}-bound) ~ {sol_ms:.0f} Msamples/s (ROOFLINE.md); "
        f"gemm probe {gemm_dt * 1e3:.2f} ms = {gemm_tfs:.1f} TF/s; "
        f"256ch {dt256 * 1e3:.2f} ms, chain256/gemm "
        f"{chain256_tfs / gemm_tfs:.2f}, ladder768/256 "
        f"{(n / dt) / (n256 / dt256):.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
