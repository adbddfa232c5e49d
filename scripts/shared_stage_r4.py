"""Round-4 shared-kernel probe 2: per-STAGE silicon cost + the sliding
(phase-factorized) epilogue vs the direct one.

Probe 1 (scripts/shared_pallas_r4.py) measured the 2x-FLOP-cut kernel
LOSING to conv (512ch: 90.2 window / 142.3 pipeline vs conv 59-64) even
though the GEMM is half — hypothesis: the stage-B/C shifted-slice
relayouts (~8 x 540 KB per program) eat the cut. This probe separates
the stages on silicon:

  gemm   = stage A + power only            (GEMM + schedule cost)
  nowin  = + twiddle combine               (stage B cost = nowin - gemm)
  full   = + spectral window conv          (stage C cost = full - nowin)

and A/Bs combine='sliding' (aligned period-J phase tiles + J-row sliding
sum, 2.7x less relayout traffic) against combine='direct'.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/shared_stage_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from nx_signal_tpu.utils.profiling import hard_sync
import numpy as np

RATE, FRAME, HOP, NFFT, NUM_TAPS, SECONDS = 48000, 512, 128, 512, 255, 10


def timed(fn, x, reps=5, steps=2):
    out = fn(x)
    hard_sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(x)
        hard_sync(out)
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def main():
    from nx_signal_tpu.kernels.dft import (fir_framed_dft,
                                           recognize_cosine_window)
    from nx_signal_tpu.kernels.pallas_dft import (
        fir_framed_dft_power_shared_pallas)
    from nx_signal_tpu.ops.filters import firwin
    from nx_signal_tpu.ops.windows import hann

    rng = np.random.default_rng(0)
    taps = firwin(NUM_TAPS, [2000.0], sampling_rate=float(RATE))
    window = hann(FRAME)
    coeffs = recognize_cosine_window(np.asarray(window), NFFT)
    n = SECONDS * RATE

    for ch in (128, 512):
        x = jnp.asarray(rng.normal(size=(ch, n)), jnp.float32)
        ref = jax.jit(lambda x: fir_framed_dft(
            x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
            output="power", precision="high", kernel="xla"))
        ref_out = ref(x)
        hard_sync(ref_out)
        print(json.dumps({"config": "conv", "ch": ch,
                          "ms": round(timed(ref, x) * 1e3, 2)}), flush=True)

        probes = [("sliding", "gemm"), ("sliding", "nowin"),
                  ("sliding", "full"), ("direct", "full")]
        for combine, stages in probes:
            fn = jax.jit(lambda x, c=combine, s=stages:
                         fir_framed_dft_power_shared_pallas(
                             x, taps, stride=HOP, n_fft=NFFT,
                             window_coeffs=coeffs, precision="high",
                             dma="window", combine=c, stages=s))
            out = fn(x)
            hard_sync(out)
            rec = {"config": f"shared_{combine}_{stages}", "ch": ch,
                   "ms": round(timed(fn, x) * 1e3, 2)}
            if stages == "full":
                rec["rel_err_vs_conv"] = round(float(
                    jnp.max(jnp.abs(out - ref_out))
                    / jnp.max(jnp.abs(ref_out))), 9)
            print(json.dumps(rec), flush=True)
            del out

        print(json.dumps({"config": "conv_again", "ch": ch,
                          "ms": round(timed(ref, x) * 1e3, 2)}), flush=True)
        del x, ref_out


if __name__ == "__main__":
    main()
