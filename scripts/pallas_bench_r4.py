"""First-silicon validation + bench of the Pallas kernels (round 4).

The chipless remote compiler gained Mosaic support this round
(scripts/pallas_probe.py: PALLAS_OK) — this script is the ROOFLINE.md §3
item the kernels were built for: verify the fused FIR+DFT+power kernel
and the OLA kernel against the XLA production paths ON SILICON, then
bench the fused kernel against strategy='conv' at the bench shapes.

Order matters: small correctness shapes first (a Mosaic compile failure
degrades the tunnel ~15 min — fail before the expensive shapes), then an
interleaved conv/pallas ladder. One JSON line per measurement.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_bench_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

RATE = 48000
FRAME = 512
HOP = 128
NFFT = 512
NUM_TAPS = 255
SECONDS = 10


def timed(fn, x, reps=5, steps=2):
    out = fn(x)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(x)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def emit(**kv):
    print(json.dumps(kv), flush=True)


def main():
    from nx_signal_tpu.kernels.dft import fir_framed_dft
    from nx_signal_tpu.kernels.pallas_dft import (
        fir_framed_dft_power_pallas, framed_dft_pallas, overlap_add_pallas)
    from nx_signal_tpu.ops.filters import firwin
    from nx_signal_tpu.ops.windows import hann
    from nx_signal_tpu.spectral.framing import overlap_and_add

    rng = np.random.default_rng(0)
    taps = firwin(NUM_TAPS, [2000.0], sampling_rate=float(RATE))
    window = hann(FRAME)

    # ---- correctness, small shapes -----------------------------------
    xs = jnp.asarray(rng.normal(size=(2, 8 * RATE // 8)), jnp.float32)

    ref = jax.jit(lambda x: fir_framed_dft(
        x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
        output="power", precision="highest"))(xs)
    got = jax.jit(lambda x: fir_framed_dft_power_pallas(
        x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
        precision="highest"))(xs)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    emit(check="fused_power_vs_xla_highest", rel_err=err, ok=err < 1e-4)

    got_h = jax.jit(lambda x: fir_framed_dft_power_pallas(
        x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
        precision="high"))(xs)
    err_h = float(jnp.max(jnp.abs(got_h - ref)) / jnp.max(jnp.abs(ref)))
    emit(check="fused_power_vs_xla_high", rel_err=err_h, ok=err_h < 1e-4)

    zp = jax.jit(lambda x: framed_dft_pallas(
        x, window, stride=HOP, n_fft=NFFT, onesided=True))(xs)
    from nx_signal_tpu.kernels.dft import framed_dft
    zr = jax.jit(lambda x: framed_dft(
        x, window, stride=HOP, n_fft=NFFT, onesided=True,
        precision="highest"))(xs)
    errz = float(jnp.max(jnp.abs(zp - zr)) / jnp.max(jnp.abs(zr)))
    emit(check="framed_dft_vs_xla", rel_err=errz, ok=errz < 1e-4)

    frames = jnp.asarray(rng.normal(size=(3, 40, FRAME)), jnp.float32)
    ola_ref = jax.jit(lambda f: overlap_and_add(
        f, overlap_length=FRAME - HOP))(frames)
    ola_got = jax.jit(lambda f: overlap_add_pallas(
        f, overlap_length=FRAME - HOP))(frames)
    bitwise = bool(jnp.all(ola_got == ola_ref))
    emit(check="overlap_add_bitwise", ok=bitwise,
         max_abs=float(jnp.max(jnp.abs(ola_got - ola_ref))))

    # ---- bench ladder, interleaved conv/pallas -----------------------
    n = SECONDS * RATE
    for ch in (128, 512, 768):
        x = jnp.asarray(rng.normal(size=(ch, n)), jnp.float32)

        conv = jax.jit(lambda x: fir_framed_dft(
            x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
            output="power", precision="high", frame_chunks="auto"))
        dt = timed(conv, x)
        emit(config=f"conv_{ch}ch", ms=round(dt * 1e3, 2),
             msamples_per_s=round(ch * n / dt / 1e6, 1))

        pal = jax.jit(lambda x: fir_framed_dft_power_pallas(
            x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
            precision="high"))
        dt = timed(pal, x)
        emit(config=f"pallas_{ch}ch", ms=round(dt * 1e3, 2),
             msamples_per_s=round(ch * n / dt / 1e6, 1))

        pal6 = jax.jit(lambda x: fir_framed_dft_power_pallas(
            x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
            precision="highest"))
        dt = timed(pal6, x)
        emit(config=f"pallas_highest_{ch}ch", ms=round(dt * 1e3, 2),
             msamples_per_s=round(ch * n / dt / 1e6, 1))
        del x

    # the OOM wall: 1024 channels LAST (an OOM wedges the process)
    x = jnp.asarray(rng.normal(size=(1024, n)), jnp.float32)
    pal = jax.jit(lambda x: fir_framed_dft_power_pallas(
        x, taps, window, stride=HOP, n_fft=NFFT, onesided=True,
        precision="high"))
    dt = timed(pal, x)
    emit(config="pallas_1024ch", ms=round(dt * 1e3, 2),
         msamples_per_s=round(1024 * n / dt / 1e6, 1))


if __name__ == "__main__":
    main()
