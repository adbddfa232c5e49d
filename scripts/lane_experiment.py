"""Lane-padding experiment (ROOFLINE.md gap 4) + HLO fusion dump (gap 2).

The fused chain's matmul has 2*257 = 514 output columns, which the TPU pads
to 640 lanes (25% MXU waste). For a one-sided real DFT the Nyquist bin is
special: its sin column is identically zero, so it reduces to ONE real dot
with weights w[t]*(-1)^t. Variant B computes bins 0..255 as a 512-column
matmul (zero lane padding) plus that single matvec and concatenates.

Also dumps compiled HLO stats for the 16/32/64/128-channel chain to chase
the 32/64ch throughput cliff (per-sample rate ~40% worse than 16/128ch).
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from nx_signal_tpu.kernels.dft import _dft_weights, toeplitz_band
from nx_signal_tpu.models.pipeline import stft_fir_chain
from nx_signal_tpu.ops.filters import firwin
from nx_signal_tpu.ops.windows import hann
from nx_signal_tpu.spectral.framing import _frames_by_reshape

RATE, SEC = 48000, 10
FRAME, HOP, NFFT = 512, 128, 512
BINS = NFFT // 2 + 1
PREC = "high"


def build_weights():
    taps = np.asarray(firwin(255, [2000.0], sampling_rate=float(RATE)),
                      np.float64)
    window = np.asarray(hann(FRAME), np.float64)
    t = toeplitz_band(taps, FRAME, np)
    full = t @ _dft_weights(window, FRAME, NFFT, True, np.float64)  # (766, 514)
    wr, wi = full[:, :BINS], full[:, BINS:]
    # 512-column layout: real/imag of bins 0..255 (Nyquist dropped)
    w512 = np.concatenate([wr[:, :256], wi[:, :256]], axis=1)
    w_nyq = wr[:, 256]  # sin column of the Nyquist bin is exactly zero
    return (jnp.asarray(full.astype(np.float32)),
            jnp.asarray(w512.astype(np.float32)),
            jnp.asarray(w_nyq.astype(np.float32)),
            taps, window)


def timeit(fn, x, steps, reps=5):
    out = fn(x)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(x)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / steps)
    return sorted(ts)[len(ts) // 2]


def main():
    w514, w512, w_nyq, taps_np, window_np = build_weights()
    k = 255
    pad_left = (k - 1) - (k - 1) // 2
    ext = FRAME + k - 1

    def frames_of(x):
        xp = jnp.pad(x, [(0, 0), (pad_left, k - 1)])
        num_frames = (x.shape[-1] - FRAME) // HOP + 1
        return _frames_by_reshape(xp, ext, HOP)[..., :num_frames, :]

    def chain514(x):
        fr = frames_of(x)
        acc = jnp.matmul(fr.reshape(-1, ext), w514, precision=PREC)
        acc = acc.reshape(*fr.shape[:-1], 2 * BINS)
        return acc[..., :BINS] ** 2 + acc[..., BINS:] ** 2

    def chain512(x):
        fr = frames_of(x)
        flat = fr.reshape(-1, ext)
        acc = jnp.matmul(flat, w512, precision=PREC)
        nyq = jnp.matmul(flat, w_nyq[:, None], precision=PREC)
        power = acc[..., :256] ** 2 + acc[..., 256:] ** 2
        power = jnp.concatenate([power, nyq**2], axis=-1)
        return power.reshape(*fr.shape[:-1], BINS)

    def chain512_nonyq(x):
        fr = frames_of(x)
        acc = jnp.matmul(fr.reshape(-1, ext), w512, precision=PREC)
        return (acc[..., :256] ** 2 + acc[..., 256:] ** 2).reshape(
            *fr.shape[:-1], 256)

    taps = jnp.asarray(taps_np, jnp.float32)
    window = jnp.asarray(window_np, jnp.float32)

    def chain_prod(x):  # the production path, for drift control
        return stft_fir_chain(
            x, taps, window, fft_length=NFFT, overlap_length=FRAME - HOP,
            sampling_rate=float(RATE), onesided=True, return_filtered=False,
            precision=PREC)

    for ch in (16, 128):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(ch, SEC * RATE)),
                        jnp.float32)
        n = ch * SEC * RATE
        steps = max(2, 64 // ch)
        # correctness of the 512-lane variant vs production
        ref = chain_prod(x[:2])
        got = chain512(x[:2])
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        for name, fn in [("prod(514col)", chain_prod),
                         ("manual514", chain514),
                         ("512col+nyqdot", chain512),
                         ("512col_nonyq", chain512_nonyq)]:
            dt = timeit(jax.jit(fn), x, steps)
            print(f"ch={ch:4d} {name:16s} {dt*1e3:8.3f} ms "
                  f"{n/dt/1e6:9.1f} Ms/s", flush=True)
        print(f"ch={ch} 512col rel err vs prod: {err:.2e}", flush=True)

    # HLO stats for the channel cliff
    for ch in (16, 32, 64, 128):
        x = jnp.asarray(np.zeros((ch, SEC * RATE)), jnp.float32)
        txt = jax.jit(chain_prod).lower(x).compile().as_text()
        fusions = txt.count(" fusion(")
        convs = txt.count("convolution(")
        dots = txt.count(" dot(")
        copies = txt.count(" copy(")
        print(f"HLO ch={ch}: {len(txt.splitlines())} lines, "
              f"fusion={fusions} dot={dots} conv={convs} copy={copies}",
              flush=True)
        with open(f"/tmp/hlo_ch{ch}.txt", "w") as f:
            f.write(txt)


if __name__ == "__main__":
    main()
