"""Round-3 frame-chunked ladder: measure fir_framed_dft(frame_chunks=k)
against the dense single-dispatch chain, then climb the channel ladder past
the 896-channel memory wall (ROOFLINE.md §3.3) that frame chunking lifts.

Also collects the floor-probe evidence for the ROOFLINE.md attainable-bound
section: the pure pre-framed GEMM rate at this exact shape (what the MXU
emitter sustains with no framing/epilogue) and the conv with/without the
power epilogue (what the unfusable intermediate round-trip costs).

Interleaved in ONE process (tunnel throughput drifts between processes);
OOM-risky configs LAST — one ResourceExhausted wedges the process
(CLAUDE.md), so everything after the first OOM is expected to fail.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ladder_chunk_r3.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from nx_signal_tpu.kernels.dft import blocked_frame_matmul, fir_framed_dft
from nx_signal_tpu.ops.filters import firwin
from nx_signal_tpu.ops.windows import hann

SECONDS, RATE = 10, 48000
FRAME, HOP, NFFT, NUM_TAPS = 512, 128, 512, 255
EXT = FRAME + NUM_TAPS - 1   # 766
COLS = 2 * (NFFT // 2 + 1)   # 514 stacked [re | im]


def timed(fn, *args, reps=5, steps=2):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def report(name, ch, dt):
    n = ch * SECONDS * RATE
    print(f"{ch:5d}ch {name:14s} {dt * 1e3:8.2f} ms/step "
          f"{n / dt / 1e6:8.1f} Ms/s", flush=True)


def main():
    taps = np.asarray(firwin(NUM_TAPS, [2000.0], sampling_rate=float(RATE)))
    window = np.asarray(hann(FRAME))

    def chain(k):
        def fn(x):
            return fir_framed_dft(x, taps, window, stride=HOP, n_fft=NFFT,
                                  onesided=True, precision="high",
                                  output="power", frame_chunks=k)
        return jax.jit(fn)

    def make_x(ch):
        return jnp.asarray(
            np.random.default_rng(0).normal(size=(ch, SECONDS * RATE)),
            dtype=jnp.float32)

    # --- floor probes at 256ch (small enough that nothing OOMs) ----------
    ch_p = 256
    xs = make_x(ch_p)
    num_frames = (SECONDS * RATE - FRAME) // HOP + 1
    # (a) pure pre-framed GEMM at the chain's exact contraction shape:
    # the attainable MXU rate with zero framing/epilogue overhead
    m_rows = ch_p * num_frames
    a = jnp.asarray(np.random.default_rng(1).normal(
        size=(m_rows, EXT)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(2).normal(
        size=(EXT, COLS)), jnp.float32)
    gemm = jax.jit(lambda a, b: jnp.matmul(a, b, precision="high"))
    dt = timed(gemm, a, b)
    flops = 2.0 * m_rows * EXT * COLS
    print(f"probe  preframed_gemm {dt * 1e3:8.2f} ms "
          f"{flops / dt / 1e12:6.1f} TF/s(real)  "
          f"[{ch_p}ch-equiv {ch_p * SECONDS * RATE / dt / 1e6:.1f} Ms/s]",
          flush=True)
    del a, b

    # (b) conv WITHOUT the power epilogue (raw 514-col intermediate out)
    pad_l = (NUM_TAPS - 1) - (NUM_TAPS - 1) // 2

    def conv_raw(x):
        from nx_signal_tpu.kernels.dft import _dft_weights, toeplitz_band
        t = toeplitz_band(taps, FRAME, np)
        dw = _dft_weights(window, FRAME, NFFT, True, np.float64)
        w = jnp.asarray((t @ dw).astype(np.float32))
        xp = jnp.pad(x, [(0, 0), (pad_l, NUM_TAPS - 1)])
        return blocked_frame_matmul(xp, w, window_length=EXT, stride=HOP,
                                    num_frames=num_frames, precision="high")

    raw = jax.jit(conv_raw)
    report("conv_raw_514", ch_p, timed(raw, xs))
    report("dense_power", ch_p, timed(chain(1), xs))
    del xs

    # --- the ladder: regression-check chunking, then climb ---------------
    for ch, k in [(768, 1), (768, 2), (768, 4),
                  (1024, 4), (1280, 6), (1536, 8)]:
        try:
            x = make_x(ch)
            report(f"chunks={k}", ch, timed(chain(k), x))
            del x
        except Exception as e:
            print(f"{ch:5d}ch chunks={k} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
