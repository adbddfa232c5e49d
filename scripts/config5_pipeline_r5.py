"""BASELINE config-5 pipeline measured END-TO-END, ingest included:
native raw decode (PrefetchingRawReader, background C++ thread) ->
StreamingPFB 1024-band channelizer -> on-device band-power accumulation
(models/pipeline.py:channelize_power_stream). Answers VERDICT_r04 item
2's open question: does the native decode path keep the chip fed?

Three same-process numbers:
  1. compute-only: the jitted step over one resident device chunk
     (hard_sync-timed) — the chip's rate with ingest out of the picture.
  2. pre-decoded: channelize_power_stream over in-memory f32 blocks —
     adds host staging + H2D transfer, no disk/decode.
  3. full pipeline: PrefetchingRawReader -> channelize_power_stream —
     disk read + i16 decode (background thread) + H2D + compute.

The capture is synthetic (random i16, written once and reused). JAX's
async dispatch overlaps H2D/compute across chunks; only the final power
fetch synchronizes. A warm-up pass over 2 blocks populates the
persistent compile cache so the measured runs pay ~1 s, not ~60 s, per
shape. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/config5_pipeline_r5.py
"""

import json
import os
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

from nx_signal_tpu.io.raw import PrefetchingRawReader, RawStreamReader
from nx_signal_tpu.models.pipeline import channelize_power_stream
from nx_signal_tpu.utils.profiling import hard_sync

M = 1024
TPC = 8
BLOCK = (1 << 18) if SMOKE else (1 << 24)      # frames per ingest block
N_BLOCKS = 4 if SMOKE else 24                  # ~400 Msamples total
CAP = "/tmp/config5_capture.i16"


def emit(**rec):
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in rec.items()}), flush=True)


def ensure_capture():
    total = BLOCK * N_BLOCKS
    if os.path.exists(CAP) and os.path.getsize(CAP) == total * 2:
        return total
    rng = np.random.default_rng(0)
    with open(CAP, "wb") as f:
        for _ in range(N_BLOCKS):
            f.write((rng.integers(-20000, 20000, size=BLOCK,
                                  dtype=np.int64)).astype("<i2").tobytes())
    return total


def main():
    total = ensure_capture()
    emit(probe="capture", samples=total, bytes=os.path.getsize(CAP))

    # warm-up: 2 blocks through the pipeline fills the persistent
    # compile cache for the step's (1, BLOCK) shape
    with PrefetchingRawReader(CAP, dtype="i16", channels=1,
                              block_frames=BLOCK) as pf:
        two = [next(iter(pf)) for _ in range(2)]
    t0 = time.perf_counter()
    p, _ = channelize_power_stream(iter(two), M, taps_per_channel=TPC,
                                   drop_tail=True)
    hard_sync(p)
    emit(probe="warmup_compile", s=time.perf_counter() - t0)

    # 1. compute-only: jitted step on one resident chunk
    from nx_signal_tpu.parallel.streaming import StreamingPFB

    pfb = StreamingPFB(M, taps_per_channel=TPC)

    def step(state, acc, chunk):
        state, z = pfb.process(state, chunk)
        return state, acc + jnp.sum(jnp.real(z) ** 2 + jnp.imag(z) ** 2,
                                    axis=-2)

    step = jax.jit(step)
    chunk = jnp.asarray(np.asarray(two[0][:, :BLOCK], np.float32))
    state = pfb.init_state(batch_shape=(1,))
    acc = jnp.zeros((1, M), jnp.float32)
    s2, a2 = step(state, acc, chunk)
    hard_sync(a2)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        s2, a2 = step(state, acc, chunk)
        s2, a2 = step(s2, a2, chunk)
        hard_sync(a2)
        times.append((time.perf_counter() - t0) / 2)
    dt = sorted(times)[len(times) // 2]
    emit(probe="compute_only", ms_per_block=dt * 1e3,
         msamples_per_s=BLOCK / dt / 1e6)

    # 2. pre-decoded blocks (no disk/decode, keeps H2D + staging)
    blocks = []
    with RawStreamReader(CAP, dtype="i16", channels=1) as r:
        while True:
            b = r.read(BLOCK)
            if b.shape[1] == 0:
                break
            blocks.append(b)
    t0 = time.perf_counter()
    power, frames = channelize_power_stream(iter(blocks), M,
                                            taps_per_channel=TPC,
                                            drop_tail=True)
    hard_sync(power)
    dt = time.perf_counter() - t0
    emit(probe="pre_decoded", s=dt, frames=frames,
         msamples_per_s=total / dt / 1e6)
    del blocks

    # 3. the full pipeline: background native decode -> PFB -> power
    with PrefetchingRawReader(CAP, dtype="i16", channels=1,
                              block_frames=BLOCK, depth_blocks=4) as pf:
        t0 = time.perf_counter()
        power, frames = channelize_power_stream(pf, M, taps_per_channel=TPC,
                                                drop_tail=True)
        hard_sync(power)
        dt = time.perf_counter() - t0
    emit(probe="full_pipeline", s=dt, frames=frames,
         msamples_per_s=total / dt / 1e6)

    # ingest-only control: how fast does the native decode path run bare?
    with PrefetchingRawReader(CAP, dtype="i16", channels=1,
                              block_frames=BLOCK, depth_blocks=4) as pf:
        t0 = time.perf_counter()
        got = sum(b.shape[1] for b in pf)
        dt = time.perf_counter() - t0
    emit(probe="ingest_only", s=dt, samples=got,
         msamples_per_s=got / dt / 1e6)


if __name__ == "__main__":
    main()
