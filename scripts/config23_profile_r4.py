"""Round-4 stage profile for BASELINE configs 2-3 (ROOFLINE §7.2):
which stage holds the measured rate below the derived bound.

config 2 (stft->istft roundtrip): forward STFT alone, inverse alone,
fused roundtrip.
config 3 (resample+DDC): mix_down alone, .real+resample_poly alone,
fused chain.

One process, scalar-fetch barriers.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/config23_profile_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5, steps=2):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.real(leaf.ravel()[0]))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.real(leaf.ravel()[0]))
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def emit(name, n, dt):
    print(json.dumps({"config": name, "ms": round(dt * 1e3, 2),
                      "msamples_per_s": round(n / dt / 1e6, 1)}), flush=True)


def main():
    from nx_signal_tpu.ops.mixing import mix_down
    from nx_signal_tpu.ops.resample import resample_poly
    from nx_signal_tpu.ops.windows import hann
    from nx_signal_tpu.spectral.stft import istft, stft

    rng = np.random.default_rng(0)

    # ---- config 2 split at 32ch (the bare complex spectrum is 2.7 GB;
    # the 64ch split probes transiently hold two of them + input -> OOM;
    # stage RATIOS are what the profile needs)
    ch, n = 32, 60 * 44100
    x = jnp.asarray(rng.normal(size=(ch, n)), jnp.float32)
    w = np.asarray(hann(512))

    fwd = jax.jit(lambda x: stft(x, w, sampling_rate=44100.0,
                                 fft_length=512, overlap_length=384,
                                 onesided=True, precision="high")[0])
    z = fwd(x)
    jax.block_until_ready(z)
    emit("c2_stft_fwd", ch * n, timed(fwd, x))
    inv = jax.jit(lambda z: istft(z, w, overlap_length=384, onesided=True,
                                  precision="high"))
    emit("c2_istft_inv", ch * n, timed(inv, z))

    both = jax.jit(lambda x: istft(
        stft(x, w, sampling_rate=44100.0, fft_length=512,
             overlap_length=384, onesided=True, precision="high")[0],
        w, overlap_length=384, onesided=True, precision="high"))
    emit("c2_roundtrip", ch * n, timed(both, x))
    del x, z

    # ---- config 3: 64ch x 60 s @ 48k mix+resample, split
    n3 = 60 * 48000
    x3 = jnp.asarray(rng.normal(size=(64, n3)), jnp.float32)
    mix = jax.jit(lambda x: mix_down(x, 8000.0, 48000.0))
    emit("c3_mixdown", 64 * n3, timed(mix, x3))
    res = jax.jit(lambda x: resample_poly(x, 1, 3))
    emit("c3_resample_only", 64 * n3, timed(res, x3))
    fused = jax.jit(lambda x: resample_poly(
        mix_down(x, 8000.0, 48000.0).real, 1, 3))
    emit("c3_chain", 64 * n3, timed(fused, x3))


if __name__ == "__main__":
    main()
