"""Round-4: the silicon-verified BITWISE Pallas OLA kernel vs the
production deterministic fold (spectral/framing.py:_ola_fold) at ISTFT
shapes — the one glue stage of config 2 never A/B'd on hardware. If the
kernel wins, istft can dispatch its fold to it on TPU for the aligned
(hop % 128 == 0, window % hop == 0) geometry, bit-compatibly.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ola_bench_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timed(fn, x, reps=5, steps=2):
    out = fn(x)
    jax.block_until_ready(out)
    float(jnp.real(out.ravel()[0]))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(x)
        jax.block_until_ready(out)
        float(jnp.real(out.ravel()[0]))
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def main():
    from nx_signal_tpu.kernels.pallas_dft import overlap_add_pallas
    from nx_signal_tpu.spectral.framing import overlap_and_add

    rng = np.random.default_rng(0)
    # config-2 ISTFT geometry: 512-pt frames, hop 128 (overlap 384)
    for ch, m in ((64, 20000), (256, 3744)):
        f = jnp.asarray(rng.normal(size=(ch, m, 512)), jnp.float32)
        fold = jax.jit(lambda f: overlap_and_add(f, overlap_length=384))
        ref = fold(f)
        jax.block_until_ready(ref)
        print(json.dumps({"config": f"fold_{ch}x{m}",
                          "ms": round(timed(fold, f) * 1e3, 2)}), flush=True)
        pal = jax.jit(lambda f: overlap_add_pallas(f, overlap_length=384))
        out = pal(f)
        jax.block_until_ready(out)
        bitwise = bool(jnp.all(out == ref))
        print(json.dumps({"config": f"pallas_{ch}x{m}",
                          "ms": round(timed(pal, f) * 1e3, 2),
                          "bitwise_vs_fold": bitwise}), flush=True)
        print(json.dumps({"config": f"fold_again_{ch}x{m}",
                          "ms": round(timed(fold, f) * 1e3, 2)}), flush=True)
        del f, ref, out


if __name__ == "__main__":
    main()
