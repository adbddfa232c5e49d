"""Round-4 PFB follow-up in ONE process (the r04b tunnel charges
~15-25 min per process): 'factored' sliding-sum lowering A/B — tpc
shifted multiply-adds vs one depthwise lax.conv over the block axis —
at 64 and 1024 bands, small and large streams.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pfb_factored_conv_r4.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

STREAMS = 8


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
    from nx_signal_tpu.ops.filters import firwin
    from nx_signal_tpu.ops.resample import _pfb_factored

    rng = np.random.default_rng(0)
    for bands, n_per in ((64, 4_194_304), (64, 33_554_432),
                         (1024, 4_194_304), (1024, 33_554_432)):
        proto = firwin(bands * 8, [1.0 / bands], window=("kaiser", 5.0))
        x = jnp.asarray(rng.normal(size=(STREAMS, n_per)), jnp.float32)
        ref_out = None
        for mode in ("shifts", "conv", "shifts"):
            fn = jax.jit(lambda x, md=mode: _pfb_factored(
                x, proto, bands, 8, "high", sum_mode=md))
            out = fn(x)
            jax.block_until_ready(out)
            rec = {"config": f"pfb{bands}_{mode}_{STREAMS}x{n_per}"}
            if ref_out is None:
                ref_out = out
            else:
                rec["rel_err"] = round(float(
                    jnp.max(jnp.abs(out - ref_out))
                    / jnp.max(jnp.abs(ref_out))), 9)
            dt = timed(fn, x)
            rec["ms"] = round(dt * 1e3, 2)
            rec["msamples_per_s"] = round(STREAMS * n_per / dt / 1e6, 1)
            print(json.dumps(rec), flush=True)
            del out
        del x, ref_out


if __name__ == "__main__":
    main()
