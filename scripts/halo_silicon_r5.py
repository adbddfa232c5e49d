"""Silicon compile check for the Pallas remote-DMA halo kernel.

Only one tunnel chip exists, so multi-device DMA cannot execute — but a
1-device ('channel' x 'block') mesh still TRACES AND COMPILES the full
kernel (the make_async_remote_copy descriptors and semaphores are
constructed unconditionally; only start/wait are pl.when-guarded off),
so Mosaic either accepts the kernel structure on real hardware or tells
us exactly what it rejects. Executes the degenerate zero-edge path and
compares bitwise vs the ppermute halo.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/halo_silicon_r5.py
"""

import json

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    from nx_signal_tpu.parallel.mesh import make_dsp_mesh
    from nx_signal_tpu.parallel.sharded import sharded_convolve_same

    n_dev = len(jax.devices())
    mesh = make_dsp_mesh(1, n_dev)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 4096)), jnp.float32)
    taps = jnp.asarray(rng.normal(size=31), jnp.float32)
    try:
        a = np.asarray(sharded_convolve_same(x, taps, mesh=mesh,
                                             method="conv"))
        b = np.asarray(sharded_convolve_same(x, taps, mesh=mesh,
                                             method="conv",
                                             halo="pallas_dma"))
        print(json.dumps({
            "probe": "halo_silicon", "devices": n_dev,
            "compiled": True, "bitwise": bool(np.array_equal(a, b)),
        }), flush=True)
    except Exception as e:  # record the rejection verbatim
        print(json.dumps({
            "probe": "halo_silicon", "devices": n_dev, "compiled": False,
            "error": f"{type(e).__name__}: {str(e)[:500]}",
        }), flush=True)


if __name__ == "__main__":
    main()
