"""Cheap Pallas-on-hardware probe (VERDICT.md round-1 item 5).

Round 1: Mosaic kernel compiles HUNG in the chipless axon remote compiler
(>10 min for a trivial kernel) and degraded the tunnel for ~15 min after.
This probe compiles the smallest possible Pallas TPU kernel under an
external hard timeout (run via `timeout 300 python scripts/pallas_probe.py`)
to re-check each round whether the environment has gained Mosaic support.
Prints PALLAS_OK <ms> if the kernel compiles and runs, exits nonzero (or is
killed by the timeout) otherwise.
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

import jax.numpy as jnp
from jax.experimental import pallas as pl


def add_one_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def main():
    x = jnp.zeros((8, 128), jnp.float32)
    fn = pl.pallas_call(
        add_one_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )
    t0 = time.perf_counter()
    out = jax.jit(fn)(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) * 1e3
    assert float(out[0, 0]) == 1.0
    print(f"PALLAS_OK {dt:.0f}ms compile+run on {jax.devices()[0].device_kind}")


if __name__ == "__main__":
    main()
