"""Performance measurement + roofline accounting (SURVEY.md §5: the
reference has no tracing/profiling subsystem; the TPU framework needs a
bandwidth-measurement harness because the north-star target is
HBM-speed-of-light throughput)."""

import time
from dataclasses import dataclass

import jax

__all__ = ["benchmark", "BenchResult", "device_hbm_bandwidth", "hard_sync",
           "trace", "timed_median", "slope_rate"]

_HBM_BYTES_PER_S = {
    "v5 lite": 819e9, "v5e": 819e9, "v5litepod": 819e9,
    "v4": 1228e9, "v5p": 2765e9, "v6e": 1640e9,
}


def device_hbm_bandwidth(device=None) -> float:
    """Per-chip HBM bandwidth in bytes/s for the given (default: first)
    device; defaults to v5e's 819 GB/s when unknown. Not in the
    reference (it has no profiling subsystem).

    Examples:

    >>> from nx_signal_tpu.utils.profiling import device_hbm_bandwidth
    >>> device_hbm_bandwidth() >= 819e9   # every supported chip >= v5e
    True
    """
    device = device or jax.devices()[0]
    kind = device.device_kind.lower()
    for key, bw in _HBM_BYTES_PER_S.items():
        if key in kind:
            return bw
    return 819e9


@dataclass(frozen=True)
class BenchResult:
    """Result of `benchmark`: wall time per call plus the derived
    throughput / HBM-speed-of-light fraction (0 when the caller gave no
    samples/bytes model). Not in the reference (it has no profiling
    subsystem — SURVEY.md §5).

    Examples:

    >>> from nx_signal_tpu.utils.profiling import BenchResult
    >>> str(BenchResult(0.002, 5e8, 0.25))
    '2.000 ms/call, 500 Msamples/s, 25.0% of HBM SoL'
    """

    seconds_per_call: float
    samples_per_second: float  # 0 when samples_per_call not given
    hbm_fraction: float        # fraction of speed-of-light, 0 when unknown

    def __str__(self):
        parts = [f"{self.seconds_per_call * 1e3:.3f} ms/call"]
        if self.samples_per_second:
            parts.append(f"{self.samples_per_second / 1e6:.0f} Msamples/s")
        if self.hbm_fraction:
            parts.append(f"{self.hbm_fraction * 100:.1f}% of HBM SoL")
        return ", ".join(parts)


def hard_sync(out):
    """Hard completion barrier: block_until_ready PLUS a scalar fetch —
    block_until_ready alone has been observed returning early through
    remote-attached backends (ROOFLINE.md §7.2; an unbarriered step once
    read 0.06 ms for a 33.5 Msample PFB). The scalar round-trip cannot
    complete before the producing computation has. The SINGLE place the
    barrier lives — every bench path (bench.py, configs_bench, pod_bench)
    uses it. Not in the reference.

    Examples:

    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.utils.profiling import hard_sync
    >>> hard_sync(jnp.ones(4) * 2.0)   # returns once the result exists
    """
    jax.block_until_ready(out)
    for leaf in jax.tree_util.tree_leaves(out):
        if getattr(leaf, "size", 0):
            import jax.numpy as jnp

            float(jnp.real(leaf.ravel()[0]))
            return


_sync = hard_sync


def benchmark(fn, *args, iters: int = 10, samples_per_call: int = 0,
              min_bytes_per_sample: float = 0.0) -> BenchResult:
    """Time a jitted callable (compiles + warms up first, then `iters`
    timed calls with a single hard device sync — see `hard_sync`). When
    `samples_per_call` and `min_bytes_per_sample` are given, also reports
    throughput as a fraction of the HBM speed-of-light bound. Not in the
    reference.

    Examples:

    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.utils.profiling import benchmark
    >>> r = benchmark(lambda x: x * 2.0, jnp.ones(1024), iters=2,
    ...               samples_per_call=1024, min_bytes_per_sample=8.0)
    >>> r.seconds_per_call > 0.0, r.samples_per_second > 0.0
    (True, True)
    """
    jf = jax.jit(fn)
    _sync(jf(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = jf(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    sps = samples_per_call / dt if samples_per_call else 0.0
    frac = 0.0
    if samples_per_call and min_bytes_per_sample:
        sol = device_hbm_bandwidth() / min_bytes_per_sample
        frac = sps / sol
    return BenchResult(dt, sps, frac)


def timed_median(fn, *args, steps: int = 8, reps: int = 5) -> float:
    """Median per-step seconds of `fn(*args)` with PIPELINED dispatch:
    each rep issues `steps` back-to-back calls before one `hard_sync`.
    On remote-attached backends consecutive same-shape dispatches overlap
    in the queue, hiding most of the fixed per-dispatch latency (measured
    59.9 -> 8.5 ms/step in the worst tunnel window, ROOFLINE.md §8.1) —
    the canonical timing for marginal/slope measurements. `fn` should
    already be jitted (the warm-up call compiles it). Not in the
    reference.

    Examples:

    >>> import jax
    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.utils.profiling import timed_median
    >>> dt = timed_median(jax.jit(lambda x: x * 2.0), jnp.ones(256),
    ...                   steps=2, reps=2)
    >>> dt > 0.0
    True
    """
    out = fn(*args)
    hard_sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        hard_sync(out)
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def slope_rate(work_delta: float, dt_small: float, dt_large: float) -> float:
    """Differential (marginal) rate between two problem sizes measured in
    ONE process: work_delta / (dt_large - dt_small). Cancels fixed
    per-dispatch cost exactly, which dominates absolute readings on
    remote-attached backends (ROOFLINE.md §8.1: the method self-validated
    at 97.5% of HBM peak on an elementwise probe in a window whose
    absolute readings were 12x off). The marginal work must exceed the
    timing jitter — size the large case at >= 2x the small one. Not in
    the reference.

    Examples:

    >>> from nx_signal_tpu.utils.profiling import slope_rate
    >>> slope_rate(8e9, 0.010, 0.020)   # 8 GB extra moved in 10 ms more
    800000000000.0
    """
    return work_delta / max(dt_large - dt_small, 1e-12)


def trace(path: str):
    """Context manager writing a jax.profiler trace (view with XProf /
    Perfetto): `with trace('/tmp/trace'): step(x)`. Not in the reference.

    Examples:

    >>> import tempfile
    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.utils.profiling import trace
    >>> with trace(tempfile.mkdtemp()):
    ...     _ = (jnp.ones(16) * 2.0).block_until_ready()
    """
    return jax.profiler.trace(path)
