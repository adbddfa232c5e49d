"""Window functions (scipy.signal.windows-equivalent semantics).

Covers the reference window family (reference: lib/nx_signal/windows.ex):
rectangular, bartlett, triangular, blackman, hamming, hann, kaiser — each
cosine-family window supporting the periodic (DFT-even, default) vs symmetric
(filter-design) distinction (reference: windows.ex:170-198 periodic trick of
computing length n+1 and dropping the last sample).

All windows are tiny, design-time tensors — plain jnp is the right tool; no
kernels needed. Everything here is jit-compatible with `n` static.
"""

import math

import jax.numpy as jnp
from jax.scipy.special import i0 as _bessel_i0

from nx_signal_tpu.utils.dtypes import DEFAULT_FLOAT

__all__ = [
    "rectangular",
    "bartlett",
    "triangular",
    "blackman",
    "hamming",
    "hann",
    "kaiser",
    "get_window",
]


def rectangular(n: int, *, dtype=jnp.int32):
    """All-ones window (reference: windows.ex:33-36; the reference defaults to
    s64 — here int32, TPU's native integer width)."""
    return jnp.ones((n,), dtype=dtype)


def bartlett(n: int, *, dtype=DEFAULT_FLOAT):
    """Periodic Bartlett window: rises 2i/n then falls 2 - 2i/n, split at
    n//2 + n%2 (reference: windows.ex:57-76). Note this is the *periodic*
    triangular variant (matches torch.bartlett_window(periodic=True)), not
    scipy.signal.windows.bartlett which is symmetric."""
    i = jnp.arange(n, dtype=dtype)
    left_size = n // 2 + n % 2
    return jnp.where(i < left_size, i * 2.0 / n, 2.0 - i * 2.0 / n).astype(dtype)


def triangular(n: int, *, dtype=DEFAULT_FLOAT):
    """Symmetric triangular window, scipy.signal.windows.triang semantics
    (reference: windows.ex:98-127): odd n -> peaks at 1, even n -> plateau."""
    half = (n + 1) // 2
    idx = jnp.arange(1, half + 1, dtype=dtype)
    if n % 2 == 1:
        left = idx * 2.0 / (n + 1)
        return jnp.concatenate([left, left[::-1][1:]]).astype(dtype)
    left = (2.0 * idx - 1.0) / n
    return jnp.concatenate([left, left[::-1]]).astype(dtype)


def _cosine_window(n: int, coefs, periodic: bool, dtype):
    """General cosine-sum window: sum_k (-1)^k a_k cos(2 pi k i / (L-1))."""
    if n == 1:
        return jnp.ones((1,), dtype=dtype)  # scipy convention for M=1
    length = n + 1 if periodic else n
    if length == 1:
        w = jnp.ones((1,), dtype=dtype)
    else:
        cdt = dtype if jnp.issubdtype(dtype, jnp.floating) else jnp.float32
        i = jnp.arange(length, dtype=cdt)
        theta = 2.0 * math.pi * i / (length - 1)
        w = jnp.zeros((length,), dtype=cdt)
        for k, a in enumerate(coefs):
            sign = 1.0 if k % 2 == 0 else -1.0
            w = w + sign * a * jnp.cos(k * theta)
    w = w.astype(dtype)
    return w[:n] if periodic else w


def blackman(n: int, *, periodic: bool = True, dtype=DEFAULT_FLOAT):
    """Blackman window 0.42 - 0.5 cos + 0.08 cos(2·) (reference:
    windows.ex:160-199)."""
    return _cosine_window(n, (0.42, 0.5, 0.08), periodic, dtype)


def hamming(n: int, *, periodic: bool = True, dtype=DEFAULT_FLOAT):
    """Hamming window 0.54 - 0.46 cos (reference: windows.ex:225-252)."""
    return _cosine_window(n, (0.54, 0.46), periodic, dtype)


def hann(n: int, *, periodic: bool = True, dtype=DEFAULT_FLOAT):
    """Hann window 0.5 (1 - cos) (reference: windows.ex:278-305)."""
    return _cosine_window(n, (0.5, 0.5), periodic, dtype)


def kaiser(n: int, *, beta: float = 12.0, periodic: bool = True, eps: float = 0.0,
           dtype=DEFAULT_FLOAT):
    """Kaiser window I0(beta sqrt(1 - r^2)) / I0(beta) over r in [-1, 1]
    (reference: windows.ex:341-369).

    Uses the exact Bessel I0 (jax.scipy.special.i0) rather than the
    reference's polynomial/asymptotic approximation (windows.ex:371-386),
    giving scipy-grade accuracy. `eps` floors the sqrt argument for exact
    reference parity (its default there is 1e-7); default 0 matches scipy.
    """
    if n == 1:
        return jnp.ones((1,), dtype=dtype)  # scipy convention for M=1
    length = n + 1 if periodic else n
    if length == 1:
        w = jnp.ones((1,), dtype=dtype)
    else:
        ratio = jnp.linspace(-1.0, 1.0, length, dtype=jnp.float32)
        sqrt_arg = jnp.maximum(1.0 - ratio * ratio, eps)
        w = (_bessel_i0(beta * jnp.sqrt(sqrt_arg)) / _bessel_i0(jnp.float32(beta))).astype(dtype)
    return w[:n] if periodic else w


_WINDOW_BUILDERS = {
    "rectangular": lambda n, periodic, dtype: rectangular(n, dtype=dtype),
    "bartlett": lambda n, periodic, dtype: bartlett(n, dtype=dtype),
    "triangular": lambda n, periodic, dtype: triangular(n, dtype=dtype),
    "blackman": lambda n, periodic, dtype: blackman(n, periodic=periodic, dtype=dtype),
    "hamming": lambda n, periodic, dtype: hamming(n, periodic=periodic, dtype=dtype),
    "hann": lambda n, periodic, dtype: hann(n, periodic=periodic, dtype=dtype),
}


def get_window(window, n: int, *, periodic: bool = False, dtype=DEFAULT_FLOAT):
    """Build a window from a spec: a name string, or ('kaiser', beta).

    The firwin dispatch analog (reference: lib/nx_signal/filters.ex:254-279);
    defaults to symmetric windows as filter design requires.
    """
    if isinstance(window, (tuple, list)):
        name, *params = window
        if name == "kaiser":
            (beta,) = params
            return kaiser(n, beta=beta, periodic=periodic, dtype=dtype)
        raise ValueError(
            f"unknown window {window!r}, supported: 'hamming', 'hann', 'blackman', "
            "'bartlett', 'triangular', 'rectangular', ('kaiser', beta)"
        )
    if window not in _WINDOW_BUILDERS:
        raise ValueError(
            f"unknown window {window!r}, supported: 'hamming', 'hann', 'blackman', "
            "'bartlett', 'triangular', 'rectangular', ('kaiser', beta)"
        )
    if window == "rectangular":
        return rectangular(n, dtype=dtype) if jnp.issubdtype(dtype, jnp.integer) \
            else jnp.ones((n,), dtype=dtype)
    return _WINDOW_BUILDERS[window](n, periodic, dtype)
