"""Chirp-Z transform and zoom FFT — scipy.signal.czt / zoom_fft semantics.

New relative to the reference (nx_signal stops at plain FFT; SURVEY.md
§2.4). TPU-first design: two dispatch paths, mirroring kernels/dft.py —

- small n*m: the transform IS a matmul, X = (x * a^-n) @ W with
  W[n, k] = w^(nk); one MXU pass, no FFT at all (the same regime where the
  framed-DFT matmul beats XLA's FFT ~3x).
- large n*m: Bluestein's algorithm — the quadratic-phase factorization
  nk = (n^2 + k^2 - (k-n)^2)/2 turns the transform into one linear
  convolution, evaluated with power-of-two FFTs (utils/shapes.py
  fft_fast_length; XLA's TPU FFT lowers non-pow-2 lengths to dense O(N^2)
  matmuls, so the pad is load-bearing).

Chirp phase tables are built host-side in f64 when the transform
parameters are concrete (the usual case — w and a are design-time
scalars), so the n^2/2 phases keep full accuracy before casting to the
device dtype.
"""

import math

import numpy as np

import jax.numpy as jnp

from nx_signal_tpu.utils.dtypes import DEFAULT_FLOAT
from nx_signal_tpu.utils.shapes import fft_fast_length

__all__ = ["czt", "zoom_fft"]

_MAX_MATMUL_NM = 1 << 21  # n*m above this -> Bluestein (empirical MXU regime)

_CDTYPE = np.complex64 if DEFAULT_FLOAT == jnp.float32 else np.complex128


def _as_scalar_complex(v):
    return complex(np.asarray(v).reshape(()))


def _chirp_powers(base, exponents):
    """base**exponents with f64 phase accuracy: base = r e^{i t} ->
    r**e * exp(i t e), all in numpy f64."""
    base = _as_scalar_complex(base)
    exponents = np.asarray(exponents, dtype=np.float64)
    r = abs(base)
    t = math.atan2(base.imag, base.real)
    mag = np.exp(exponents * math.log(r)) if r != 1.0 else 1.0
    return (mag * np.exp(1j * t * exponents)).astype(np.complex128)


def czt(x, m: int = None, w=None, a=1.0 + 0.0j, *, axis: int = -1):
    """Chirp-Z transform: X[k] = sum_n x[n] z_k^{-n} along the spiral
    z_k = a * w^{-k}, k = 0..m-1 — scipy.signal.czt semantics (defaults
    m = len(x), w = exp(-2j*pi/m), a = 1: the plain DFT).

    Requires concrete (non-traced) `w`/`a` — they parameterize the
    transform and become compile-time weight tables, the deftransform/
    defn split of the reference (SURVEY.md §1 L1).

    Accuracy note: for |w| != 1 (decaying spirals) Bluestein's chirps span
    e^{±|log w| n^2/2} and cancel catastrophically — scipy's czt loses all
    digits by n ~ 100 at |w| = e^{-0.01}. The matmul path has no such
    blowup (|w^{nk}| <= spread of the answer itself), so this
    implementation is strictly more accurate in the matmul regime; tests
    gate against the direct-definition f64 oracle there, and against scipy
    on the unit circle.
    """
    x = jnp.asarray(x)
    n = x.shape[axis]
    if n == 0:
        raise ValueError("input must be nonempty along the transform axis")
    if m is None:
        m = n
    if m <= 0:
        raise ValueError(f"m must be positive, got {m}")
    if w is None:
        w = np.exp(-2j * np.pi / m)
    w = _as_scalar_complex(w)
    a = _as_scalar_complex(a)

    xm = jnp.moveaxis(x, axis, -1)
    n_idx = np.arange(n, dtype=np.float64)
    a_chirp = _chirp_powers(a, -n_idx)  # a^{-n}

    if n * m <= _MAX_MATMUL_NM:
        # MXU path: one (.., n) @ (n, m) complex matmul
        nk = n_idx[:, None] * np.arange(m, dtype=np.float64)[None, :]
        weights = jnp.asarray(
            (a_chirp[:, None] * _chirp_powers(w, nk)).astype(_CDTYPE)
        )
        out = jnp.matmul(xm.astype(weights.dtype), weights, precision="highest")
        return jnp.moveaxis(out, -1, axis)

    # Bluestein: nk = (n^2 + k^2 - (k-n)^2) / 2
    k_idx = np.arange(m, dtype=np.float64)
    wn2 = _chirp_powers(w, n_idx * n_idx / 2.0)      # w^{n^2/2}
    wk2 = _chirp_powers(w, k_idx * k_idx / 2.0)      # w^{k^2/2}
    length = fft_fast_length(n + m - 1)
    # v[j] = w^{-j^2/2} for j in -(n-1)..(m-1), circularly embedded
    v = np.zeros(length, dtype=np.complex128)
    v[:m] = _chirp_powers(w, -(k_idx * k_idx) / 2.0)
    if n > 1:
        j = np.arange(1, n, dtype=np.float64)
        v[length - n + 1 :] = _chirp_powers(w, -(j * j) / 2.0)[::-1]
    v_f = np.fft.fft(v)  # host-side f64: v is a concrete chirp table
    u = xm.astype(_CDTYPE) * jnp.asarray((a_chirp * wn2).astype(_CDTYPE))
    conv = jnp.fft.ifft(
        jnp.fft.fft(u, n=length, axis=-1) * jnp.asarray(v_f.astype(_CDTYPE)),
        axis=-1,
    )
    out = conv[..., :m] * jnp.asarray(wk2.astype(_CDTYPE))
    return jnp.moveaxis(out, -1, axis)


def zoom_fft(x, fn, m: int = None, *, fs: float = 2.0, endpoint: bool = False,
             axis: int = -1):
    """DFT of `x` evaluated only over the band `fn` = [f1, f2] (or [0, fn]
    for scalar fn) at `m` points — scipy.signal.zoom_fft semantics: a czt
    along the unit circle, equivalent to zero-padding the FFT to the matching
    resolution and slicing, without ever computing the full spectrum."""
    fn = np.atleast_1d(np.asarray(fn, dtype=np.float64))
    if fn.size == 2:
        f1, f2 = float(fn[0]), float(fn[1])
    elif fn.size == 1:
        f1, f2 = 0.0, float(fn[0])
    else:
        raise ValueError("fn must be a scalar or a pair [f1, f2]")
    if not 0 <= f1 <= f2 <= fs / 2:
        raise ValueError(f"fn must satisfy 0 <= f1 <= f2 <= fs/2, got {fn}")
    x = jnp.asarray(x)
    if m is None:
        m = x.shape[axis]
    denom = (m - 1) if endpoint else m
    w = np.exp(-2j * np.pi * (f2 - f1) / (denom * fs))
    a = np.exp(2j * np.pi * f1 / fs)
    return czt(x, m, w, a, axis=axis)
