"""Lambert W function on an arbitrary branch, vectorized.

Reference semantics: lib/nx_signal/internal.ex (scipy.special.lambertw
parity): promote to complex, pick an initial guess per region (branch-point
series near -1/e, Pade approximant near 0 on branch 0, asymptotic
log z + 2 pi i k - log log z otherwise), then iterate Halley's method with
two numerically-stable update variants selected by sign(Re w), relative
tolerance early exit, <= 100 iterations.

This is host/CPU-side special-function math (complex128 when x64 is enabled
— the scipy-parity configuration; complex64 otherwise). It exists to support
filter-design helpers (e.g. Kaiser-order estimation); it is not a hot-path
kernel.
"""

import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["lambert_w"]

_OMEGA = 0.56714329040978387299997  # W(1), the Omega constant
_EXPN1 = 0.36787944117144232159553  # 1/e


def _branchpt(z):
    """Series about the branch point z = -1/e: -1 + p - p^2/3,
    p = sqrt(2 (e z + 1))."""
    p = jnp.sqrt(2.0 * (math.e * z + 1.0))
    return -1.0 + p - p * p / 3.0


def _pade0(z):
    """(3, 2)-ish Pade approximant of W about z = 0 (branch 0)."""
    num = z * (1.0 + z * (12.34042553191489361902 + z * 12.85106382978723404255))
    den = 1.0 + z * (14.34042553191489361702 + z * 32.53191489361702127660)
    return num / den


def _asy(z, k):
    """Asymptotic W ~ log z + 2 pi i k - log(log z + 2 pi i k)."""
    w = jnp.log(z) + 2.0j * math.pi * k
    return w - jnp.log(w)


def lambert_w(z, k: int = 0, *, tol: float = 1.0e-8):
    """Lambert W on branch `k` (an int, static), elementwise over `z`.

    Returns complex128 when `jax_enable_x64` is on (matching the reference's
    c128 promotion, internal.ex:10-18, and its atol 1e-13 scipy parity),
    complex64 otherwise.

    Examples:

    W(1) is the omega constant (omega * e^omega = 1):

    >>> import numpy as np
    >>> from nx_signal_tpu.ops.lambert_w import lambert_w
    >>> complex(np.round(complex(lambert_w(1.0)), 8))
    (0.56714326+0j)
    """
    z = jnp.asarray(z)
    cdtype = jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64
    z = z.astype(cdtype)
    rdtype = jnp.zeros((), cdtype).real.dtype

    rz, iz = jnp.real(z), jnp.imag(z)
    absz = jnp.abs(z)

    # --- initial guess per region (reference: internal.ex:47-73) ---
    if k == 0:
        near_branchpt = jnp.abs(z + _EXPN1) < 0.3
        in_pade_box = (
            (-1.0 < rz) & (rz < 1.5) & (jnp.abs(iz) < 1.0)
            & (-2.5 * jnp.abs(iz) - 0.2 < rz)
        )
        w0 = jnp.where(
            near_branchpt, _branchpt(z), jnp.where(in_pade_box, _pade0(z), _asy(z, k))
        )
    elif k == -1:
        on_neg_axis = (absz <= _EXPN1) & (iz == 0.0) & (rz < 0.0)
        # log(-x) is real there; guard the log argument to stay finite.
        safe = jnp.where(on_neg_axis, -rz, jnp.ones_like(rz))
        w0 = jnp.where(on_neg_axis, jnp.log(safe).astype(cdtype), _asy(z, k))
    else:
        w0 = _asy(z, k)

    # --- Halley's method, two stable variants by sign(Re w0) (reference:
    # internal.ex:75-109). Variant is fixed from the initial guess. ---
    pos = jnp.real(w0) >= 0

    def step(state):
        w, done, i = state
        # positive-real variant: work with e^{-w}
        ew_n = jnp.exp(-jnp.where(pos, w, 0.0 * w))
        wewz_p = w - z * ew_n
        wn_p = w - wewz_p / (w + 1.0 - (w + 2.0) * wewz_p / (2.0 * w + 2.0))
        # negative-real variant: work with e^{w}
        ew_p = jnp.exp(jnp.where(pos, 0.0 * w, w))
        wew = w * ew_p
        wewz_n = wew - z
        wn_n = w - wewz_n / (wew + ew_p - (w + 2.0) * wewz_n / (2.0 * w + 2.0))

        wn = jnp.where(pos, wn_p, wn_n)
        newly_done = jnp.abs(wn - w) <= tol * jnp.abs(wn)
        w_next = jnp.where(done, w, wn)
        return w_next, done | newly_done, i + 1

    def cond(state):
        _, done, i = state
        return (i < 100) & ~jnp.all(done)

    done0 = jnp.zeros(z.shape, dtype=bool)
    w, _, _ = lax.while_loop(cond, step, (w0, done0, jnp.int32(0)))

    # --- special cases override the iteration (reference: internal.ex:21-45) ---
    two_pi_ik = jnp.asarray(2.0j * math.pi * k, dtype=cdtype)
    w = jnp.where(jnp.isposinf(rz), z + two_pi_ik, w)
    w = jnp.where(jnp.isneginf(rz), -z + two_pi_ik, w)
    if k == 0:
        w = jnp.where(z == 0, jnp.zeros((), cdtype), w)
        w = jnp.where(z == 1, jnp.asarray(_OMEGA, cdtype), w)
    else:
        w = jnp.where(z == 0, jnp.asarray(-jnp.inf, rdtype).astype(cdtype), w)
    return w
