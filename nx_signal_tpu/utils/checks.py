"""Numerical-health checks (SURVEY.md §5: jax.debug/checkify-style NaN/OOB
guards for the pure-graph pipeline)."""

import jax
import jax.numpy as jnp

__all__ = ["assert_all_finite", "count_nonfinite"]


def count_nonfinite(x):
    """Number of NaN/Inf elements (traced; usable under jit).

    Examples:

    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.utils.checks import count_nonfinite
    >>> int(count_nonfinite(jnp.asarray([1.0, np.inf, np.nan])))
    2
    """
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        bad = ~(jnp.isfinite(jnp.real(x)) & jnp.isfinite(jnp.imag(x)))
    elif jnp.issubdtype(x.dtype, jnp.floating):
        bad = ~jnp.isfinite(x)
    else:
        return jnp.zeros((), jnp.int32)
    return jnp.sum(bad).astype(jnp.int32)


def assert_all_finite(x, name: str = "tensor"):
    """Debug-callback assertion that `x` contains no NaN/Inf; raises
    FloatingPointError host-side (works under jit via jax.debug.callback).
    Zero cost when not called — insert at pipeline seams while debugging.

    Examples:

    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.utils.checks import assert_all_finite
    >>> y = assert_all_finite(jnp.asarray([1.0, 2.0]), "spectrum")
    >>> bool((y == jnp.asarray([1.0, 2.0])).all())   # passthrough when finite
    True
    """
    bad = count_nonfinite(x)

    def _raise(n):
        if int(n) > 0:
            raise FloatingPointError(f"{name} contains {int(n)} non-finite values")

    jax.debug.callback(_raise, bad)
    return x
