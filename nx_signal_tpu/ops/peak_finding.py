"""Relative-extrema peak finding.

Reference semantics: lib/nx_signal/peak_finding.ex. Results use the
JIT-friendly fixed-shape encoding: an (n, rank) index tensor padded with -1
plus a valid count — dynamic-size results with static shapes (reference:
peak_finding.ex:340-391), which is exactly the right idiom under jit.
"""

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["argrelmin", "argrelmax", "argrelextrema", "Extrema"]


class Extrema(NamedTuple):
    """indices: (n, rank) int32, -1-padded after the first `valid_indices`
    rows (rows appear in row-major scan order)."""

    indices: jnp.ndarray
    valid_indices: jnp.ndarray


def argrelmin(data, *, axis: int = 0, order: int = 1):
    """Relative minima along `axis` with neighborhood `order` (reference:
    peak_finding.ex:131-134).

    Examples:

    >>> import jax.numpy as jnp
    >>> import numpy as np
    >>> from nx_signal_tpu.ops.peak_finding import argrelmin
    >>> idx, count = argrelmin(jnp.asarray([3.0, 1.0, 4.0, 0.0, 5.0]))
    >>> np.asarray(idx).ravel()[:2], int(count)
    (array([1, 3], dtype=int32), 2)
    """
    return argrelextrema(data, jnp.less, axis=axis, order=order)


def argrelmax(data, *, axis: int = 0, order: int = 1):
    """Relative maxima along `axis` with neighborhood `order` (reference:
    peak_finding.ex:252-255).

    Examples:

    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.ops.peak_finding import argrelmax
    >>> r = argrelmax(jnp.asarray([1.0, 3.0, 2.0, 5.0, 2.0, 0.0]))
    >>> r.indices
    Array([[ 1],
           [ 3],
           [-1],
           [-1],
           [-1],
           [-1]], dtype=int32)
    >>> r.valid_indices
    Array(2, dtype=uint32)
    """
    return argrelextrema(data, jnp.greater, axis=axis, order=order)


def argrelextrema(data, comparator, *, axis: int = 0, order: int = 1):
    """Comparator-based relative extrema: element at i is kept iff
    comparator(x[i], x[i ± s]) holds for every shift s in 1..order, with
    edge-clamped neighbor indices (reference: peak_finding.ex:348-368).
    
    Examples:

    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.ops.peak_finding import argrelextrema
    >>> a = jnp.asarray([1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 0.0])
    >>> ext = argrelextrema(a, jnp.greater)
    >>> ext.indices[:4, 0], ext.valid_indices   # -1 pads the fixed shape
    (Array([ 1,  3,  5, -1], dtype=int32), Array(3, dtype=uint32))
    """
    data = jnp.asarray(data)
    mask = _boolrelextrema(data, comparator, axis, order)
    return _nonzero(mask)


def _boolrelextrema(data, comparator, axis, order):
    length = data.shape[axis]
    locs = jnp.arange(length)
    results = jnp.ones(data.shape, dtype=bool)
    # order is static and small; the reference's while-loop early-halt is an
    # interpreter optimization — the AND-fold result is identical.
    for shift in range(1, order + 1):
        plus = jnp.take(data, jnp.clip(locs + shift, 0, length - 1), axis=axis)
        minus = jnp.take(data, jnp.clip(locs - shift, 0, length - 1), axis=axis)
        results = results & comparator(data, plus) & comparator(data, minus)
    return results


def _nonzero(mask):
    """Boolean mask -> fixed-shape Extrema: per-axis index rows, invalid rows
    as -1, valid rows moved to the front by a stable sort on the flat mask
    (reference: peak_finding.ex:370-391)."""
    rank = mask.ndim
    flat = mask.reshape(-1)
    n = flat.shape[0]
    grids = jnp.indices(mask.shape, dtype=jnp.int32)  # (rank, *shape)
    indices = grids.reshape(rank, n).T
    masked = jnp.where(flat[:, None], indices, jnp.int32(-1))
    order = jnp.argsort((~flat).astype(jnp.int32), stable=True)
    return Extrema(
        indices=jnp.take(masked, order, axis=0),
        valid_indices=jnp.sum(flat).astype(jnp.uint32),
    )
