"""Frequency translation (mixing) and complex baseband conversion.

Greenfield component for the SDR-style workloads (BASELINE config 4:
"polyphase resample + demod-style mixdown on 64 channels"): mix a band down
to complex baseband, low-pass with firwin, decimate with resample_poly.
Pure elementwise VPU work that XLA fuses into the adjacent FIR.
"""

import math

import jax.numpy as jnp

from nx_signal_tpu.ops.filters import firwin
from nx_signal_tpu.ops.resample import resample_poly
from nx_signal_tpu.utils.dtypes import DEFAULT_FLOAT

__all__ = ["mix_down", "demodulate_channel"]


def mix_down(x, carrier_frequency, sampling_rate, *, phase: float = 0.0):
    """Multiply by exp(-2*pi*i*fc*t): shift the band at `carrier_frequency`
    down to DC (complex baseband). Operates along the last axis; sample
    times are n / sampling_rate.

    Examples:

    Mixing a quarter-rate cosine down by its own carrier leaves DC (0.5)
    plus the -2fc image alternating on top of it:

    >>> import jax.numpy as jnp
    >>> import numpy as np
    >>> from nx_signal_tpu.ops.mixing import mix_down
    >>> y = mix_down(jnp.cos(2 * jnp.pi * 0.25 * jnp.arange(8)), 0.25, 1.0)
    >>> np.round(np.asarray(y), 4)
    array([1.+0.j, 0.+0.j, 1.-0.j, 0.+0.j, 1.-0.j, 0.+0.j, 1.-0.j, 0.+0.j],
          dtype=complex64)
    """
    x = jnp.asarray(x)
    n = jnp.arange(x.shape[-1], dtype=DEFAULT_FLOAT)
    lo_phase = -2.0 * math.pi * (carrier_frequency / sampling_rate) * n - phase
    lo = jnp.exp(1j * lo_phase.astype(DEFAULT_FLOAT))
    return x * lo


def demodulate_channel(x, carrier_frequency, sampling_rate, *, bandwidth,
                       decimation: int, num_taps: int = 129):
    """Classic digital down-converter: mix to baseband, FIR low-pass at
    `bandwidth`/2, decimate by `decimation` (polyphase). Returns the complex
    baseband stream at sampling_rate / decimation.

    Examples:

    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.ops.mixing import demodulate_channel
    >>> fs = 8000.0
    >>> t = np.arange(4096) / fs
    >>> x = jnp.asarray(np.cos(2 * np.pi * 1000 * t), jnp.float32)
    >>> base = demodulate_channel(x, 1000.0, fs, bandwidth=200.0, decimation=4)
    >>> base.shape, base.dtype    # complex baseband at fs/4
    ((1024,), dtype('complex64'))
    >>> round(float(jnp.abs(base[200:-200]).mean()), 2)  # tone -> DC, |.|=1/2
    0.5
    """
    if decimation < 1:
        raise ValueError(f"decimation must be >= 1, got: {decimation}")
    baseband = mix_down(x, carrier_frequency, sampling_rate)
    taps = firwin(num_taps, [bandwidth / 2.0], sampling_rate=sampling_rate)
    return resample_poly(baseband, 1, decimation, taps=taps)
