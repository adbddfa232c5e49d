"""Stateful block-streaming DSP for unbounded streams.

The reference is stateless/batch-only; streaming is a greenfield component
(SURVEY.md §5: "carry overlap-save filter state (last K-1 samples) as
explicit carry"). Every processor here is a pure (state, chunk) -> (state,
out) function pair, so it composes with jax.lax.scan for compiled multi-
chunk runs and serializes trivially (the state is a pytree of arrays) for
checkpoint/resume of long streaming jobs.

Chunk lengths are static per jit-compilation (XLA static shapes); use a
fixed chunk size and pad the final chunk.
"""

from dataclasses import dataclass

import jax.numpy as jnp

from nx_signal_tpu.ops.convolution import fir_convolve_1d, _float_cast
from nx_signal_tpu.spectral.framing import _ola_fold, as_windowed
from nx_signal_tpu.utils.dtypes import DEFAULT_FLOAT

__all__ = ["StreamingFIR", "StreamingSTFT", "StreamingISTFT", "StreamingIIR"]


@dataclass(frozen=True)
class StreamingFIR:
    """Causal overlap-save FIR: chunk outputs equal
    convolve(stream, taps, mode='full')[:len(stream)] — the filter's group
    delay is NOT compensated (that needs future samples). The carry is the
    last K-1 input samples.

    Examples:

    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.parallel.streaming import StreamingFIR
    >>> fir = StreamingFIR(jnp.asarray([0.5, 0.5]))
    >>> state = fir.init_state()
    >>> state, y1 = fir.process(state, jnp.asarray([1.0, 2.0, 3.0, 4.0]))
    >>> state, y2 = fir.process(state, jnp.asarray([5.0, 6.0, 7.0, 8.0]))
    >>> np.round(np.concatenate([y1, y2]), 2)   # == full conv of the stream
    array([0.5, 1.5, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5], dtype=float32)
    """

    taps: jnp.ndarray

    def init_state(self, batch_shape=(), dtype=DEFAULT_FLOAT):
        k = jnp.asarray(self.taps).shape[-1]
        return jnp.zeros((*batch_shape, k - 1), dtype=dtype)

    def process(self, state, chunk):
        chunk = _float_cast(jnp.asarray(chunk))
        taps = _float_cast(jnp.asarray(self.taps))
        k = taps.shape[-1]
        ext = jnp.concatenate([state.astype(chunk.dtype), chunk], axis=-1)
        out = fir_convolve_1d(ext, taps, "valid")
        new_state = ext[..., -(k - 1) :] if k > 1 else state
        return new_state, out


@dataclass(frozen=True)
class StreamingSTFT:
    """Streaming frame extraction + windowed FFT. The carry holds the
    samples not yet consumed by a full frame (the frame_length - hop
    overlap context), initialized to zeros — so the stream behaves like the
    batch signal PREPENDED with frame_length - hop zeros: streaming frame i
    starts at stream sample i*hop - (frame_length - hop), and concatenating
    the per-chunk spectra equals
    stft(concat([zeros(frame_length - hop), stream]), padding='valid').
    Account for that fixed lead-in when aligning frame timestamps.

    Examples:

    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.ops.windows import hann
    >>> from nx_signal_tpu.parallel.streaming import StreamingSTFT
    >>> sstft = StreamingSTFT(hann(8), hop=4, onesided=True)
    >>> state = sstft.init_state()
    >>> state, z1 = sstft.process(state, jnp.ones(8))
    >>> state, z2 = sstft.process(state, jnp.ones(8))
    >>> z1.shape, z2.shape   # 2 frames per 8-sample chunk at hop 4
    ((2, 5), (2, 5))
    """

    window: jnp.ndarray
    hop: int
    fft_length: int = None
    onesided: bool = False

    @property
    def frame_length(self):
        return jnp.asarray(self.window).shape[-1]

    def init_state(self, batch_shape=(), dtype=DEFAULT_FLOAT):
        return jnp.zeros((*batch_shape, self.frame_length - self.hop), dtype=dtype)

    def process(self, state, chunk):
        window = jnp.asarray(self.window)
        frame_length = window.shape[-1]
        if chunk.shape[-1] % self.hop != 0:
            raise ValueError(
                f"chunk length ({chunk.shape[-1]}) must be a multiple of the "
                f"hop ({self.hop}) so frame counts stay static"
            )
        ext = jnp.concatenate([state.astype(chunk.dtype), chunk], axis=-1)
        frames = as_windowed(ext, window_length=frame_length, stride=self.hop)
        n_fft = self.fft_length or frame_length
        fft = jnp.fft.rfft if self.onesided else jnp.fft.fft
        z = fft(frames * window, n=n_fft, axis=-1)
        consumed = frames.shape[-2] * self.hop
        return ext[..., consumed:], z


@dataclass(frozen=True)
class StreamingISTFT:
    """Streaming inverse STFT via the deterministic overlap-add fold. The
    carry is the overlap tail (the last frame_length - hop output samples,
    still accumulating). Emitted samples are normalized by the periodic NOLA
    window envelope, so the concatenated output equals the batch `istft`
    everywhere except the first and last half-window of the whole stream
    (which the batch version also reconstructs imperfectly).

    Examples:

    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.ops.windows import hann
    >>> from nx_signal_tpu.parallel.streaming import StreamingISTFT
    >>> sistft = StreamingISTFT(hann(8), hop=4)
    >>> state = sistft.init_state()
    >>> z = jnp.asarray(np.fft.fft(np.ones((2, 8))), jnp.complex64)
    >>> state, y = sistft.process(state, z)
    >>> y.shape   # hop * frames emitted, overlap tail carried
    (8,)
    """

    window: jnp.ndarray
    hop: int
    scaling: str = None
    sampling_rate: float = 1000.0

    def init_state(self, batch_shape=(), dtype=jnp.complex64):
        frame_length = jnp.asarray(self.window).shape[-1]
        return jnp.zeros((*batch_shape, frame_length - self.hop), dtype=dtype)

    def _envelope(self, frame_length):
        """Periodic interior NOLA envelope: env[s] = sum_j w^2[s + j*hop],
        one hop period."""
        w2 = jnp.abs(jnp.asarray(self.window)).astype(DEFAULT_FLOAT) ** 2
        pad = (-frame_length) % self.hop
        w2 = jnp.pad(w2, (0, pad))
        env = w2.reshape(-1, self.hop).sum(axis=0)
        return jnp.where(env > 1e-10, env, jnp.ones((), env.dtype))

    def process(self, state, z_chunk):
        from nx_signal_tpu.spectral.stft import _apply_scaling

        window = jnp.asarray(self.window)
        frame_length = window.shape[-1]
        overlap = frame_length - self.hop
        if z_chunk.shape[-1] != frame_length:
            raise ValueError(
                f"StreamingISTFT requires fft_length == window length "
                f"({frame_length}); got spectra with {z_chunk.shape[-1]} bins "
                "— decimating or cropping bins would silently corrupt the "
                "reconstruction"
            )
        frames = jnp.fft.ifft(z_chunk, n=frame_length, axis=-1)
        frames = _apply_scaling(frames, window, self.scaling, self.sampling_rate,
                                inverse=True)
        frames = frames * window
        m = frames.shape[-2]
        local_len = m * self.hop + overlap
        init = jnp.pad(
            state.astype(frames.dtype),
            [(0, 0)] * (frames.ndim - 2) + [(0, local_len - overlap)],
        )
        acc = _ola_fold(frames, self.hop, local_len, init=init)
        emitted = acc[..., : m * self.hop]
        env = self._envelope(frame_length)
        reps = -(-m * self.hop // self.hop)
        env_full = jnp.tile(env, reps)[: m * self.hop]
        return acc[..., m * self.hop :], emitted / env_full


@dataclass(frozen=True)
class StreamingIIR:
    """Causal IIR filtering of an unbounded stream as cascaded second-order
    sections: chunk outputs equal sosfilt over the concatenated stream (the
    DF2T state is an exact stream summary; the chunked parallel scan
    associates sums differently, so equality is to f.p. accuracy rather
    than bitwise). The carry is the
    (n_sections, ..., 2) sosfilt state pytree — serializable for
    checkpoint/resume like every processor here.

    Within each chunk the biquads run as log-depth parallel scans
    (ops/iir.py); the sequential dependency is only chunk-to-chunk.
    
    Examples:

    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> from nx_signal_tpu.parallel.streaming import StreamingIIR
    >>> sos = jnp.asarray([[0.2, 0.2, 0.0, 1.0, -0.6, 0.0]], jnp.float32)
    >>> siir = StreamingIIR(sos)
    >>> state = siir.init_state()
    >>> state, o1 = siir.process(state, jnp.ones(4))
    >>> np.round(np.asarray(o1), 3)   # == sosfilt over the whole stream
    array([0.2  , 0.52 , 0.712, 0.827], dtype=float32)
    """

    sos: jnp.ndarray

    def init_state(self, batch_shape=(), dtype=DEFAULT_FLOAT):
        n_sections = jnp.asarray(self.sos).shape[0]
        return jnp.zeros((n_sections, *batch_shape, 2), dtype=dtype)

    def process(self, state, chunk):
        from nx_signal_tpu.ops.iir import _lfilter_last_axis

        chunk = _float_cast(jnp.asarray(chunk))
        sos = jnp.asarray(self.sos)
        out = chunk
        new_states = []
        for s in range(sos.shape[0]):
            out, zf = _lfilter_last_axis(
                sos[s, :3], sos[s, 3:], out, state[s].astype(chunk.dtype)
            )
            new_states.append(zf)
        return jnp.stack(new_states, axis=0), out
