from nx_signal_tpu.io.checkpoint import load_state, save_state
from nx_signal_tpu.io.wav import (PrefetchingWavReader, RingBuffer, WavReader,
                                  read_wav, stream_wav, write_wav)

__all__ = ["PrefetchingWavReader", "RingBuffer", "WavReader", "load_state",
           "read_wav", "save_state", "stream_wav", "write_wav"]
