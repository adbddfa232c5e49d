from nx_signal_tpu.io.checkpoint import load_state, save_state
from nx_signal_tpu.io.wav import RingBuffer, WavReader, read_wav, stream_wav, write_wav

__all__ = ["RingBuffer", "WavReader", "load_state", "read_wav", "save_state",
           "stream_wav", "write_wav"]
