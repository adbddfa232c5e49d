from nx_signal_tpu.io.wav import RingBuffer, WavReader, read_wav, stream_wav, write_wav

__all__ = ["RingBuffer", "WavReader", "read_wav", "stream_wav", "write_wav"]
