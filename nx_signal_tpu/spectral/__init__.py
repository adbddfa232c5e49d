from nx_signal_tpu.spectral.estimation import coherence, csd, periodogram, welch
from nx_signal_tpu.spectral.framing import as_windowed, overlap_and_add
from nx_signal_tpu.spectral.mel import mel_filters, stft_to_mel
from nx_signal_tpu.spectral.spectrogram import spectrogram
from nx_signal_tpu.spectral.stft import STFTResult, fft_frequencies, istft, stft

__all__ = [
    "as_windowed",
    "overlap_and_add",
    "mel_filters",
    "spectrogram",
    "stft_to_mel",
    "STFTResult",
    "fft_frequencies",
    "istft",
    "stft",
    "periodogram",
    "welch",
    "csd",
    "coherence",
]
