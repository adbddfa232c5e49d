"""Public-function registry: the reference's `@doc type:` taxonomy.

The reference tags every public function with a category from a fixed
taxonomy and enforces it with a meta-test
(reference: test/support/nx_signal_case.ex:19-39). This module is the same
contract for the TPU framework: every public op is registered under one
category, and tests/test_registry.py asserts the registry and the package
exports stay in sync. The original taxonomy [:time_frequency, :windowing,
:filters, :waveforms, :peak_finding] is extended with the categories this
framework adds (convolution was untyped in the reference; resampling,
parallel, streaming, and io are greenfield).
"""

TAXONOMY = frozenset({
    "time_frequency",
    "windowing",
    "filters",
    "waveforms",
    "peak_finding",
    "convolution",
    "transforms",
    "special",
    "resampling",
    "parallel",
    "streaming",
    "io",
})

# module path (under nx_signal_tpu) -> {function name -> category}
FUNCTION_TYPES = {
    "spectral.stft": {
        "stft": "time_frequency",
        "istft": "time_frequency",
        "fft_frequencies": "time_frequency",
    },
    "spectral.spectrogram": {
        "spectrogram": "time_frequency",
    },
    "spectral.estimation": {
        "periodogram": "time_frequency",
        "welch": "time_frequency",
        "csd": "time_frequency",
        "coherence": "time_frequency",
        "lombscargle": "time_frequency",
        "vectorstrength": "time_frequency",
    },
    "spectral.mel": {
        "mel_filters": "time_frequency",
        "stft_to_mel": "time_frequency",
    },
    "spectral.framing": {
        "as_windowed": "windowing",
        "overlap_and_add": "windowing",
        "pad_for_windowing": "windowing",
    },
    "ops.windows": {
        "rectangular": "windowing",
        "bartlett": "windowing",
        "triangular": "windowing",
        "blackman": "windowing",
        "hamming": "windowing",
        "hann": "windowing",
        "kaiser": "windowing",
        "general_cosine": "windowing",
        "general_hamming": "windowing",
        "blackmanharris": "windowing",
        "nuttall": "windowing",
        "flattop": "windowing",
        "bohman": "windowing",
        "cosine": "windowing",
        "barthann": "windowing",
        "parzen": "windowing",
        "lanczos": "windowing",
        "gaussian": "windowing",
        "general_gaussian": "windowing",
        "tukey": "windowing",
        "exponential": "windowing",
        "taylor": "windowing",
        "chebwin": "windowing",
        "dpss": "windowing",
        "get_window": "windowing",
    },
    "ops.waveforms": {
        "sawtooth": "waveforms",
        "square": "waveforms",
        "gaussian_pulse": "waveforms",
        "chirp": "waveforms",
        "polynomial_sweep": "waveforms",
        "unit_impulse": "waveforms",
        "sinc": "waveforms",
    },
    "ops.convolution": {
        "convolve": "convolution",
        "correlate": "convolution",
        "fftconvolve": "convolution",
        "oaconvolve": "convolution",
        "fir_convolve_1d": "convolution",
        "convolve2d": "convolution",
        "correlate2d": "convolution",
    },
    "ops.transforms": {
        "fft_nd": "transforms",
        "ifft_nd": "transforms",
        "rfft_nd": "transforms",
        "irfft_nd": "transforms",
        "hilbert": "transforms",
    },
    "ops.filters": {
        "median": "filters",
        "wiener": "filters",
        "firwin": "filters",
        "freqz": "filters",
        "sosfreqz": "filters",
        "group_delay": "filters",
        "detrend": "filters",
        "savgol_coeffs": "filters",
        "savgol_filter": "filters",
    },
    "ops.fir_design": {
        "kaiser_beta": "filters",
        "kaiser_atten": "filters",
        "kaiserord": "filters",
        "firwin2": "filters",
        "firls": "filters",
        "remez": "filters",
        "minimum_phase": "filters",
    },
    "ops.czt": {
        "czt": "transforms",
        "zoom_fft": "transforms",
    },
    "ops.iir": {
        "lfilter": "filters",
        "lfilter_zi": "filters",
        "filtfilt": "filters",
        "sosfilt": "filters",
        "sosfilt_zi": "filters",
        "sosfiltfilt": "filters",
    },
    "ops.iir_design": {
        "butter": "filters",
        "cheby1": "filters",
        "cheby2": "filters",
        "ellip": "filters",
        "bessel": "filters",
        "iirfilter": "filters",
        "iirnotch": "filters",
        "iirpeak": "filters",
        "iircomb": "filters",
        "iirdesign": "filters",
        "buttord": "filters",
        "cheb1ord": "filters",
        "cheb2ord": "filters",
        "ellipord": "filters",
        "buttap": "filters",
        "cheb1ap": "filters",
        "cheb2ap": "filters",
        "ellipap": "filters",
        "besselap": "filters",
        "lp2lp_zpk": "filters",
        "lp2hp_zpk": "filters",
        "lp2bp_zpk": "filters",
        "lp2bs_zpk": "filters",
        "bilinear_zpk": "filters",
        "zpk2tf": "filters",
        "tf2zpk": "filters",
        "zpk2sos": "filters",
        "tf2sos": "filters",
        "sos2tf": "filters",
    },
    "ops.peak_finding": {
        "argrelmin": "peak_finding",
        "argrelmax": "peak_finding",
        "argrelextrema": "peak_finding",
    },
    "ops.find_peaks": {
        "find_peaks": "peak_finding",
        "peak_prominences": "peak_finding",
        "peak_widths": "peak_finding",
        "Peaks": "peak_finding",
    },
    "ops.lambert_w": {
        "lambert_w": "special",
    },
    "ops.resample": {
        "upfirdn": "resampling",
        "resample_poly": "resampling",
        "pfb_analyze": "resampling",
        "resample": "resampling",
        "decimate": "resampling",
    },
    "ops.mixing": {
        "mix_down": "resampling",
        "demodulate_channel": "resampling",
    },
    "kernels.dft": {
        "framed_dft": "time_frequency",
        "framed_idft": "time_frequency",
        "fir_framed_dft": "time_frequency",
        "blocked_frame_matmul": "time_frequency",
        "toeplitz_band": "convolution",
        "good_matmul_fft_length": "time_frequency",
    },
    "kernels.pallas_dft": {
        "framed_dft_pallas": "time_frequency",
        "pallas_dft_supported": "time_frequency",
    },
    "parallel.multihost": {
        "initialize": "parallel",
        "make_pod_mesh": "parallel",
        "process_block_range": "parallel",
    },
    "parallel.mesh": {
        "make_dsp_mesh": "parallel",
        "channel_block_sharding": "parallel",
    },
    "parallel.sharded": {
        "sharded_convolve_same": "parallel",
        "sharded_oaconvolve_same": "parallel",
        "sharded_stft": "parallel",
        "sharded_istft": "parallel",
        "sharded_pfb_analyze": "parallel",
        "sharded_sosfilt": "parallel",
        "sharded_upfirdn": "parallel",
        "sharded_resample_poly": "parallel",
    },
    "parallel.estimation": {
        "sharded_csd": "parallel",
        "sharded_welch": "parallel",
        "sharded_coherence": "parallel",
    },
    "parallel.streaming": {
        "StreamingFIR": "streaming",
        "StreamingSTFT": "streaming",
        "StreamingISTFT": "streaming",
        "StreamingIIR": "streaming",
    },
    "utils.checks": {
        "assert_all_finite": "special",
        "count_nonfinite": "special",
    },
    "io.wav": {
        "read_wav": "io",
        "write_wav": "io",
        "stream_wav": "io",
        "WavReader": "io",
        "RingBuffer": "io",
    },
    "io.checkpoint": {
        "save_state": "io",
        "load_state": "io",
    },
}


def function_type(module: str, name: str):
    """Category for a registered public function, or None."""
    return FUNCTION_TYPES.get(module, {}).get(name)
