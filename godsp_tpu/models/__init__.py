"""End-to-end pipelines ("model families") built on the framework stack.

  stft     — short-time Fourier transform / inverse / spectrogram
  griffin  — Griffin-Lim phase reconstruction (fast GLA momentum)
  filter   — linear convolution / FIR filtering (overlap-save)
  iir      — IIR filtering as a blocked parallel scan (lfilter/sosfilt/filtfilt)
  design   — IIR filter design (butter/cheby1/cheby2/bessel) + freqz analysis
  mel      — mel filterbank / log-mel spectrogram / MFCC front end
  resample — Fourier-method resampling (scipy.signal.resample)
  pipeline — WAV stream -> distributed streaming Welch PSD (flagship)

The reference library has no pipeline layer — composition of wav/fft/
spectral happens in user code (SURVEY.md §1); these modules provide the
batched, TPU-sharded equivalents as first-class API.
"""

from godsp_tpu.models.design import (
    bessel,
    bilinear_zpk,
    butter,
    buttord,
    cheb1ord,
    cheb2ord,
    cheby1,
    cheby2,
    ellip,
    ellipap,
    ellipord,
    freqz,
    group_delay,
    iircomb,
    iirdesign,
    iirfilter,
    iirnotch,
    iirpeak,
    normalize,
    sos2tf,
    sos2zpk,
    sosfreqz,
    tf2sos,
    tf2zpk,
    zpk2sos,
    zpk2tf,
)
from godsp_tpu.models.conv2d import (
    convolve2d,
    correlate2d,
    hilbert2,
    wiener,
)
from godsp_tpu.models.fir_design import (
    firls,
    minimum_phase,
    remez,
)
from godsp_tpu.models.filter import (
    correlate,
    correlation_lags,
    deconvolve,
    fftconvolve,
    fir_filter,
    medfilt,
    overlap_save,
)
from godsp_tpu.models.griffin import griffin_lim
from godsp_tpu.models.iir import (
    filtfilt,
    lfilter,
    lfilter_zi,
    sosfilt,
    sosfilt_zi,
    sosfiltfilt,
)
from godsp_tpu.models.mel import mel_filterbank, mel_spectrogram, mfcc, stream_mel
from godsp_tpu.models.resample import (
    decimate,
    firwin,
    firwin2,
    kaiser_atten,
    kaiser_beta,
    kaiserord,
    resample,
    resample_poly,
    upfirdn,
)
from godsp_tpu.models.peaks import find_peaks, peak_prominences, peak_widths
from godsp_tpu.models.savgol import savgol_coeffs, savgol_filter
from godsp_tpu.models.pipeline import (
    WavPsdResult,
    spectra_to_wav,
    spectrogram_from_wav,
    wav_psd,
)
from godsp_tpu.models.waveforms import (
    chirp,
    gausspulse,
    sawtooth,
    square,
    sweep_poly,
    unit_impulse,
)
from godsp_tpu.models.stft import (
    StreamingISTFT,
    StreamingSTFT,
    check_cola,
    check_nola,
    istft,
    spectrogram,
    stft,
    stft_frames,
    stream_istft,
    stream_stft,
)

__all__ = [
    "StreamingISTFT",
    "StreamingSTFT",
    "WavPsdResult",
    "bessel",
    "bilinear_zpk",
    "butter",
    "buttord",
    "cheb1ord",
    "cheb2ord",
    "cheby1",
    "cheby2",
    "check_cola",
    "check_nola",
    "chirp",
    "convolve2d",
    "correlate",
    "correlate2d",
    "correlation_lags",
    "decimate",
    "deconvolve",
    "ellip",
    "ellipap",
    "ellipord",
    "fftconvolve",
    "find_peaks",
    "hilbert2",
    "filtfilt",
    "firls",
    "fir_filter",
    "firwin",
    "firwin2",
    "freqz",
    "gausspulse",
    "griffin_lim",
    "group_delay",
    "iircomb",
    "iirdesign",
    "iirfilter",
    "iirnotch",
    "iirpeak",
    "kaiser_atten",
    "kaiser_beta",
    "kaiserord",
    "lfilter",
    "lfilter_zi",
    "medfilt",
    "minimum_phase",
    "normalize",
    "overlap_save",
    "peak_prominences",
    "peak_widths",
    "remez",
    "resample_poly",
    "sawtooth",
    "savgol_coeffs",
    "savgol_filter",
    "sos2tf",
    "sos2zpk",
    "sosfilt",
    "sosfilt_zi",
    "sosfiltfilt",
    "sosfreqz",
    "square",
    "sweep_poly",
    "tf2sos",
    "tf2zpk",
    "unit_impulse",
    "wiener",
    "upfirdn",
    "zpk2sos",
    "zpk2tf",
    "istft",
    "mel_filterbank",
    "mel_spectrogram",
    "mfcc",
    "resample",
    "spectra_to_wav",
    "spectrogram",
    "stream_istft",
    "stream_mel",
    "stream_stft",
    "spectrogram_from_wav",
    "stft",
    "stft_frames",
    "wav_psd",
]
