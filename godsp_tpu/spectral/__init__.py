"""L2 spectral analysis: Welch PSD + cross-spectra (reference spectral/).

The reference's serial per-segment loop (pwelch.go:107-122) is
embarrassingly parallel; here it is one batched frame->window->FFT->|.|^2
->mean computation that XLA fuses, vmaps over the segment axis, and (in
godsp_tpu.parallel) shards over a device mesh.
"""

from godsp_tpu.spectral._csd_impl import coherence, csd
from godsp_tpu.spectral._pwelch_impl import PwelchOptions, periodogram, pwelch, pwelch_from_frames
from godsp_tpu.spectral._segment_impl import num_segments, segment
from godsp_tpu.spectral._welch_impl import (
    lombscargle,
    spectrogram_scipy,
    welch,
    welch_coherence,
    welch_csd,
)

__all__ = [
    "PwelchOptions",
    "coherence",
    "csd",
    "lombscargle",
    "num_segments",
    "periodogram",
    "pwelch",
    "pwelch_from_frames",
    "segment",
    "spectrogram_scipy",
    "welch",
    "welch_coherence",
    "welch_csd",
]
