"""godsp_tpu — a TPU-native DSP framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface
of the go-dsp reference library (FFT, spectral analysis, window tapers,
WAV ingest), built for TPU hardware: batched fused kernels, device-mesh
sharding, and streaming multi-host Welch PSD.

Packages:
  dsputils  — L0 primitives: conversion, padding, segmentation, compare
  window    — symmetric window tapers
  fft       — 1-D/2-D/N-D FFT, Stockham + Bluestein kernels, convolution
  spectral  — Welch PSD
  wav       — RIFF/WAVE streaming ingest
  ops       — Pallas TPU kernels (fused FFT, windowed periodogram)
  parallel  — mesh sharding, halo exchange, distributed/streaming Pwelch
  models    — end-to-end pipelines (Pwelch, STFT/spectrogram)
  utils     — metrics, profiling, roofline helpers
"""

__version__ = "0.1.0"

from godsp_tpu import dsputils, fft, spectral, wav, window  # noqa: F401

__all__ = ["dsputils", "fft", "spectral", "wav", "window", "__version__"]

# scipy.signal.windows-style namespace (godsp_tpu.windows)
from godsp_tpu.window import windows  # noqa: E402,F401
