"""Pallas TPU kernels — the fused, roofline-targeted compute paths.

These are the TPU-build counterparts of the reference's perf-critical
components (SURVEY.md §2: radix-2 kernel, twiddle cache, Welch pipeline):
  pallas_fft     — batched power-of-2 FFT, whole transform in VMEM
  pallas_pwelch  — fused frame->window->FFT->|.|^2->masked-sum kernel
  pallas_stft    — fused per-segment STFT / spectrogram / mel kernel
  pallas_csd     — fused cross-spectral (conj(X)·Y) accumulation
  pallas_outer   — fused outer DFT levels of the giant-N plan
"""

from godsp_tpu.ops.pallas_fft import (
    LANES,
    default_batch_tile,
    fft_pow2_split,
    supported_size,
)
from godsp_tpu.ops.pallas_csd import csd_power_partials
from godsp_tpu.ops.pallas_stft import stft_pallas
from godsp_tpu.ops.pallas_outer import outer_dft_split
from godsp_tpu.ops.pallas_pwelch import (
    digit_to_natural_bins,
    fused_supported,
    packed_to_natural_onesided,
    pwelch_power_partials,
    pwelch_power_sum,
)

__all__ = [
    "LANES",
    "default_batch_tile",
    "csd_power_partials",
    "digit_to_natural_bins",
    "fft_pow2_split",
    "fused_supported",
    "outer_dft_split",
    "packed_to_natural_onesided",
    "pwelch_power_partials",
    "pwelch_power_sum",
    "stft_pallas",
    "supported_size",
]
