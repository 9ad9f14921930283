"""L1 transforms: FFT/IFFT (1-D/2-D/N-D, real/complex), convolution.

TPU-native counterpart of the reference fft package (/root/reference/fft/).
Kernels: Stockham autosort radix-2 (stockham.py) and Bluestein chirp-z
(bluestein.py); fused Pallas TPU kernels live in godsp_tpu.ops.
"""

from godsp_tpu.fft.bluestein import bluestein_fft
from godsp_tpu.fft.fftlog import fht, fhtoffset, ifht
from godsp_tpu.fft._czt_impl import CZT, ZoomFFT, czt, czt_points, zoom_fft
from godsp_tpu.fft._dct_impl import dct, dctn, dst, dstn, idct, idctn, idst, idstn
from godsp_tpu.fft.core import (
    convolve,
    ensure_radix2_factors,
    fft,
    fft2,
    fft2_real,
    fft_real,
    fftn,
    ifft,
    ifft2,
    ifft2_real,
    ifft_real,
    ifftn,
)
from godsp_tpu.fft.four_step import four_step_fft
from godsp_tpu.fft.helpers import fftfreq, fftshift, hilbert, ifftshift, rfftfreq, hfft, hfft2, hfftn, ihfft, ihfft2, ihfftn, irfft, irfft2, irfftn, next_fast_len, prev_fast_len, rfft, rfft2, rfftn
from godsp_tpu.fft.large import set_large_min
from godsp_tpu.fft.pow2 import pallas_enabled, pow2_fft, set_pallas_enabled
from godsp_tpu.fft.split import fft_split, ifft_split, rfft_split
from godsp_tpu.fft.stockham import stockham_fft, twiddles


def set_natural_fused(on: bool) -> None:
    """Toggle in-kernel natural-order emission (ops.pallas_fft).

    Re-exported lazily: the rest of this package imports the pallas stack
    inside function bodies, and an eager module-level import here would
    pull jax.experimental.pallas (and godsp_tpu.ops) in while this module
    is mid-initialization.
    """
    from godsp_tpu.ops.pallas_fft import set_natural_fused as _impl

    _impl(on)

__all__ = [
    "bluestein_fft",
    "convolve",
    "CZT",
    "ZoomFFT",
    "czt",
    "czt_points",
    "dct",
    "dctn",
    "dst",
    "dstn",
    "idct",
    "idctn",
    "idst",
    "idstn",
    "ensure_radix2_factors",
    "fft",
    "four_step_fft",
    "fft2",
    "fft2_real",
    "fft_real",
    "fht",
    "fhtoffset",
    "fft_split",
    "rfft_split",
    "ifft_split",
    "fftfreq",
    "fftn",
    "fftshift",
    "hfft",
    "hfft2",
    "hfftn",
    "hilbert",
    "ihfft",
    "ihfft2",
    "ihfftn",
    "irfft",
    "irfft2",
    "irfftn",
    "next_fast_len",
    "prev_fast_len",
    "rfft",
    "rfft2",
    "rfftn",
    "ifft",
    "ifftshift",
    "rfftfreq",
    "ifft2",
    "ifft2_real",
    "ifft_real",
    "ifht",
    "ifftn",
    "pallas_enabled",
    "pow2_fft",
    "set_large_min",
    "set_natural_fused",
    "set_pallas_enabled",
    "stockham_fft",
    "twiddles",
    "zoom_fft",
]
