"""Fourier-method resampling (scipy.signal.resample semantics).

Resample x to `num` points along the trailing axis by transforming,
truncating/zero-padding the spectrum (with the Nyquist bin split
handled exactly as scipy does), and inverse transforming — all through
the framework's FFT kernels, so power-of-2 lengths ride Pallas.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from godsp_tpu._dtypes import as_complex_array, put
from godsp_tpu.fft.core import _fft_jit, _ifft_jit

__all__ = ["resample"]


@partial(jax.jit, static_argnames=("num", "real_out"))
def _resample_jit(x, num: int, real_out: bool):
    n = x.shape[-1]
    X = _fft_jit(as_complex_array(x))
    m = min(n, num)
    half = m // 2
    lead = X.shape[:-1]
    Y = jnp.zeros(lead + (num,), dtype=X.dtype)
    Y = Y.at[..., : half + 1].set(X[..., : half + 1])
    if half > 0:
        Y = Y.at[..., num - (m - 1 - half) :].set(X[..., n - (m - 1 - half) :])
    if m % 2 == 0:  # split/merge the Nyquist bin exactly as scipy does
        if num < n:  # downsampling: fold the mirrored bin in
            Y = Y.at[..., half].add(X[..., n - half])
        elif num > n:  # upsampling: split it between +/- Nyquist
            Y = Y.at[..., half].mul(0.5)
            Y = Y.at[..., num - half].set(Y[..., half])
    y = _ifft_jit(Y) * (num / n)
    return jnp.real(y) if real_out else y


def resample(x, num: int) -> jax.Array:
    """Resample the trailing axis to `num` points (Fourier method,
    scipy.signal.resample-compatible; assumes the signal is periodic).
    Real input returns real output; batched over leading axes."""
    if num < 1:
        raise ValueError("num must be >= 1")
    x = put(x)
    real_out = x.dtype.kind != "c"
    return _resample_jit(x, int(num), real_out)
