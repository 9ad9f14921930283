"""Frequency-grid and spectrum-layout helpers (numpy.fft-compatible).

Beyond the reference's surface (go-dsp exposes only the freqs grid
inside Pwelch, pwelch.go:138-142) but expected of any FFT package:
sample-frequency grids and the centered-spectrum reorder, plus the
analytic signal (Hilbert transform) built on the framework's FFT stack.
All batched over leading axes and jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from godsp_tpu._dtypes import as_real_array, default_float

__all__ = ["fftfreq", "rfftfreq", "fftshift", "ifftshift", "hilbert"]


def fftfreq(n: int, d: float = 1.0) -> jax.Array:
    """DFT sample frequencies: [0, 1, ..., n//2-1, -(n//2), ..., -1]/(n d)
    (numpy.fft.fftfreq; the two-sided counterpart of pwelch.go:138-142)."""
    f = default_float()
    k = np.fft.fftfreq(n, d).astype(np.float64)
    return jnp.asarray(k, dtype=f)


def rfftfreq(n: int, d: float = 1.0) -> jax.Array:
    """One-sided DFT sample frequencies i/(n d), i = 0..n//2 — exactly
    Pwelch's freqs grid (pwelch.go:138-142) with fs = 1/d."""
    f = default_float()
    return jnp.arange(n // 2 + 1, dtype=f) / (n * d)


def fftshift(x, axes=None) -> jax.Array:
    """Move the zero-frequency bin to the center (numpy.fft.fftshift)."""
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [x.shape[a] // 2 for a in axes], axes)


def ifftshift(x, axes=None) -> jax.Array:
    """Inverse of fftshift (exact also for odd lengths)."""
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [-(x.shape[a] // 2) for a in axes], axes)


def hilbert(x) -> jax.Array:
    """Analytic signal of a real input (scipy.signal.hilbert semantics).

    z = x + i * H{x}: the spectrum's positive frequencies are doubled,
    negative zeroed (DC and Nyquist kept), through the framework's FFT
    dispatch — power-of-2 lengths ride the Pallas kernel on TPU.
    |z| is the envelope; jnp.angle(z) the instantaneous phase.
    """
    from godsp_tpu.fft.core import fft, ifft

    x = as_real_array(x)
    n = x.shape[-1]
    if n == 0:
        from godsp_tpu._dtypes import complex_for

        return x.astype(complex_for(x.dtype))
    X = fft(x)
    h = np.zeros(n, dtype=np.float64)
    h[0] = 1.0
    if n % 2 == 0:
        h[n // 2] = 1.0
        h[1 : n // 2] = 2.0
    else:
        h[1 : (n + 1) // 2] = 2.0
    return ifft(X * jnp.asarray(h, dtype=X.real.dtype))
