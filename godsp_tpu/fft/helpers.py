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

from godsp_tpu._dtypes import as_real_array, default_float, put

__all__ = ["fftfreq", "rfftfreq", "fftshift", "ifftshift", "hfft",
           "hilbert", "ihfft", "irfft", "rfft"]


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


def hilbert(x, N: int | None = None, axis: int = -1) -> jax.Array:
    """Analytic signal of a real input (scipy.signal.hilbert semantics,
    incl. the N zero-pad/truncate and axis parameters).

    z = x + i * H{x}: the spectrum's positive frequencies are doubled,
    negative zeroed (DC and Nyquist kept), through the framework's FFT
    dispatch — power-of-2 lengths ride the Pallas kernel on TPU.
    |z| is the envelope; jnp.angle(z) the instantaneous phase.
    """
    from godsp_tpu.fft.core import fft, ifft

    x = as_real_array(x)
    x = jnp.moveaxis(x, axis, -1)
    if N is not None:
        N = int(N)
        if N < 1:
            raise ValueError("N must be >= 1")
        cur = x.shape[-1]
        if N < cur:
            x = x[..., :N]
        elif N > cur:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, N - cur)])
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
    return jnp.moveaxis(ifft(X * jnp.asarray(h, dtype=X.real.dtype)), -1, axis)


def rfft(x, n: int | None = None, axis: int = -1) -> jax.Array:
    """One-sided FFT of real input (scipy.fft.rfft semantics: n//2 + 1
    bins; n pads/truncates before transforming).  Rides the real-input
    kernel path of fft_real."""
    from godsp_tpu.fft.core import fft_real

    x = put(x)
    if x.dtype.kind == "c":
        raise ValueError("rfft expects real input")
    x = jnp.moveaxis(x, axis, -1)
    if n is not None:
        n = int(n)
        if n < 1:
            raise ValueError("n must be >= 1")
        cur = x.shape[-1]
        if n < cur:
            x = x[..., :n]
        elif n > cur:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - cur)])
    m = x.shape[-1]
    X = fft_real(x)[..., : m // 2 + 1]
    return jnp.moveaxis(X, -1, axis)


def irfft(X, n: int | None = None, axis: int = -1) -> jax.Array:
    """Real inverse of rfft (scipy.fft.irfft: output length n, default
    2*(bins-1)); rebuilds the Hermitian spectrum and inverts through the
    kernel chain."""
    from godsp_tpu._dtypes import as_complex_array
    from godsp_tpu.fft.core import ifft

    X = put(X)
    X = jnp.moveaxis(as_complex_array(X), axis, -1)
    bins = X.shape[-1]
    n = 2 * (bins - 1) if n is None else int(n)
    if n < 1:
        raise ValueError("n must be >= 1")
    nb = n // 2 + 1
    if X.shape[-1] < nb:
        X = jnp.pad(X, [(0, 0)] * (X.ndim - 1) + [(0, nb - X.shape[-1])])
    else:
        X = X[..., :nb]
    neg = jnp.conj(X[..., 1 : (n + 1) // 2][..., ::-1])
    full = jnp.concatenate([X, neg], axis=-1)
    out = jnp.real(ifft(full))
    return jnp.moveaxis(out, -1, axis)


def hfft(x, n: int | None = None, axis: int = -1) -> jax.Array:
    """FFT of a Hermitian-symmetric signal -> real spectrum
    (scipy.fft.hfft): hfft(x, n) == irfft(conj(x), n) * n."""
    from godsp_tpu._dtypes import as_complex_array

    x = jnp.conj(as_complex_array(put(x)))
    bins = x.shape[axis]
    n = 2 * (bins - 1) if n is None else int(n)
    return irfft(x, n, axis=axis) * n


def ihfft(x, n: int | None = None, axis: int = -1) -> jax.Array:
    """Inverse of hfft (scipy.fft.ihfft): conj(rfft(x, n)) / n."""
    x = put(x)
    if x.dtype.kind == "c":
        raise ValueError("ihfft expects real input")
    nn = x.shape[axis] if n is None else int(n)
    return jnp.conj(rfft(x, n, axis=axis)) / nn
