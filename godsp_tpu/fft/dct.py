"""Discrete cosine transforms via the framework's FFT kernels.

DCT-II/III (the "the DCT" pair: forward/inverse) expressed through a
same-length complex FFT using the even-extension phase trick, so
power-of-2 sizes ride the Pallas kernel and other sizes Bluestein —
no new kernel code.

  DCT-II:  y[k] = 2 * sum_n x[n] cos(pi k (2n+1) / (2N))
           computed as Re( e^{-i pi k / 2N} * FFT(reorder(x))[k] ) * 2
           where reorder = [x0, x2, ..., x3, x1] (even indices, then
           reversed odd indices — Makhoul's N-point method).
  norm="ortho" matches scipy.fft.dct(..., norm="ortho").

Batched over leading axes, jit-compatible; validated against scipy in
tests/test_fft.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from godsp_tpu._dtypes import complex_for, put, real_for
from godsp_tpu.fft.core import _fft_jit, _ifft_jit

__all__ = ["dct", "idct"]


@lru_cache(maxsize=None)
def _phase(n: int, dtype_name: str) -> np.ndarray:
    """e^{-i pi k / (2N)}, float64-generated."""
    k = np.arange(n, dtype=np.float64)
    return np.exp(-1j * np.pi * k / (2.0 * n)).astype(dtype_name)


@partial(jax.jit, static_argnames=("norm",))
def _dct2_jit(x, norm):
    n = x.shape[-1]
    cdt = complex_for(x.dtype)
    # Makhoul reorder: even indices ascending, odd indices descending.
    v = jnp.concatenate([x[..., 0::2], x[..., 1::2][..., ::-1]], axis=-1)
    V = _fft_jit(v.astype(cdt))
    ph = jnp.asarray(_phase(n, np.dtype(cdt).name))
    y = 2.0 * jnp.real(ph * V)
    if norm == "ortho":
        rdt = x.dtype
        s = jnp.full((n,), 1.0 / jnp.sqrt(2.0 * n), dtype=rdt)
        s = s.at[0].set(1.0 / jnp.sqrt(4.0 * n).astype(rdt))
        y = y * s
    return y


@partial(jax.jit, static_argnames=("norm",))
def _dct3_jit(y, norm):
    n = y.shape[-1]
    rdt = real_for(y.dtype)
    y = jnp.real(y).astype(rdt)
    if norm == "ortho":
        # Undo the forward's ortho scaling, recovering the raw-2x DCT.
        s = jnp.full((n,), jnp.sqrt(2.0 * n), dtype=rdt)
        s = s.at[0].set(jnp.sqrt(4.0 * n).astype(rdt))
        y = y * s
    cdt = complex_for(rdt)
    ph = jnp.asarray(_phase(n, np.dtype(cdt).name))
    # Invert Makhoul: V[k] = conj(phase)[k]... build the complex spectrum
    # of the reordered sequence, inverse FFT, then undo the reorder.
    yk = y.astype(cdt)
    y_rev = jnp.concatenate(
        [jnp.zeros(y.shape[:-1] + (1,), cdt), -yk[..., 1:][..., ::-1] * 1j],
        axis=-1,
    )
    V = (yk + y_rev) / (2.0 * ph)
    v = jnp.real(_ifft_jit(V)).astype(rdt)
    out = jnp.zeros_like(v)
    half = (n + 1) // 2
    out = out.at[..., 0::2].set(v[..., :half])
    out = out.at[..., 1::2].set(v[..., half:][..., ::-1])
    return out


def dct(x, norm: str | None = None) -> jax.Array:
    """DCT-II of the trailing axis (scipy.fft.dct type 2 semantics;
    norm=None -> unnormalized 2x convention, "ortho" -> orthonormal)."""
    if norm not in (None, "ortho"):
        raise ValueError(f"unknown norm: {norm}")
    x = put(x)
    if x.dtype.kind == "c":
        raise ValueError("dct expects real input")
    if x.shape[-1] == 0:
        return x
    return _dct2_jit(x, norm)


def idct(y, norm: str | None = None) -> jax.Array:
    """Inverse of `dct` (DCT-III; scipy.fft.idct type 2 semantics)."""
    if norm not in (None, "ortho"):
        raise ValueError(f"unknown norm: {norm}")
    y = put(y)
    if y.shape[-1] == 0:
        return y
    if norm is None:
        # scipy.fft's backward norm makes idct the exact inverse of dct:
        # idct(dct(x)) == x (the 2N factor is scipy.fftpack semantics).
        return _dct3_jit(y, None)
    return _dct3_jit(y, "ortho")
