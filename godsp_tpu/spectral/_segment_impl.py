"""Integer-overlap Welch framing (reference spectral/spectral.go:22-47).

Distinct from dsputils.segment (SURVEY.md §2 #3 vs #13): overlap is an
integer point count (not a fraction), frames are materialized copies (a
stacked array here), and the segment count is derived from the data
length: (len(x) - size) / (size - noverlap) + 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["segment", "num_segments"]


def num_segments(lx: int, size: int, noverlap: int) -> int:
    """Segment count formula of spectral.go:26-33 (host-side, static)."""
    stride = size - noverlap
    if lx == size:
        return 1
    if lx > size:
        return (lx - size) // stride + 1
    return 0


def segment(x, size: int, noverlap: int) -> jax.Array:
    """Frame the trailing axis into (segments, size) with integer overlap.

    Returns a stacked (..., segments, size) array; values identical to the
    reference's copied frames (spectral.go:36-45).  Trailing samples that
    do not fill a frame are discarded.
    """
    x = jnp.asarray(x)
    lx = x.shape[-1]
    segments = num_segments(lx, size, noverlap)
    stride = size - noverlap
    if segments == 0:
        return jnp.zeros(x.shape[:-1] + (0, size), dtype=x.dtype)
    idx = jnp.arange(segments)[:, None] * stride + jnp.arange(size)[None, :]
    return jnp.take(x, idx, axis=-1)
