"""Sequence-parallel STFT / spectrogram: time axis sharded over "sp".

Completes the SP story beyond PSD (parallel/pwelch_sharded.py): for
giant signals, frames are computed per shard with the left-neighbor
halo exchange so boundary-straddling frames are exact, and the OUTPUT
stays sharded over its frame axis — nothing is gathered.

Geometry matches models.stft exactly (n_frames = (L - nfft)//hop + 1
globally; the tail remainder is dropped globally, not per shard).
Requires L divisible by n_sp * hop, the per-shard block >= the
(nfft - hop) halo, and — like all shard_map code here — the same jitted
step runs on any mesh size including 1.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from godsp_tpu import window as win
from godsp_tpu._dtypes import as_real_array
from godsp_tpu.models.stft import WindowSpec, _fused_window, _resolve_window

__all__ = ["spectrogram_sharded"]


@partial(
    jax.jit,
    static_argnames=("mesh", "nfft", "hop", "pad", "frames_per_shard", "total_frames"),
)
def _sharded_power_frames(
    x,
    w_pad,
    mesh: Mesh,
    nfft: int,
    hop: int,
    pad: int,
    frames_per_shard: int,
    total_frames: int,
):
    """(..., n_sp * frames_per_shard, lp) power frames, frame axis sharded.

    Invalid tail frames (>= total_frames) are zeroed.
    """
    n_sp = mesh.shape["sp"]
    H = max(nfft - hop, 0)
    lp = pad // 2 + 1

    def shard_fn(x_local):
        if H > 0:
            halo = jax.lax.ppermute(
                x_local[..., :H], "sp",
                perm=[(i, (i - 1) % n_sp) for i in range(n_sp)],
            )
        else:
            halo = x_local[..., :0]
        ext = jnp.concatenate([x_local, halo], axis=-1)

        sp_idx = jax.lax.axis_index("sp")
        frame_global = sp_idx * frames_per_shard + jnp.arange(frames_per_shard)
        mask = (frame_global < total_frames).astype(ext.dtype)

        from godsp_tpu.spectral.pwelch import fused_path_eligible

        if fused_path_eligible(nfft, pad, hop):
            from godsp_tpu.ops.pallas_stft import stft_pallas

            p = stft_pallas(ext, w_pad, nfft, hop, frames_per_shard, pad=pad,
                            out="power")
        else:
            idx = (
                jnp.arange(frames_per_shard)[:, None] * hop
                + jnp.arange(nfft)[None, :]
            )
            frames = jnp.take(ext, idx, axis=-1) * w_pad[:nfft]
            if pad > nfft:
                frames = jnp.pad(
                    frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad - nfft)]
                )
            from godsp_tpu.fft.core import fft_real

            spec = fft_real(frames)[..., :lp]
            p = spec.real * spec.real + spec.imag * spec.imag
        return p * mask[..., None]

    lead = x.ndim - 1
    in_spec = P(*([None] * lead), "sp")
    out_spec = P(*([None] * lead), "sp", None)
    return jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_spec, out_specs=out_spec
    )(x)


def spectrogram_sharded(
    x,
    mesh: Mesh,
    nfft: int,
    hop: Optional[int] = None,
    window: WindowSpec = None,
    pad: Optional[int] = None,
) -> jax.Array:
    """Power spectrogram of a long signal, frames sharded over "sp".

    Returns (..., total_frames, pad//2 + 1) — equal to
    models.spectrogram(x, ...) with the frame axis laid out across the
    mesh (padded invalid tail frames are sliced off).  L must divide by
    n_sp * hop; each shard's block must hold the (nfft - hop) halo.
    """
    x = as_real_array(x)
    hop = nfft // 2 if hop is None else hop
    if hop <= 0:
        raise ValueError("hop must be positive")
    pad = pad or nfft
    n_sp = mesh.shape["sp"]
    L = x.shape[-1]
    if L % (n_sp * hop) != 0:
        raise ValueError(f"L={L} must divide by n_sp*hop={n_sp * hop}")
    frames_per_shard = L // (n_sp * hop)
    if max(nfft - hop, 0) > frames_per_shard * hop:
        raise ValueError(
            "per-shard block must hold the nfft-hop halo; use fewer shards"
        )
    total_frames = (L - nfft) // hop + 1

    w = _resolve_window(window, nfft, x.dtype)
    w_pad = _fused_window(w, pad)
    p = _sharded_power_frames(
        x, w_pad, mesh, nfft, hop, pad, frames_per_shard, total_frames
    )
    return p[..., :total_frames, :]
