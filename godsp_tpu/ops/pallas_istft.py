"""Fused inverse STFT (spectra -> overlap-added signal) as one Pallas
TPU kernel.

The synthesis-side counterpart of ops.pallas_stft: one kernel tile takes
`bt` frames' complex spectra (split planes, the FFT kernel's DIGIT bin
order) and produces the overlap-added time block entirely in VMEM —

  IFFT     : the digit-in inverse two-step of ops.pallas_fft
             (per-k1 Karatsuba contraction with conjugate column-scaled
             G tables, then the radix-2 slice network), 1/pad folded
             into the tables; only the REAL output plane is consumed
             (conjugate-symmetric input), so the final stage's imag
             arithmetic is dead code the compiler drops;
  window   : one VPU multiply by the nfft-length synthesis taper;
  OLA      : overlap-add is ONE MXU contraction — the m = nfft/hop
             hop-chunks of the windowed frames are stacked on sublanes
             (m*bt, hop) and multiplied by a precomputed block of
             shifted-identity matrices S = [S_0 | ... | S_{m-1}] with
             S_k[j, j-k] = 1, giving the tile's output rows
             out[j, t] = sum_k yw[j-k, k*hop + t], i.e. sample
             j*hop + t of the tile's overlap-added span.  One-hot
             operands at HIGHEST precision pass f32 values through
             exactly.

Per-tile HBM traffic: read 2*bt*pad spectrum planes + write
(bt + m - 1)*hop ~ bt*hop output samples — the windowed frames never
round-trip to HBM (the XLA path materializes them twice around its
scatter-add).  Tile outputs overlap their successor by (m-1) rows; the
wrapper adds those tails with one static row-shifted add (no scatter).

NOLA normalization (sum_f w^2 shifted) is applied by the caller
(models.stft.istft), which also rebuilds the full conjugate-symmetric
spectrum from one-sided bins and permutes natural -> digit bin order
(one XLA transpose — the synthesis twin of the forward kernel's
digit -> natural fix; fully fused analysis->synthesis chains can keep
digit order end-to-end and skip both).

Geometry: pad = FFT length in ops.pallas_fft.supported_size with the
lane-slice structure (pad <= 8192), nfft % 128 == 0, lane-aligned hop
(hop % 128 == 0, nfft % hop == 0).  Anything else falls back to the
XLA ISTFT (models/_stft_impl.py:_istft_jit).

The reference library has no synthesis path (spectral/pwelch.go stops
at PSD); semantics follow models.stft.istft's least-squares
overlap-add, golden-tested against it in tests/test_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from godsp_tpu.ops.pallas_fft import (
    LANES,
    _HI,
    _LS_MAX_N1,
    _LS_ORDER,
    _dft_slices,
    _karatsuba_g,
    _ls_tables,
    _natural_perm_np,
    _permute_lanes_mxu,
)

__all__ = ["istft_fused_supported", "istft_overlap_add"]

_F32 = jnp.float32


def istft_fused_supported(nfft: int, pad: int, hop: int) -> bool:
    """True if the fused ISTFT kernel covers this geometry."""
    n1 = pad // LANES
    return (
        pad >= nfft
        and pad & (pad - 1) == 0
        and 2 <= n1 <= _LS_MAX_N1
        and nfft % LANES == 0
        and hop > 0
        and hop % LANES == 0
        and nfft % hop == 0
    )


def _istft_kernel(
    *refs, bt: int, hop: int, nfft: int, pad: int, natural_in: bool = False,
):
    """One tile: (natural ->) digit-in inverse FFT -> window -> matmul
    overlap-add.  natural_in consumes NATURAL bin order directly via the
    in-kernel MXU permutation (the input twin of the forward kernel's
    natural_out — see ops.pallas_fft._permute_lanes_mxu)."""
    xr_ref, xi_ref, w_ref, s_ref, *rest = refs
    *tabs, out_ref = rest
    if natural_in:
        *tabs, p_ref = tabs
    n1 = pad // LANES
    n1f = nfft // LANES
    m = nfft // hop

    xr = xr_ref[:]
    xi = xi_ref[:]
    if natural_in:
        # V_g = natural_g @ P^T: chunk k1 of V_g holds digit slice k1's
        # column window [g*mw, (g+1)*mw) — the exact transpose of the
        # forward kernel's natural emission.
        mw = LANES // n1
        p = p_ref[:]
        Vr = [
            _permute_lanes_mxu(xr[:, g * LANES : (g + 1) * LANES], p)
            for g in range(n1)
        ]
        Vi = [
            _permute_lanes_mxu(xi[:, g * LANES : (g + 1) * LANES], p)
            for g in range(n1)
        ]
        slices = [
            (
                jnp.concatenate(
                    [Vr[g][:, k1 * mw : (k1 + 1) * mw] for g in range(n1)],
                    axis=1,
                ),
                jnp.concatenate(
                    [Vi[g][:, k1 * mw : (k1 + 1) * mw] for g in range(n1)],
                    axis=1,
                ),
            )
            for k1 in range(n1)
        ]
    else:
        slices = [
            (
                xr[:, k1 * LANES : (k1 + 1) * LANES],
                xi[:, k1 * LANES : (k1 + 1) * LANES],
            )
            for k1 in range(n1)
        ]
    C = []
    for k1 in range(n1):
        ar, ai = slices[k1]
        C.append(_karatsuba_g(ar, ai, k1, tabs))
    Y = _dft_slices(C, inverse=True)
    # Natural-order time samples; frames were zero-extended to pad on
    # analysis, synthesis reads back the first nfft (models/_stft_impl.py:135).
    y = jnp.concatenate([Y[i1][0] for i1 in range(n1f)], axis=1)
    yw = y * w_ref[:]  # (bt, nfft)

    if m == 1:
        out_ref[:] = yw.reshape(1, bt, hop)
        return
    # Stack the m hop-chunks on sublanes and overlap-add with one MXU
    # contraction against the shifted-identity block (exact at HIGHEST).
    z = jnp.concatenate(
        [yw[:, k * hop : (k + 1) * hop] for k in range(m)], axis=0
    )  # (m*bt, hop)
    out = jax.lax.dot_general(
        s_ref[:], z,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=_F32, precision=_HI,
    )
    out_ref[:] = out.reshape(1, out.shape[0], hop)


def istft_overlap_add(
    sr: jax.Array,
    si: jax.Array,
    w: jax.Array,
    nfft: int,
    hop: int,
    frames_per_tile: int | None = None,
    interpret: bool = False,
    natural_in: bool = False,
) -> jax.Array:
    """Windowed overlap-add of inverse FFTs, un-normalized.

    sr, si: (..., F, pad) float32 full-spectrum planes in the FFT
    kernel's DIGIT bin order — or NATURAL order with natural_in=True,
    which permutes in-kernel on the MXU instead of paying the XLA
    natural -> digit transpose (see models.stft).  w: (nfft,) synthesis
    window.  Returns (..., (F-1)*hop + nfft) with
    y[t] = sum_f w[t - f*hop] * real(ifft(spec_f))[t - f*hop];
    the caller divides by the NOLA window-energy denominator.
    """
    if sr.shape != si.shape:
        raise ValueError("re/im planes must have identical shapes")
    pad = sr.shape[-1]
    if not istft_fused_supported(nfft, pad, hop):
        raise ValueError(
            f"geometry (nfft={nfft}, pad={pad}, hop={hop}) unsupported "
            "by the fused ISTFT kernel"
        )
    lead = sr.shape[:-2]
    F = sr.shape[-2]
    m = nfft // hop
    if F == 0:
        return jnp.zeros(lead + (0,), _F32)

    bt = frames_per_tile or max(8, min(128, (1 << 21) // (4 * pad)))
    bt = min(bt, max(8, F))
    bt = max(8, 1 << (bt.bit_length() - 1))
    # The stitch scatters a tile's m-1 tail rows into its successor's
    # bt-row slot, so bt must cover them (deep overlaps: m-1 can exceed
    # the F-clamped tile size, e.g. nfft=2048 hop=128 with few frames).
    while bt < m - 1:
        bt *= 2
    n_tiles = pl.cdiv(F, bt)
    # Zero-pad ragged frames: zero spectra synthesize zero samples.
    r2 = sr.reshape(-1, F, pad).astype(_F32)
    i2 = si.reshape(-1, F, pad).astype(_F32)
    R = r2.shape[0]
    pad_f = n_tiles * bt - F
    if pad_f:
        r2 = jnp.pad(r2, ((0, 0), (0, pad_f), (0, 0)))
        i2 = jnp.pad(i2, ((0, 0), (0, pad_f), (0, 0)))
    r2 = r2.reshape(R * n_tiles * bt, pad)
    i2 = i2.reshape(R * n_tiles * bt, pad)

    # Output rows per tile: bt + (m-1) overlap rows, 8-rounded for the
    # sublane block rule (extra rows are written zeros via S's shape).
    bt_op = -(-(bt + m - 1) // 8) * 8
    s_np = np.zeros((bt_op, m * bt), np.float32)
    for k in range(m):
        s_np[:, k * bt : (k + 1) * bt] += np.eye(bt_op, bt, -k, dtype=np.float32)
    smat = jnp.asarray(s_np)

    tabs = _ls_tables(pad, True, True, 1.0 / pad)
    tables = [jnp.asarray(tabs[k]) for k in _LS_ORDER]
    if natural_in:
        tables.append(jnp.asarray(_natural_perm_np(pad // LANES).T.copy()))

    spec_in = pl.BlockSpec((bt, pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    inputs = [r2, i2, jnp.asarray(w, _F32).reshape(1, nfft), smat]
    in_specs = [
        spec_in, spec_in,
        pl.BlockSpec((1, nfft), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(smat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    for t in tables:
        inputs.append(t)
        in_specs.append(
            pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )

    n1 = pad // LANES
    vma = getattr(jax.typeof(r2), "vma", None) or frozenset()
    out = pl.pallas_call(
        partial(_istft_kernel, bt=bt, hop=hop, nfft=nfft, pad=pad,
                natural_in=natural_in),
        grid=(R * n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, bt_op, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R * n_tiles, bt_op, hop), _F32, vma=vma),
        cost_estimate=pl.CostEstimate(
            flops=int(
                R * n_tiles * bt * pad * (2 * n1 + 6 * LANES)
                + R * n_tiles * bt_op * m * bt * hop * 6
            ),
            bytes_accessed=int(4 * R * n_tiles * (2 * bt * pad + bt_op * hop)),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*inputs)

    # Stitch tiles: rows [0, bt) are the tile's own hop-blocks; rows
    # [bt, bt+m-1) overlap the NEXT tile's first rows.  One static
    # row-shifted add — no scatter.
    out = out.reshape(R, n_tiles, bt_op, hop)
    main = out[:, :, :bt, :].reshape(R, n_tiles * bt, hop)
    if m > 1:
        tails = out[:, :, bt : bt + m - 1, :]  # (R, n_tiles, m-1, hop)
        shifted = jnp.zeros((R, n_tiles + 1, bt, hop), _F32)
        shifted = shifted.at[:, 1:, : m - 1, :].set(tails)
        main = main + shifted.reshape(R, (n_tiles + 1) * bt, hop)[
            :, : n_tiles * bt
        ]
        # The final tile's tail extends past the padded frame span; those
        # samples belong to frames >= F only when F fills the last tile.
        # Keep them: the un-padded signal span below slices them off or
        # retains the genuine last-frame overlap.
        extra = tails[:, -1]  # (R, m-1, hop)
    else:
        extra = jnp.zeros((R, 0, hop), _F32)
    full = jnp.concatenate([main, extra.reshape(R, -1, hop)], axis=1)
    full = full.reshape(R, -1)
    length = (F - 1) * hop + nfft
    return full[:, :length].reshape(*lead, length)
