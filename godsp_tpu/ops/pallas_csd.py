"""Fused cross-spectral (Welch CSD) accumulation kernel.

The two-signal sibling of ops.pallas_pwelch: one kernel per segment tile
frames BOTH signals in VMEM, runs both real-input FFTs, forms the
per-segment cross power conj(X)*Y, and reduces it over the tile's
segments with the masked MXU contraction — neither frames nor spectra
ever hit HBM.

  re(conj(X)Y) =  xr*yr + xi*yi
  im(conj(X)Y) =  xr*yi - xi*yr

Same geometry support as the Pwelch kernel (fused_supported); digit bin
order on output, reordered by the caller on the tiny reduced rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from godsp_tpu.ops.pallas_fft import (
    LANES,
    _fft_steps_real,
    fft_real_tables,
)
from godsp_tpu.ops.pallas_pwelch import (
    _phases,
    framing_blocks,
    framing_halo,
    framing_mode,
    frame_class_perm,
    _segs_per_tile,
    fused_supported,
    windowed_frames,
)

__all__ = ["csd_power_partials"]

_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST


def _csd_kernel(
    *refs,
    bt: int,
    stride: int,
    nfft: int,
    pad: int,
    halo: int,
    framing: str = "row",
):
    """One tile: frame both -> window -> FFTs -> conj(X)Y -> masked sums."""
    if halo:
        bx_ref, by_ref, hx_ref, hy_ref, mask_ref, w_ref, *rest = refs
    else:
        bx_ref, by_ref, mask_ref, w_ref, *rest = refs
        hx_ref = hy_ref = None
    *tabs, re_ref, im_ref = rest

    xw = windowed_frames(bx_ref, hx_ref, w_ref, bt, stride, nfft, pad,
                         halo, framing)
    yw = windowed_frames(by_ref, hy_ref, w_ref, bt, stride, nfft, pad,
                         halo, framing)
    n1 = pad // LANES
    xr, xi = _fft_steps_real(xw, tuple(tabs), bt, n1)
    yr, yi = _fft_steps_real(yw, tuple(tabs), bt, n1)

    pre = xr * yr + xi * yi  # (bt, pad) digit order
    pim = xr * yi - xi * yr
    mask_row = mask_ref[:].reshape(1, -1)[:, :bt]
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=_F32, precision=_HI,
    )
    re_ref[:] = dot(mask_row, pre).reshape(1, 1, pad)
    im_ref[:] = dot(mask_row, pim).reshape(1, 1, pad)


def csd_power_partials(
    ext_x: jax.Array,
    ext_y: jax.Array,
    mask: jax.Array,
    w: jax.Array,
    nfft: int,
    stride: int,
    pad: int | None = None,
    segs_per_tile: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Masked per-tile cross-power sums sum_s conj(X_s) * Y_s.

    Same contract as ops.pallas_pwelch.pwelch_power_partials but over a
    PAIR of aligned sample streams; returns (re, im) each
    (..., n_tiles, pad) in digit bin order.
    """
    pad = pad or nfft
    if not fused_supported(nfft, pad, stride):
        raise ValueError(
            f"geometry (nfft={nfft}, pad={pad}, stride={stride}) unsupported "
            "by the fused kernel"
        )
    if ext_x.shape != ext_y.shape:
        raise ValueError("ext_x and ext_y must have identical shapes")
    S = mask.shape[-1]
    lead = ext_x.shape[:-1]
    if mask.shape[:-1] != lead:
        raise ValueError("ext and mask must share leading dimensions")
    if S == 0:
        z = jnp.zeros(lead + (0, pad), dtype=_F32)
        return z, z
    bt = segs_per_tile or _segs_per_tile(pad)
    bt = min(bt, max(8, S))
    bt = max(8, 1 << (bt.bit_length() - 1))
    n_tiles = pl.cdiv(S, bt)
    T = bt * stride
    P = _phases(stride)
    halo = framing_halo(nfft, stride)

    ex2 = ext_x.reshape(-1, ext_x.shape[-1]).astype(_F32)
    ey2 = ext_y.reshape(-1, ext_y.shape[-1]).astype(_F32)
    R = ex2.shape[0]
    mask2 = mask.reshape(-1, S).astype(_F32)
    if n_tiles * bt - S:
        mask2 = jnp.pad(mask2, ((0, 0), (0, n_tiles * bt - S)))

    framing = framing_mode(nfft, stride, bt)
    in_x, specs_x, halo_k = framing_blocks(
        ex2, n_tiles, bt, stride, nfft, halo, framing
    )
    in_y, specs_y, _ = framing_blocks(
        ey2, n_tiles, bt, stride, nfft, halo, framing
    )
    halo = halo_k
    tile3 = lambda X: pl.BlockSpec(
        (1, 1, X), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    inputs = [in_x[0], in_y[0]]
    in_specs = [specs_x[0], specs_y[0]]
    if len(in_x) > 1:
        inputs += [in_x[1], in_y[1]]
        in_specs += [specs_x[1], specs_y[1]]
    mp = max(bt, LANES)
    masks = mask2.reshape(R * n_tiles, bt)
    if P > 1:
        # Frames emerge class-ordered; the summed reduction absorbs the
        # order by permuting the mask (see pallas_pwelch).
        masks = masks[:, frame_class_perm(bt, stride)]
    masks = jnp.pad(masks, ((0, 0), (0, mp - bt)))
    inputs.append(masks.reshape(R * n_tiles, 1, mp))
    in_specs.append(tile3(mp))
    inputs.append(jnp.asarray(w, _F32).reshape(1, pad))
    in_specs.append(pl.BlockSpec((1, pad), lambda i: (0, 0), memory_space=pltpu.VMEM))
    order, tabs = fft_real_tables(pad)
    for key in order:
        t = jnp.asarray(tabs[key])
        inputs.append(t)
        in_specs.append(
            pl.BlockSpec(
                t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM
            )
        )

    vma = getattr(jax.typeof(inputs[0]), "vma", None) or frozenset()
    out_spec = pl.BlockSpec((1, 1, pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((R * n_tiles, 1, pad), _F32, vma=vma)
    n1 = pad // LANES
    re, im = pl.pallas_call(
        partial(
            _csd_kernel,
            bt=bt, stride=stride, nfft=nfft, pad=pad, halo=halo,
            framing=framing,
        ),
        grid=(R * n_tiles,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(shp, shp),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * R * n_tiles * bt * pad * (2 * n1 + 6 * LANES)),
            bytes_accessed=int(4 * (2 * R * n_tiles * (T + halo) + 2 * R * n_tiles * pad)),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*inputs)
    return (
        re.reshape(*lead, n_tiles, pad),
        im.reshape(*lead, n_tiles, pad),
    )
