"""Fused STFT / spectrogram as one Pallas TPU kernel.

Same in-VMEM frame -> window -> FFT pipeline as ops.pallas_pwelch, but
emitting PER-SEGMENT results instead of the masked segment sum:

  out="power"   -> |X|^2 per segment (the spectrogram hot path)
  out="complex" -> (re, im) spectra per segment (the STFT hot path)

Overlapped samples are still read from HBM exactly once; the per-segment
output is the dominant HBM traffic, so unlike Pwelch this kernel is
bandwidth-bound on its own writes.  Bin order is the kernel's digit
order — the wrapper reorders to natural with one XLA transpose over the
(segments, pad) output.

Geometry: same as the Pwelch kernel (ops.pallas_pwelch.fused_supported).
Used by models.stft/spectrogram on TPU; golden-tested against the XLA
path in tests/test_pallas.py.
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
    _natural_perm_np,
    _natural_slices_mxu,
    _rfft_steps_packed,
    _rfft_tables,
    fft_real_tables,
    rfft_supported_size,
)
from godsp_tpu.ops.pallas_pwelch import (
    _phases,
    framing_blocks,
    framing_halo,
    framing_mode,
    _segs_per_tile,
    frame_class_perm,
    fused_supported,
    windowed_frames,
)

__all__ = ["stft_pallas"]

_F32 = jnp.float32


def _stft_kernel(
    *refs,
    bt: int,
    stride: int,
    nfft: int,
    pad: int,
    halo: int,
    out: str,
    natural_out: bool = False,
    framing: str = "row",
    half: bool = False,
):
    """One tile: frame -> window -> FFT -> per-segment outputs.

    natural_out (power/complex only): emit NATURAL bin order via the
    in-kernel MXU permutation — the wrapper then skips its XLA
    digit -> natural transpose over the (segments, pad) output."""
    if halo:
        block_ref, halo_ref, w_ref, *rest = refs
    else:
        block_ref, w_ref, *rest = refs
        halo_ref = None
    if out == "mel":
        fb_ref, *rest = rest
        *tabs, m_ref = rest
    elif out == "power":
        *tabs, p_ref = rest
    else:
        *tabs, yr_ref, yi_ref = rest
    if natural_out:
        *tabs, perm_ref = tabs

    n1 = pad // LANES
    xw = windowed_frames(
        block_ref, halo_ref, w_ref, bt, stride, nfft, pad, halo, framing
    )
    if out == "mel" and half:
        # Half-Hermitian route (round 5): the rfft packed tables HALVE
        # the MXU stream, and the filterbank contraction absorbs the
        # packed bin order at zero cost (fb rows pre-permuted at trace
        # time) — the power spectrum never leaves VMEM either way.
        ypr, ypi, nyq = _rfft_steps_packed(xw, tuple(tabs), n1)
        p = jnp.concatenate(
            [ypr * ypr + ypi * ypi,
             (nyq * nyq) * jnp.ones((1, LANES), _F32)],
            axis=1,
        )  # (bt, pad/2 + 128), packed one-sided
        m_ref[:] = jax.lax.dot_general(
            p, fb_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return
    cr, ci = _fft_steps_real(xw, tuple(tabs), bt, n1)
    if out == "mel":
        # |X|^2 then the mel filterbank contraction — the full power
        # spectrum never leaves VMEM.  fb rows arrive in the kernel's
        # digit bin order (permuted once at trace time).
        p = cr * cr + ci * ci  # (bt, pad)
        m_ref[:] = jax.lax.dot_general(
            p, fb_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.HIGHEST,
        )
    elif out == "power":
        p = cr * cr + ci * ci
        if natural_out:
            # One permute on the power value (vs two on the planes).
            slc = [p[:, k * LANES : (k + 1) * LANES] for k in range(n1)]
            for g, pg in enumerate(_natural_slices_mxu(slc, perm_ref[:], n1)):
                p_ref[:, g * LANES : (g + 1) * LANES] = pg
        else:
            p_ref[:] = p
    elif natural_out:
        perm = perm_ref[:]
        cs = [cr[:, k * LANES : (k + 1) * LANES] for k in range(n1)]
        for g, vg in enumerate(_natural_slices_mxu(cs, perm, n1)):
            yr_ref[:, g * LANES : (g + 1) * LANES] = vg
        cs = [ci[:, k * LANES : (k + 1) * LANES] for k in range(n1)]
        for g, vg in enumerate(_natural_slices_mxu(cs, perm, n1)):
            yi_ref[:, g * LANES : (g + 1) * LANES] = vg
    else:
        yr_ref[:] = cr
        yi_ref[:] = ci


def _digit_to_natural_rows(y: jax.Array, pad: int) -> jax.Array:
    """(..., pad) digit-order rows -> natural bin order (one transpose)."""
    n1 = pad // LANES
    lead = y.shape[:-1]
    return y.reshape(*lead, n1, LANES).swapaxes(-1, -2).reshape(*lead, pad)


def stft_pallas(
    x: jax.Array,
    w: jax.Array,
    nfft: int,
    stride: int,
    total_segs: int,
    pad: int | None = None,
    out: str = "complex",
    segs_per_tile: int | None = None,
    interpret: bool = False,
    fb: jax.Array | None = None,
    packed_half: bool | None = None,
):
    """Fused short-time transform of raw samples.

    x: (..., L) float32; segment s reads x[..., s*stride : +nfft],
    s in [0, total_segs).  Returns natural-order one-sided results of
    shape (..., total_segs, pad//2 + 1):
      out="complex" -> complex spectra (jax.lax.complex of the planes)
      out="power"   -> |X|^2 float32
      out="mel"     -> |X|^2 @ fb.T, (..., total_segs, n_mels): the mel
                       filterbank contraction runs INSIDE the kernel, so
                       the full power spectrum never hits HBM.  fb is
                       the (n_mels, pad//2 + 1) natural-order filterbank.
    """
    if out not in ("complex", "power", "mel"):
        raise ValueError(f"unknown out: {out}")
    if out == "mel" and fb is None:
        raise ValueError("out='mel' requires fb")
    pad = pad or nfft
    if not fused_supported(nfft, pad, stride):
        raise ValueError(
            f"geometry (nfft={nfft}, pad={pad}, stride={stride}) unsupported "
            "by the fused kernel"
        )
    lead = x.shape[:-1]
    lp = pad // 2 + 1
    n_mels = fb.shape[0] if out == "mel" else 0
    if total_segs <= 0:
        z = jnp.zeros(lead + (0, n_mels if out == "mel" else lp), _F32)
        return jax.lax.complex(z, z) if out == "complex" else z

    bt = segs_per_tile or _segs_per_tile(pad)
    bt = min(bt, max(8, total_segs))
    bt = max(8, 1 << (bt.bit_length() - 1))
    n_tiles = pl.cdiv(total_segs, bt)
    T = bt * stride
    P = _phases(stride)
    halo = framing_halo(nfft, stride)
    # Per-frame outputs must be un-permuted from the kernel's class
    # order back to segment order (inverse of frame_class_perm).
    if P > 1:
        import numpy as np

        inv = np.empty(bt, np.int64)
        inv[frame_class_perm(bt, stride)] = np.arange(bt)
        inv = jnp.asarray(inv)
    else:
        inv = None

    x2 = x.reshape(-1, x.shape[-1]).astype(_F32)
    R = x2.shape[0]
    framing = framing_mode(nfft, stride, bt)
    inputs, in_specs, halo = framing_blocks(
        x2, n_tiles, bt, stride, nfft, halo, framing
    )
    blocks = inputs[0]
    inputs.append(jnp.asarray(w, _F32).reshape(1, pad))
    in_specs.append(pl.BlockSpec((1, pad), lambda i: (0, 0), memory_space=pltpu.VMEM))
    from godsp_tpu.ops import pallas_pwelch as _pw

    # packed_half=None resolves the module toggle AT TRACE TIME (the
    # same caveat as every kernel knob: a jitted caller bakes it in).
    # A/B probes and toggle-sensitive callers pass it EXPLICITLY, like
    # pwelch_power_partials' packed_half parameter.
    if packed_half is None:
        packed_half = _pw._half_enabled
    half = out == "mel" and packed_half and rfft_supported_size(pad)
    if out == "mel":
        # fb may be a TRACED array (models.mel passes it through jit):
        # indices are trace-time numpy, the scatter/gather are jnp ops.
        import numpy as np

        n1_ = pad // LANES
        mel_pad = -(-n_mels // LANES) * LANES
        fbT = jnp.zeros((lp, mel_pad), _F32)
        fbT = fbT.at[:, :n_mels].set(jnp.asarray(fb, _F32).T)
        if half:
            # Rows in the kernel's PACKED one-sided order: position
            # j*128 + h*64 + q holds bin (2j+h) + n1*q; the Nyquist
            # weight rides lane pad/2 only (the other 127 broadcast
            # lanes get zero — exact).
            nh = pad // 2
            b = np.arange(nh)
            pos = ((b % n1_) // 2) * LANES + ((b % n1_) % 2) * (
                LANES // 2) + b // n1_
            fbk = jnp.zeros((nh + LANES, mel_pad), _F32)
            fbk = fbk.at[jnp.asarray(pos)].set(fbT[:nh])
            fbk = fbk.at[nh].set(fbT[lp - 1])
        else:
            # digit bin order over the full pad; mirrored half -> zero
            fb_full = jnp.zeros((pad, mel_pad), _F32)
            fb_full = fb_full.at[:lp].set(fbT)
            binidx = (
                np.arange(n1_)[:, None] + n1_ * np.arange(LANES)[None, :]
            ).reshape(-1)
            fbk = fb_full[jnp.asarray(binidx)]
        inputs.append(fbk)
        in_specs.append(
            pl.BlockSpec(fbk.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    if half:
        tabs = _rfft_tables(pad)
        order = ("gr", "gi", "gs", "alt")
    else:
        order, tabs = fft_real_tables(pad)
    from godsp_tpu.ops import pallas_fft as _pf

    # Natural-order emission in-kernel (MXU permute): lane-slice tables
    # only (the batched-3D structure keeps the XLA transpose), and only
    # while the permute's n1^2 lane concats stay cheap (round-3 probes:
    # the fused emission loses to the XLA transpose past n1 = 8).
    natural_kernel = (
        out in ("power", "complex") and _pf._natural_fused
        and len(order) == 3
        and pad // LANES <= _pf._NATURAL_FUSED_MAX_N1
    )
    for key in order:
        t = jnp.asarray(tabs[key])
        inputs.append(t)
        in_specs.append(
            pl.BlockSpec(
                t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM
            )
        )
    if natural_kernel:
        t = jnp.asarray(_natural_perm_np(pad // LANES))
        inputs.append(t)
        in_specs.append(
            pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    # Per-segment outputs: (bt, pad) blocks (bt is a pow2 >= 8, so the
    # 8-sublane rule holds — no unit-sublane trick needed here).
    out_spec = pl.BlockSpec((bt, pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_rows = R * n_tiles * bt
    vma = getattr(jax.typeof(blocks), "vma", None) or frozenset()
    shp = jax.ShapeDtypeStruct((out_rows, pad), _F32, vma=vma)
    n1 = pad // LANES
    cost = pl.CostEstimate(
        flops=int(out_rows * pad * (2 * n1 + 6 * LANES)),
        bytes_accessed=int(4 * (R * n_tiles * (T + halo) + out_rows * pad)),
        transcendentals=0,
    )
    kern = partial(
        _stft_kernel,
        bt=bt, stride=stride, nfft=nfft, pad=pad, halo=halo,
        out=out, natural_out=natural_kernel, framing=framing, half=half,
    )
    call = partial(
        pl.pallas_call,
        kern,
        grid=(R * n_tiles,),
        in_specs=in_specs,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )

    def unpermute(rows, width):
        # (R*n_tiles*bt, width) class order -> segment order, trimmed.
        rows = rows.reshape(R, n_tiles, bt, width)
        if inv is not None:
            rows = jnp.take(rows, inv, axis=2)
        return rows.reshape(R, n_tiles * bt, width)[:, :total_segs]

    def finish(rows):
        # (R*n_tiles*bt, pad) -> (..., total_segs, lp) natural; the
        # digit -> natural pass only when the kernel emitted digit.
        rows = unpermute(rows, pad)
        if not natural_kernel:
            rows = _digit_to_natural_rows(rows, pad)
        rows = rows[..., :lp]
        return rows.reshape(*lead, total_segs, lp)

    if out == "mel":
        mel_pad = -(-n_mels // LANES) * LANES
        m = call(
            out_specs=pl.BlockSpec(
                (bt, mel_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((out_rows, mel_pad), _F32, vma=vma),
        )(*inputs)
        m = unpermute(m, mel_pad)[..., :n_mels]
        return m.reshape(*lead, total_segs, n_mels)
    if out == "power":
        p = call(out_specs=out_spec, out_shape=shp)(*inputs)
        return finish(p)
    yr, yi = call(out_specs=(out_spec, out_spec), out_shape=(shp, shp))(*inputs)
    return jax.lax.complex(finish(yr), finish(yi))
