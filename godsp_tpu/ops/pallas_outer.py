"""Fused outer-level DFT kernel for the giant-N FFT plan (fft/large.py).

For N = d1 * d2 * n3 the plan's two outer Cooley-Tukey levels are dense
DFT contractions over the SUBLANE-grouped axes of the (d1*d2, n3) view:

    level 1:  A[k1, i2, t] = sum_i1 F1[k1, i1] x[i1, i2, t]
    twiddle:  A *= W_N^{k1 (i2*n3 + t)}      (factored Ta x Tb tables)
    level 2:  B[k1, k2, t] = sum_i2 F2[k2, i2] A[k1, i2, t]
    twiddle:  B *= W_{d2*n3}^{k2 t}          (Tc table)

Done as XLA einsums these cost ~2.9 ms at 2^24 on v5e — the HIGHEST
(6-pass bf16-limb) contraction streams the whole array from HBM once
per limb pass (chip-measured round 4, tools/probe_giant2.py).  This
kernel instead tiles the lane axis: each grid step loads a
(d1*d2, T) block into VMEM ONCE, runs both contractions (Karatsuba
complex, 3 real matmuls each) and both twiddles on-chip, and stores
once — the limb amplification stays in VMEM, so HBM traffic is a
single read+write pass regardless of precision.

Layout notes (v5e Mosaic):
  - the (d1*d2, T) block reshapes to (d1, d2, T) by splitting the
    SUBLANE dim (row-major; minor dim untouched) — legal and free;
  - level 1 runs as d2 two-dimensional (d1, d1) @ (d1, T) matmuls
    (contraction over rhs dim 0 of a rank-3 operand is not a mapped
    Mosaic pattern; the slice loop is the lane-slice kernel's proven
    idiom);
  - level 2 runs as ONE batched dot_general over k1 with the F2
    weights broadcast — the _fft_steps_real_3d pattern.

Precision: per-level `precision` (HIGHEST default).  The twiddles are
exact f32 VPU multiplies either way.

Reference analogue: the recursion levels of fft/radix2.go:80-153 above
the kernel row size.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from godsp_tpu.fft.four_step import dft_matrix

__all__ = ["outer_dft_split", "outer_supported"]

_F32 = jnp.float32
_LANES = 128


def outer_supported(d1: int, d2: int, n3: int) -> bool:
    """Dense levels (2..128) over a lane-tileable row length.  d2 == 1
    selects the SINGLE-LEVEL form (round 5): one full-width d1
    contraction + its twiddle, no level 2 — the building block of the
    128-peel plan, where every contraction runs at K = 128 (full MXU
    depth) instead of the balanced d1, d2 < 128 split whose K < 128
    passes waste the systolic array (measured ~3.3 pass-equivalents at
    d1=64/d2=32; fft/large.py history)."""
    return 2 <= d1 <= 128 and 1 <= d2 <= 128 and n3 % _LANES == 0


def _pair(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    c32 = lambda v: np.ascontiguousarray(v, dtype=np.float32)
    return c32(a.real), c32(a.imag)


@lru_cache(maxsize=None)
def _outer_tables(d1: int, d2: int, n3: int, T: int, inverse: bool):
    """Trace-time float64 tables (the radix2.go:26-69 cache analogue):
    F1/F2 as (re, im, re+im) Karatsuba triples, Ta (d1, d2), and the
    lane-axis twiddles FACTORED over the lane-tile grid —

        Tb[k1, j*T + t] = W_n^{k1 j T} * W_n^{k1 t}
                        = Tb_hi[k1, j] * Tb_lo[k1, t]

    (same for Tc over d2*n3) — so the kernel sees only (d, n3/T) and
    (d, T) constants.  The unfactored (d, n3) table at the 2^28
    recursive plan is (16, 2^21) = 128 MB per plane: embedded as HLO
    constants it overflowed the remote-compile transport (HTTP 413).
    Angle products k*j*T < 2^53 stay exact in f64; the one extra f32
    rounding of the device-side product costs ~2-3 dB against ~135 dB.
    """
    n = d1 * d2 * n3
    sign = 2j * np.pi if inverse else -2j * np.pi
    f1 = dft_matrix(d1)
    f2 = dft_matrix(d2)
    if inverse:
        f1, f2 = np.conj(f1), np.conj(f2)
    k1 = np.arange(d1, dtype=np.float64)
    k2 = np.arange(d2, dtype=np.float64)
    j = np.arange(n3 // T, dtype=np.float64)
    t = np.arange(T, dtype=np.float64)
    ta = np.exp(sign * np.outer(k1, np.arange(d2, dtype=np.float64) * n3) / n)
    tb_hi = np.exp(sign * np.outer(k1, j * T) / n)
    tb_lo = np.exp(sign * np.outer(k1, t) / n)
    tc_hi = np.exp(sign * np.outer(k2, j * T) / (d2 * n3))
    tc_lo = np.exp(sign * np.outer(k2, t) / (d2 * n3))
    tri = lambda f: (*_pair(f), np.ascontiguousarray(
        (f.real + f.imag), dtype=np.float32))
    return (
        tri(f1), _pair(ta), _pair(tb_hi), _pair(tb_lo),
        tri(f2), _pair(tc_hi), _pair(tc_lo),
    )


# Level-1 structure probe toggle (trace-time): one rank-3 dot_general
# contracting rhs dim 0, vs the d2-loop of 2-D slice matmuls.  Both are
# mathematically identical; which lowers faster on Mosaic is an
# empirical question (tools/probe_outer_l1.py).
_l1_single_dot = False


def set_l1_single_dot(on: bool) -> None:
    global _l1_single_dot
    _l1_single_dot = bool(on)


def _k1_chunk(d1: int, d2: int, T: int) -> int:
    """Level-2 k1-chunk size: keeps each (c, d2, T) temp <= ~2 MB so the
    peak VMEM stack stays bounded by level 1's full-size arrays (the
    whole-block level 2 measured 119.75M scoped at rows*T = 2^21 — over
    the 100M limit)."""
    c = max(1, (1 << 19) // (d2 * T))
    while d1 % c:
        c -= 1
    return c


def _outer_kernel(*refs, d1: int, d2: int, T: int, prec):
    (
        xr_ref, xi_ref,
        f1r, f1i, f1s, tar, tai, tbhr, tbhi, tblr, tbli,
        f2r, f2i, f2s, tchr, tchi, tclr, tcli,
        yr_ref, yi_ref,
    ) = refs
    # Reconstitute this lane tile's twiddle columns: hi[j] * lo (the
    # factored form keeps the HLO constants tiny; see _outer_tables).
    # Column j is selected by an iota mask-and-reduce — Mosaic has no
    # dynamic_slice lowering; the 0/1 multiply is exact.
    j = pl.program_id(1)

    def col(ref):
        v = ref[:]
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, v.shape[1]), 1) == j
        ).astype(_F32)
        return jnp.sum(v * sel, axis=1, keepdims=True)  # (d, 1)

    bh_r, bh_i = col(tbhr), col(tbhi)
    tbr = bh_r * tblr[:] - bh_i * tbli[:]  # (d1, T)
    tbi = bh_r * tbli[:] + bh_i * tblr[:]

    mm2 = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=_F32, precision=prec,
    )

    def kara(mr, mi, ms, vr, vi):
        m1 = mr(vr)
        m2 = mi(vi)
        m3 = ms(vr + vi)
        return m1 - m2, m3 - m1 - m2

    if d2 == 1:
        # ---- Single-level form (128-peel building block): one
        # (d1, d1) @ (d1, T) contraction + the Tb twiddle, store.
        # Ta and Tc are all-ones at d2 == 1 (k2 == 0, i2 == 0).
        ar, ai = kara(
            lambda v: mm2(f1r[:], v),
            lambda v: mm2(f1i[:], v),
            lambda v: mm2(f1s[:], v),
            xr_ref[:].reshape(d1, T), xi_ref[:].reshape(d1, T),
        )
        yr_ref[0] = ar * tbr - ai * tbi
        yi_ref[0] = ar * tbi + ai * tbr
        return

    ch_r, ch_i = col(tchr), col(tchi)
    tcr = ch_r * tclr[:] - ch_i * tcli[:]  # (d2, T)
    tci = ch_r * tcli[:] + ch_i * tclr[:]
    xr = xr_ref[:].reshape(d1, d2, T)
    xi = xi_ref[:].reshape(d1, d2, T)

    if _l1_single_dot:
        # ---- Level 1 as ONE rank-3 contraction over rhs dim 0 ----
        ar, ai = kara(
            lambda v: mm2(f1r[:], v),
            lambda v: mm2(f1i[:], v),
            lambda v: mm2(f1s[:], v),
            xr, xi,
        )  # (d1, d2, T)
    else:
        # ---- Level 1: d2 slice matmuls (d1, d1) @ (d1, T) ----
        ars, ais = [], []
        for i2 in range(d2):
            ar, ai = kara(
                lambda v: mm2(f1r[:], v),
                lambda v: mm2(f1i[:], v),
                lambda v: mm2(f1s[:], v),
                xr[:, i2, :], xi[:, i2, :],
            )
            ars.append(ar[:, None, :])
            ais.append(ai[:, None, :])
        ar = jnp.concatenate(ars, axis=1)  # (d1, d2, T)
        ai = jnp.concatenate(ais, axis=1)

    # ---- Twiddles + level 2, in k1 chunks (bounds peak VMEM) ----
    c = _k1_chunk(d1, d2, T)
    dn_b = (((2,), (1,)), ((0,), (0,)))
    mmb = partial(
        jax.lax.dot_general, dimension_numbers=dn_b,
        preferred_element_type=_F32, precision=prec,
    )
    tc_r, tc_i = tcr[:][None, :, :], tci[:][None, :, :]
    for k0 in range(0, d1, c):
        sl = slice(k0, k0 + c)
        # Level-1 twiddle: Ta (c, d2) x Tb (c, T), exact f32 VPU.
        ta_r, ta_i = tar[sl][:, :, None], tai[sl][:, :, None]
        tb_r, tb_i = tbr[sl][:, None, :], tbi[sl][:, None, :]
        twr = ta_r * tb_r - ta_i * tb_i
        twi = ta_r * tb_i + ta_i * tb_r
        br = ar[sl] * twr - ai[sl] * twi
        bi = ar[sl] * twi + ai[sl] * twr
        # Level 2: batched contraction over i2 (k1-chunk batched).
        w = lambda t: jnp.broadcast_to(t[:], (c, d2, d2))
        cr, ci = kara(
            lambda v: mmb(w(f2r), v),
            lambda v: mmb(w(f2i), v),
            lambda v: mmb(w(f2s), v),
            br, bi,
        )
        # Level-2 twiddle: Tc (d2, T) broadcast over the chunk.
        yr = cr * tc_r - ci * tc_i
        yi = cr * tc_i + ci * tc_r
        rows = slice(k0 * d2, (k0 + c) * d2)
        yr_ref[0, rows, :] = yr.reshape(c * d2, T)
        yi_ref[0, rows, :] = yi.reshape(c * d2, T)


def outer_dft_split(
    xr: jax.Array,
    xi: jax.Array,
    d1: int,
    d2: int,
    inverse: bool = False,
    lane_tile: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Both outer DFT levels + twiddles of the (d1, d2, n3) plan over
    (..., d1*d2, n3) float32 planes, in ONE HBM pass.

    Output element [k1*d2 + k2, t] = (level-2 twiddled) partial DFT —
    rows are ready for the kernel row FFT over t (fft/large.py level 3).
    """
    if xr.shape != xi.shape:
        raise ValueError("re/im planes must have identical shapes")
    rows, n3 = xr.shape[-2], xr.shape[-1]
    if rows != d1 * d2:
        raise ValueError(f"row dim {rows} != d1*d2 = {d1 * d2}")
    if not outer_supported(d1, d2, n3):
        raise ValueError(f"unsupported outer plan ({d1}, {d2}, {n3})")
    # Live per grid step: double-buffered in/out windows (8 arrays) +
    # the level-1 result and its slice list (~4 more), each (rows, T)
    # f32.  rows*T = 2^21 measured 137 M — OVER the 128 M physical VMEM
    # (chip OOM at 2^28); rows*T <= 2^20 compiles and runs (~60-70 M).
    # rows > 8192 cannot reach a 128-lane tile under that bound — the
    # caller keeps the einsum path there (fft/large.py gate).
    T = lane_tile or min(n3, max(_LANES, (1 << 20) // rows))
    if n3 % T:
        raise ValueError(f"lane tile {T} must divide n3 = {n3}")
    if rows * T > (1 << 20):
        raise ValueError(
            f"rows*T = {rows * T} exceeds the VMEM-safe bound 2^20 "
            f"(rows = {rows} needs lane_tile <= {(1 << 20) // rows})"
        )

    lead = xr.shape[:-2]
    B = int(np.prod(lead, dtype=np.int64)) if lead else 1
    xr3 = xr.reshape(B, rows, n3)
    xi3 = xi.reshape(B, rows, n3)

    f1t, ta, tb_hi, tb_lo, f2t, tc_hi, tc_lo = _outer_tables(
        d1, d2, n3, T, inverse
    )
    tables = [
        jnp.asarray(t)
        for t in (*f1t, *ta, *tb_hi, *tb_lo, *f2t, *tc_hi, *tc_lo)
    ]
    # Every table is small (the lane-axis twiddles arrive factored);
    # whole-block specs, the kernel selects its hi column by program_id.
    tbl_specs = [
        pl.BlockSpec(
            t.shape, lambda b, j, nd=t.ndim: (0,) * nd,
            memory_space=pltpu.VMEM,
        )
        for t in tables
    ]

    spec = pl.BlockSpec(
        (1, rows, T), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM
    )
    vma = getattr(jax.typeof(xr3), "vma", None) or frozenset()
    flops = 6 * B * rows * n3 * (d1 + d2) * 2
    yr, yi = pl.pallas_call(
        partial(_outer_kernel, d1=d1, d2=d2, T=T, prec=precision),
        grid=(B, n3 // T),
        in_specs=[spec, spec] + tbl_specs,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, rows, n3), _F32, vma=vma),
            jax.ShapeDtypeStruct((B, rows, n3), _F32, vma=vma),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=int(4 * B * rows * n3 * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xr3, xi3, *tables)
    return yr.reshape(*lead, rows, n3), yi.reshape(*lead, rows, n3)


# ---------------------------------------------------------------------------
# Fused last-peel + row-FFT kernel (round 5).
#
# In the 128-peel plan the LAST peel's natural unit of work is a
# (128, n3) block: one d=128 sublane contraction + its twiddle yields
# 128 COMPLETE length-n3 rows — exactly what the row FFT consumes next.
# Running the row FFT (the lane-slice structure of ops/pallas_fft) on
# that block while it is still in VMEM merges the plan's two middle
# HBM passes into one: load once, level + twiddle + row FFT, store
# digit-order rows.  Eligible for n3 <= 8192 (n1 = n3/128 <= 64, where
# the lane-slice row structure holds; 2^28's n3 = 16384 keeps the
# unfused path).  Chip A/B: tools/probe_peel.py / bench giant section.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _peel_rows_tables(n3: int, inverse: bool):
    """F(128) Karatsuba triple + the (128, n3) last-peel twiddle
    (exact f64 angles; the table is small enough to embed whole)."""
    n = 128 * n3
    sign = 2j * np.pi if inverse else -2j * np.pi
    f1 = dft_matrix(128)
    if inverse:
        f1 = np.conj(f1)
    k1 = np.arange(128, dtype=np.float64)
    t = np.arange(n3, dtype=np.float64)
    tb = np.exp(sign * np.outer(k1, t) / n)
    c32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    return (
        c32(f1.real), c32(f1.imag), c32(f1.real + f1.imag),
        c32(tb.real), c32(tb.imag),
    )


def peel_rows_supported(n3: int) -> bool:
    from godsp_tpu.ops.pallas_fft import _use_laneslice

    return (
        n3 % _LANES == 0
        and 2 <= n3 // _LANES <= 64
        and _use_laneslice(n3 // _LANES)
    )


def _peel_rows_kernel(*refs, n3: int, nb: int, inverse: bool, prec):
    from godsp_tpu.ops.pallas_fft import _dft_slices, _karatsuba_g

    (xr_ref, xi_ref, f1r, f1i, f1s, tbr, tbi, gr, gi, gs,
     yr_ref, yi_ref) = refs
    n1 = n3 // _LANES
    mm = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    for b in range(nb):
        xr = xr_ref[b]  # (128, n3)
        xi = xi_ref[b]
        # ---- last-peel level: F(128) @ x, Karatsuba complex ----
        m1 = mm(f1r[:], xr)
        m2 = mm(f1i[:], xi)
        m3 = mm(f1s[:], xr + xi)
        ar, ai = m1 - m2, m3 - m1 - m2
        # ---- twiddle (exact f32 VPU) ----
        vr = ar * tbr[:] - ai * tbi[:]
        vi = ar * tbi[:] + ai * tbr[:]
        # ---- row FFT over lanes: the lane-slice structure ----
        pairs = [
            (vr[:, k * _LANES : (k + 1) * _LANES],
             vi[:, k * _LANES : (k + 1) * _LANES])
            for k in range(n1)
        ]
        A = _dft_slices(pairs, inverse)
        for k1 in range(n1):
            cr, ci = _karatsuba_g(A[k1][0], A[k1][1], k1, (gr, gi, gs))
            yr_ref[b, :, k1 * _LANES : (k1 + 1) * _LANES] = cr
            yi_ref[b, :, k1 * _LANES : (k1 + 1) * _LANES] = ci


def peel_rows_fused_split(
    xr: jax.Array,
    xi: jax.Array,
    inverse: bool = False,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused (d=128 peel + row FFT) over (..., 128, n3) float32 planes.

    Each (128, n3) batch element is one independent length-128*n3
    sub-transform: output row k1 holds the DIGIT-ORDER row FFT of the
    twiddled level-k1 partial — identical data to
    outer_dft_split(d1=128, d2=1) followed by fft_pow2_split(order=
    "digit"), in ONE HBM pass instead of two.
    """
    from godsp_tpu.ops.pallas_fft import _ls_tables

    if xr.shape != xi.shape:
        raise ValueError("re/im planes must have identical shapes")
    d, n3 = xr.shape[-2], xr.shape[-1]
    if d != 128 or not peel_rows_supported(n3):
        raise ValueError(f"unsupported fused peel-rows shape ({d}, {n3})")
    lead = xr.shape[:-2]
    B = int(np.prod(lead, dtype=np.int64)) if lead else 1
    xr3 = xr.reshape(B, 128, n3)
    xi3 = xi.reshape(B, 128, n3)

    # Batch elements per grid step: ~2-4 MB blocks keep the DMA fat.
    nb = max(1, (1 << 20) // (128 * n3))
    while B % nb:
        nb -= 1

    f1r, f1i, f1s, tbr, tbi = (
        jnp.asarray(t) for t in _peel_rows_tables(n3, inverse)
    )
    lt = _ls_tables(n3, inverse, digit_in=False)
    gr, gi, gs = (jnp.asarray(lt[k]) for k in ("gr", "gi", "gs"))
    tables = [f1r, f1i, f1s, tbr, tbi, gr, gi, gs]
    tbl_specs = [
        pl.BlockSpec(
            t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )
        for t in tables
    ]
    spec = pl.BlockSpec(
        (nb, 128, n3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vma = getattr(jax.typeof(xr3), "vma", None) or frozenset()
    n1 = n3 // _LANES
    flops = 6 * B * 128 * n3 * (128 + _LANES) * 2
    yr, yi = pl.pallas_call(
        partial(_peel_rows_kernel, n3=n3, nb=nb, inverse=inverse,
                prec=precision),
        grid=(B // nb,),
        in_specs=[spec, spec] + tbl_specs,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, 128, n3), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, 128, n3), jnp.float32, vma=vma),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=int(4 * B * 128 * n3 * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xr3, xi3, *tables)
    return yr.reshape(*lead, 128, n3), yi.reshape(*lead, 128, n3)
