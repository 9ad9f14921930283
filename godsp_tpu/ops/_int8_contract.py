"""Exact balanced-int8-limb MXU contraction (round-4 precision scheme).

Why: the >=120 dB FFT kernels contract against their DFT/twiddle tables
at f32-equivalent precision.  On this MXU the only f32-accurate matmul
mode is HIGHEST — a 6-pass bf16 limb expansion — and BASELINE.md's
round-3 elimination probes showed the flagship kernel runs within ~16%
of that 6-pass stream's own wall clock: the precision SCHEME is the
floor.  v5e's MXU also runs s8 x s8 -> s32 *exactly* at ~2x the bf16
rate (394 TOPS vs 197 TFLOPS), so the same six >=2^-16-weight limb
cross products cost half the MXU time with int8 operands and exact
int32 accumulation.  This module implements that decomposition.

Scheme (per real matmul x @ T, x f32 (r, c), T a constant table):

  * per-row power-of-2 scale: S_r = 2^(floor(log2 max|x[r,:]|) + 1),
    v = x * (K / S) in [-K, K] with K = 2^23 - 2^15 - 2^8 (~24 bits);
  * BALANCED base-256 digit split (floor ladder with half offsets —
    branch-free, every digit provably lands in int8's [-128, 127], and
    balanced digits mean NO bias constant and therefore no correction
    terms):  v = d0*2^16 + d1*2^8 + d2 + eps,  |eps| <= 1/2;
  * tables are split the same way at trace time in float64 (exact);
  * the six limb products with weight >= 2^-16 (i + j <= 2) are issued
    as THREE stacked int8 matmuls — d0 @ [t0|t1|t2], d1 @ [t0|t1],
    d2 @ [t0] — 384/256/128-lane weights, no wasted columns;
  * int32 partials recombine in f32: (P00 + 2^-8 (P01 + P10)
    + 2^-16 (P11 + P02 + P20)) * (S * 2^32 / K^2)  ==  x @ T.

Error budget: the dropped (1,2)/(2,1)/(2,2) products are the SAME
~2^-24-per-element-relative truncation the hardware's 6-pass bf16
HIGHEST mode makes, and the digit quantization (|eps| <= 1/2 in K
units, i.e. 2^-24 of the row max) matches f32's own rounding — so the
scheme is accuracy-equivalent to HIGHEST (chip-measured ~137 dB on the
FFT flagship, BASELINE.md round 4) at half the MXU passes.

int32 accumulation never overflows: |d| <= 128, 128-deep contraction
=> |P| <= 128*128*128 = 2^21; 3-term recombines stay < 2^23 << 2^31.

Reference analogue: fft/radix2.go:80-153 — the reference's one
perf-critical kernel; this is the precision scheme for its MXU
replacement (ops/pallas_fft.py), selected with set_int8_contraction.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "K_I8",
    "digits3",
    "table_digits_np",
    "stack_tables_np",
    "row_quant_scales",
    "mm_i8_stacked",
    "karatsuba_g_i8",
]

_F32 = jnp.float32
_I8 = jnp.int8
_I32 = jnp.int32
LANES = 128

# Quantization scale: ~24 bits, with headroom so every floor-ladder
# digit provably fits int8 EVEN under worst-case f32 rounding of the
# ladder's own adds (v + B0 near 2^23 has ulp 1: the input |v| may
# exceed K by the one rounding of x*ck, and the add may round up by
# another 1/2 ulp — K leaves > 2^7 slack below the d0 = 128 boundary).
K_I8 = float(2**23 - 2**15 - 2**8)

# Floor-ladder offsets (half units at each level keep the residual
# ranges half-open so the final round never exceeds +127).
_B0 = np.float32(2**15 + 2**7 + 0.5)
_B1 = np.float32(2**7 + 0.5)


def digits3(v):
    """Balanced base-256 digit split of v in [-K_I8, K_I8] (f32).

    Returns (d0, d1, d2) int8 with v == d0*2^16 + d1*2^8 + d2 + eps,
    |eps| <= 1/2.  Branch-free floor ladder; ranges (derived in the
    module docstring's terms):
      d0 = floor((v + 2^15 + 2^7 + .5) * 2^-16)  in [-128, 127]
      r0 = v - d0*2^16                           in [-32896.5, 32639.5)
      d1 = floor((r0 + 2^7 + .5) * 2^-8)         in [-128, 127]
      r1 = r0 - d1*2^8                           in [-128.5, 127.5)
      d2 = floor(r1 + .5)                        in [-128, 127]
    """
    d0 = jnp.floor((v + _B0) * np.float32(2.0**-16))
    r0 = v - d0 * np.float32(65536.0)
    d1 = jnp.floor((r0 + _B1) * np.float32(2.0**-8))
    r1 = r0 - d1 * np.float32(256.0)
    d2 = jnp.floor(r1 + np.float32(0.5))
    return d0.astype(_I8), d1.astype(_I8), d2.astype(_I8)


def row_quant_scales(m):
    """Per-row quantization helpers from a positive row bound m (r, 1).

    Returns (ck, s_out): v = x * ck is the digit-split input (ck = K/S
    with S = 2^(floor(log2 m) + 1) an exact power of two >= m), and
    s_out = S * 2^32 / K^2 converts the recombined limb sum back to
    x @ T units.  Both exact up to one f32 rounding (exp2 of an
    integer-valued float is an exact power of two).
    """
    e = jnp.floor(jnp.log2(jnp.maximum(m, np.float32(1e-30))))
    inv_s = jnp.exp2(-e - np.float32(1.0))
    ck = inv_s * np.float32(K_I8)
    s_out = jnp.exp2(e + np.float32(33.0)) * np.float32(1.0 / (K_I8 * K_I8))
    return ck, s_out


def table_digits_np(t: np.ndarray):
    """Trace-time balanced digit split of a table with |t| <= 1 (f64).

    Same ladder as digits3, in float64 (exact: K_I8*|t| < 2^24 and every
    intermediate is integer-or-half-valued).  Table quantization error
    <= 0.5/K_I8 ~ 2^-24 — the same class as rounding the table to f32.
    """
    v = np.asarray(t, np.float64) * K_I8
    if np.any(np.abs(v) > K_I8):
        raise ValueError("table entries must satisfy |t| <= 1")
    d0 = np.floor((v + float(_B0)) * 2.0**-16)
    r0 = v - d0 * 65536.0
    d1 = np.floor((r0 + float(_B1)) * 2.0**-8)
    r1 = r0 - d1 * 256.0
    d2 = np.floor(r1 + 0.5)
    for d in (d0, d1, d2):
        assert d.min() >= -128 and d.max() <= 127
    return d0.astype(np.int8), d1.astype(np.int8), d2.astype(np.int8)


def stack_tables_np(t: np.ndarray):
    """Table digits pre-stacked for the 3-matmul form.

    Returns (w0, w1, w2) int8 with shapes (c, 3L), (c, 2L), (c, L):
      w0 = [t0 | t1 | t2]   (d0's partner: weights 2^32, 2^24, 2^16)
      w1 = [t0 | t1]        (d1's partner: weights 2^24, 2^16)
      w2 = t0               (d2's partner: weight 2^16)
    Six products total — exactly the i+j <= 2 set, no wasted columns.
    """
    t0, t1, t2 = table_digits_np(t)
    return (
        np.ascontiguousarray(np.concatenate([t0, t1, t2], axis=1)),
        np.ascontiguousarray(np.concatenate([t0, t1], axis=1)),
        np.ascontiguousarray(t0),
    )


_DN = (((1,), (0,)), ((), ()))
_mm = partial(jax.lax.dot_general, dimension_numbers=_DN,
              preferred_element_type=_I32)


def mm_i8_stacked(d, w, out_lanes: int = LANES):
    """Six-limb-product matmul: digits d = (d0, d1, d2) int8 (r, c),
    stacked tables w = (w0, w1, w2) from stack_tables_np.

    Returns int32 partials (q0, q1, q2) at weights (2^0, 2^-8, 2^-16)
    relative — i.e. the recombined value is
        q0 + 2^-8 q1 + 2^-16 q2  ==  (x @ T) * K^2 / (S * 2^32).
    Kept as int32 so callers can fuse further exact adds/subs
    (the Karatsuba +- combines) before the one f32 conversion.
    """
    L = out_lanes
    p0 = _mm(d[0], w[0])  # (r, 3L): P00 | P01 | P02
    p1 = _mm(d[1], w[1])  # (r, 2L): P10 | P11
    p2 = _mm(d[2], w[2])  # (r, L) : P20
    q0 = p0[:, :L]
    q1 = p0[:, L : 2 * L] + p1[:, :L]
    q2 = p0[:, 2 * L :] + p1[:, L:] + p2
    return q0, q1, q2


def _recombine(q, s_out):
    return (
        q[0].astype(_F32)
        + np.float32(2.0**-8) * q[1].astype(_F32)
        + np.float32(2.0**-16) * q[2].astype(_F32)
    ) * s_out


def karatsuba_g_i8(ar, ai, wr, wi, ws, extra_scale: float = 1.0):
    """(ar + i*ai) @ (Gr + i*Gi) via three int8-limb real products.

    ar, ai: f32 (r, c) planes.  wr/wi/ws: stacked int8 digit tables of
    Gr, Gi, Gr+Gi... — NOTE ws must be the digit split of (Gr + Gi)/2
    (halved so |entries| <= 1; the 2x rides the recombination scale).
    extra_scale multiplies the result for free (folded into s_out —
    e.g. an IFFT 1/N, or a chain-stabilizing factor in benchmarks).

    Same Karatsuba form as pallas_fft._karatsuba_g:
        m1 = ar @ Gr, m2 = ai @ Gi, m3 = (ar + ai) @ (Gr + Gi)
        re = m1 - m2,  im = m3 - m1 - m2
    with the +- combines done on the int32 limb partials (exact; bounds
    < 2^23 << 2^31) so each output pays ONE f32 recombination.
    """
    as_ = ar + ai
    m = jnp.max(jnp.abs(ar) + jnp.abs(ai), axis=-1, keepdims=True)
    ck, s_out = row_quant_scales(m)
    s_out = s_out * np.float32(extra_scale)
    dr = digits3(ar * ck)
    di = digits3(ai * ck)
    ds = digits3(as_ * ck)
    L = wr[2].shape[-1]
    q_r = mm_i8_stacked(dr, wr, L)
    q_i = mm_i8_stacked(di, wi, L)
    q_s = mm_i8_stacked(ds, ws, L)  # == m3 / 2 in recombined units
    re = _recombine(tuple(a - b for a, b in zip(q_r, q_i)), s_out)
    im = _recombine(
        tuple(2 * s - a - b for s, a, b in zip(q_s, q_r, q_i)), s_out
    )
    return re, im
