"""Fused batched power-of-2 FFT as a Pallas TPU kernel.

The speed-of-light path for the BASELINE roofline target: the pure-XLA
four-step (fft/four_step.py) materializes every stage to HBM (~6 passes,
~16% of roofline measured); this kernel keeps one batch tile's ENTIRE
transform in VMEM — HBM traffic is one read and one write per element —
with the DFT factor contractions on the MXU.

Measured on a v5e chip (two-chain-length differential timing at heavy
depth — shallow chains are flattered by tunnel-RTT noise; see
utils.metrics.time_chain_diff), lane-slice structure (see below),
n=1024 batch=16384: ~138 dB at 0.36-0.61 ms across the chip's bimodal
clock windows (best measured 0.36 ms = 0.90 of the 819 GB/s
per-direction HBM roofline; slow-window medians ~0.53 ms = 0.61;
batched-3D structure: 1.05 ms), vs jnp.fft.fft ~2.4 ms and the
four-step XLA path ~1.6 ms.  BASELINE.md carries the full round-2
analysis: the structure is NOT MAC-bound (HIGHEST = DEFAULT precision
in time), and the binding constraint is the slice store/feed pipeline
at the day's copy ceiling.

Layout: split-complex (re, im) float32 planes of shape (batch, N).
Pallas TPU has no complex dtype, and this environment's TPU transport
cannot move complex buffers anyway, so split planes are the native
interface; fft/core.py and ops/pallas_pwelch.py bridge to it.

Mosaic layout discipline (probed empirically on v5e):
  * the minor (lane) dimension must stay a multiple of 128 — so the
    factor split is N = n1 x 128 with i2 on the lanes;
  * (bt, N) <-> (bt, n1, 128) reshapes are legal; transposes of the two
    minor dims and strided lane stores are NOT — so the kernel emits the
    four-step's digit-TRANSPOSED order (k1-major) and the wrapper fixes
    it with one XLA transpose when natural order is requested.  Fused
    consumers (the Pwelch kernel) keep digit order and permute their
    tiny reduced outputs instead, making the reorder free;
  * matmul precision: Mosaic supports DEFAULT (1-pass bf16, ~52 dB) and
    HIGHEST (6-pass bf16 limb expansion, ~141 dB) only.  The kernels use
    HIGHEST everywhere: a manual 3-limb-product "fast" mode (~105 dB)
    was benchmarked SLOWER than HIGHEST in this structure (the bound is
    DMA/VPU work, not MXU passes) while failing the 120 dB parity bar,
    so it was removed (round-2 simplification; BASELINE.md).

Per batch tile (bt, N), with n = i1*128 + i2:
  A[b, k1, i2] = sum_{i1} F1[k1, i1] x[b, i1, i2]   (MXU; exact VPU
                  radix-2/4 butterflies when n1 <= 4, whose DFT entries
                  are all +-1/+-i)
  B            = A * T[k1, i2]                      (VPU twiddle)
  C[b, k1, k2] = sum_{i2} B[b, k1, i2] F2[i2, k2]   (MXU, contract lanes,
                  3-multiply Karatsuba complex product)
  X[b, k1 + n1*k2] = C[b, k1, k2]  (digit order: stored at k1*128 + k2)

Reference parity: same transform as fft/radix2.go:80-153 (golden-tested
through fft/core.py dispatch and directly in tests/test_pallas.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from godsp_tpu.fft.four_step import dft_matrix, twiddle_2d

__all__ = [
    "fft_pow2_split",
    "digit_to_natural",
    "ifft_pow2_digit_split",
    "rfft_pow2_split",
    "rfft_supported_size",
    "rfft_packed_to_natural",
    "supported_size",
    "default_batch_tile",
    "LANES",
]

_F32 = jnp.float32
_BF16 = jnp.bfloat16
_np_bf16 = ml_dtypes.bfloat16
_HI = jax.lax.Precision.HIGHEST
LANES = 128


def supported_size(n: int) -> bool:
    """Power-of-2 sizes with n/128 in [2, 128]: 256..16384."""
    return n & (n - 1) == 0 and 256 <= n <= 16384


def default_batch_tile(n: int) -> int:
    """Batch rows per grid step (tuned on v5e with the 64 MB VMEM cap;
    ~10 live (bt, n) f32 arrays per step plus the G tables).  n=8192:
    bt=64 measured 0.59-0.62 ms vs bt=32's 0.69-0.74 at batch=2048
    (round-4 probe_r4 sweep — VERDICT r3 item 4); 16384's split-DIF
    keeps bt=32 (both halves' pipelines live across the recombination)."""
    if n >= 16384:
        return 32
    if n >= 8192:
        return 64
    if n >= 4096:
        return 64
    return 256


@lru_cache(maxsize=None)
def _tables(n: int, inverse: bool, scale: float = 1.0):
    """Kernel constant tables for n = n1*128, as float32 + bf16 hi/lo.
    scale multiplies F2 (folds e.g. the IFFT 1/N into the contraction)."""
    n1 = n // LANES
    f1 = dft_matrix(n1)
    t = twiddle_2d(n1, LANES)
    f2 = dft_matrix(LANES) * scale  # symmetric
    if inverse:
        f1, t, f2 = np.conj(f1), np.conj(t), np.conj(f2)
    c32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)

    f2s = f2.real + f2.imag
    return {
        "f1r": c32(f1.real), "f1i": c32(f1.imag), "f1s": c32(f1.real + f1.imag),
        "tr": c32(t.real), "ti": c32(t.imag),
        "f2r": c32(f2.real), "f2i": c32(f2.imag), "f2s": c32(f2s),
    }


_TABLE_ORDER = ["f1r", "f1i", "f1s", "tr", "ti", "f2r", "f2i", "f2s"]


# ---------------------------------------------------------------------------
# Lane-slice kernel structure (the fast path for n1 <= _LS_MAX_N1, N <= 8192).
#
# Instead of (bt, N) -> (bt, n1, 128) reshapes and 3-D batched dots — which
# cost Mosaic relayouts on every intermediate — the kernel works on n1
# aligned LANE SLICES x[:, k*128:(k+1)*128] of the 2-D block:
#   * step 1 (DFT over i1) is a radix-2 butterfly network across the
#     slice list with python-constant scalar twiddles (pure VPU FMAs,
#     5·n1·log2(n1) flops instead of the batched-matmul's 8·n1²);
#   * the twiddle step is FOLDED into step 3: per-k1 combined tables
#     G[k1] = diag(T[k1,:]) @ F2, so step 2+3 is one (bt,128)@(128,128)
#     Karatsuba matmul triple per k1 — MXU-ideal 2-D shapes, no batch
#     dims, no separate twiddle pass.
# Measured on v5e (HIGHEST, heavy-depth timing): n=1024 0.52 ms vs
# 1.05 ms for the batched-3D structure (~0.63 of HBM roofline at
# ~138 dB); n=8192 0.73 vs 1.06 ms.  At n1=128 (n=16384) the lane-slice
# form collapses (9.2 ms on chip), so that size runs the split-DIF
# structure below (two n1=64 pipelines behind an in-VMEM butterfly).
# ---------------------------------------------------------------------------

_LS_MAX_N1 = 64

_LS_ORDER = ["gr", "gi", "gs"]

# Known interpreter-mode corner (root-caused in round 2): under
# shard_map + force_tpu_interpret_mode, pallas calls route to the MOSAIC
# interpreter (not the HLO interpreter of interpret=True), whose
# io_callback-based buffer allocator deadlocks across concurrent virtual
# devices — all device threads pile up in _allocate_buffer
# (interpret_pallas_call.py).  A jax limitation, not a kernel bug:
# interpret=True under shard_map works, as does the compiled TPU path.
# The sharded integration tests toggle this off to exercise the data
# plumbing through the batched-3D structure (which happens not to trip
# the allocator race); the lane-slice structure itself is covered
# standalone (tests/test_pallas.py) and on hardware.
_ls_enabled = True


def set_laneslice_enabled(on: bool) -> None:
    """Select the kernel structure globally (True = lane-slice for
    n1 <= _LS_MAX_N1, the fast path; False = batched-3D everywhere)."""
    global _ls_enabled
    _ls_enabled = bool(on)


def _use_laneslice(n1: int) -> bool:
    return _ls_enabled and n1 <= _LS_MAX_N1


# Natural-order emission inside the lane-slice kernel (the MXU permute,
# see _permute_lanes_mxu).  Toggleable so the chip benchmark can compare
# against the XLA digit->natural transpose it replaces.
#
# Size gate (round-3 chip probes): the in-kernel permute builds each of
# the n1 natural slices from n1 column windows — n1^2 lane concats — so
# its cost explodes with n1: n=1024 fused 0.67 ms vs 0.87 digit+XLA
# (WIN), n=4096 fused 2.31 vs 1.28 (LOSS), n=8192 fused ~5 ms (LOSS).
_natural_fused = True
_NATURAL_FUSED_MAX_N1 = 8


def set_natural_fused(on: bool) -> None:
    """Select how order="natural" is produced on the lane-slice path:
    True = in-kernel MXU permutation (no XLA transpose pass), False =
    digit-order kernel + XLA transpose."""
    global _natural_fused
    _natural_fused = bool(on)


@lru_cache(maxsize=None)
def _ls_tables(n: int, inverse: bool, digit_in: bool, scale: float = 1.0):
    """Per-k1 fused twiddle+DFT tables, float32.

    forward / natural-in inverse: G[k1][i2, k2] = T[k1, i2] * F2[i2, k2]
    digit-in inverse:             G[k1][k2, i2] = F2c[k2, i2] * Tc[k1, i2]
    scale multiplies the tables (folds e.g. the IFFT 1/N for free).
    """
    n1 = n // LANES
    t = twiddle_2d(n1, LANES)
    f2 = dft_matrix(LANES) * scale
    if inverse:
        t, f2 = np.conj(t), np.conj(f2)
    if digit_in:
        g = t[:, None, :] * f2[None, :, :]  # [k1][k2, i2]
    else:
        g = t[:, :, None] * f2[None, :, :]  # [k1][i2, k2]
    c32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)

    gs = g.real + g.imag
    return {"gr": c32(g.real), "gi": c32(g.imag), "gs": c32(gs)}


_SHARED_ORDER = [
    "tr", "ti",
    "f2r_h", "f2r_m", "f2r_l",
    "f2i_h", "f2i_m", "f2i_l",
    "f2s_h", "f2s_m", "f2s_l",
]


@lru_cache(maxsize=None)
def _ls_tables_shared_base(n: int, inverse: bool, scale: float = 1.0):
    """cs-independent part of the shared-F2 tables: the unreplicated
    (n1, 128) twiddle planes and the F2 / i·F2 / (F2r+F2i) trace-time
    3-limb bf16 splits (so DEFAULT-precision matmuls against them are
    exact per limb).  scale folds into F2."""
    n1 = n // LANES
    t = twiddle_2d(n1, LANES)
    f2 = dft_matrix(LANES) * scale
    if inverse:
        t, f2 = np.conj(t), np.conj(f2)
    c32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    out = {"tr": c32(t.real), "ti": c32(t.imag)}
    for name, mat in (
        ("f2r", f2.real), ("f2i", f2.imag), ("f2s", f2.real + f2.imag)
    ):
        for suffix, limb in zip("hml", _limb3_np(mat)):
            out[f"{name}_{suffix}"] = limb
    return out


def _ls_tables_shared(n: int, inverse: bool, cs: int, scale: float = 1.0):
    """Tables for the shared-F2 lane-slice kernel (see the shared-F2
    block comment above _limb3), with the twiddle repeated to the
    stacked (n1*cs, 128) row layout.  The repeat happens here, OUTSIDE
    the cache: only the cs-independent base tables are lru_cached, so
    sweeping cs (tools/probe_chunk.py) cannot grow the cache without
    bound."""
    base = _ls_tables_shared_base(n, inverse, scale)
    out = dict(base)
    # rows [k1*cs, (k1+1)*cs) = T[k1]
    out["tr"] = np.ascontiguousarray(np.repeat(base["tr"], cs, axis=0))
    out["ti"] = np.ascontiguousarray(np.repeat(base["ti"], cs, axis=0))
    return out


@lru_cache(maxsize=None)
def _f1_scalars(n1: int, inverse: bool):
    """n1-point DFT twiddles for the radix-2 slice network, as python
    float pairs per (stage block size m, j): w = exp(∓2πi j/m)."""
    import math

    sign = 1.0 if inverse else -1.0
    out = {}
    m = 2
    while m <= n1:
        for j in range(m // 2):
            ang = sign * 2.0 * math.pi * j / m
            out[(m, j)] = (math.cos(ang), math.sin(ang))
        m *= 2
    return out


def _cmul_scalar(pair, wr: float, wi: float):
    """(re, im|None) * (wr + i wi) with None == structural zero."""
    re, im = pair
    if wr == 1.0 and wi == 0.0:
        return pair
    if im is None:
        return (re * wr, re * wi if wi != 0.0 else None)
    if wi == 0.0:
        return (re * wr, im * wr)
    return (re * wr - im * wi, re * wi + im * wr)


def _cadd(a, b):
    (ar, ai), (br, bi) = a, b
    if ai is None:
        return (ar + br, bi)
    if bi is None:
        return (ar + br, ai)
    return (ar + br, ai + bi)


def _csub(a, b):
    (ar, ai), (br, bi) = a, b
    if ai is None:
        return (ar - br, None if bi is None else -bi)
    if bi is None:
        return (ar - br, ai)
    return (ar - br, ai - bi)


def _dft_slices(pairs, inverse: bool):
    """In-register n1-point DFT across a list of (re, im|None) slices.

    Radix-2 DIT, statically unrolled; twiddles are python constants so
    everything lowers to VPU scalar-FMA ops.  Returns a list of
    (re, im) pairs (im never None on output for n1 >= 2... except pure
    real inputs keep None where the math is exactly real).
    """
    n1 = len(pairs)
    if n1 == 1:
        return list(pairs)
    bits = n1.bit_length() - 1
    a = [pairs[int(format(i, f"0{bits}b")[::-1], 2)] for i in range(n1)]
    tw = _f1_scalars(n1, inverse)
    m = 2
    while m <= n1:
        half = m // 2
        for start in range(0, n1, m):
            for j in range(half):
                wr, wi = tw[(m, j)]
                u = a[start + j]
                v = _cmul_scalar(a[start + j + half], wr, wi)
                a[start + j] = _cadd(u, v)
                a[start + j + half] = _csub(u, v)
        m *= 2
    return a


def _karatsuba_g(ar, ai, k1: int, tabs):
    """(ar + i·ai) @ G[k1] as 3 MXU matmuls; ai=None == zero imag.

    tabs follow _LS_ORDER: (gr, gi, gs) float32, contracted at HIGHEST
    (the 6-pass bf16 limb expansion — the minimum for >=120 dB).
    """
    dn = (((1,), (0,)), ((), ()))
    mm = partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=_F32, precision=_HI,
    )
    gr, gi, gs = tabs
    m1 = mm(ar, gr[k1])
    m3 = mm(ar if ai is None else ar + ai, gs[k1])
    m2 = None if ai is None else mm(ai, gi[k1])
    if m2 is None:
        return m1, m3 - m1
    return m1 - m2, m3 - m1 - m2


@lru_cache(maxsize=None)
def _natural_perm_np(n1: int) -> np.ndarray:
    """(128, 128) one-hot P with P[k1*m + j, k1 + n1*j] = 1, m = 128/n1.

    Right-multiplying the per-output-slice window concat
    W_g = [C[0][:, g*m:(g+1)*m] | ... | C[n1-1][:, g*m:(g+1)*m]] by P
    places bin k1 + n1*(g*m + j) at lane k1 + n1*j — i.e. output slice g
    of the NATURAL bin order, computed entirely in-kernel."""
    m = LANES // n1
    p = np.zeros((LANES, LANES), np.float32)
    for k1 in range(n1):
        for j in range(m):
            p[k1 * m + j, k1 + n1 * j] = 1.0
    return p


def _permute_lanes_mxu(w, p):
    """Exact f32 lane permutation w @ P on the MXU.

    Static lane gathers relayout poorly on Mosaic (probed: +0.34 ms
    repeat+select at n=1024), but the kernel is slice store/feed-bound,
    NOT MAC-bound (BASELINE.md round-2 probes: DEFAULT ≈ HIGHEST, matmul
    count barely moves it) — so spending MXU passes on the permutation
    is nearly free.  Exactness: split w into its 3 bf16 limbs (8+8+8
    mantissa bits = f32's 24); each limb and the one-hot P are
    bf16-representable, so three DEFAULT-precision matmuls accumulate
    the permutation bit-exactly — for limbs in bf16's NORMAL range,
    i.e. |w| >~ 2^-110.  Below that the lo/mid limbs underflow (TPU
    flushes subnormals) and the permuted value degrades gracefully to
    ~2^-16 relative error, still far beyond the 120 dB parity bound."""
    hi = w.astype(_BF16).astype(_F32)
    r = w - hi
    mid = r.astype(_BF16).astype(_F32)
    lo = r - mid
    dn = (((1,), (0,)), ((), ()))
    mm = partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=_F32,
    )
    return mm(hi, p) + mm(mid, p) + mm(lo, p)


def _natural_slices_mxu(C, p, n1: int):
    """Digit slices C[k1] (bt, 128) -> list of NATURAL output slices.

    Natural slice g gathers column window [g*m, (g+1)*m) of every digit
    slice and lane-interleaves them via one P multiply (exact, see
    _permute_lanes_mxu)."""
    m = LANES // n1
    out = []
    for g in range(n1):
        w = jnp.concatenate(
            [C[k1][:, g * m : (g + 1) * m] for k1 in range(n1)], axis=1
        )
        out.append(_permute_lanes_mxu(w, p))
    return out


# ---------------------------------------------------------------------------
# Shared-F2 contraction (round-3 structure, probed on v5e).
#
# The per-slice fused tables G[k1] = diag(T[k1]) @ F2 make every grid
# step issue n1 x 3 SMALL (bt, 128)@(128, 128) matmuls with DIFFERENT
# weights — and the round-2/3 anatomy probes show the kernel is bound by
# exactly that: matmul count/weight swaps, not FLOPs (DEFAULT precision
# measures the same as 6-pass HIGHEST; see BASELINE.md).  So un-fold the
# twiddle back out of the contraction:
#     C[k1] = (A[k1] * T[k1]) @ F2          (same math, associativity)
# The twiddle multiply is a cheap VPU elementwise pass in VMEM (the
# round-1 reason for folding — an extra HBM pass — never applied inside
# the kernel), and the F2 contraction now has ONE weight matrix shared
# by every slice: stack the n1 twiddled slices along sublanes into
# (n1*cs, 128) and contract once.  HIGHEST-equivalent precision is
# hand-rolled: split the stacked data into its 3 bf16 limbs (exact,
# 8+8+8 of f32's 24 mantissa bits), precompute F2's limbs at trace time,
# and accumulate the 6 >=2^-16 cross products — 6 big matmuls per
# Karatsuba product, 18 per grid step, vs 18*n1 small weight-swapping
# passes before.  Same FLOPs, ~n1x fewer weight loads.
# ---------------------------------------------------------------------------

_C6 = ((0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (2, 0))  # limb pairs >= 2^-16


def _limb3(x):
    """Exact 3-limb bf16 decomposition of f32 (hi + mid + lo == x)."""
    hi = x.astype(_BF16).astype(_F32)
    r = x - hi
    mid = r.astype(_BF16).astype(_F32)
    return hi, mid, r - mid


def _limb3_np(a: np.ndarray):
    """Trace-time 3-limb split of a table: round to f32, then the exact
    bf16 limb decomposition (hi + mid + lo == the f32 value; lo's
    remaining <=8 mantissa bits are bf16-representable by construction).
    """
    x = np.asarray(a, np.float32)
    hi = x.astype(_np_bf16).astype(np.float32)
    r = x - hi
    mid = r.astype(_np_bf16).astype(np.float32)
    return hi, mid, r - mid


def _mm_limbs(zl, fl, combos=_C6):
    """sum of zl[a] @ fl[b] over limb pairs — the hand-rolled HIGHEST."""
    dn = (((1,), (0,)), ((), ()))
    mm = partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=_F32,
    )
    acc = None
    for a, b in combos:
        t = mm(zl[a], fl[b])
        acc = t if acc is None else acc + t
    return acc


# Rows per in-kernel chunk (None = whole block at once).  The VPU
# butterfly network and the MXU G matmuls have a serial dependency
# within one row set; chunking the block's rows lets the hardware run
# chunk j+1's network on the VPU while chunk j's matmuls occupy the MXU
# (in-order issue, async MXU).  Probed on v5e before enabling.
_LS_CHUNK_ROWS = None


def set_ls_chunk_rows(rows: int | None) -> None:
    """Set the lane-slice kernel's internal row-chunk size (None = off)."""
    global _LS_CHUNK_ROWS
    _LS_CHUNK_ROWS = rows


# Grid-dimension semantics for the FFT kernels.  The grid axis is pure
# batch (no cross-step accumulation, unlike the Pwelch/ISTFT kernels),
# so "parallel" is semantically valid and lets Mosaic overlap grid
# steps.  Probed on v5e: same-window anatomy 0.502 vs 0.550 ms; across
# the round-3 sweeps parallel gave the best flagship number (0.436 ms
# digit at n=1024) and cut split2-16384 digit 0.76 -> 0.67 ms, washes
# elsewhere — default parallel, knob for A/B.
_DIM_SEM = ("parallel",)

# Per-size overrides (round-4 probe_r4: at n=8192/bt=64 "arbitrary"
# measured 0.588 vs "parallel" 0.618 ms; parallel stays best at 1024
# and 16384 per the round-3 sweeps).
_DIM_SEM_BY_SIZE = {8192: ("arbitrary",)}


def _dim_sem_for(n: int):
    return _DIM_SEM_BY_SIZE.get(n, _DIM_SEM)


def set_fft_dim_semantics(sem: str) -> None:
    """Set the FFT kernels' default grid semantics ("parallel" or
    "arbitrary"); clears the per-size overrides so A/B probes measure
    exactly what they set."""
    global _DIM_SEM, _DIM_SEM_BY_SIZE
    if sem not in ("parallel", "arbitrary"):
        raise ValueError(f"unknown dimension semantics: {sem}")
    _DIM_SEM = (sem,)
    _DIM_SEM_BY_SIZE = {}


# Shared-F2 structure toggle (complex input only; real-input and
# batched-3D paths keep the fused-G form).
_LS_SHARED = False


def set_ls_shared_f2(on: bool) -> None:
    """Select the lane-slice contraction structure: True = shared-F2
    (separate VPU twiddle + one weight matrix for every slice, 18 big
    limb matmuls per grid step), False = per-slice fused G tables."""
    global _LS_SHARED
    _LS_SHARED = bool(on)


def _fft_kernel_ls_shared(
    *refs, n1: int, inverse: bool, natural_out: bool, cs: int,
):
    """Lane-slice forward (or natural-in inverse) kernel, shared-F2
    contraction (see the block comment above _limb3).  Digit output, or
    natural via the stacked shared-P MXU permutation.  cs = rows per
    chunk (divides the block's bt); the twiddle table is pre-repeated to
    the (n1*cs, 128) stacked layout."""
    xr_ref, xi_ref, *rest = refs
    *tabs, yr_ref, yi_ref = rest
    if natural_out:
        *tabs, p_ref = tabs
    tr_ref, ti_ref, *f2refs = tabs
    tr, ti = tr_ref[:], ti_ref[:]
    f2r = tuple(r[:] for r in f2refs[0:3])
    f2i = tuple(r[:] for r in f2refs[3:6])
    f2s = tuple(r[:] for r in f2refs[6:9])
    p = p_ref[:] if natural_out else None
    pc = ((0, 0), (1, 0), (2, 0))  # data limbs against the one-hot P

    xr = xr_ref[:]
    xi = xi_ref[:]
    bt = xr.shape[0]
    m = LANES // n1
    for j in range(0, bt, cs):
        rows = slice(j, j + cs)
        pairs = [
            (
                xr[rows, k * LANES : (k + 1) * LANES],
                xi[rows, k * LANES : (k + 1) * LANES],
            )
            for k in range(n1)
        ]
        A = _dft_slices(pairs, inverse)
        ar = jnp.concatenate([A[k][0] for k in range(n1)], axis=0)
        ai = jnp.concatenate([A[k][1] for k in range(n1)], axis=0)
        zr = ar * tr - ai * ti
        zi = ar * ti + ai * tr
        m1 = _mm_limbs(_limb3(zr), f2r)
        m2 = _mm_limbs(_limb3(zi), f2i)
        m3 = _mm_limbs(_limb3(zr + zi), f2s)
        cr = m1 - m2
        ci = m3 - m1 - m2
        if not natural_out:
            for k1 in range(n1):
                yr_ref[rows, k1 * LANES : (k1 + 1) * LANES] = (
                    cr[k1 * cs : (k1 + 1) * cs]
                )
                yi_ref[rows, k1 * LANES : (k1 + 1) * LANES] = (
                    ci[k1 * cs : (k1 + 1) * cs]
                )
            continue
        # Natural slice g = lane-interleave of column window g of every
        # digit slice; stack all g along sublanes for ONE shared-P
        # 3-limb multiply (exact, cf. _permute_lanes_mxu).
        def _stack_windows(c):
            return jnp.concatenate(
                [
                    jnp.concatenate(
                        [
                            c[k1 * cs : (k1 + 1) * cs, g * m : (g + 1) * m]
                            for k1 in range(n1)
                        ],
                        axis=1,
                    )
                    for g in range(n1)
                ],
                axis=0,
            )
        pr = _mm_limbs(_limb3(_stack_windows(cr)), (p,), combos=pc)
        pi = _mm_limbs(_limb3(_stack_windows(ci)), (p,), combos=pc)
        for g in range(n1):
            yr_ref[rows, g * LANES : (g + 1) * LANES] = (
                pr[g * cs : (g + 1) * cs]
            )
            yi_ref[rows, g * LANES : (g + 1) * LANES] = (
                pi[g * cs : (g + 1) * cs]
            )


def _fft_kernel_ls(
    *refs, n1: int, inverse: bool, real_input: bool = False,
    natural_out: bool = False,
):
    """Lane-slice forward (or natural-in inverse) kernel; digit output,
    or NATURAL output via the in-kernel MXU permutation (natural_out).

    Inputs are read as ONE whole-block load and sliced as VALUES —
    measurably cheaper than per-slice ref reads (0.31 vs 0.36 ms for a
    pure copy at bt=256, n=1024 on v5e).
    """
    if real_input:
        xr_ref, *rest = refs
        xi_ref = None
    else:
        xr_ref, xi_ref, *rest = refs
    *tabs, yr_ref, yi_ref = rest
    if natural_out:
        *tabs, p_ref = tabs

    xr = xr_ref[:]
    xi = None if real_input else xi_ref[:]
    bt = xr.shape[0]
    cs = _LS_CHUNK_ROWS or bt
    p = p_ref[:] if natural_out else None
    for j in range(0, bt, cs):
        rows = slice(j, min(j + cs, bt))
        pairs = [
            (
                xr[rows, k * LANES : (k + 1) * LANES],
                None if real_input else xi[rows, k * LANES : (k + 1) * LANES],
            )
            for k in range(n1)
        ]
        A = _dft_slices(pairs, inverse)
        C = [_karatsuba_g(A[k1][0], A[k1][1], k1, tabs) for k1 in range(n1)]
        if not natural_out:
            for k1 in range(n1):
                yr_ref[rows, k1 * LANES : (k1 + 1) * LANES] = C[k1][0]
                yi_ref[rows, k1 * LANES : (k1 + 1) * LANES] = C[k1][1]
            continue
        for g, (gr, gi) in enumerate(
            zip(
                _natural_slices_mxu([c[0] for c in C], p, n1),
                _natural_slices_mxu([c[1] for c in C], p, n1),
            )
        ):
            yr_ref[rows, g * LANES : (g + 1) * LANES] = gr
            yi_ref[rows, g * LANES : (g + 1) * LANES] = gi


def _ifft_digit_in_kernel_ls(*refs, n1: int):
    """Lane-slice inverse consuming digit order; natural output.

    Per-k1 contraction with the column-scaled conjugate tables replaces
    step A + twiddle; the slice DFT over k1 (conjugate twiddles) emits
    natural-order i1 slices.
    """
    xr_ref, xi_ref, *rest = refs
    *tabs, yr_ref, yi_ref = rest

    xr = xr_ref[:]
    xi = xi_ref[:]
    C = []
    for k1 in range(n1):
        ar = xr[:, k1 * LANES : (k1 + 1) * LANES]
        ai = xi[:, k1 * LANES : (k1 + 1) * LANES]
        C.append(_karatsuba_g(ar, ai, k1, tabs))
    Y = _dft_slices(C, inverse=True)
    for i1 in range(n1):
        yr, yi = Y[i1]
        yr_ref[:, i1 * LANES : (i1 + 1) * LANES] = yr
        yi_ref[:, i1 * LANES : (i1 + 1) * LANES] = (
            jnp.zeros_like(yr) if yi is None else yi
        )


# ---------------------------------------------------------------------------
# n = 16384 split-DIF structure (round 3).
#
# At n1 = 128 both alternatives collapse: the lane-slice structure's
# in-kernel cost explodes (chip probe: 9.2 ms vs batched-3D's 1.8 at
# b=1024) and the four-step split pays two transpose passes (5.6 ms).
# Instead run ONE radix-2 DIF stage over the block IN VMEM —
#     u = x[:, :8192] + x[:, 8192:]
#     v = (x[:, :8192] - x[:, 8192:]) * W,   W[j] = e^{-2 pi i j/16384}
# — and push u and v through the PROVEN n1=64 lane-slice pipeline
# (even/odd bins of the 16384 transform are the 8192-point transforms
# of u and v).  No extra HBM pass; the butterfly + twiddle are VPU
# elementwise ops on VMEM-resident halves.
#
# Digit order at 16384 is therefore DEFINED as the split-digit layout:
#     position  half*8192 + k1*128 + k2   holds bin 2*(k1 + 64*k2) + half
# with the matching digit-in inverse below; natural order is one
# composed XLA transpose (digit16384_to_natural).  Consumers go through
# natural_to_digit()/the wrapper so the definition lives in one place.
# ---------------------------------------------------------------------------

_N_SPLIT2 = 16384
_HALF = _N_SPLIT2 // 2
_SPLIT2_N1 = _HALF // LANES  # 64


def _split2_active(n: int) -> bool:
    return n == _N_SPLIT2 and _ls_enabled


@lru_cache(maxsize=None)
def _split2_w(inverse: bool):
    """W[j] = exp(-+2 pi i j / 16384) for j in [0, 8192), as (64, 128)
    f32 planes matching the half's lane-slice layout."""
    j = np.arange(_HALF, dtype=np.float64)
    sign = 1.0 if inverse else -1.0
    w = np.exp(sign * 2j * np.pi * j / _N_SPLIT2).reshape(_SPLIT2_N1, LANES)
    c32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    return c32(w.real), c32(w.imag)


def _fft_kernel_split2(*refs, inverse: bool):
    """Forward (or unnormalized-inverse) 16384 kernel: in-VMEM DIF
    stage + two n1=64 lane-slice pipelines.  Split-digit output."""
    xr_ref, xi_ref, *rest = refs
    wr_ref, wi_ref, *gtabs = rest
    *tabs, yr_ref, yi_ref = gtabs

    xr = xr_ref[:]
    xi = xi_ref[:]
    wr, wi = wr_ref[:], wi_ref[:]
    n1 = _SPLIT2_N1
    for half in range(2):
        pairs = []
        for k in range(n1):
            lo = slice(k * LANES, (k + 1) * LANES)
            hi = slice(_HALF + k * LANES, _HALF + (k + 1) * LANES)
            if half == 0:
                pairs.append((xr[:, lo] + xr[:, hi], xi[:, lo] + xi[:, hi]))
            else:
                dr = xr[:, lo] - xr[:, hi]
                di = xi[:, lo] - xi[:, hi]
                twr, twi = wr[k : k + 1], wi[k : k + 1]
                pairs.append((dr * twr - di * twi, dr * twi + di * twr))
        A = _dft_slices(pairs, inverse)
        C = [_karatsuba_g(A[k1][0], A[k1][1], k1, tabs) for k1 in range(n1)]
        base = half * _HALF
        for k1 in range(n1):
            sl = slice(base + k1 * LANES, base + (k1 + 1) * LANES)
            yr_ref[:, sl] = C[k1][0]
            yi_ref[:, sl] = C[k1][1]


def _ifft_kernel_split2(*refs):
    """Digit-in inverse of _fft_kernel_split2 (scale folded into the
    half tables): two n1=64 digit-in inverse pipelines, then the DIT
    recombination a = u + v*conj(W), b = u - v*conj(W) — exactly
    undoing the forward's in-VMEM DIF stage (16384*a = u~ + v~*W^-1
    with u~, v~ the unnormalized half inverses; the /16384 rides the
    table scale)."""
    xr_ref, xi_ref, *rest = refs
    wr_ref, wi_ref, *gtabs = rest
    *tabs, yr_ref, yi_ref = gtabs

    xr = xr_ref[:]
    xi = xi_ref[:]
    wr, wi = wr_ref[:], wi_ref[:]  # conj(W) tables (inverse=True)
    n1 = _SPLIT2_N1
    halves = []
    for half in range(2):
        base = half * _HALF
        C = []
        for k1 in range(n1):
            sl = slice(base + k1 * LANES, base + (k1 + 1) * LANES)
            C.append(_karatsuba_g(xr[:, sl], xi[:, sl], k1, tabs))
        halves.append(_dft_slices(C, inverse=True))
    U, V = halves
    for i1 in range(n1):
        ur, ui = U[i1]
        vr, vi = V[i1]
        ui = jnp.zeros_like(ur) if ui is None else ui
        vi = jnp.zeros_like(vr) if vi is None else vi
        twr, twi = wr[i1 : i1 + 1], wi[i1 : i1 + 1]
        cr = vr * twr - vi * twi
        ci = vr * twi + vi * twr
        lo = slice(i1 * LANES, (i1 + 1) * LANES)
        hi = slice(_HALF + i1 * LANES, _HALF + (i1 + 1) * LANES)
        yr_ref[:, lo] = ur + cr
        yi_ref[:, lo] = ui + ci
        yr_ref[:, hi] = ur - cr
        yi_ref[:, hi] = ui - ci


def digit_to_natural(y: jax.Array, n: int) -> jax.Array:
    """The kernel's digit order -> natural bins, any leading dims (the
    exact inverse of natural_to_digit, incl. the split-digit layout at
    n=16384).  A pure reshape/transpose: XLA fuses it into a following
    elementwise consumer (e.g. the c64 recombine in fft/pow2.py), so a
    digit-order kernel + this costs ZERO extra passes when a conversion
    pass follows anyway."""
    if _split2_active(n):
        return digit16384_to_natural(y)
    n1 = n // LANES
    lead = y.shape[:-1]
    return (
        y.reshape(*lead, n1, LANES).swapaxes(-1, -2).reshape(*lead, n)
    )


def digit16384_to_natural(y: jax.Array) -> jax.Array:
    """Split-digit (..., 16384) -> natural bin order (one transpose)."""
    lead = y.shape[:-1]
    v = y.reshape(*lead, 2, _SPLIT2_N1, LANES)
    nd = v.ndim
    perm = tuple(range(nd - 3)) + (nd - 1, nd - 2, nd - 3)
    return jnp.transpose(v, perm).reshape(*lead, _N_SPLIT2)


def natural_to_digit(h: jax.Array, n: int) -> jax.Array:
    """Natural bin order -> the kernel's digit order for size n (the
    trace-time twin of the kernels' layout; pow2.py permutes constant
    frequency responses through this).

    Layout caveat (real-input exception): at n = 16384 this follows
    `_split2_active` — the layout of the COMPLEX-input kernels (the
    split-digit order of _fft_kernel_split2).  A real-input forward
    (xi=None) at 16384 runs the batched-3D kernel instead and emits the
    STANDARD digit order; its spectrum must not be fed through this
    helper or ifft_pow2_digit_split.  No in-repo consumer pairs those
    (the digit chains are complex end-to-end), and the layouts are
    pinned by tests/test_pallas.py::TestSplit2KernelMath.
    """
    lead = h.shape[:-1]
    if _split2_active(n):
        v = h.reshape(*lead, LANES, _SPLIT2_N1, 2)
        nd = v.ndim
        perm = tuple(range(nd - 3)) + (nd - 1, nd - 2, nd - 3)
        return jnp.transpose(v, perm).reshape(*lead, n)
    n1 = n // LANES
    return (
        h.reshape(*lead, LANES, n1)
        .swapaxes(-1, -2)
        .reshape(*lead, n)
    )


def _ifft_digit_in_kernel_ls_shared(*refs, n1: int, cs: int):
    """Digit-in inverse, shared-F2 contraction: B = Astack @ F2c (one
    shared weight, 18 big limb matmuls), then the per-slice twiddle as a
    VPU column multiply (G[k1] = F2c . diag-ish Tc[k1] factored back
    out), then the conjugate slice network emits natural i1 order."""
    xr_ref, xi_ref, *rest = refs
    *tabs, yr_ref, yi_ref = rest
    tr_ref, ti_ref, *f2refs = tabs
    tr, ti = tr_ref[:], ti_ref[:]
    f2r = tuple(r[:] for r in f2refs[0:3])
    f2i = tuple(r[:] for r in f2refs[3:6])
    f2s = tuple(r[:] for r in f2refs[6:9])
    xr, xi = xr_ref[:], xi_ref[:]
    bt = xr.shape[0]
    for j in range(0, bt, cs):
        rows = slice(j, j + cs)
        ar = jnp.concatenate(
            [xr[rows, k * LANES : (k + 1) * LANES] for k in range(n1)], axis=0
        )
        ai = jnp.concatenate(
            [xi[rows, k * LANES : (k + 1) * LANES] for k in range(n1)], axis=0
        )
        m1 = _mm_limbs(_limb3(ar), f2r)
        m2 = _mm_limbs(_limb3(ai), f2i)
        m3 = _mm_limbs(_limb3(ar + ai), f2s)
        br = m1 - m2
        bi = m3 - m1 - m2
        cr = br * tr - bi * ti
        ci = br * ti + bi * tr
        C = [
            (cr[k1 * cs : (k1 + 1) * cs], ci[k1 * cs : (k1 + 1) * cs])
            for k1 in range(n1)
        ]
        Y = _dft_slices(C, inverse=True)
        for i1 in range(n1):
            yr, yi_ = Y[i1]
            yr_ref[rows, i1 * LANES : (i1 + 1) * LANES] = yr
            yi_ref[rows, i1 * LANES : (i1 + 1) * LANES] = (
                jnp.zeros_like(yr) if yi_ is None else yi_
            )


def _step_a_real_vpu(x3, n1: int):
    """Forward DFT over i1 for REAL input, n1 in {2, 4}: exact VPU adds."""
    if n1 == 2:
        x0, x1 = x3[:, 0], x3[:, 1]
        ar = jnp.stack([x0 + x1, x0 - x1], axis=1)
        return ar, jnp.zeros_like(ar)
    x0, x1, x2, x3_ = (x3[:, k] for k in range(4))
    e, o = x0 + x2, x0 - x2  # even sum / diff
    s, d = x1 + x3_, x1 - x3_  # odd sum / diff
    zero = jnp.zeros_like(e)
    ar = jnp.stack([e + s, o, e - s, o], axis=1)
    ai = jnp.stack([zero, -d, zero, d], axis=1)
    return ar, ai


def _step_a_vpu(xr, xi, n1: int, inverse: bool):
    """Exact DFT over i1 for n1 in {2, 4}: entries are +-1 / +-i."""
    if n1 == 2:
        ar = jnp.stack([xr[:, 0] + xr[:, 1], xr[:, 0] - xr[:, 1]], axis=1)
        ai = jnp.stack([xi[:, 0] + xi[:, 1], xi[:, 0] - xi[:, 1]], axis=1)
        return ar, ai
    # n1 == 4: forward rows of F4 are
    # [1,1,1,1], [1,-i,-1,i], [1,-1,1,-1], [1,i,-1,-i]; inverse conjugates.
    x0r, x1r, x2r, x3r = (xr[:, k] for k in range(4))
    x0i, x1i, x2i, x3i = (xi[:, k] for k in range(4))
    e_r, e_i = x0r + x2r, x0i + x2i  # even sum
    o_r, o_i = x0r - x2r, x0i - x2i  # even diff
    s_r, s_i = x1r + x3r, x1i + x3i  # odd sum
    d_r, d_i = x1r - x3r, x1i - x3i  # odd diff
    if inverse:
        d_r, d_i = -d_r, -d_i
    ar = jnp.stack([e_r + s_r, o_r + d_i, e_r - s_r, o_r - d_i], axis=1)
    ai = jnp.stack([e_i + s_i, o_i - d_r, e_i - s_i, o_i + d_r], axis=1)
    return ar, ai


def fft_real_tables(n: int):
    """(table_names, tables_dict) for the real-input FFT steps at size n
    — lane-slice G tables for n1 <= _LS_MAX_N1, batched-3D tables
    otherwise.  Used by the fused Pwelch/STFT kernel wrappers."""
    n1 = n // LANES
    if _use_laneslice(n1):
        return _LS_ORDER, _ls_tables(n, False, False)
    return _TABLE_ORDER, _tables(n, False)


def _fft_steps_real(xw, tabs, bt: int, n1: int):
    """Forward FFT of REAL xw (bt, n1*128) -> (cr, ci) (bt, n1*128),
    digit bin order.

    tabs: table refs from fft_real_tables (lane-slice G tables or the
    batched-3D _TABLE_ORDER set, distinguished by length).  Shared by
    the standalone real-input kernel and the fused Pwelch/STFT kernels.
    """
    if len(tabs) != len(_TABLE_ORDER):
        pairs = [
            (xw[:, k * LANES : (k + 1) * LANES], None) for k in range(n1)
        ]
        A = _dft_slices(pairs, inverse=False)
        crs, cis = [], []
        for k1 in range(n1):
            cr, ci = _karatsuba_g(A[k1][0], A[k1][1], k1, tabs)
            crs.append(cr)
            cis.append(ci)
        return jnp.concatenate(crs, axis=1), jnp.concatenate(cis, axis=1)
    return _fft_steps_real_3d(xw.reshape(bt, n1, LANES), tabs, bt, n1)


def _fft_steps_real_3d(x3, tabs, bt: int, n1: int):
    """Batched-3D real-input steps (n1 > _LS_MAX_N1); (bt, n1*128) digit."""
    f1r, f1i, _f1s, tr, ti, f2r, f2i, f2s = tabs

    # Step 1: real input halves the contraction.
    if n1 <= 4:
        ar, ai = _step_a_real_vpu(x3, n1)
    else:
        dn_a = (((2,), (1,)), ((0,), (0,)))
        mm_a = partial(
            jax.lax.dot_general, dimension_numbers=dn_a,
            preferred_element_type=_F32, precision=_HI,
        )
        ar = mm_a(jnp.broadcast_to(f1r[:], (bt, n1, n1)), x3)
        ai = mm_a(jnp.broadcast_to(f1i[:], (bt, n1, n1)), x3)

    # Step 2: twiddle (VPU).
    br = ar * tr[:] - ai * ti[:]
    bi = ar * ti[:] + ai * tr[:]

    # Step 3: lane contraction with F2 (Karatsuba complex).
    dn_c = (((2,), (0,)), ((), ()))
    mm_c = partial(
        jax.lax.dot_general, dimension_numbers=dn_c,
        preferred_element_type=_F32, precision=_HI,
    )
    m1 = mm_c(br, f2r[:])
    m2 = mm_c(bi, f2i[:])
    m3 = mm_c(br + bi, f2s[:])
    return (
        (m1 - m2).reshape(bt, n1 * LANES),
        (m3 - m1 - m2).reshape(bt, n1 * LANES),
    )


def _fft_kernel(
    *refs, n1: int, inverse: bool, real_input: bool = False,
):
    if real_input:
        (
            xr_ref,
            f1r, f1i, f1s, tr, ti, f2r, f2i, f2s,
            yr_ref, yi_ref,
        ) = refs
        xi_ref = None
    else:
        (
            xr_ref, xi_ref,
            f1r, f1i, f1s, tr, ti, f2r, f2i, f2s,
            yr_ref, yi_ref,
        ) = refs
    bt = xr_ref.shape[0]
    xr = xr_ref[:].reshape(bt, n1, LANES)
    xi = None if real_input else xi_ref[:].reshape(bt, n1, LANES)

    # ---- Step 1: A[b, k1, i2] = sum_i1 F1[k1, i1] x[b, i1, i2] ----
    # Real input halves the contraction (no x.im terms).
    dn_a = (((2,), (1,)), ((0,), (0,)))
    mm_a = partial(
        jax.lax.dot_general, dimension_numbers=dn_a,
        preferred_element_type=_F32, precision=_HI,
    )
    if real_input:
        if n1 <= 4:
            ar, ai = _step_a_real_vpu(xr, n1)
        else:
            ar = mm_a(jnp.broadcast_to(f1r[:], (bt, n1, n1)), xr)
            ai = mm_a(jnp.broadcast_to(f1i[:], (bt, n1, n1)), xr)
    elif n1 <= 4:
        ar, ai = _step_a_vpu(xr, xi, n1, inverse)
    else:
        f1r3 = jnp.broadcast_to(f1r[:], (bt, n1, n1))
        f1i3 = jnp.broadcast_to(f1i[:], (bt, n1, n1))
        ar = mm_a(f1r3, xr) - mm_a(f1i3, xi)
        ai = mm_a(f1r3, xi) + mm_a(f1i3, xr)

    # ---- Step 2: twiddle T[k1, i2] (VPU, f32 exact tables) ----
    br = ar * tr[:] - ai * ti[:]
    bi = ar * ti[:] + ai * tr[:]

    # ---- Step 3: 128-deep lane contraction with F2 (Karatsuba) ----
    dn_c = (((2,), (0,)), ((), ()))
    mm_c = partial(
        jax.lax.dot_general, dimension_numbers=dn_c,
        preferred_element_type=_F32, precision=_HI,
    )
    m1 = mm_c(br, f2r[:])
    m2 = mm_c(bi, f2i[:])
    m3 = mm_c(br + bi, f2s[:])
    cr = m1 - m2
    ci = m3 - m1 - m2

    # ---- Step 4: emit digit-transposed (k1-major) order ----
    yr_ref[:] = cr.reshape(bt, n1 * LANES)
    yi_ref[:] = ci.reshape(bt, n1 * LANES)


def _ifft_digit_in_kernel(
    xr_ref, xi_ref,
    f1r, f1i, _f1s, tr, ti, f2r, f2i, f2s,
    yr_ref, yi_ref, *, n1: int,
):
    """Inverse DFT CONSUMING the forward kernel's digit order.

    Input layout (k1, k2) holds Y[k1 + n1*k2]; with conjugated tables the
    forward's three steps run in reverse roles:
      B[b, k1, i2] = sum_k2 Y[b, k1, k2] conj(F2)[k2, i2]   (lane MXU)
      C            = B * conj(T)[k1, i2]                     (VPU)
      y[b, i1, i2] = sum_k1 conj(F1)[i1, k1] C[b, k1, i2]    (MXU)
    emitting NATURAL order — so fft(digit out) ∘ pointwise ∘ this kernel
    needs no reorder transposes at all (the Convolve/Bluestein chain).
    Tables arrive already conjugated via _tables(n, inverse=True).
    """
    bt = xr_ref.shape[0]
    xr = xr_ref[:].reshape(bt, n1, LANES)
    xi = xi_ref[:].reshape(bt, n1, LANES)

    # ---- Step A: lane contraction with conj(F2) (Karatsuba complex) ----
    dn_c = (((2,), (0,)), ((), ()))
    mm_c = partial(
        jax.lax.dot_general, dimension_numbers=dn_c,
        preferred_element_type=_F32, precision=_HI,
    )
    m1 = mm_c(xr, f2r[:])
    m2 = mm_c(xi, f2i[:])
    m3 = mm_c(xr + xi, f2s[:])
    br = m1 - m2
    bi = m3 - m1 - m2

    # ---- Step B: conjugate twiddle (VPU) ----
    cr = br * tr[:] - bi * ti[:]
    ci = br * ti[:] + bi * tr[:]

    # ---- Step C: DFT over k1 with conj(F1) ----
    if n1 <= 4:
        yr, yi = _step_a_vpu(cr, ci, n1, inverse=True)
    else:
        dn_a = (((2,), (1,)), ((0,), (0,)))
        mm_a = partial(
            jax.lax.dot_general, dimension_numbers=dn_a,
            preferred_element_type=_F32, precision=_HI,
        )
        f1r3 = jnp.broadcast_to(f1r[:], (bt, n1, n1))
        f1i3 = jnp.broadcast_to(f1i[:], (bt, n1, n1))
        yr = mm_a(f1r3, cr) - mm_a(f1i3, ci)
        yi = mm_a(f1r3, ci) + mm_a(f1i3, cr)

    yr_ref[:] = yr.reshape(bt, n1 * LANES)
    yi_ref[:] = yi.reshape(bt, n1 * LANES)


def _digit_to_natural(y: jax.Array, n1: int) -> jax.Array:
    """XLA-side reorder: position k1*128 + k2  ->  k = k1 + n1*k2."""
    b, n = y.shape
    return jnp.transpose(y.reshape(b, n1, LANES), (0, 2, 1)).reshape(b, n)


def fft_pow2_split(
    xr: jax.Array,
    xi: jax.Array | None,
    inverse: bool = False,
    order: str = "natural",
    batch_tile: int | None = None,
    interpret: bool = False,
    scale: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Batched power-of-2 FFT over split-complex float32 planes.

    xr, xi: (..., N) float32, natural-order input.  Returns (yr, yi)
    with the unnormalized forward (or conjugate-table inverse) DFT.
    xi=None marks a REAL input (forward only): the imag plane is neither
    read from HBM nor multiplied — step 1 halves.

    order:  "natural" applies the digit-order fix (one XLA transpose);
            "digit" returns the kernel's k1-major order — free for
            consumers that reduce over bins and permute the reduced
            result (the fused Pwelch kernel).

    scale multiplies the transform, FOLDED into the contraction tables
    (e.g. 1/N for a normalized inverse — no extra pass).

    Leading axes are flattened into the grid's batch dimension; a ragged
    final tile is zero-padded (FFT of zeros is zeros — harmless).
    """
    real_input = xi is None
    if real_input and inverse:
        raise ValueError("real-input mode is forward-only (xi=None)")
    if not real_input and xr.shape != xi.shape:
        raise ValueError("re/im planes must have identical shapes")
    if order not in ("natural", "digit"):
        raise ValueError(f"unknown order: {order}")
    n = xr.shape[-1]
    if not supported_size(n):
        raise ValueError(f"unsupported FFT size for the Pallas kernel: {n}")
    n1 = n // LANES

    lead = xr.shape[:-1]
    xr2 = xr.reshape(-1, n).astype(_F32)
    b = xr2.shape[0]
    bt = batch_tile or default_batch_tile(n)
    pad = (-b) % bt
    if pad:
        xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
    data = [xr2]
    if not real_input:
        xi2 = xi.reshape(-1, n).astype(_F32)
        if pad:
            xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
        data.append(xi2)
    grid = (xr2.shape[0] // bt,)

    natural_fused = False
    split2 = _split2_active(n) and not real_input
    if split2:
        tabs = _ls_tables(_HALF, inverse, False, scale)
        w2r, w2i = _split2_w(inverse)
        tables = [jnp.asarray(w2r), jnp.asarray(w2i)] + [
            jnp.asarray(tabs[k]) for k in _LS_ORDER
        ]
        kern = partial(_fft_kernel_split2, inverse=inverse)
    elif _LS_SHARED and not real_input and _use_laneslice(n1):
        cs = _LS_CHUNK_ROWS or bt
        if cs > bt or bt % cs:
            cs = bt
        tabs = _ls_tables_shared(n, inverse, cs, scale)
        tables = [jnp.asarray(tabs[k]) for k in _SHARED_ORDER]
        natural_fused = (
            order == "natural" and _natural_fused
            and n1 <= _NATURAL_FUSED_MAX_N1
        )
        if natural_fused:
            tables.append(jnp.asarray(_natural_perm_np(n1)))
        kern = partial(
            _fft_kernel_ls_shared, n1=n1, inverse=inverse,
            natural_out=natural_fused, cs=cs,
        )
    elif _use_laneslice(n1):
        tabs = _ls_tables(n, inverse, False, scale)
        tables = [jnp.asarray(tabs[k]) for k in _LS_ORDER]
        natural_fused = (
            order == "natural" and _natural_fused
            and n1 <= _NATURAL_FUSED_MAX_N1
        )
        if natural_fused:
            tables.append(jnp.asarray(_natural_perm_np(n1)))
        kern = partial(
            _fft_kernel_ls, n1=n1, inverse=inverse, real_input=real_input,
            natural_out=natural_fused,
        )
    else:
        tabs = _tables(n, inverse, scale)
        tables = [jnp.asarray(tabs[k]) for k in _TABLE_ORDER]
        kern = partial(
            _fft_kernel, n1=n1, inverse=inverse, real_input=real_input,
        )

    data_spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(
            t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )
        for t in tables
    ]

    flops = 18 * 2 * xr2.shape[0] * n * (n1 + LANES)  # 6-pass HIGHEST
    bytes_acc = (3 if real_input else 4) * xr2.shape[0] * n * 4

    # Under vma-checked shard_map the outputs must declare the mesh axes
    # they vary over — exactly as the input planes do.
    vma = getattr(jax.typeof(xr2), "vma", None) or frozenset()
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[data_spec] * len(data) + const_specs,
        out_specs=(data_spec, data_spec),
        out_shape=(
            jax.ShapeDtypeStruct(xr2.shape, _F32, vma=vma),
            jax.ShapeDtypeStruct(xr2.shape, _F32, vma=vma),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(bytes_acc), transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20,
            dimension_semantics=_dim_sem_for(n),
        ),
        interpret=interpret,
    )(*data, *tables)

    if order == "natural" and not natural_fused:
        if split2:
            yr, yi = digit16384_to_natural(yr), digit16384_to_natural(yi)
        else:
            yr = _digit_to_natural(yr, n1)
            yi = _digit_to_natural(yi, n1)
    if pad:
        yr, yi = yr[:b], yi[:b]
    return yr.reshape(*lead, n), yi.reshape(*lead, n)


def ifft_pow2_digit_split(
    yr: jax.Array,
    yi: jax.Array,
    batch_tile: int | None = None,
    interpret: bool = False,
    scale: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Inverse of fft_pow2_split(..., order="digit"), times `scale`.

    yr, yi: (..., N) float32 planes in the kernel's digit order.  Returns
    natural-order time-domain planes; scale=1/N gives the normalized
    inverse FOLDED INTO the contraction tables (no extra pass).  This is
    the tail of the zero-reorder Convolve/Bluestein chain:
    fft(digit) -> pointwise -> this.

    "Digit order" here means the COMPLEX-input forward's layout — at
    n = 16384 the split-digit layout of _fft_kernel_split2 (when the
    lane-slice structure is enabled).  A real-input forward at 16384
    emits the standard batched-3D digit order instead and must not feed
    this inverse; see natural_to_digit's layout caveat.
    """
    if yr.shape != yi.shape:
        raise ValueError("re/im planes must have identical shapes")
    n = yr.shape[-1]
    if not supported_size(n):
        raise ValueError(f"unsupported FFT size for the Pallas kernel: {n}")
    n1 = n // LANES

    lead = yr.shape[:-1]
    r2 = yr.reshape(-1, n).astype(_F32)
    i2 = yi.reshape(-1, n).astype(_F32)
    b = r2.shape[0]
    bt = batch_tile or default_batch_tile(n)
    pad = (-b) % bt
    if pad:
        r2 = jnp.pad(r2, ((0, pad), (0, 0)))
        i2 = jnp.pad(i2, ((0, pad), (0, 0)))
    grid = (r2.shape[0] // bt,)

    vmem_cap = 64 << 20
    if _split2_active(n):
        tabs = _ls_tables(_HALF, True, True, scale)  # digit-in halves
        w2r, w2i = _split2_w(True)  # conj(W)
        tables = [jnp.asarray(w2r), jnp.asarray(w2i)] + [
            jnp.asarray(tabs[k]) for k in _LS_ORDER
        ]
        kern = _ifft_kernel_split2
        # Both halves' pipelines are live across the DIT recombination;
        # Mosaic's stack estimate lands ~78 MB at bt=32 (v5e VMEM: 128).
        vmem_cap = 100 << 20
    elif _LS_SHARED and _use_laneslice(n1):
        cs = _LS_CHUNK_ROWS or bt
        if cs > bt or bt % cs:
            cs = bt
        tabs = _ls_tables_shared(n, True, cs, scale)  # conjugated
        tables = [jnp.asarray(tabs[k]) for k in _SHARED_ORDER]
        kern = partial(_ifft_digit_in_kernel_ls_shared, n1=n1, cs=cs)
    elif _use_laneslice(n1):
        tabs = _ls_tables(n, True, True, scale)  # conjugated, column-scaled
        tables = [jnp.asarray(tabs[k]) for k in _LS_ORDER]
        kern = partial(_ifft_digit_in_kernel_ls, n1=n1)
    else:
        tabs = _tables(n, True, scale)  # conjugated
        tables = [jnp.asarray(tabs[k]) for k in _TABLE_ORDER]
        kern = partial(_ifft_digit_in_kernel, n1=n1)
    data_spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_specs = [
        # nd default-bound per table: a plain closure would late-bind to
        # the LAST t (mixed-rank tables, e.g. split2's W + G, miscount).
        pl.BlockSpec(
            t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )
        for t in tables
    ]
    vma = getattr(jax.typeof(r2), "vma", None) or frozenset()
    zr, zi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[data_spec, data_spec] + const_specs,
        out_specs=(data_spec, data_spec),
        out_shape=(
            jax.ShapeDtypeStruct(r2.shape, _F32, vma=vma),
            jax.ShapeDtypeStruct(r2.shape, _F32, vma=vma),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(18 * 2 * r2.shape[0] * n * (n1 + LANES)),
            bytes_accessed=int(4 * r2.shape[0] * n * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_cap,
            dimension_semantics=_dim_sem_for(n),
        ),
        interpret=interpret,
    )(r2, i2, *tables)
    if pad:
        zr, zi = zr[:b], zi[:b]
    return zr.reshape(*lead, n), zi.reshape(*lead, n)


# ---------------------------------------------------------------------------
# Real-input FFT with Hermitian-packed output (round 4, VERDICT item 2).
#
# The reference's hot entry is FFTReal (fft/fft.go:25-32) and Welch
# feeds it real data (pwelch.go:111).  For real x the spectrum is
# Hermitian — bins above N/2 are conjugates — so the kernel emits only
# bins 0..N/2: per slice k1 it contracts against the HALF tables
# G[k1][:, :64] (bins k1 + n1*k2 for k2 < 64 are exactly the bins below
# Nyquist), HALVING the HIGHEST MXU stream, and writes (..., N/2)
# packed planes — half the store traffic — plus the (real) Nyquist bin
# from a one-lane alternating-sum on the VPU.  Combined with the
# one-plane read of real input, total HBM traffic is ~(2N + 128)·4
# bytes per row vs the complex kernel's 4N·4.
#
# Packed layout: position j*128 + h*64 + q  holds bin (2j + h) + n1*q
# (pairs of k1 slices' 64-bin halves lane-concatenated; q in [0, 64),
# h in {0, 1}, j in [0, n1/2)).  DC is packed position 0; bin N/2 rides
# the separate extras plane (lane-broadcast).  rfft_packed_to_natural
# undoes this with ONE XLA transpose (the digit fix's real twin).
# ---------------------------------------------------------------------------


def rfft_supported_size(n: int) -> bool:
    """Lane-slice sizes with an even slice count: 256..8192."""
    return supported_size(n) and _use_laneslice(n // LANES) and (
        (n // LANES) % 2 == 0
    )


@lru_cache(maxsize=None)
def _rfft_tables(n: int, scale: float = 1.0):
    """Half G tables G[k1][:, :64] + the Nyquist alternating row."""
    n1 = n // LANES
    t = twiddle_2d(n1, LANES)
    f2 = dft_matrix(LANES) * scale
    g = t[:, :, None] * f2[None, :, :]
    gh = g[:, :, : LANES // 2]
    c32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    alt = (np.where(np.arange(LANES) % 2 == 0, 1.0, -1.0) * scale)[None]
    return {
        "gr": c32(gh.real), "gi": c32(gh.imag),
        "gs": c32(gh.real + gh.imag), "alt": c32(alt),
    }


def _rfft_steps_packed(xr, tabs, n1: int):
    """Forward FFT of REAL xr (bt, n1*128) against HALF G tables:
    packed Hermitian planes (ypr, ypi) (bt, n/2) + Nyquist column
    (bt, 1).  Shared by the standalone rfft kernel and the fused
    one-sided Pwelch reduction (the contraction is HALF the complex
    kernel's MXU stream)."""
    gr, gi, gs, alt = tabs
    pairs = [
        (xr[:, k * LANES : (k + 1) * LANES], None) for k in range(n1)
    ]
    A = _dft_slices(pairs, inverse=False)
    C = [_karatsuba_g(A[k1][0], A[k1][1], k1, (gr, gi, gs)) for k1 in range(n1)]
    ypr = jnp.concatenate([c[0] for c in C], axis=1)
    ypi = jnp.concatenate([c[1] for c in C], axis=1)
    # Nyquist bin N/2 = (k1=0, k2=64): G[0][i2, 64] = (-1)^i2, and A[0]
    # is exactly real for real input — one masked lane sum on the VPU.
    nyq = jnp.sum(A[0][0] * alt[:], axis=1, keepdims=True)
    return ypr, ypi, nyq


def _rfft_kernel_ls(*refs, n1: int):
    """Real-input lane-slice forward: packed Hermitian output planes
    (bt, n/2) + Nyquist extras plane (bt, 128, lane-broadcast)."""
    xr_ref, gr, gi, gs, alt, yr_ref, yi_ref, ex_ref = refs
    ypr, ypi, nyq = _rfft_steps_packed(xr_ref[:], (gr, gi, gs, alt), n1)
    yr_ref[:] = ypr
    yi_ref[:] = ypi
    ex_ref[:] = nyq * jnp.ones((1, LANES), _F32)


def rfft_packed_to_natural(
    ypr: jax.Array, ypi: jax.Array, ex: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Packed rfft planes (..., N/2) + extras (..., 128) -> natural
    one-sided planes (..., N/2 + 1) (bins 0..N/2), one XLA transpose."""
    lead = ypr.shape[:-1]
    nh = ypr.shape[-1]
    n1 = (2 * nh) // LANES
    half = LANES // 2

    def fix(p):
        v = p.reshape(*lead, n1 // 2, 2, half)
        nd = v.ndim
        perm = tuple(range(nd - 3)) + (nd - 1, nd - 3, nd - 2)
        return jnp.transpose(v, perm).reshape(*lead, nh)

    nyq = ex[..., :1]
    return (
        jnp.concatenate([fix(ypr), nyq], axis=-1),
        jnp.concatenate([fix(ypi), jnp.zeros_like(nyq)], axis=-1),
    )


def rfft_pow2_split(
    xr: jax.Array,
    order: str = "natural",
    batch_tile: int | None = None,
    interpret: bool = False,
    scale: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """One-sided DFT of REAL input over a float32 plane (..., N).

    order="natural": (yr, yi) planes of shape (..., N/2 + 1), bins
    0..N/2 (numpy.fft.rfft layout; one XLA transpose).
    order="packed": the kernel's packed layout — (yr, yi) of
    (..., N/2) plus the Nyquist extras plane (..., 128) — for fused
    consumers that reduce over bins and reorder afterwards for free.

    Matches fft/fft.go:25-32 (FFTReal) on the first N/2+1 bins; the
    conjugate upper half is implied.  HBM traffic and MXU passes are
    half the complex kernel's (see the block comment above).
    """
    if order not in ("natural", "packed"):
        raise ValueError(f"unknown order: {order}")
    n = xr.shape[-1]
    if not rfft_supported_size(n):
        raise ValueError(f"unsupported rfft size for the Pallas kernel: {n}")
    n1 = n // LANES

    lead = xr.shape[:-1]
    xr2 = xr.reshape(-1, n).astype(_F32)
    b = xr2.shape[0]
    bt = batch_tile or default_batch_tile(n)
    pad = (-b) % bt
    if pad:
        xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
    grid = (xr2.shape[0] // bt,)

    tabs = _rfft_tables(n, scale)
    tables = [jnp.asarray(tabs[k]) for k in ("gr", "gi", "gs", "alt")]

    nh = n // 2
    in_spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, nh), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ex_spec = pl.BlockSpec(
        (bt, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const_specs = [
        pl.BlockSpec(
            t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )
        for t in tables
    ]

    vma = getattr(jax.typeof(xr2), "vma", None) or frozenset()
    B = xr2.shape[0]
    ypr, ypi, ex = pl.pallas_call(
        partial(_rfft_kernel_ls, n1=n1),
        grid=grid,
        in_specs=[in_spec] + const_specs,
        out_specs=(out_spec, out_spec, ex_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, nh), _F32, vma=vma),
            jax.ShapeDtypeStruct((B, nh), _F32, vma=vma),
            jax.ShapeDtypeStruct((B, LANES), _F32, vma=vma),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(9 * 2 * B * n * (n1 + LANES) // 2),
            bytes_accessed=int((2 * n + LANES) * B * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20,
            dimension_semantics=_dim_sem_for(n),
        ),
        interpret=interpret,
    )(xr2, *tables)

    if pad:
        ypr, ypi, ex = ypr[:b], ypi[:b], ex[:b]
    ypr = ypr.reshape(*lead, nh)
    ypi = ypi.reshape(*lead, nh)
    ex = ex.reshape(*lead, LANES)
    if order == "packed":
        return ypr, ypi, ex
    return rfft_packed_to_natural(ypr, ypi, ex)
