"""Large power-of-2 FFT (N > 16384) as direct-DFT levels over the
Pallas kernel — a TRANSPOSE-FREE Cooley-Tukey plan.

Covers the reference's only benchmark workload — a 2^20-point complex
FFT (fft/fft_test.go:262-280) — and up through 2^28, at kernel speed.
The per-size Pallas kernel (ops.pallas_fft) stops at N = 16384, where
one batch tile's whole transform still fits VMEM; beyond that the
transform is factored

    N = d1 * d2 * N3,    d1, d2 <= 128,    N3 in {8192, 16384}

with BOTH outer levels solved as dense DFT einsums that contract the
MIDDLE axis of the (b, d, rest) view — a sublane-contracting matmul the
MXU runs natively, with the data staying in natural layout throughout.
No (b, N1, N2) <-> (b, N2, N1) transposes exist anywhere in the plan:

    x4[b, i1, i2, i3] = x[b, i1*(d2*N3) + i2*N3 + i3]
    level 1:  A[b, k1, i2, i3] = sum_i1 F1[k1, i1] x4[b, i1, i2, i3]
    twiddle:  A *= W_N^{k1 (i2*N3 + i3)}   (factored (d1,d2) x (d1,N3)
              tables, fused elementwise — the N-sized table never exists)
    level 2:  B[b, k1, k2, i3] = sum_i2 F2[k2, i2] A[b, k1, i2, i3]
    twiddle:  B *= W_{d2*N3}^{k2 i3}       ((d2, N3) table)
    level 3:  kernel FFT over i3 (minor axis, digit order out)
    reorder:  bin k = k1 + d1*k2 + d1*d2*k3 — ONE transpose that also
              absorbs the kernel's digit layout (_fold_to_natural).

History (chip-measured, v5e; all A/Bs within one session — the bimodal
clock makes cross-session wall comparisons unreliable): the round-2/3
form ran a BALANCED two-level split (kernel-sized N1) for n > 2^20,
paying a swapaxes pair around the step-1 kernel — 2^24 measured
4.1 ms.  A round-4 attempt to fold the step-1 kernel's digit fix into
the final transpose measured 5.9 ms (the interleaved 5-axis transpose
is slower than the two simpler transposes it replaced — transposes are
not pass-count-equivalent).  This three-level plan replaces both: the
dense outer DFTs cost extra MXU flops (N * (d1 + d2) complex MACs) but
ZERO layout passes between levels 1 and 2, and one fold at the end —
2^24 ~3.3 ms same-session vs ~4.5 for the two-level form
(tools/probe_giant3/4.py; see BASELINE.md round 4).  The outer levels
run as the fused Pallas kernel (ops/pallas_outer.py, one HBM pass) by
default, with the einsum form as the f64/CPU fallback.  The d1 + d2
sum is minimized by the balanced factoring.

Everything runs on split-complex float32 planes: complex XLA ops
compile pathologically slowly through this environment's remote-compile
path, while f32 plane ops compile in seconds and run at near copy
bandwidth.

Reference parity: same transform as fft/radix2.go:80-153 at sizes the
reference reaches via its 2^20 benchmark; validated against numpy and
the four-step oracle in tests/test_fft.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from godsp_tpu.fft.four_step import dft_matrix

__all__ = ["large_supported", "fft_large_split", "fft_large"]

_HI = jax.lax.Precision.HIGHEST
_KERNEL_MAX = 16384  # ops.pallas_fft.supported_size upper bound
_ROW_N = 8192  # preferred kernel row length: the lane-slice structure
# tops out here (ops.pallas_fft._LS_MAX_N1); 16384's split-DIF form is
# ~1.2x the per-element cost, so rows stay 8192 until d1*d2 would
# exceed 128*128.


def _plan(n: int) -> tuple[int, int, int]:
    """n = d1 * d2 * n3 with d1, d2 <= 128 dense-DFT levels (d2 may be 1)
    and n3 a kernel row size.  d1/d2 balanced: the einsum flop cost is
    proportional to d1 + d2."""
    n3 = _KERNEL_MAX if n > (_ROW_N * 128 * 128) else _ROW_N
    m = n // n3
    if m <= 128:
        return m, 1, n3
    l2 = m.bit_length() - 1
    d1 = 1 << (l2 - l2 // 2)  # larger half
    return d1, m // d1, n3


# Smallest size routed through this module.  16384 sits in both worlds:
# the per-size kernel covers it (split-DIF structure), while this plan
# would run it as d1=2 x 8192 rows.  set_large_min(16384) selects the
# plan (chip A/B toggle; see BASELINE.md).
_MIN_N = _KERNEL_MAX * 2


def set_large_min(n: int) -> None:
    """Lowest FFT size dispatched through the direct-level plan
    (default 32768; 16384 routes n=16384 here instead of the kernel's
    split-DIF form)."""
    global _MIN_N
    _MIN_N = int(n)


def large_supported(n: int) -> bool:
    """Power-of-2 sizes above the single-kernel limit, through 2^28."""
    if n & (n - 1) or n < _MIN_N:
        return False
    d1, d2, n3 = _plan(n)
    return 2 <= d1 <= 128 and d2 <= 128


@lru_cache(maxsize=None)
def _tables(n: int, inverse: bool):
    """Level tables as float64 numpy (the analogue of radix2.go:26-69's
    cache; on-the-fly f32 angle computation would lose the 120 dB bound
    at these N).  Cast to the plane dtype at use.

    The level-1 twiddle W_N^{k1 (i2*N3 + i3)} is kept FACTORED:

        T[k1, i2*N3 + i3] = W_N^{k1 i2 N3} * W_N^{k1 i3}
                          = Ta[k1, i2] * Tb[k1, i3],

    (d1, d2) and (d1, n3) tables whose on-device product XLA fuses into
    the twiddle multiply — the N-sized table (4.3 GB at 2^28) never
    exists.  Angle products k1*i2*N3 < 2^53 stay exact in f64; the one
    extra f32 rounding of the device-side product costs ~2-3 dB against
    a ~135 dB measurement.  Returns (F1 planes, Ta, Tb, F2 planes|None,
    Tc|None), each a (re, im) pair.
    """
    d1, d2, n3 = _plan(n)
    sign = 2j * np.pi if inverse else -2j * np.pi
    f1 = dft_matrix(d1)
    if inverse:
        f1 = np.conj(f1)
    k1 = np.arange(d1, dtype=np.float64)
    ta = np.exp(sign * np.outer(k1, np.arange(d2, dtype=np.float64) * n3) / n)
    tb = np.exp(sign * np.outer(k1, np.arange(n3, dtype=np.float64)) / n)
    pair = lambda a: (
        np.ascontiguousarray(a.real),
        np.ascontiguousarray(a.imag),
    )
    if d2 == 1:
        return pair(f1), pair(ta), pair(tb), None, None
    f2 = dft_matrix(d2)
    if inverse:
        f2 = np.conj(f2)
    k2 = np.arange(d2, dtype=np.float64)
    tc = np.exp(sign * np.outer(k2, np.arange(n3, dtype=np.float64)) / (d2 * n3))
    return pair(f1), pair(ta), pair(tb), pair(f2), pair(tc)


def _kernel_fft_digit(xr, xi, inverse, interpret=False):
    from godsp_tpu.ops.pallas_fft import fft_pow2_split

    return fft_pow2_split(
        xr, xi, inverse=inverse, order="digit", interpret=interpret
    )


def _digit_axes(nlen: int) -> list[tuple[int, int]]:
    """Mixed-radix factorization of the kernel's digit layout for a row
    of length `nlen`: position-major (size, bin_stride) pairs such that
    a digit position decomposed row-major over the sizes holds
    bin = sum(idx_i * bin_stride_i).  Standard digit: position
    s*128 + l holds bin s + (nlen/128)*l; split-digit (16384,
    lane-slice on): position half*8192 + s*128 + l holds bin
    half + 2*s + 128*l (ops/pallas_fft.py layout definitions)."""
    from godsp_tpu.ops.pallas_fft import LANES, _split2_active

    if _split2_active(nlen):
        return [(2, 1), (nlen // (2 * LANES), 2), (LANES, nlen // LANES)]
    return [(nlen // LANES, 1), (LANES, nlen // LANES)]


def _fold_to_natural(y, lead, b, n, axes):
    """ONE transpose from (b, <mixed-radix layout>) to natural bins.

    `axes` is the position-major (size, GLOBAL bin stride) factorization
    of y's trailing dims; sorting by descending stride IS natural order.
    Absorbs the kernel's digit layout into the plan's own final reorder
    so no separate digit->natural pass exists."""
    sizes = [s for s, _ in axes]
    strides = [st for _, st in axes]
    v = y.reshape(b, *sizes)
    order = sorted(range(len(sizes)), key=lambda i: -strides[i])
    perm = (0,) + tuple(1 + i for i in order)
    return jnp.transpose(v, perm).reshape(*lead, n)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


# The fused outer-level kernel (ops/pallas_outer.py) runs both dense
# levels + twiddles in ONE HBM pass; the einsum path below streams the
# array once per bf16 limb pass (chip: ~2.9 ms of the old 4.5 ms total
# at 2^24).  f32-only; the CPU x64 parity tests keep the einsum path.
_outer_kernel_on = True

# Largest row count one outer-kernel call may hold in VMEM
# (ops/pallas_outer.py rows*T bound at the 128-lane minimum tile).
# Tests shrink this to exercise the recursive two-call path at CPU size.
_MAX_ROWS = 8192


def set_outer_kernel_enabled(on: bool) -> None:
    """A/B toggle for the fused outer-level kernel (d2 > 1 plans)."""
    global _outer_kernel_on
    _outer_kernel_on = bool(on)


# 128-peel plan (round 5).  The fused two-level outer kernel contracts
# at K = d1, d2 < 128, and the MXU consumes a full K=128 systolic pass
# regardless of contraction depth (probe_facdft measured the same
# effect from the other side), so the balanced split's MXU time is
# ~(128/d1 + 128/d2)/2 pass-equivalents — 3.3 measured at (64, 32).
# When n = 128^k * n3 with n3 a kernel row size, k successive
# SINGLE-LEVEL d=128 contractions (outer_dft_split with d2=1) run at
# full MXU depth instead: one extra HBM pass at 2^24 buys back ~2
# pass-equivalents of MXU stall.  Chip A/B: tools/probe_peel.py.
_peel_on = True


def set_peel_enabled(on: bool) -> None:
    """A/B toggle for the 128-peel giant plan."""
    global _peel_on
    _peel_on = bool(on)


# Fuse the last peel with the row FFT (ops/pallas_outer
# peel_rows_fused_split): one HBM pass instead of two.  Chip verdict
# (2^24, same session): fused stage 1.181 ms vs peel2 0.66 + rows 0.475
# separate — the saved pass does NOT materialize because both forms are
# bound by the same MXU contraction time, which the separate kernels
# already overlap with their DMA.  Default OFF; kept as the measured
# evidence + A/B toggle.
_fuse_rows_on = False


def set_fuse_rows_enabled(on: bool) -> None:
    """A/B toggle for the fused last-peel + row-FFT kernel."""
    global _fuse_rows_on
    _fuse_rows_on = bool(on)


def _peel_plan(n: int):
    """([128] * k, n3) when n = 128^k * n3 with n3 a kernel row size;
    None otherwise (2^22/2^23 keep the balanced fused plan)."""
    from godsp_tpu.ops.pallas_fft import supported_size

    for k in (1, 2, 3):
        n3 = n >> (7 * k)
        if n3 < 1024:
            return None
        if n3 <= _KERNEL_MAX and (n3 << (7 * k)) == n and supported_size(n3):
            return [128] * k, n3
    return None


def fft_large_split(
    xr: jax.Array,
    xi: jax.Array,
    inverse: bool = False,
    row_fft=None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Unnormalized large-N DFT over split float32 planes (..., N).

    Natural bin order in and out.  inverse conjugates the tables and does
    NOT scale (the public ifft applies its 1/N, fft.go:47-50).  row_fft
    overrides the kernel-sized sub-transform (tests inject an
    interpret-mode kernel; default is the Pallas kernel).
    """
    n = xr.shape[-1]
    if not large_supported(n):
        raise ValueError(f"unsupported large-FFT size: {n}")
    if xr.shape != xi.shape:
        raise ValueError("re/im planes must have identical shapes")
    d1, d2, n3 = _plan(n)
    lead = xr.shape[:-1]
    b = int(np.prod(lead, dtype=np.int64)) if lead else 1
    fdt = xr.dtype  # f32 on TPU; f64 under the CPU x64 parity tests

    if _peel_on and _outer_kernel_on and fdt == jnp.float32:
        pp = _peel_plan(n)
        if pp is not None:
            from godsp_tpu.ops.pallas_outer import (
                outer_dft_split,
                peel_rows_fused_split,
                peel_rows_supported,
            )

            # ---- 128-peel plan: k single-level full-MXU-depth
            # contractions, then kernel rows.  Peel i transforms each
            # length-`rest` row independently (recursive Cooley-Tukey:
            # bin k = k1 + 128 k2 + ... + 128^k * k3).  The LAST peel
            # fuses with the row FFT into one HBM pass where the
            # lane-slice row structure holds (n3 <= 8192) — the plan's
            # passes then number 3 (first peel(s), fused peel+rows,
            # fold) instead of 4.
            peels, n3p = pp
            fuse_last = (
                _fuse_rows_on and row_fft is None
                and peel_rows_supported(n3p)
            )
            br, bi = xr, xi
            batch, rest, stride = b, n, 1
            axes_outer = []
            head = peels[:-1] if fuse_last else peels
            for d in head:
                rest //= d
                br, bi = outer_dft_split(
                    br.reshape(batch, d, rest),
                    bi.reshape(batch, d, rest),
                    d, 1, inverse=inverse, interpret=interpret,
                )
                axes_outer.append((d, stride))
                stride *= d
                batch *= d
            if fuse_last:
                d = peels[-1]
                yr, yi = peel_rows_fused_split(
                    br.reshape(batch, d, n3p),
                    bi.reshape(batch, d, n3p),
                    inverse=inverse, interpret=interpret,
                )
                axes_outer.append((d, stride))
                stride *= d
                axes = list(axes_outer) + [
                    (s, stride * st) for s, st in _digit_axes(n3p)
                ]
                yr = _fold_to_natural(yr, lead, b, n, axes)
                yi = _fold_to_natural(yi, lead, b, n, axes)
                return yr, yi
            return _finish_rows(br, bi, lead, b, n, stride, axes_outer,
                                n3p, inverse, row_fft, interpret)

    if d2 > 1 and _outer_kernel_on and fdt == jnp.float32:
        from godsp_tpu.ops.pallas_outer import outer_dft_split

        m = d1 * d2
        if m <= _MAX_ROWS:
            # ---- Fused outer kernel: levels 1+2 + twiddles, one pass
            br, bi = outer_dft_split(
                xr.reshape(b, m, n3),
                xi.reshape(b, m, n3),
                d1, d2, inverse=inverse, interpret=interpret,
            )
            axes_outer = [(d1, 1), (d2, d1)]
        else:
            # ---- rows > _MAX_ROWS (2^27+): VMEM can't hold one m-row
            # block (ops/pallas_outer.py bound), so peel the outer
            # factor in TWO fused calls — recursive Cooley-Tukey, each
            # call applying its own exact twiddles for the product that
            # remains below it:
            #   call 1: (g1, g2) levels over rest = (m/g) * n3
            #   call 2: (e1, e2) levels over n3, batched per call-1 row
            # Bin k = k1 + g1 k2 + g (k1' + e1 k2' + e1 e2 k3).
            def _bal(v):
                l2 = v.bit_length() - 1
                hi = 1 << (l2 - l2 // 2)
                return hi, v // hi

            g, m2 = _bal(m)  # balanced: both calls' row counts ~sqrt(m)
            g1, g2 = _bal(g)
            e1, e2 = _bal(m2)
            br, bi = outer_dft_split(
                xr.reshape(b, g, m2 * n3),
                xi.reshape(b, g, m2 * n3),
                g1, g2, inverse=inverse, interpret=interpret,
            )
            br, bi = outer_dft_split(
                br.reshape(b * g, m2, n3),
                bi.reshape(b * g, m2, n3),
                e1, e2, inverse=inverse, interpret=interpret,
            )
            axes_outer = [(g1, 1), (g2, g1), (e1, g), (e2, g * e1)]
        return _finish_rows(br, bi, lead, b, n, m, axes_outer, n3,
                            inverse, row_fft, interpret)

    f1p, tap, tbp, f2p, tcp = _tables(n, inverse)
    J = lambda a: jnp.asarray(a, dtype=fdt)

    # ---- Level 1: dense DFT over i1 (middle-axis einsum, no transpose)
    x3r = xr.reshape(b, d1, d2 * n3)
    x3i = xi.reshape(b, d1, d2 * n3)
    mm = lambda F, v: jnp.einsum("ki,bin->bkn", F, v, precision=_HI)
    f1r, f1i = J(f1p[0]), J(f1p[1])
    ar = mm(f1r, x3r) - mm(f1i, x3i)
    ai = mm(f1r, x3i) + mm(f1i, x3r)

    # ---- Level-1 twiddle: factored (d1, d2) x (d1, n3), fused ----
    a4r = ar.reshape(b, d1, d2, n3)
    a4i = ai.reshape(b, d1, d2, n3)
    twr, twi = _cmul(
        J(tap[0])[:, :, None], J(tap[1])[:, :, None],
        J(tbp[0])[:, None, :], J(tbp[1])[:, None, :],
    )  # (d1, d2, n3) — XLA fuses; never stored
    br, bi = _cmul(a4r, a4i, twr, twi)

    # ---- Level 2 (absent when d2 == 1): DFT over i2 + its twiddle ----
    if f2p is not None:
        mm2 = lambda F, v: jnp.einsum("ci,bkin->bkcn", F, v, precision=_HI)
        f2r, f2i = J(f2p[0]), J(f2p[1])
        cr = mm2(f2r, br) - mm2(f2i, bi)
        ci = mm2(f2r, bi) + mm2(f2i, br)
        br, bi = _cmul(cr, ci, J(tcp[0]), J(tcp[1]))

    return _finish_rows(br, bi, lead, b, n, d1 * d2,
                        [(d1, 1), (d2, d1)], n3,
                        inverse, row_fft, interpret)


def _finish_rows(br, bi, lead, b, n, rows, axes_outer, n3,
                 inverse, row_fft, interpret):
    """Level 3 (kernel FFT over i3, digit order out) + the final fold.

    axes_outer: position-major (size, bin stride) pairs for the outer
    digits carried in the row index (product of sizes == rows)."""
    br = br.reshape(b * rows, n3)
    bi = bi.reshape(b * rows, n3)
    if row_fft is None:
        yr, yi = _kernel_fft_digit(br, bi, inverse, interpret)
        k3_axes = _digit_axes(n3)
    else:
        yr, yi = row_fft(br, bi, inverse)  # natural rows
        k3_axes = [(n3, 1)]
    axes = list(axes_outer) + [(s, rows * st) for s, st in k3_axes]
    yr = _fold_to_natural(yr, lead, b, n, axes)
    yi = _fold_to_natural(yi, lead, b, n, axes)
    return yr, yi


def fft_large(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Complex-array wrapper: unnormalized large-N DFT, natural order."""
    yr, yi = fft_large_split(jnp.real(x), jnp.imag(x), inverse=inverse)
    return jax.lax.complex(yr, yi)
