"""Large power-of-2 FFT (N > 16384) as a two-level four-step over the
Pallas kernel.

Covers the reference's only benchmark workload — a 2^20-point complex
FFT (fft/fft_test.go:262-280) — at kernel speed.  The per-size Pallas
kernel (ops.pallas_fft) stops at N = 16384, where one batch tile's whole
transform still fits VMEM; beyond that the transform is factored
N = N1 x N2 (Bailey four-step, same math as fft/four_step.py) with the
row transforms batched through the kernel:

    x3[b, i1, i2] = x[b, i1*N2 + i2]
    step 1:  A[b, k1, i2] = sum_i1 F1[k1, i1] x3[b, i1, i2]
             - N1 <= 64:   one HIGHEST einsum against the dense N1-point
                           DFT matrix (contraction over the middle axis;
                           no transposes)
             - N1 >= 256:  transpose to (b, N2, N1) and run the batched
                           Pallas kernel over the minor axis
    step 2:  B = A * W_N^{k1 i2}  (trace-time float64 twiddle table;
             XLA fuses the multiply into the neighboring pass)
    step 3:  Y[b, k1, k2] = kernel FFT of B over i2 (minor axis)
    step 4:  natural order = transpose (b, N1, N2) -> (b, N2, N1)
             (bin k = k1 + N1*k2 lands at position k2*N1 + k1).

Everything runs on split-complex float32 planes: complex XLA ops compile
pathologically slowly through this environment's remote-compile path
(a single c64 transpose measured 140 s to compile), while f32 plane
transposes compile in seconds and run at near copy bandwidth.

Reference parity: same transform as fft/radix2.go:80-153 at sizes the
reference reaches via its 2^20 benchmark; validated against numpy and
the four-step oracle in tests/test_fft.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from godsp_tpu.fft.four_step import dft_matrix, twiddle_2d

__all__ = ["large_supported", "fft_large_split", "fft_large"]

_HI = jax.lax.Precision.HIGHEST
_KERNEL_MAX = 16384  # ops.pallas_fft.supported_size upper bound
_ROW_N = 8192  # preferred row length: the kernel's lane-slice structure
# tops out here (ops.pallas_fft._LS_MAX_N1); 16384 falls to the ~2x
# slower batched-3D form, so a wider direct step-1 + 8192-point rows
# wins through 2^20.
_DIRECT_MAX = 128  # largest N1 solved by one dense einsum


def _split(n: int) -> tuple[int, int]:
    """n = N1 * N2 with N2 kernel-sized and N1 either direct (<= 128) or
    kernel-sized itself (balanced split for n > 2^20)."""
    if n <= _ROW_N * _DIRECT_MAX:  # up to 2^20
        return n // _ROW_N, _ROW_N
    l2 = n.bit_length() - 1
    n1 = 1 << (l2 - l2 // 2)  # larger half
    return n1, n // n1


# Smallest size routed through this module.  16384 sits in both worlds:
# the per-size kernel covers it, but only in the ~2x slower batched-3D
# structure (_LS_MAX_N1 stops at 8192), while this split runs it as two
# lane-slice 8192-rows + a direct N1=2 butterfly.  set_large_min(16384)
# selects the split (chip A/B toggle; see BASELINE.md).
_MIN_N = _KERNEL_MAX * 2


def set_large_min(n: int) -> None:
    """Lowest FFT size dispatched through the two-level four-step
    (default 32768; 16384 routes n=16384 here instead of the kernel's
    batched-3D form)."""
    global _MIN_N
    _MIN_N = int(n)


def large_supported(n: int) -> bool:
    """Power-of-2 sizes above the single-kernel limit, through 2^28."""
    if n & (n - 1) or n < _MIN_N:
        return False
    n1, n2 = _split(n)
    if n1 < 2:  # n < 2*_ROW_N has no valid two-level factoring here
        return False
    return n2 <= _KERNEL_MAX and (n1 <= _DIRECT_MAX or 256 <= n1 <= _KERNEL_MAX)


_TW_SPLIT = 128  # lane factor of the factored twiddle (balanced splits)


@lru_cache(maxsize=None)
def _tables(n: int, inverse: bool):
    """(F1 planes | None, twiddle) as float64 numpy (the analogue of
    radix2.go:26-69's cache; on-the-fly f32 angle computation would lose
    the 120 dB bound at these N).  Cast to the plane dtype at use.

    Direct splits (n1 <= 128) keep the dense (n1, n2) table — it is
    small and single-rounded.  Balanced splits factor it: with
    i2 = a*S + b (S = _TW_SPLIT),

        T[k1, i2] = W_N^{k1 i2} = W_N^{k1 a S} * W_N^{k1 b}
                  = T_hi[k1, a] * T_lo[k1, b],

    two (n1, n2/S) / (n1, S) tables whose on-device product XLA fuses
    into the twiddle multiply — the N-sized table (4.3 GB host / 2 GB
    device at 2^28) never exists.  Angle products k1*a*S < 2^53 stay
    exact in f64; the one extra f32 rounding of the device-side complex
    product costs ~2-3 dB against a ~135 dB measurement.
    Twiddle shape is ("dense", re, im) or ("fac", (hr, hi), (lr, li)).
    """
    n1, n2 = _split(n)
    f1 = dft_matrix(n1) if n1 <= _DIRECT_MAX else None
    if f1 is not None:
        t = twiddle_2d(n1, n2)
        if inverse:
            t = np.conj(t)
            f1 = np.conj(f1)
        return (
            (f1.real.copy(), f1.imag.copy()),
            ("dense", t.real.copy(), t.imag.copy()),
        )
    s = _TW_SPLIT
    sign = 2j * np.pi if inverse else -2j * np.pi
    k1 = np.arange(n1, dtype=np.float64)
    th = np.exp(sign * np.outer(k1, np.arange(n2 // s, dtype=np.float64) * s) / n)
    tl = np.exp(sign * np.outer(k1, np.arange(s, dtype=np.float64)) / n)
    return None, (
        "fac",
        (th.real.copy(), th.imag.copy()),
        (tl.real.copy(), tl.imag.copy()),
    )


def _kernel_fft_digit(xr, xi, inverse, interpret=False):
    from godsp_tpu.ops.pallas_fft import fft_pow2_split

    return fft_pow2_split(
        xr, xi, inverse=inverse, order="digit", interpret=interpret
    )


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
    n1, n2 = _split(n)
    lead = xr.shape[:-1]
    b = int(np.prod(lead, dtype=np.int64)) if lead else 1
    x3r = xr.reshape(b, n1, n2)
    x3i = xi.reshape(b, n1, n2)
    fdt = x3r.dtype  # f32 on TPU; f64 under the CPU x64 parity tests

    f1p, tw = _tables(n, inverse)

    # ---- Step 1: DFT over i1 (middle axis) ----
    if f1p is not None:
        f1r = jnp.asarray(f1p[0], dtype=fdt)
        f1i = jnp.asarray(f1p[1], dtype=fdt)
        mm = lambda F, v: jnp.einsum("ki,bin->bkn", F, v, precision=_HI)
        ar = mm(f1r, x3r) - mm(f1i, x3i)
        ai = mm(f1r, x3i) + mm(f1i, x3r)
    else:
        # Kernel-sized N1: transpose so i1 is minor, batched kernel FFT.
        xtr = jnp.swapaxes(x3r, 1, 2)  # (b, N2=i2, N1=i1)
        xti = jnp.swapaxes(x3i, 1, 2)
        if row_fft is None:
            from godsp_tpu.ops.pallas_fft import fft_pow2_split

            atr, ati = fft_pow2_split(
                xtr, xti, inverse=inverse, interpret=interpret
            )
        else:
            atr, ati = row_fft(xtr, xti, inverse)  # (b, i2, k1)
        ar = jnp.swapaxes(atr, 1, 2)  # (b, k1, i2)
        ai = jnp.swapaxes(ati, 1, 2)

    # ---- Step 2: twiddle W_N^{k1 i2} (fused elementwise) ----
    if tw[0] == "dense":
        twr = jnp.asarray(tw[1], dtype=fdt)
        twi = jnp.asarray(tw[2], dtype=fdt)
        br = ar * twr - ai * twi
        bi = ar * twi + ai * twr
    else:
        _, (thr, thi), (tlr, tli) = tw
        s = tlr.shape[1]
        thr = jnp.asarray(thr, dtype=fdt)[:, :, None]
        thi = jnp.asarray(thi, dtype=fdt)[:, :, None]
        tlr = jnp.asarray(tlr, dtype=fdt)[:, None, :]
        tli = jnp.asarray(tli, dtype=fdt)[:, None, :]
        twr = thr * tlr - thi * tli  # (n1, n2/s, s) — fused, never stored
        twi = thr * tli + thi * tlr
        a4r = ar.reshape(b, n1, n2 // s, s)
        a4i = ai.reshape(b, n1, n2 // s, s)
        br = (a4r * twr - a4i * twi).reshape(b, n1, n2)
        bi = (a4r * twi + a4i * twr).reshape(b, n1, n2)

    # ---- Step 3 + 4: kernel FFT over i2 (digit order out) and ONE
    # combined transpose to natural: kernel row position k1'*128 + k2'
    # holds k2 = k1' + (N2/128)*k2', and bin k = k1 + N1*k2 lives at flat
    # position k2*N1 + k1 — i.e. out viewed (b, 128, N2/128, N1) is the
    # (0, 3, 2, 1) transpose of the digit output viewed
    # (b, N1, N2/128, 128).  Folding the kernel's digit fix into the
    # four-step's own reorder saves a full memory pass.
    if row_fft is None:
        from godsp_tpu.ops.pallas_fft import _split2_active

        yr, yi = _kernel_fft_digit(br, bi, inverse, interpret)
        if _split2_active(n2):
            # Split-digit rows (n2 = 16384): position half*8192 +
            # k1q*128 + k2q holds row-bin 2*k1q + 128*k2q + half; bin
            # k = k1 + N1*k2 lives at k2*N1 + k1, so natural is the
            # (b, k2q, k1q, half, N1) view of the (b, N1, half, k1q,
            # k2q) digit view — still ONE fused transpose.
            shp = (b, n1, 2, n2 // 256, 128)
            perm = (0, 4, 3, 2, 1)
            yr = jnp.transpose(yr.reshape(shp), perm).reshape(*lead, n)
            yi = jnp.transpose(yi.reshape(shp), perm).reshape(*lead, n)
        else:
            m = n2 // 128
            perm = (0, 3, 2, 1)
            yr = jnp.transpose(yr.reshape(b, n1, m, 128), perm).reshape(
                *lead, n
            )
            yi = jnp.transpose(yi.reshape(b, n1, m, 128), perm).reshape(
                *lead, n
            )
    else:
        yr, yi = row_fft(br, bi, inverse)  # (b, k1, k2) natural rows
        yr = jnp.swapaxes(yr, 1, 2).reshape(*lead, n)
        yi = jnp.swapaxes(yi, 1, 2).reshape(*lead, n)
    return yr, yi


def fft_large(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Complex-array wrapper: unnormalized large-N DFT, natural order."""
    yr, yi = fft_large_split(jnp.real(x), jnp.imag(x), inverse=inverse)
    return jax.lax.complex(yr, yi)
