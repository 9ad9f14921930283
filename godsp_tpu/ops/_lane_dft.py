"""Exact-f32 radix-2 DIF network along the 128-lane axis (round 4).

Why this exists: the MXU path pays a 6x bf16-limb precision tax — the
128-point lane DFT as dense HIGHEST matmuls costs ~77 GFLOP at the
flagship shape, measured MXU-bound at ~0.44 ms (tools/probe_int8.py:
same-MAC int8 twins run at the SAME wall, so no cheaper MXU mode
exists).  The FFT's algorithmic cost is only 5 N log2 N ~ 0.9 GFLOP —
three orders less — and the VPU computes it in exact f32 with NO
precision tax.  The historical blocker was lane-crossing butterflies;
this module builds them from the two primitives Mosaic handles well:

  * CONTIGUOUS lane slices + lane concat (measured at pure-copy cost,
    BASELINE.md round-3 anatomy probes) for stage half-widths >= 8;
  * full-width lane rolls + select for half-widths 4, 2, 1 (narrow
    lane slices relayout poorly; a roll + mask touches every lane once).

Decimation-in-frequency keeps every read/write contiguous; the price is
bit-reversed bin order along the lanes, which simply becomes part of
the kernel's "digit" layout (position p holds bin brev7(p); consumers
already treat digit order as an opaque permutation fixed by
natural_to_digit / one XLA gather).

All functions here are pure jnp (usable inside a Pallas kernel body or
standalone for CPU tests); tables are trace-time float64 numpy.

Reference analogue: the butterfly stages of fft/radix2.go:104-151 — the
reference's hot loop — mapped onto 8x128 vector registers instead of a
goroutine pool.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

LANES = 128
_SLICE_MIN_W = 8  # narrower stages switch to roll+select

__all__ = [
    "LANES",
    "lane_stage_tables",
    "lane_dif_128",
    "lane_dit_128",
    "brev7",
    "brev_perm_np",
]


@lru_cache(maxsize=None)
def brev_perm_np(bits: int = 7) -> np.ndarray:
    """p -> bit-reverse(p) over `bits` bits (the lane-DIF bin order)."""
    n = 1 << bits
    return np.array(
        [int(format(p, f"0{bits}b")[::-1], 2) for p in range(n)], np.int64
    )


def brev7(p: int) -> int:
    return int(brev_perm_np(7)[p])


@lru_cache(maxsize=None)
def lane_stage_tables(inverse: bool):
    """Per-stage twiddle tables for the 7 radix-2 stages over 128 lanes.

    Slice stages (half-width w in 64, 32, 16, 8): (1, w) planes of
    W_{2w}^j, j in [0, w) (conjugated for the inverse).

    Roll stages (w in 4, 2, 1): full-width (1, 128) planes holding 1 on
    "low" lanes (j mod 2w < w) and W_{2w}^{j mod w} on "high" lanes,
    plus a shared (3, 128) low-lane mask — so the butterfly is two
    rolls, one add/sub blend, and one uniform complex multiply.

    Returned as float32 numpy: {"slice": [(w, twr, twi), ...],
    "roll": [(w, twr, twi), ...], "mask": (3, 128)}.
    """
    sign = 1.0 if inverse else -1.0
    c32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    slices = []
    w = LANES // 2
    while w >= _SLICE_MIN_W:
        tw = np.exp(sign * 1j * np.pi * np.arange(w, dtype=np.float64) / w)
        slices.append((w, c32(tw.real)[None], c32(tw.imag)[None]))
        w //= 2
    rolls = []
    masks = []
    j = np.arange(LANES, dtype=np.int64)
    while w >= 1:
        lo = (j % (2 * w)) < w
        tw = np.where(
            lo, 1.0 + 0j,
            np.exp(sign * 1j * np.pi * (j % w) / w),
        )
        rolls.append((w, c32(tw.real)[None], c32(tw.imag)[None]))
        masks.append(lo.astype(np.float32))
        w //= 2
    return {"slice": slices, "roll": rolls, "mask": np.stack(masks)}


def _roll(x, shift: int):
    """Lane roll, result[j] = x[(j + shift) mod 128], via two contiguous
    slices + concat.  This version is for CPU/tracing use OUTSIDE a
    Pallas kernel: in-kernel, width-1/2/4 lane slices FAULT at runtime
    on v5e (probed round 4), so kernels must pass roll=pltpu_roll
    (pltpu.roll lowers to the native lane rotate)."""
    return jnp.concatenate([x[:, shift:], x[:, :shift]], axis=1)


def pltpu_roll(x, shift: int):
    """In-kernel lane roll with _roll's semantics
    (result[j] = x[(j + shift) mod 128]), via Mosaic's native rotate.
    jnp.roll/pltpu.roll shift in the opposite direction (result[j] =
    x[j - shift]), hence the negation; semantics chip-verified in
    tools/probe_vdif.py."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, -shift % LANES, axis=1)


def lane_dif_128(re, im, tabs, mask, roll=_roll):
    """Forward/inverse 128-point DFT along lanes of (rows, 128) planes.

    tabs/mask from lane_stage_tables (pass jnp arrays in-kernel).
    Output lane p holds bin brev7(p) — the lane-DIF digit order.
    im may be None (real input): imaginary parts materialize at the
    first stage whose twiddles are complex.
    """
    for si, (w, twr, twi) in enumerate(tabs["slice"]):
        nb = LANES // (2 * w)
        out_r, out_i = [], []
        for b in range(nb):
            lo = slice(b * 2 * w, b * 2 * w + w)
            hi = slice(b * 2 * w + w, (b + 1) * 2 * w)
            ar, br_ = re[:, lo], re[:, hi]
            ur = ar + br_
            dr = ar - br_
            if im is None:
                out_r += [ur, dr * twr]
                out_i += [None, dr * twi]
            else:
                ai, bi = im[:, lo], im[:, hi]
                ui = ai + bi
                di = ai - bi
                out_r += [ur, dr * twr - di * twi]
                out_i += [ui, dr * twi + di * twr]
        if im is None and any(v is not None for v in out_i):
            out_i = [
                jnp.zeros_like(out_r[k]) if v is None else v
                for k, v in enumerate(out_i)
            ]
            im = jnp.concatenate(out_i, axis=1)
        elif im is not None:
            im = jnp.concatenate(out_i, axis=1)
        re = jnp.concatenate(out_r, axis=1)
    if im is None:  # pure-real path never happens past stage 1, but be safe
        im = jnp.zeros_like(re)
    for ri, (w, twr, twi) in enumerate(tabs["roll"]):
        m = mask[ri : ri + 1]
        # low lane j partners with x[j+w] (= _roll(x, +w)[j]), high with
        # x[j-w] (= _roll(x, -w)[j])
        pr = m * roll(re, w) + (1.0 - m) * roll(re, -w)
        pi = m * roll(im, w) + (1.0 - m) * roll(im, -w)
        # low lanes: x + partner; high lanes: partner - x, then the
        # uniform twiddle multiply (tables are 1 on low lanes).
        sgn = 2.0 * m - 1.0
        br_ = sgn * re + pr
        bi = sgn * im + pi
        re = br_ * twr - bi * twi
        im = br_ * twi + bi * twr
    return re, im


def lane_dit_128(re, im, tabs, mask, roll=_roll):
    """Inverse-structured network CONSUMING lane-DIF digit order (lane p
    = bin brev7(p)) and emitting natural lane order: the exact mirror of
    lane_dif_128 (roll stages first, then slice stages, butterflies
    transposed).  Pass conjugate tables (lane_stage_tables(inverse=...))
    for an inverse transform; with forward tables it recomputes the
    forward transform's inverse permutation... — in practice it is only
    used with inverse tables: ifft consuming the forward's digit order.

    DIT stage at half-width w: a = u + tw*v, b = u - tw*v with (u, v)
    the (low, high) halves — twiddle applied BEFORE the butterfly.
    """
    for ri in range(len(tabs["roll"]) - 1, -1, -1):
        w, twr, twi = tabs["roll"][ri]
        m = mask[ri : ri + 1]
        # uniform twiddle multiply (1 on low lanes), then blend
        tr = re * twr - im * twi
        ti = re * twi + im * twr
        pr = m * roll(tr, w) + (1.0 - m) * roll(tr, -w)
        pi = m * roll(ti, w) + (1.0 - m) * roll(ti, -w)
        sgn = 2.0 * m - 1.0
        re = sgn * tr + pr
        im = sgn * ti + pi
    for si in range(len(tabs["slice"]) - 1, -1, -1):
        w, twr, twi = tabs["slice"][si]
        nb = LANES // (2 * w)
        out_r, out_i = [], []
        for b in range(nb):
            lo = slice(b * 2 * w, b * 2 * w + w)
            hi = slice(b * 2 * w + w, (b + 1) * 2 * w)
            ur, ui = re[:, lo], im[:, lo]
            vr_, vi_ = re[:, hi], im[:, hi]
            tr = vr_ * twr - vi_ * twi
            ti = vr_ * twi + vi_ * twr
            out_r += [ur + tr, ur - tr]
            out_i += [ui + ti, ui - ti]
        re = jnp.concatenate(out_r, axis=1)
        im = jnp.concatenate(out_i, axis=1)
    return re, im
