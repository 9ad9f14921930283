"""Fused Welch-periodogram accumulation as one Pallas TPU kernel.

The end-to-end hot path of the framework (reference pwelch.go:107-122 is
a serial per-segment loop of pad -> window -> FFTReal -> |.|^2 ->
accumulate): here one kernel invocation per tile of `bt` segments does
ALL of it in VMEM —

  frame    : overlapped segments are cut from a contiguous sample block
             (plus its right halo) by m = nfft/stride lane-aligned
             reshapes — no gathers, and overlapped samples are read from
             HBM exactly once (the XLA fallback materializes frames to
             HBM, re-reading every overlapped sample);
  window   : one VPU multiply by the pad-length taper table;
  FFT      : the same two-step MXU factorization as ops.pallas_fft
             (N = n1 x 128, DFT matmul / twiddle / lane contraction),
             with the real input halving step 1 (ai needs no x.im term);
  |.|^2    : VPU square-accumulate, digit (k1-major) bin order — the
             reorder is applied by the wrapper to the tiny reduced
             output, so it is effectively free (pallas_fft docstring);
  reduce   : the masked sum over the tile's segments is ONE
             (1,bt)@(bt,N) MXU contraction with the segment-validity
             mask as the left operand — masking and reduction in the
             same op.

HBM traffic per tile: read bt*stride + halo signal samples + write one
(1, N) partial row.  For 50% overlap that is ~4 bytes/sample vs ~20 for
the unfused path (frames write+read at 2x, spectrum write+read), on top
of removing all intermediate HBM round-trips.

Geometry supported (checked by `fused_supported`): pad >= nfft with
pad in ops.pallas_fft.supported_size (256..16384), nfft % 128 == 0, and
either a lane-aligned stride (stride % 128 == 0, nfft % stride == 0 —
0%, 50%, 75%, ... overlap, pure-reshape framing) or any stride with
stride % 16 == 0 (phase-class framing: one static lane roll per class,
<= 8 classes — covers audio hops like 160/320/480).  Everything else
falls back to the XLA path in spectral.pwelch.

Reference parity: bit-semantics of pwelch.go:101-121 (one-sided lp
bins, interior doubling and normalization applied by the caller);
golden-tested against spectral.pwelch in tests/test_pallas.py.
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
    _fft_steps_real,
    _rfft_steps_packed,
    _rfft_tables,
    default_batch_tile,
    fft_real_tables,
    rfft_supported_size,
    supported_size,
)

__all__ = [
    "fused_supported",
    "frame_class_perm",
    "pwelch_power_partials",
    "pwelch_power_sum",
    "digit_to_natural_bins",
    "packed_to_natural_onesided",
]

_F32 = jnp.float32
_BF16 = jnp.bfloat16
_HI = jax.lax.Precision.HIGHEST


_MAX_PHASES = 8  # cap on 128/gcd(stride, 128): one static roll per phase


def _phases(stride: int) -> int:
    import math

    return LANES // math.gcd(stride, LANES)


def fused_supported(nfft: int, pad: int, stride: int) -> bool:
    """True if the fused kernel covers this Pwelch geometry.

    pad >= nfft (segments zero-extended in VMEM before the FFT,
    pwelch.go:108); the FFT size is pad.  Lane-aligned strides
    (stride % 128 == 0, nfft % stride == 0) frame by pure reshapes;
    non-aligned strides down to stride % 16 == 0 (e.g. audio hops 160,
    320, 480) frame via <= 8 phase classes, each one static lane roll +
    reshapes (see _windowed_frames) — frames emerge class-ordered, which
    the masked segment reduction absorbs by permuting the mask.
    """
    return (
        pad >= nfft
        and supported_size(pad)
        and nfft % LANES == 0
        and stride > 0
        and _phases(stride) <= _MAX_PHASES
    )


def framing_halo(nfft: int, stride: int) -> int:
    """Lanes of right-halo each tile must load for in-kernel framing.

    Exact-division lane-aligned strides read nfft - stride past the
    block; the generalized (phase-class / partial-period) framing reads
    up to (P-1)*stride + ceil-period slack plus a <=128-lane roll-wrap
    margin (see _windowed_frames), rounded up to whole lanes.
    """
    P = _phases(stride)
    if P == 1 and nfft % stride == 0:
        return nfft - stride
    L = stride * P
    m_full, rem = divmod(nfft, L)
    j_last = m_full if rem else m_full - 1
    return -(-((L - stride) + j_last * L + LANES) // LANES) * LANES


def frame_class_perm(bt: int, stride: int) -> np.ndarray:
    """perm such that class-ordered frame j is original segment perm[j].

    Class p (of P = 128/gcd(stride,128)) holds segments s ≡ p (mod P) in
    k order: j = p*bt_p + k  ->  s = p + k*P.
    """
    P = _phases(stride)
    bt_p = bt // P
    j = np.arange(bt)
    return (j // bt_p) + (j % bt_p) * P


def _segs_per_tile(nfft: int) -> int:
    # Cap so the ~7 live (bt, nfft) f32 intermediates stay well under VMEM.
    return max(8, min(default_batch_tile(nfft), (1 << 21) // (4 * nfft)))


def _windowed_frames(block_ref, halo_ref, w_ref, bt, stride, nfft, pad, halo):
    """Frame + zero-extend + window one tile, entirely in VMEM.

    Per-tile operands arrive as (1, 1, X) blocks of (n, 1, X) arrays —
    the unit sublane dim satisfies Mosaic's block-shape rule ("equal to
    the array dim") where a (1, X) row block of an (n, X) array would
    not (sublane blocks must be 8-divisible), and 1-D lane-only blocks
    miscompile the lane->sublane frame split.

    Returns (bt, pad) windowed real frames:
    frames[s] = ext[s*stride : s*stride + nfft] zero-extended to pad and
    tapered by the PAD-length window (pwelch.go:108-109).

    Lane-aligned strides use m = nfft/stride pure reshapes.  Otherwise
    segments are grouped into P = 128/gcd(stride,128) phase classes:
    class p's starts p*stride + k*L (L = lcm(stride,128)) become
    128-aligned after ONE static roll by (p*stride) mod 128, and the
    same reshape trick applies at period L.  Frames come out
    CLASS-ORDERED (frame_class_perm) — callers permute the mask (sum
    reductions) or un-permute outputs (per-frame kernels).
    """
    T = bt * stride
    ext = block_ref[:].reshape(1, T)
    if halo:
        ext = jnp.concatenate([ext, halo_ref[:].reshape(1, halo)], axis=1)
    P = _phases(stride)
    if P == 1 and nfft % stride == 0:
        m = nfft // stride
        if m == 1:
            frames = ext[:, :T].reshape(bt, stride)
        else:
            # m lane-aligned reshapes of the extended block — no gathers.
            frames = jnp.concatenate(
                [
                    ext[:, k * stride : k * stride + T].reshape(bt, stride)
                    for k in range(m)
                ],
                axis=1,
            )
    else:
        L = stride * P  # lcm(stride, 128): multiple of 128
        bt_p = bt // P
        m_full, rem = divmod(nfft, L)  # rem is a multiple of 128
        classes = []
        E = ext.shape[1]
        for p in range(P):
            o = p * stride
            a, c = divmod(o, LANES)  # start = a*128 + c in unrolled coords
            # Left-rotate by c (pltpu.roll takes non-negative right shifts):
            R = pltpu.roll(ext, E - c, 1) if c else ext
            base = a * LANES
            parts = []
            for j in range(m_full + (1 if rem else 0)):
                lo = base + j * L
                span = R[:, lo : lo + bt_p * L].reshape(bt_p, L)
                parts.append(span if j < m_full else span[:, :rem])
            classes.append(jnp.concatenate(parts, axis=1))
        frames = jnp.concatenate(classes, axis=0)  # (bt, nfft), class order
    if pad > nfft:
        frames = jnp.pad(frames, ((0, 0), (0, pad - nfft)))
    return frames * w_ref[:]


def _halo_rows(nfft: int, stride: int) -> int:
    """Sublane rows of right-halo for the 2-D-block framing path,
    rounded up to a multiple of 8 (keeps bt + hrows 8-divisible for the
    sublane rolls)."""
    m = -(-nfft // stride)
    if m <= 1:
        return 0
    return -(-(m - 1) // 8) * 8


def _framing_2d_eligible(nfft: int, stride: int) -> bool:
    """Lane-aligned strides frame from (bt, stride) 2-D blocks.  When
    stride does not divide nfft, each frame is the lane SLICE [:nfft]
    of ceil(nfft/stride) concatenated rows — legal when nfft is a lane
    multiple (slices land on 128-lane boundaries)."""
    return (
        _framing_2d
        and stride % LANES == 0
        and (nfft % stride == 0 or nfft % LANES == 0)
    )


def _windowed_frames_2d(block_ref, halo_ref, w_ref, bt, stride, nfft, pad,
                        hrows):
    """2-D-block framing: signal rows arrive as (bt, stride) — a FREE
    row-major reshape on the XLA side — plus (hrows, stride) right-halo
    rows; frame s = rows s..s+m-1 concatenated along lanes, built by
    m-1 sublane rolls.  Round-5 fix for the flat-row load: a (1, T)
    single-sublane block wastes 7/8 of every (8, 128) VMEM tile's DMA —
    measured 52 ns/frame of pure load at nfft=1024/stride=512 (the
    whole kernel's FFT is 30); 2-D blocks load at 10 ns/frame
    (tools/probe_pwfloor.py), taking the fused kernel from 77 to
    33 ns/frame end-to-end, bit-identical."""
    m = -(-nfft // stride)  # rows spanned per frame (ceil)
    x2 = block_ref[:].reshape(bt, stride)
    if m == 1:
        frames = x2[:, :nfft]  # nfft < stride: head lanes of each row
    else:
        h2 = halo_ref[:].reshape(hrows, stride)
        ext_rows = jnp.concatenate([x2, h2], axis=0)  # (bt + hrows, stride)
        S = bt + hrows
        parts = [x2]
        for k in range(1, m):
            rolled = pltpu.roll(ext_rows, S - k, 0)  # row i <- row i+k
            parts.append(rolled[:bt])
        frames = jnp.concatenate(parts, axis=1)  # (bt, m*stride)
        if m * stride > nfft:
            # stride does not divide nfft: lane-slice the row concat
            # (nfft is a lane multiple per _framing_2d_eligible)
            frames = frames[:, :nfft]
    if pad > nfft:
        frames = jnp.pad(frames, ((0, 0), (0, pad - nfft)))
    return frames * w_ref[:]


def _phase_rows_geom(nfft: int, stride: int) -> tuple[int, int, int]:
    """(P, W, mc) for phase-class 2-D framing: rows of width
    W = P*stride (always a lane multiple), with class-c frames starting
    at lane offset c*stride of row k; mc = extra rows a frame may span
    beyond its own."""
    P = _phases(stride)
    W = P * stride
    mc = -(-((P - 1) * stride + nfft) // W) - 1
    return P, W, mc


def _halo_rows_phase(nfft: int, stride: int) -> int:
    _, _, mc = _phase_rows_geom(nfft, stride)
    if mc <= 0:
        return 0
    return -(-mc // 8) * 8


def _framing_2dp_eligible(nfft: int, stride: int, bt: int) -> bool:
    """Phase-class strides (stride % 128 != 0) frame from (rpt, P*stride)
     2-D rows: ONE lane roll per class aligns the class's frame starts,
    then the slice lands on lane boundaries (nfft % 128 == 0).  Needs
    rpt = bt/P rows per tile, 8-divisible for the sublane rolls."""
    if not _framing_2d or nfft % LANES:
        return False
    P = _phases(stride)
    return P > 1 and bt >= 8 * P and bt % (8 * P) == 0


def framing_mode(nfft: int, stride: int, bt: int = 0) -> str:
    """Framing structure for this geometry: "2d" (lane-aligned strides),
    "2dp" (phase-class strides via per-class lane rolls, round 5), or
    "row" (flat blocks, the fallback)."""
    if _framing_2d_eligible(nfft, stride):
        return "2d"
    if _framing_2dp_eligible(nfft, stride, bt):
        return "2dp"
    return "row"


def _windowed_frames_2d_phase(block_ref, halo_ref, w_ref, bt, stride,
                              nfft, pad, hrows):
    """Phase-class 2-D framing: rows of width W = P*stride (a lane
    multiple); class-c frames start at lane offset c*stride of row k,
    so ONE circular lane roll per class aligns the whole class and the
    slice [:, :nfft] lands on lane boundaries.  Output class-major
    (frame_class_perm order), like the flat-row path.  Chip: lane rolls
    run at copy speed (~900 GB/s probe), vs the flat (1, T) block's
    1/5-rate DMA."""
    P, W, mc = _phase_rows_geom(nfft, stride)
    rpt = bt // P
    x2 = block_ref[:].reshape(rpt, W)
    if mc > 0:
        h2 = halo_ref[:].reshape(hrows, W)
        ext_rows = jnp.concatenate([x2, h2], axis=0)
        S = rpt + hrows
        parts = [x2]
        for k in range(1, mc + 1):
            parts.append(pltpu.roll(ext_rows, S - k, 0)[:rpt])
        wide = jnp.concatenate(parts, axis=1)  # (rpt, (mc+1)*W)
    else:
        wide = x2
    Wt = wide.shape[1]
    stacks = []
    for c in range(P):
        o = c * stride
        v = pltpu.roll(wide, Wt - o, 1) if o else wide  # left-shift by o
        stacks.append(v[:, :nfft])
    frames = jnp.concatenate(stacks, axis=0)  # (bt, nfft), class-major
    if pad > nfft:
        frames = jnp.pad(frames, ((0, 0), (0, pad - nfft)))
    return frames * w_ref[:]


def windowed_frames(block_ref, halo_ref, w_ref, bt, stride, nfft, pad,
                    halo, framing):
    """Framing dispatch shared by every frame->window->FFT kernel
    (pwelch, stft/spectrogram/mel, csd)."""
    if framing == "2d":
        return _windowed_frames_2d(
            block_ref, halo_ref, w_ref, bt, stride, nfft, pad,
            _halo_rows(nfft, stride),
        )
    if framing == "2dp":
        return _windowed_frames_2d_phase(
            block_ref, halo_ref, w_ref, bt, stride, nfft, pad,
            _halo_rows_phase(nfft, stride),
        )
    return _windowed_frames(
        block_ref, halo_ref, w_ref, bt, stride, nfft, pad, halo
    )


def framing_blocks(ext2, n_tiles, bt, stride, nfft, halo, framing):
    """Signal-side operands for the chosen framing: (inputs, in_specs,
    halo_for_kernel).  ext2: (R, L) f32 rows (each row framed
    independently); the caller guarantees every masked/emitted segment's
    samples exist in ext2 (zero-padded here to tile granularity).

    "2d"/"2dp": 2-D row blocks + halo rows — the flat (1, T)
    single-sublane block these replace loaded at 1/5 the DMA rate (see
    _windowed_frames_2d).  The two modes differ only in row geometry:
    (rpt, W) = (bt, stride) for lane-aligned strides, (bt/P, P*stride)
    for phase classes.  For R == 1 the pad runs on the FLAT view and
    the halo gather on 2-D rows: a padded (1, L) intermediate is itself
    single-sublane-tiled (8x traffic — a CLAUDE.md invariant) and a
    batched 3-D gather lowers worse than the 2-D row take.
    """
    R = ext2.shape[0]
    T = bt * stride
    if framing in ("2d", "2dp"):
        if framing == "2dp":
            P, W, _mc = _phase_rows_geom(nfft, stride)
            rpt = bt // P
            hrows = _halo_rows_phase(nfft, stride)
        else:
            rpt, W = bt, stride
            hrows = _halo_rows(nfft, stride)
        rows_needed = n_tiles * rpt + hrows
        need2 = rows_needed * W
        if R == 1:
            flat = ext2.reshape(-1)
            if flat.shape[0] < need2:
                flat = jnp.pad(flat, (0, need2 - flat.shape[0]))
            rows2 = flat[:need2].reshape(1, rows_needed, W)
        else:
            if ext2.shape[-1] < need2:
                ext2 = jnp.pad(ext2, ((0, 0), (0, need2 - ext2.shape[-1])))
            rows2 = ext2[:, :need2].reshape(R, rows_needed, W)
        blocks = rows2[:, : n_tiles * rpt].reshape(R * n_tiles, rpt, W)
        inputs = [blocks]
        in_specs = [pl.BlockSpec(
            (1, rpt, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )]
        if hrows:
            ridx = (
                (jnp.arange(n_tiles)[:, None] + 1) * rpt
                + jnp.arange(hrows)[None, :]
            )
            if R == 1:
                # 2-D row gather (axis 0) lowers to clean contiguous-row
                # DMAs; the batched 3-D form (axis 1 under a unit
                # leading dim) does not.
                halos = jnp.take(rows2[0], ridx, axis=0).reshape(
                    n_tiles, hrows, W
                )
            else:
                halos = jnp.take(rows2, ridx, axis=1).reshape(
                    R * n_tiles, hrows, W
                )
            inputs.append(halos)
            in_specs.append(pl.BlockSpec(
                (1, hrows, W), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ))
        return inputs, in_specs, hrows * W
    need = n_tiles * T + halo
    if ext2.shape[-1] < need:
        ext2 = jnp.pad(ext2, ((0, 0), (0, need - ext2.shape[-1])))
    blocks = ext2[:, : n_tiles * T].reshape(R * n_tiles, 1, T)
    inputs = [blocks]
    in_specs = [pl.BlockSpec(
        (1, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )]
    if halo:
        idx = (jnp.arange(n_tiles)[:, None] + 1) * T + jnp.arange(
            halo)[None, :]
        halos = jnp.take(ext2, idx, axis=-1).reshape(R * n_tiles, 1, halo)
        inputs.append(halos)
        in_specs.append(pl.BlockSpec(
            (1, 1, halo), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ))
    return inputs, in_specs, halo


def _pwelch_kernel(
    *refs,
    bt: int,
    stride: int,
    nfft: int,
    pad: int,
    halo: int,
    half: bool = False,
    framing: str = "row",
):
    """One tile: frame -> window -> FFT -> |.|^2 -> masked segment sum.

    half=True contracts against the HALF (Hermitian) G tables
    (ops.pallas_fft._rfft_steps_packed): for real frames the one-sided
    Welch sum needs only bins 0..pad/2, so the dominant HIGHEST MXU
    stream is HALVED.  Output row is then the packed layout
    (pad/2 lanes + 128 Nyquist-broadcast lanes; see
    packed_to_natural_onesided)."""
    if halo:
        block_ref, halo_ref, mask_ref, w_ref, *rest = refs
    else:
        block_ref, mask_ref, w_ref, *rest = refs
        halo_ref = None
    *tabs, out_ref = rest

    xw = windowed_frames(
        block_ref, halo_ref, w_ref, bt, stride, nfft, pad, halo, framing
    )
    if half:
        ypr, ypi, nyq = _rfft_steps_packed(xw, tuple(tabs), pad // LANES)
        p = jnp.concatenate(
            [ypr * ypr + ypi * ypi,
             (nyq * nyq) * jnp.ones((1, LANES), _F32)],
            axis=1,
        )  # (bt, pad/2 + 128), packed bin order
    else:
        cr, ci = _fft_steps_real(xw, tuple(tabs), bt, pad // LANES)
        p = cr * cr + ci * ci  # (bt, pad), digit order (k1-major)

    # ---- masked segment reduction in one MXU contraction ----
    mask_row = mask_ref[:].reshape(1, -1)[:, :bt]  # 128-lane padded block
    row = jax.lax.dot_general(
        mask_row, p,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=_F32, precision=_HI,
    )
    out_ref[:] = row.reshape(1, 1, p.shape[1])


def pwelch_power_partials(
    ext: jax.Array,
    mask: jax.Array,
    w: jax.Array,
    nfft: int,
    stride: int,
    pad: int | None = None,
    segs_per_tile: int | None = None,
    interpret: bool = False,
    packed_half: bool = False,
) -> jax.Array:
    """Masked per-tile periodogram sums, digit bin order.

    packed_half=True (requires rfft_supported_size(pad)) contracts
    against the half Hermitian tables — HALF the MXU stream — and
    returns (..., n_tiles, pad/2 + 128) rows in the PACKED one-sided
    layout (reorder reduced rows with packed_to_natural_onesided).

    ext:  (..., L_ext) float32 samples; segment s reads
          ext[..., s*stride : s*stride + nfft] (the caller appends any
          cross-shard/stream halo, cf. parallel.pwelch_sharded).
    mask: (..., S) float32 validity (1 = count segment s, 0 = drop); S
          caps the segment count.  ext must cover every MASKED segment;
          both are zero-padded here to tile granularity (an all-zero
          frame contributes |FFT(0)|^2 = 0, and padded mask rows are 0).
    w:    (pad,) window taper table (pwelch.go:109, hoisted).
    pad:  FFT length >= nfft (default nfft); segments are zero-extended
          to it in VMEM (pwelch.go:108).

    Returns (..., n_tiles, pad): per-tile sums over segments of
    |FFT(w * frame)|^2 in the kernel's digit order — pass through
    `digit_to_natural_bins` (or sum tiles first; summing commutes).
    """
    pad = pad or nfft
    if not fused_supported(nfft, pad, stride):
        raise ValueError(
            f"geometry (nfft={nfft}, pad={pad}, stride={stride}) unsupported "
            "by the fused kernel"
        )
    if packed_half and not rfft_supported_size(pad):
        raise ValueError(
            f"packed_half requires an rfft-kernel pad size, got {pad}"
        )
    out_w = pad // 2 + LANES if packed_half else pad
    S = mask.shape[-1]
    lead = ext.shape[:-1]
    if mask.shape[:-1] != lead:
        raise ValueError("ext and mask must share leading dimensions")
    if S == 0:
        return jnp.zeros(lead + (0, out_w), dtype=_F32)
    bt = segs_per_tile or _segs_per_tile(pad)
    bt = min(bt, max(8, S))
    bt = max(8, 1 << (bt.bit_length() - 1))  # pow2: keeps T 1024-aligned
    n_tiles = pl.cdiv(S, bt)
    T = bt * stride
    P = _phases(stride)
    halo = framing_halo(nfft, stride)

    ext2 = ext.reshape(-1, ext.shape[-1]).astype(_F32)
    mask2 = mask.reshape(-1, S).astype(_F32)
    R = ext2.shape[0]

    pad_s = n_tiles * bt - S
    if pad_s:
        mask2 = jnp.pad(mask2, ((0, 0), (0, pad_s)))

    framing = framing_mode(nfft, stride, bt)
    inputs, in_specs, halo = framing_blocks(
        ext2, n_tiles, bt, stride, nfft, halo, framing
    )
    blocks = inputs[0]
    mp = max(bt, LANES)
    masks = mask2.reshape(R * n_tiles, bt)
    if P > 1:
        # Frames emerge class-ordered: row j of the kernel's frame stack
        # is segment frame_class_perm(bt, stride)[j] of its tile, so the
        # mask columns follow the same permutation (the summed result is
        # order-invariant).
        masks = masks[:, frame_class_perm(bt, stride)]
    masks = jnp.pad(masks, ((0, 0), (0, mp - bt)))
    inputs.append(masks.reshape(R * n_tiles, 1, mp))
    in_specs.append(
        pl.BlockSpec((1, 1, mp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    )

    inputs.append(jnp.asarray(w, _F32).reshape(1, pad))
    in_specs.append(
        pl.BlockSpec((1, pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )

    if packed_half:
        tabs = _rfft_tables(pad)
        order = ("gr", "gi", "gs", "alt")
    else:
        order, tabs = fft_real_tables(pad)
    for key in order:
        t = jnp.asarray(tabs[key])
        inputs.append(t)
        in_specs.append(
            pl.BlockSpec(
                t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM
            )
        )

    n1 = pad // LANES
    # Step 1 (real): 2 matmuls over n1; step 3: 3 over 128 (HALVED by
    # the Hermitian tables when packed_half, which also shrinks the
    # mask-sum contraction and the store to out_w = pad/2 + 128 lanes
    # instead of pad).
    f3 = 3 * LANES if packed_half else 6 * LANES
    flops = R * n_tiles * bt * (pad * (2 * n1 + f3) + 8 * out_w)
    bytes_acc = 4 * (R * n_tiles * (T + halo + bt) + R * n_tiles * out_w)

    # Inside shard_map with vma checking, the output must declare which
    # mesh axes it varies over — it varies exactly as the samples do.
    vma = getattr(jax.typeof(blocks), "vma", None) or frozenset()
    out = pl.pallas_call(
        partial(
            _pwelch_kernel,
            bt=bt, stride=stride, nfft=nfft, pad=pad, halo=halo,
            half=packed_half, framing=framing,
        ),
        grid=(R * n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, out_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R * n_tiles, 1, out_w), _F32, vma=vma),
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(bytes_acc), transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20,
            dimension_semantics=(_dim_sem,),
        ),
        interpret=interpret,
    )(*inputs)
    return out.reshape(*lead, n_tiles, out_w)


# 2-D-block framing for lane-aligned strides (round 5).  Chip numbers
# at nfft=1024/stride=512 (tools/probe_pwfloor.py, one session):
# flat-row kernel 77 ns/frame of which the (1, T) block LOAD alone is
# 52 (a single-sublane block wastes 7/8 of each (8,128) VMEM tile's
# DMA); 2-D blocks load at 10 ns/frame and the full kernel drops to
# 33 ns/frame — within ~10% of its contraction floor twin (31) and the
# standalone rfft kernel (30).  Output bit-identical.  Toggleable for
# A/B probes; phase-class strides keep the flat-row path.
_framing_2d = True


def set_framing_2d_enabled(on: bool) -> None:
    """A/B toggle for the 2-D-block framing path (lane-aligned strides)."""
    global _framing_2d
    _framing_2d = bool(on)


# Grid semantics for the fused kernel.  Tiles are independent (each
# writes its own partial row), so "parallel" is legal and lets grid
# steps overlap — the same change that bought the FFT kernels their
# round-3 win (per-slice stores under "arbitrary" serialize).  Probe
# verdict (probe_pwfloor): parallel ~= arbitrary here — the load layout
# was the binding constraint, not store semantics.
_dim_sem = "parallel"


def set_pwelch_dim_semantics(sem: str) -> None:
    """A/B toggle ("parallel" | "arbitrary") for chip probes."""
    global _dim_sem
    if sem not in ("parallel", "arbitrary"):
        raise ValueError(f"unknown dimension semantics: {sem}")
    _dim_sem = sem


def digit_to_natural_bins(p: jax.Array, nfft: int) -> jax.Array:
    """Reorder a (..., nfft) digit-order bin vector to natural order.

    The kernel stores bin k = k1 + n1*k2 at position k1*128 + k2
    (ops.pallas_fft layout note); applied to the tiny reduced power rows
    this transpose is effectively free.
    """
    n1 = nfft // LANES
    lead = p.shape[:-1]
    return (
        p.reshape(*lead, n1, LANES).swapaxes(-1, -2).reshape(*lead, nfft)
    )


def packed_to_natural_onesided(p: jax.Array, pad: int) -> jax.Array:
    """Packed one-sided power row (..., pad/2 + 128) -> natural bins
    0..pad/2 (length pad/2 + 1).

    Packed layout (ops.pallas_fft rfft block comment): position
    j*128 + h*64 + q holds bin (2j + h) + n1*q; the 128 extras lanes all
    broadcast the Nyquist bin.  Applied to reduced rows, this reorder is
    effectively free (same stance as digit_to_natural_bins)."""
    lead = p.shape[:-1]
    nh = (p.shape[-1] - LANES)
    n1 = 2 * nh // LANES
    v = p[..., :nh].reshape(*lead, n1 // 2, 2, LANES // 2)
    nd = v.ndim
    perm = tuple(range(nd - 3)) + (nd - 1, nd - 3, nd - 2)
    nat = jnp.transpose(v, perm).reshape(*lead, nh)
    return jnp.concatenate([nat, p[..., nh : nh + 1]], axis=-1)


def pwelch_power_sum(
    x: jax.Array,
    w: jax.Array,
    nfft: int,
    stride: int,
    total_segs: int,
    pad: int | None = None,
    segs_per_tile: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """One-sided periodogram power sum of a raw signal, natural order.

    x: (..., L) real samples; segments s in [0, total_segs) with
    total_segs = (L - nfft)//stride + 1 (spectral.go:26-33).  Returns
    (..., pad//2 + 1) sum over segments of |FFT(w * frame)|^2 — the
    caller applies interior doubling and the 1/(nsegs * sum(w^2) * fs)
    normalization (pwelch.go:113-136).
    """
    mask = jnp.ones(x.shape[:-1] + (total_segs,), _F32)
    pad = pad or nfft
    half = _half_enabled and rfft_supported_size(pad)
    partials = pwelch_power_partials(
        x, mask, w, nfft, stride, pad=pad,
        segs_per_tile=segs_per_tile, interpret=interpret,
        packed_half=half,
    )
    if half:
        return packed_to_natural_onesided(partials.sum(axis=-2), pad)
    p = digit_to_natural_bins(partials.sum(axis=-2), pad)
    return p[..., : pad // 2 + 1]


_half_enabled = True


def set_packed_half_enabled(on: bool) -> None:
    """A/B toggle: route pwelch_power_sum through the half-Hermitian
    contraction (default on where rfft_supported_size(pad))."""
    global _half_enabled
    _half_enabled = bool(on)
