"""Welch partial sums with the cross-shard halo fused INTO the kernel.

The SURVEY.md §5 commitment ("hand-written Pallas remote-DMA ... where
collective-permute fusion with the FFT kernel pays"), round-1's missing
piece: instead of a separate halo collective (ppermute or the standalone
ring kernel, parallel/halo.py) followed by the fused Pwelch kernel, ONE
kernel per shard

  * starts the remote DMA of its block head to the LEFT neighbor at
    grid step 0,
  * processes all interior tiles while the copy is in flight (their
    halos are local data),
  * waits for the receive only at the LAST tile, whose boundary
    segments read the neighbor's head from the RDMA buffer.

The communication therefore overlaps with all but the final tile's
FFTs — no XLA collective rendezvous sits between framing and compute.

Ring wraparound: the last shard receives shard 0's head — garbage it
either masks (one-shot: the global-tail mask, spectral.go:26-33) or
replaces with the injected `tail` (streaming: the head of the NEXT
chunk), selected in-kernel by an SMEM flag.

Leading axes (dp-sharded channels / batch) are flattened into extra
kernel grid rows; all channels' halo heads travel in ONE remote copy
started at the first grid step and awaited at channel 0's last tile.

Call INSIDE shard_map over a single-axis ("sp",) mesh region (logical
device ids — the interpret-mode restriction; the compiled path also
accepts them on 1-D meshes).  Validated against the ppermute path on
the virtual 8-device mesh (tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from godsp_tpu.ops.pallas_fft import LANES, _fft_steps_real, fft_real_tables
from godsp_tpu.ops.pallas_pwelch import (
    _F32,
    _HI,
    _phases,
    _segs_per_tile,
    _windowed_frames,
    frame_class_perm,
    framing_halo,
    fused_supported,
)

__all__ = ["pwelch_power_partials_rdma"]


def _rdma(head_ref, left_ref, rbuf, send_sem, recv_sem):
    """Descriptor for head -> left neighbor's rbuf (state lives in the
    semaphores, so rebuilding it at the waiting grid step is sound).
    The neighbor id arrives via SMEM — axis_index arithmetic inside the
    kernel trips interpret-mode vma checking."""
    return pltpu.make_async_remote_copy(
        src_ref=head_ref,
        dst_ref=rbuf,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=left_ref[0, 0],
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )


def _kernel(
    *refs,
    bt: int,
    stride: int,
    nfft: int,
    pad: int,
    halo: int,
):
    (
        left_ref, islast_ref, head_ref, tail_ref, block_ref, lhalo_ref,
        mask_ref, w_ref, *rest
    ) = refs
    *tabs, out_ref, rbuf, send_sem, recv_sem = rest

    c = pl.program_id(0)  # channel (dp-batched row)
    pid = pl.program_id(1)  # tile within the channel's shard block
    last = pl.num_programs(1) - 1

    # ONE remote copy moves every channel's head (the full (C, 1, halo)
    # array) at the very first grid step; the wait happens at channel
    # 0's last tile — the earliest step that can read it.  Grid steps
    # are sequential on a TPU core, so later channels' last tiles read
    # rbuf strictly after the wait.
    @pl.when((c == 0) & (pid == 0))
    def _():
        _rdma(head_ref, left_ref, rbuf, send_sem, recv_sem).start()

    @pl.when((c == 0) & (pid == last))
    def _():
        _rdma(head_ref, left_ref, rbuf, send_sem, recv_sem).wait()

    # Interior tiles read their (local) gathered halo; the last tile's
    # halo is the neighbor's head from the RDMA buffer — except on the
    # LAST SHARD, whose ring neighbor wraps to shard 0: there the
    # injected tail (next-chunk head in streaming; zeros one-shot, where
    # the global mask kills those segments anyway) is used instead.
    # Reading rbuf before the wait on non-last tiles is safe: discarded.
    cross = jnp.where(
        islast_ref[0, 0] == 1, tail_ref[:], rbuf[pl.ds(c, 1)]
    )
    halo_val = jnp.where(pid == last, cross, lhalo_ref[:])

    xw = _windowed_frames(
        block_ref, halo_val, w_ref, bt, stride, nfft, pad, halo
    )
    cr, ci = _fft_steps_real(xw, tuple(tabs), bt, pad // LANES)
    p = cr * cr + ci * ci
    mask_row = mask_ref[:].reshape(1, -1)[:, :bt]
    row = jax.lax.dot_general(
        mask_row, p,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=_F32, precision=_HI,
    )
    out_ref[:] = row.reshape(1, 1, pad)


def pwelch_power_partials_rdma(
    x_local: jax.Array,
    mask: jax.Array,
    w: jax.Array,
    nfft: int,
    stride: int,
    n_sp: int,
    pad: int | None = None,
    tail: jax.Array | None = None,
    segs_per_tile: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Per-tile masked periodogram sums of THIS shard, digit bin order.

    x_local: (..., L) float32 — this shard's time block; leading axes
    (dp-sharded channels, batch) are flattened into kernel grid rows and
    every channel's halo head travels in the SAME remote copy.  mask:
    (..., S) validity over this shard's segments.  tail: (..., H)
    samples that globally FOLLOW the last shard's block (the streaming
    driver's next-chunk head; None = zeros, in which case the last
    shard's boundary-straddling segments must be masked — the one-shot
    global-tail mask guarantees this).  Returns (..., n_tiles, pad).
    """
    pad = pad or nfft
    if not fused_supported(nfft, pad, stride):
        raise ValueError(
            f"geometry (nfft={nfft}, pad={pad}, stride={stride}) unsupported "
            "by the fused kernel"
        )
    lead = x_local.shape[:-1]
    if mask.shape[:-1] != lead:
        raise ValueError("x_local and mask must share leading dimensions")
    S = mask.shape[-1]
    if S == 0:
        return jnp.zeros(lead + (0, pad), dtype=_F32)
    bt = segs_per_tile or _segs_per_tile(pad)
    bt = min(bt, max(8, S))
    bt = max(8, 1 << (bt.bit_length() - 1))
    # Tiles must cover the shard EXACTLY: the RDMA halo is consumed at
    # offset n_tiles*T, which must coincide with the shard boundary L
    # (a ragged last tile would put the neighbor's samples at the wrong
    # offset for boundary-straddling frames).
    while bt > 8 and S % bt:
        bt //= 2
    if S % bt:
        raise ValueError(
            f"segment count per shard ({S}) must be divisible by a "
            f"power-of-2 tile size >= 8 for the fused-halo path"
        )
    n_tiles = S // bt
    T = bt * stride
    halo = framing_halo(nfft, stride)
    P = _phases(stride)

    x2 = x_local.reshape(-1, x_local.shape[-1]).astype(_F32)
    C, L = x2.shape
    if halo > L:
        raise ValueError(
            f"shard block ({L} samples) must cover the {halo}-lane halo"
        )
    if L != n_tiles * T:
        raise ValueError(
            f"shard block length {L} != segments*stride {n_tiles * T}"
        )
    x2 = jnp.pad(x2, ((0, 0), (0, halo)))  # halo region placeholder

    head = x2[:, :halo].reshape(C, 1, halo)  # what the LEFT neighbor needs
    blocks = x2[:, : n_tiles * T].reshape(C * n_tiles, 1, T)
    # Local per-tile halos; each channel's last tile row is zeros beyond
    # the shard and gets overridden by the RDMA buffer in-kernel.
    idx = (jnp.arange(n_tiles)[:, None] + 1) * T + jnp.arange(halo)[None, :]
    lhalos = jnp.take(x2, idx, axis=-1).reshape(C * n_tiles, 1, halo)

    # Tiles cover the shard exactly (enforced above): no mask padding.
    masks = mask.astype(_F32).reshape(C * n_tiles, bt)
    if P > 1:
        masks = masks[:, frame_class_perm(bt, stride)]
    mp = max(bt, LANES)
    masks = jnp.pad(masks, ((0, 0), (0, mp - bt))).reshape(C * n_tiles, 1, mp)

    my = jax.lax.axis_index("sp")
    left = jax.lax.rem(
        my.astype(jnp.int32) + jnp.int32(n_sp - 1), jnp.int32(n_sp)
    ).reshape(1, 1)
    islast = (my == n_sp - 1).astype(jnp.int32).reshape(1, 1)
    if tail is None:
        tail3 = jnp.zeros((C, 1, halo), _F32)
    else:
        t2 = tail.reshape(C, -1).astype(_F32)
        if t2.shape[-1] < halo:  # frame reads past H are slice slack
            t2 = jnp.pad(t2, ((0, 0), (0, halo - t2.shape[-1])))
        tail3 = t2[:, :halo].reshape(C, 1, halo)

    # Grid (C, n_tiles): channel-major sequential order so channel 0's
    # last tile (the wait step) precedes every other channel's last tile.
    row = lambda c, j: (c * n_tiles + j, 0, 0)
    tile3 = lambda X: pl.BlockSpec((1, 1, X), row, memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec((1, 1), lambda c, j: (0, 0), memory_space=pltpu.SMEM)
    head_spec = pl.BlockSpec(
        (C, 1, halo), lambda c, j: (0, 0, 0), memory_space=pltpu.VMEM
    )
    tail_spec = pl.BlockSpec(
        (1, 1, halo), lambda c, j: (c, 0, 0), memory_space=pltpu.VMEM
    )
    inputs = [left, islast, head, tail3, blocks, lhalos, masks]
    in_specs = [smem1, smem1, head_spec, tail_spec, tile3(T), tile3(halo),
                tile3(mp)]
    inputs.append(jnp.asarray(w, _F32).reshape(1, pad))
    in_specs.append(
        pl.BlockSpec((1, pad), lambda c, j: (0, 0), memory_space=pltpu.VMEM)
    )
    order, tabs = fft_real_tables(pad)
    for key in order:
        t = jnp.asarray(tabs[key])
        inputs.append(t)
        in_specs.append(
            pl.BlockSpec(
                t.shape, lambda c, j, nd=t.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )

    n1 = pad // LANES
    vma = getattr(jax.typeof(blocks), "vma", None) or frozenset()
    out = pl.pallas_call(
        partial(
            _kernel,
            bt=bt, stride=stride, nfft=nfft, pad=pad, halo=halo,
        ),
        grid=(C, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, pad), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C * n_tiles, 1, pad), _F32, vma=vma),
        scratch_shapes=[
            pltpu.VMEM((C, 1, halo), _F32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(C * n_tiles * bt * pad * (2 * n1 + 6 * LANES + 8)),
            bytes_accessed=int(4 * C * n_tiles * (T + halo + bt + pad)),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20,
            has_side_effects=True,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    return out.reshape(*lead, n_tiles, pad)
