"""Chip decomposition of the fused Pwelch kernel's per-frame cost
(VERDICT r4 next-round #2: pallas_pwelch1024_s512 measured 77 ns/frame
vs the rfft kernel's 24 with LESS HBM traffic — find the 3x).

Elimination twins at the bench geometry (nfft=pad=1024, stride=512,
packed_half) — every variant is a standalone pallas_call sharing the
production kernel's plumbing (same block layout, same tables):

  loadonly  : load (1,1,T) block + halo + mask + window, store a trivial
              (1,1,out_w) row        -> the input-pipeline floor
  frameonly : _windowed_frames + mask reduction, NO FFT
              -> framing + reduction cost over the pipeline
  noframe   : input arrives PRE-FRAMED as (bt, pad) tiles (the rfft
              kernel's layout); rfft + |.|^2 + mask reduction
              -> contraction + reduction without framing (2x traffic)
  full      : the production kernel (pwelch_power_partials)
  rfft      : the standalone rfft kernel (24 ns/frame baseline)

Each variant is also A/B'd under dimension_semantics "arbitrary" (the
production setting) vs "parallel" (what the FFT kernels moved to in
round 3, which exonerated per-slice stores).  3-rep medians of heavy
chain differentials, one session.
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from godsp_tpu import window as win
from godsp_tpu.ops import pallas_pwelch as pw
from godsp_tpu.ops.pallas_fft import (
    LANES,
    _rfft_steps_packed,
    _rfft_tables,
    rfft_pow2_split,
)

_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST

NFFT, STRIDE = 1024, 512
SEGS = int(os.environ.get("PWFLOOR_SEGS", 16384))
BT = int(os.environ.get("PWFLOOR_BT", 256))
L = (SEGS - 1) * STRIDE + NFFT


def _mask_reduce(mask_ref, p, bt, out_ref):
    mask_row = mask_ref[:].reshape(1, -1)[:, :bt]
    row = jax.lax.dot_general(
        mask_row, p, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=_F32, precision=_HI,
    )
    out_ref[:] = row.reshape(1, 1, p.shape[1])


def _kern_loadonly(block_ref, halo_ref, mask_ref, w_ref, out_ref, *, bt, out_w):
    T = block_ref.shape[-1]
    x = block_ref[:].reshape(1, T)
    h = halo_ref[:].reshape(1, -1)
    m = mask_ref[:].reshape(1, -1)
    s = (jnp.sum(x) + jnp.sum(h) + jnp.sum(m) + jnp.sum(w_ref[:]))
    out_ref[:] = jnp.full((1, 1, out_w), s, _F32)


def _kern_frameonly(block_ref, halo_ref, mask_ref, w_ref, out_ref, *,
                    bt, stride, nfft, pad, halo):
    xw = pw._windowed_frames(block_ref, halo_ref, w_ref, bt, stride, nfft,
                             pad, halo)
    _mask_reduce(mask_ref, xw, bt, out_ref)


def _kern_noframe(frames_ref, mask_ref, w_ref, *rest, bt, pad):
    *tabs, out_ref = rest
    xw = frames_ref[:] * w_ref[:]
    ypr, ypi, nyq = _rfft_steps_packed(xw, tuple(tabs), pad // LANES)
    p = jnp.concatenate(
        [ypr * ypr + ypi * ypi, (nyq * nyq) * jnp.ones((1, LANES), _F32)],
        axis=1,
    )
    _mask_reduce(mask_ref, p, bt, out_ref)


HROWS = 8  # halo rows (padded to a sublane multiple)


def _kern_load2d(block_ref, halo_ref, mask_ref, w_ref, out_ref, *, bt, out_w):
    x = block_ref[:].reshape(block_ref.shape[-2], block_ref.shape[-1])
    h = halo_ref[:].reshape(HROWS, -1)
    s = jnp.sum(x) + jnp.sum(h) + jnp.sum(mask_ref[:]) + jnp.sum(w_ref[:])
    out_ref[:] = jnp.full((1, 1, out_w), s, _F32)


def _frames_2d(block_ref, halo_ref, bt, stride, nfft):
    """(bt, stride) rows + (HROWS, stride) halo rows -> (bt, nfft)
    overlapped frames via sublane rolls (m = nfft/stride lane concats)."""
    m = nfft // stride
    x2 = block_ref[:].reshape(bt, stride)
    h2 = halo_ref[:].reshape(HROWS, stride)
    ext_rows = jnp.concatenate([x2, h2], axis=0)  # (bt + HROWS, stride)
    S = bt + HROWS
    parts = [x2]
    for k in range(1, m):
        rolled = pltpu.roll(ext_rows, S - k, 0)  # row i <- row i+k
        parts.append(rolled[:bt])
    return jnp.concatenate(parts, axis=1)  # (bt, nfft)


def _kern_frame2d(block_ref, halo_ref, mask_ref, w_ref, out_ref, *,
                  bt, stride, nfft):
    xw = _frames_2d(block_ref, halo_ref, bt, stride, nfft) * w_ref[:]
    _mask_reduce(mask_ref, xw, bt, out_ref)


def _kern_full2d(block_ref, halo_ref, mask_ref, w_ref, *rest, bt, stride, pad):
    *tabs, out_ref = rest
    xw = _frames_2d(block_ref, halo_ref, bt, stride, pad) * w_ref[:]
    ypr, ypi, nyq = _rfft_steps_packed(xw, tuple(tabs), pad // LANES)
    p = jnp.concatenate(
        [ypr * ypr + ypi * ypi, (nyq * nyq) * jnp.ones((1, LANES), _F32)],
        axis=1,
    )
    _mask_reduce(mask_ref, p, bt, out_ref)


def build_variant(variant, dim_sem, interpret=False):
    """Returns f(operand) -> (n_tiles, out_w) partial rows."""
    nfft = pad = NFFT
    stride = STRIDE
    bt = BT
    n_tiles = SEGS // bt
    T = bt * stride
    halo = pw.framing_halo(nfft, stride)
    out_w = pad // 2 + LANES
    w = jnp.asarray(win.window_table_np("hann", pad), _F32)
    tabs = _rfft_tables(pad)
    tables = [jnp.asarray(tabs[k]) for k in ("gr", "gi", "gs", "alt")]
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=64 << 20, dimension_semantics=(dim_sem,),
    )
    out_spec = pl.BlockSpec((1, 1, out_w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_tiles, 1, out_w), _F32)
    const_specs = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in tables
    ]
    mask_spec = pl.BlockSpec((1, 1, bt), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, pad), lambda i: (0, 0), memory_space=pltpu.VMEM)

    if variant == "full":
        def run(ext, sem=dim_sem):
            prev = pw._dim_sem
            pw.set_pwelch_dim_semantics(sem)
            try:
                mask = jnp.ones(ext.shape[:-1] + (SEGS,), _F32)
                return pw.pwelch_power_partials(
                    ext, mask, w, nfft, stride, pad=pad, packed_half=True,
                    segs_per_tile=bt, interpret=interpret,
                )
            finally:
                pw.set_pwelch_dim_semantics(prev)
        return run

    if variant == "rfft":
        def run(frames):
            return rfft_pow2_split(frames, order="packed", batch_tile=bt,
                                   interpret=interpret)[0]
        return run

    if variant in ("loadonly", "frameonly"):
        kern = (
            partial(_kern_loadonly, bt=bt, out_w=out_w)
            if variant == "loadonly"
            else partial(_kern_frameonly, bt=bt, stride=stride, nfft=nfft,
                         pad=pad, halo=halo)
        )
        ow = out_w if variant == "loadonly" else pad
        call = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, halo), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                mask_spec,
                w_spec,
            ],
            out_specs=pl.BlockSpec((1, 1, ow), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1, ow), _F32),
            compiler_params=cparams,
            interpret=interpret,
        )

        def run(ext):
            need = n_tiles * T + halo
            ext2 = jnp.pad(ext.reshape(1, -1),
                           ((0, 0), (0, max(0, need - ext.shape[-1]))))
            blocks = ext2[:, : n_tiles * T].reshape(n_tiles, 1, T)
            idx = ((jnp.arange(n_tiles)[:, None] + 1) * T
                   + jnp.arange(halo)[None, :])
            halos = jnp.take(ext2[0], idx, axis=-1).reshape(n_tiles, 1, halo)
            masks = jnp.ones((n_tiles, 1, bt), _F32)
            return call(blocks, halos, masks, w.reshape(1, pad))
        return run

    if variant in ("load2d", "frame2d", "full2d"):
        if variant == "load2d":
            kern = partial(_kern_load2d, bt=bt, out_w=out_w)
            ow, n_extra = out_w, []
        elif variant == "frame2d":
            kern = partial(_kern_frame2d, bt=bt, stride=stride, nfft=nfft)
            ow, n_extra = pad, []
        else:
            kern = partial(_kern_full2d, bt=bt, stride=stride, pad=pad)
            ow, n_extra = out_w, const_specs
        call = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, bt, stride), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HROWS, stride), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                mask_spec,
                w_spec,
            ] + n_extra,
            out_specs=pl.BlockSpec((1, 1, ow), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1, ow), _F32),
            compiler_params=cparams,
            interpret=interpret,
        )

        def run(ext):
            rows_needed = n_tiles * bt + HROWS
            ext2 = jnp.pad(
                ext, (0, max(0, rows_needed * stride - ext.shape[-1]))
            ).reshape(rows_needed, stride)
            blocks = ext2[: n_tiles * bt].reshape(n_tiles, bt, stride)
            ridx = (jnp.arange(n_tiles)[:, None] + 1) * bt + jnp.arange(
                HROWS)[None, :]
            halos = jnp.take(ext2, ridx, axis=0)  # (n_tiles, HROWS, stride)
            masks = jnp.ones((n_tiles, 1, bt), _F32)
            args = [blocks, halos, masks, w.reshape(1, pad)]
            if variant == "full2d":
                args += tables
            return call(*args)
        return run

    if variant == "noframe":
        call = pl.pallas_call(
            partial(_kern_noframe, bt=bt, pad=pad),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((bt, pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                mask_spec,
                w_spec,
            ] + const_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=cparams,
            interpret=interpret,
        )

        def run(frames):
            masks = jnp.ones((n_tiles, 1, bt), _F32)
            return call(frames, masks, w.reshape(1, pad), *tables)
        return run

    raise ValueError(variant)


def chain(runner, K):
    @jax.jit
    def go(x):
        acc = 0.0
        for k in range(K):
            out = runner(x * (1.0 + 1e-6 * k))
            acc = acc + out.reshape(-1)[0]
        return acc

    return go


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    ext = jax.jit(
        lambda k: jax.random.normal(k, (L,), _F32) * np.float32(0.1)
    )(key)
    frames = jax.jit(
        lambda k: jax.random.normal(k, (SEGS, NFFT), _F32) * np.float32(0.1)
    )(key)
    ext.block_until_ready(); frames.block_until_ready()

    # Numerics: the 2-D-block framing must reproduce the production
    # kernel's partial rows exactly (same frames, same contraction).
    got = np.asarray(build_variant("full2d", "parallel")(ext))[:, 0, :]
    want = np.asarray(build_variant("full", "parallel")(ext))
    diff = np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)
    print(f"full2d vs full relerr: {diff:.3e}", flush=True)

    specs = []
    for variant in ("loadonly", "frameonly", "noframe", "full", "rfft",
                    "load2d", "frame2d", "full2d"):
        for sem in ("arbitrary", "parallel"):
            if variant == "rfft" and sem == "parallel":
                continue  # rfft kernel's semantics fixed by _dim_sem_for
            if variant in ("load2d", "frame2d") and sem == "arbitrary":
                continue
            specs.append((variant, sem))

    pool = ThreadPoolExecutor(4)
    progs = {}
    for variant, sem in specs:
        x = frames if variant in ("noframe", "rfft") else ext
        for K in (6, 22):
            f = chain(build_variant(variant, sem), K)
            progs[(variant, sem, K)] = pool.submit(
                lambda f=f, x=x: f.lower(x).compile()
            )
    progs = {k: v.result() for k, v in progs.items()}
    print("compiled", len(progs), "programs", flush=True)

    for variant, sem in specs:
        x = frames if variant in ("noframe", "rfft") else ext
        lo, hi = progs[(variant, sem, 6)], progs[(variant, sem, 22)]
        for f in (lo, hi):
            float(np.asarray(f(x)))
        reps = []
        tries = 0
        while len(reps) < 3 and tries < 6:
            tries += 1
            bl = bh = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(np.asarray(lo(x)))
                bl = min(bl, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(np.asarray(hi(x)))
                bh = min(bh, time.perf_counter() - t0)
            if bh - bl < 1e-4:
                continue
            reps.append((bh - bl) / 16)
        per = sorted(reps)[len(reps) // 2]
        print(
            f"{variant:9s} sem={sem:9s}: {per*1e3:.3f} ms "
            f"({per/SEGS*1e9:.1f} ns/frame)  reps="
            f"{[f'{r*1e3:.3f}' for r in reps]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
