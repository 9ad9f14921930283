#!/usr/bin/env python
"""Round-4 probe 3: the all-VPU lane-DIF FFT kernel vs the MXU path.

The MXU HIGHEST contraction is FLOP-bound at ~0.44 ms for the flagship
(probe_int8/probe_store: int8 gives no rate advantage, stores are
free).  The lane-DIF network (ops/_lane_dft.py) computes the same
128-point lane transform in exact f32 on the VPU at the FFT's
algorithmic flop count (~0.9 GFLOP vs the MXU scheme's 77) — if the
VPU+DMA overlap lands anywhere near the copy ceiling (0.32 ms), the
0.80-roofline north star is met with BETTER precision (140 dB vs 138).

Measures (flagship n=1024, b=16384, bt=256):
  copy        two-plane copy ceiling
  vdif        full forward kernel: n1 slice network + T twiddle +
              lane-DIF, digit-vdif order out
  vdif_nat    + in-kernel natural order?  (not yet — the XLA gather
              pass is measured separately by the bench)
plus one-shot SNR vs numpy f64.
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from godsp_tpu._dtypes import put
from godsp_tpu.dsputils import snr_db
from godsp_tpu.ops import _lane_dft as ld
from godsp_tpu.ops.pallas_fft import LANES, _dft_slices
from godsp_tpu.fft.four_step import twiddle_2d
from godsp_tpu.utils.host import to_host
from godsp_tpu.utils.metrics import copy_split_pallas

N, B, BT = 1024, 16384, 256
N1 = N // LANES

_SLICE_WS = (64, 32, 16, 8)


def vdif_tables(n1: int, inverse: bool, scale: float = 1.0):
    """T twiddle (scaled) + lane stage tables, flattened to a ref list:
    [tr, ti, s64r, s64i, ..., s8r, s8i, rollr(3,128), rolli(3,128),
    mask(3,128)]."""
    t = twiddle_2d(n1, LANES) * scale
    if inverse:
        t = np.conj(t)
    c32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    tabs = ld.lane_stage_tables(inverse)
    out = [c32(t.real), c32(t.imag)]
    for w, twr, twi in tabs["slice"]:
        out += [twr, twi]
    out.append(np.stack([r[0] for _, r, _i in tabs["roll"]]))
    out.append(np.stack([i[0] for _, _r, i in tabs["roll"]]))
    out.append(tabs["mask"])
    return [jnp.asarray(a) for a in out]


def _unpack_tabs(refs):
    tr, ti = refs[0][:], refs[1][:]
    sl = []
    for k, w in enumerate(_SLICE_WS):
        sl.append((w, refs[2 + 2 * k][:], refs[3 + 2 * k][:]))
    rollr, rolli = refs[10][:], refs[11][:]
    rolls = [(4, rollr[0:1], rolli[0:1]), (2, rollr[1:2], rolli[1:2]),
             (1, rollr[2:3], rolli[2:3])]
    mask = refs[12][:]
    return tr, ti, {"slice": sl, "roll": rolls}, mask


def _vdif_kernel(*refs, n1: int, inverse: bool):
    xr_ref, xi_ref, *rest = refs
    *tabs, yr_ref, yi_ref = rest
    tr, ti, ltabs, mask = _unpack_tabs(tabs)
    xr = xr_ref[:]
    xi = xi_ref[:]
    pairs = [
        (xr[:, k * LANES : (k + 1) * LANES],
         xi[:, k * LANES : (k + 1) * LANES])
        for k in range(n1)
    ]
    A = _dft_slices(pairs, inverse)
    for k1 in range(n1):
        ar, ai = A[k1]
        twr, twi = tr[k1 : k1 + 1], ti[k1 : k1 + 1]
        zr = ar * twr - ai * twi
        zi = ar * twi + ai * twr
        cr, ci = ld.lane_dif_128(zr, zi, ltabs, mask, roll=ld.pltpu_roll)
        sl = slice(k1 * LANES, (k1 + 1) * LANES)
        yr_ref[:, sl] = cr
        yi_ref[:, sl] = ci


def vdif_op(xr, xi, scale: float = 1.0):
    b = xr.shape[0]
    bt = min(BT, b)
    tables = vdif_tables(N1, False, scale)
    data_spec = pl.BlockSpec((bt, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in tables
    ]
    return pl.pallas_call(
        partial(_vdif_kernel, n1=N1, inverse=False),
        grid=(b // bt,),
        in_specs=[data_spec, data_spec] + const,
        out_specs=(data_spec, data_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, N), jnp.float32),
            jax.ShapeDtypeStruct((b, N), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(5 * N * 10 * b), bytes_accessed=int(4 * b * N * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20,
            dimension_semantics=("parallel",),
        ),
    )(xr, xi, *tables)


def digit_vdif_np(F: np.ndarray, n1: int) -> np.ndarray:
    """Natural spectrum -> vdif digit order: position k1*128 + p holds
    bin k1 + n1*brev7(p)."""
    b, n = F.shape
    perm = ld.brev_perm_np(7)
    v = F.reshape(b, n // n1, n1).swapaxes(-1, -2)  # [k1][k2]
    return np.ascontiguousarray(v[:, :, perm].reshape(b, n))


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr, flush=True)
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)

    # SNR first (one shot)
    xs = (rng.normal(size=(256, N)) * 0.1).astype(np.float32)
    ys = (rng.normal(size=(256, N)) * 0.1).astype(np.float32)
    r, i = vdif_op(put(xs), put(ys))
    got = np.asarray(to_host(r), np.float64) + 1j * np.asarray(
        to_host(i), np.float64)
    want = digit_vdif_np(
        np.fft.fft(xs.astype(np.float64) + 1j * ys.astype(np.float64)), N1)
    log(f"vdif on-chip SNR vs f64: {snr_db(got, want):.1f} dB")

    xr = put((rng.normal(size=(B, N)) * 0.01).astype(np.float32))
    xi = put((rng.normal(size=(B, N)) * 0.01).astype(np.float32))
    s = float(1.0 / np.sqrt(N))

    OPS = {
        "copy": (copy_split_pallas, (10, 50)),
        "vdif": (lambda a, b: vdif_op(a, b, s), (10, 34)),
    }

    def make_chain(op):
        def make(K):
            @jax.jit
            def chain(rr):
                ii = xi
                for _ in range(K):
                    rr, ii = op(rr, ii)
                    rr, ii = ii, rr
                return jnp.abs(rr[0, 0]) + jnp.abs(ii[0, 0])
            return chain
        return make

    pool = ThreadPoolExecutor(max_workers=4)
    CH = {}
    for name, (op, (lo, hi)) in OPS.items():
        mk = make_chain(op)
        CH[name] = {
            "diff": hi - lo,
            "lo": pool.submit(lambda m=mk, k=lo: m(k).lower(xr).compile()),
            "hi": pool.submit(lambda m=mk, k=hi: m(k).lower(xr).compile()),
        }
    log("compiling...")
    t0 = time.perf_counter()
    for name, d in CH.items():
        d["lo"], d["hi"] = d["lo"].result(), d["hi"].result()
    log(f"compiles done in {time.perf_counter()-t0:.0f}s")

    for rep in range(3):
        for name, d in CH.items():
            if "warm" not in d:
                for f in (d["lo"], d["hi"]):
                    float(np.asarray(f(xr)))
                d["warm"] = True
            best_lo = best_hi = float("inf")
            for _ in range(10):
                t0 = time.perf_counter()
                float(np.asarray(d["lo"](xr)))
                best_lo = min(best_lo, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(np.asarray(d["hi"](xr)))
                best_hi = min(best_hi, time.perf_counter() - t0)
            per = (best_hi - best_lo) / d["diff"]
            d.setdefault("reps", []).append(per)
            log(f"  rep{rep} {name}: {per*1e3:.3f} ms")
    log("--- medians ---")
    for name, d in CH.items():
        med = sorted(d["reps"])[len(d["reps"]) // 2]
        log(f"  {name}: {med*1e3:.3f} ms ({4*B*N*4/med/1e9:.0f} GB/s summed, "
            f"{4*B*N*4/med/1e9/819:.3f} of 819)")


if __name__ == "__main__":
    main()
