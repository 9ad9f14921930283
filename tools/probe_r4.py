#!/usr/bin/env python
"""Round-4 probe 4: rfft kernel timing, lane-reversal support, and the
n=8192 batch-tile sweep (VERDICT r3 items 2 and 4).

  flip    does jnp.flip along lanes compile + run in a kernel?  (gates
          the even/odd DFT fold that would cut the MXU stream 33%)
  rfft    Hermitian-packed real-input kernel at (16384, 1024), chain of
          rfft+concat links minus the co-measured concat glue twin
  fft8192 fft_pow2_split at (2048, 8192) for batch_tile in {32, 64} and
          both grid semantics, vs n=16384 at equal element count
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from godsp_tpu._dtypes import put
from godsp_tpu.dsputils import snr_db
from godsp_tpu.ops import pallas_fft as pf
from godsp_tpu.utils.host import to_host
from godsp_tpu.utils.metrics import copy_split_pallas


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(d, xr, iters=10):
    if "warm" not in d:
        for f in (d["lo"], d["hi"]):
            float(np.asarray(f(xr)))
        d["warm"] = True
    best_lo = best_hi = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(d["lo"](xr)))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(np.asarray(d["hi"](xr)))
        best_hi = min(best_hi, time.perf_counter() - t0)
    return (best_hi - best_lo) / d["diff"]


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    log(f"device: {jax.devices()[0].device_kind}")

    if stage in ("flip", "all"):
        def kf(x_ref, o_ref):
            o_ref[:] = jnp.flip(x_ref[:], axis=1) * 2.0

        x = np.tile(np.arange(128, dtype=np.float32)[None], (8, 1))
        t0 = time.time()
        try:
            out = pl.pallas_call(
                kf, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
            )(jnp.asarray(x))
            v = np.asarray(out)[0]
            ok = np.array_equal(v, 2.0 * np.arange(128)[::-1])
            log(f"flip: OK exact={ok} ({time.time()-t0:.0f}s)")
        except Exception as e:
            log(f"flip: FAIL {type(e).__name__} {str(e)[:150]}")

    B, N = 16384, 1024
    pool = ThreadPoolExecutor(max_workers=4)
    CH = {}

    def reg(name, mk, xr, lo, hi):
        CH[name] = {
            "diff": hi - lo, "x": xr,
            "lo": pool.submit(lambda: mk(lo).lower(xr).compile()),
            "hi": pool.submit(lambda: mk(hi).lower(xr).compile()),
        }

    if stage in ("rfft", "all"):
        # SNR one-shot on chip
        xs = (rng.normal(size=(256, N)) * 0.1).astype(np.float32)
        yr, yi = pf.rfft_pow2_split(put(xs), batch_tile=256)
        got = np.asarray(to_host(yr), np.float64) + 1j * np.asarray(
            to_host(yi), np.float64)
        log(f"rfft on-chip SNR: "
            f"{snr_db(got, np.fft.rfft(xs.astype(np.float64))):.1f} dB")

        xrf = put((rng.normal(size=(B, N)) * 0.01).astype(np.float32))
        s = np.float32(1.0 / 32.0)

        def mk_rfft(K):
            @jax.jit
            def chain(x):
                for _ in range(K):
                    pr, pi, ex = pf.rfft_pow2_split(x, order="packed")
                    x = jnp.concatenate([pr, pi], axis=1) * s
                return jnp.abs(x[0, 0])
            return chain

        def mk_glue(K):
            @jax.jit
            def chain(x):
                for _ in range(K):
                    x = jnp.concatenate(
                        [x[:, : N // 2] * s, x[:, N // 2 :] * s], axis=1
                    )
                return jnp.abs(x[0, 0])
            return chain

        reg("rfft_link", mk_rfft, xrf, 10, 34)
        reg("glue", mk_glue, xrf, 10, 50)

    if stage in ("8192", "all"):
        x8r = put((rng.normal(size=(2048, 8192)) * 0.01).astype(np.float32))
        x8i = put((rng.normal(size=(2048, 8192)) * 0.01).astype(np.float32))
        x16r = put((rng.normal(size=(1024, 16384)) * 0.01).astype(np.float32))
        x16i = put((rng.normal(size=(1024, 16384)) * 0.01).astype(np.float32))

        def mk_fft(xi, n, bt, sem):
            s2 = np.float32(1.0 / (float(n) * float(n)))

            def make(K):
                @jax.jit
                def chain(r):
                    i = xi
                    pf.set_fft_dim_semantics(sem)
                    try:
                        for k in range(K):
                            r, i = pf.fft_pow2_split(
                                r, i, order="digit", batch_tile=bt
                            )
                            r, i = i, r
                            if k % 4 == 3:
                                r, i = r * s2, i * s2
                    finally:
                        pf.set_fft_dim_semantics("parallel")
                    return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])
                return chain
            return make

        for bt in (32, 64):
            for sem in ("parallel", "arbitrary"):
                reg(f"fft8192_bt{bt}_{sem}", mk_fft(x8i, 8192, bt, sem),
                    x8r, 10, 26)
        reg("fft16384_ref", mk_fft(x16i, 16384, None, "parallel"), x16r,
            10, 26)

    log(f"compiling {len(CH)} chain pairs...")
    t0 = time.perf_counter()
    for name, d in CH.items():
        try:
            d["lo"], d["hi"] = d["lo"].result(), d["hi"].result()
        except Exception as e:
            log(f"  {name}: COMPILE FAILED {type(e).__name__} {str(e)[:150]}")
            d["lo"] = None
    log(f"compiles done in {time.perf_counter()-t0:.0f}s")

    for rep in range(3):
        for name, d in CH.items():
            if d["lo"] is None:
                continue
            per = measure(d, d["x"])
            d.setdefault("reps", []).append(per)
            log(f"  rep{rep} {name}: {per*1e3:.3f} ms")
    log("--- medians ---")
    for name, d in CH.items():
        if d.get("reps"):
            med = sorted(d["reps"])[len(d["reps"]) // 2]
            log(f"  {name}: {med*1e3:.3f} ms")
    if "rfft_link" in CH and CH["rfft_link"].get("reps"):
        r = sorted(CH["rfft_link"]["reps"])[1]
        g = sorted(CH["glue"]["reps"])[1]
        net = r - g
        traffic = (2 * N + 128) * B * 4
        log(f"rfft net: {net*1e3:.3f} ms  ({traffic/net/1e9:.0f} GB/s of its "
            f"own traffic, {traffic/net/1e9/819:.3f} of 819)")


if __name__ == "__main__":
    main()
