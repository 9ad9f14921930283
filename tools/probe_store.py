#!/usr/bin/env python
"""Round-4 probe 2: is the ~0.12 ms gap between the whole-block copy
(0.32 ms) and EVERY per-slice compute twin (~0.44 ms: gmm, i8mm,
i8full — tools/probe_int8.py) the per-slice STORE pattern?

Twins (flagship shape n=1024, b=16384, bt=256):
  copy         whole-block read + whole-block store      (baseline)
  slicestore   whole-block read + 8 per-slice stores     (store pattern alone)
  concatstore  read, slice to 8, lane-concat, 1 store    (concat cost alone)
  gmm_concat   the HIGHEST G-matmul stream, outputs lane-concatenated
               into ONE store per plane                  (gmm minus slice stores)
  i8_concat    the int8 6-product contraction, concat single store
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
from jax.experimental.pallas import tpu as pltpu

from godsp_tpu._dtypes import put
from godsp_tpu.ops import _int8_contract as i8
from godsp_tpu.ops.pallas_fft import LANES, _karatsuba_g, _ls_tables, _LS_ORDER
from godsp_tpu.utils.metrics import copy_split_pallas
from tools.probe_int8 import make_i8full_tables

N, B, BT = 1024, 16384, 256
N1 = N // LANES


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _call(kern, tables, xr, xi, flops):
    data_spec = pl.BlockSpec((BT, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in tables
    ]
    return pl.pallas_call(
        kern,
        grid=(B // BT,),
        in_specs=[data_spec, data_spec] + const,
        out_specs=(data_spec, data_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(4 * B * N * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20,
            dimension_semantics=("parallel",),
        ),
    )(xr, xi, *tables)


def _slicestore_kernel(xr_ref, xi_ref, yr_ref, yi_ref):
    xr, xi = xr_ref[:], xi_ref[:]
    for k1 in range(N1):
        sl = slice(k1 * LANES, (k1 + 1) * LANES)
        yr_ref[:, sl] = xr[:, sl]
        yi_ref[:, sl] = xi[:, sl]


def _concatstore_kernel(xr_ref, xi_ref, yr_ref, yi_ref):
    xr, xi = xr_ref[:], xi_ref[:]
    rs = [xr[:, k * LANES : (k + 1) * LANES] for k in range(N1)]
    is_ = [xi[:, k * LANES : (k + 1) * LANES] for k in range(N1)]
    yr_ref[:] = jnp.concatenate(rs, axis=1)
    yi_ref[:] = jnp.concatenate(is_, axis=1)


def _gmm_concat_kernel(xr_ref, xi_ref, gr, gi, gs, yr_ref, yi_ref):
    xr, xi = xr_ref[:], xi_ref[:]
    crs, cis = [], []
    for k1 in range(N1):
        sl = slice(k1 * LANES, (k1 + 1) * LANES)
        cr, ci = _karatsuba_g(xr[:, sl], xi[:, sl], k1, (gr, gi, gs))
        crs.append(cr)
        cis.append(ci)
    yr_ref[:] = jnp.concatenate(crs, axis=1)
    yi_ref[:] = jnp.concatenate(cis, axis=1)


def _i8_concat_kernel(xr_ref, xi_ref, *rest):
    *tabs, yr_ref, yi_ref = rest
    wr, wi, ws = tabs[0:3], tabs[3:6], tabs[6:9]
    xr, xi = xr_ref[:], xi_ref[:]
    crs, cis = [], []
    for k1 in range(N1):
        sl = slice(k1 * LANES, (k1 + 1) * LANES)
        re, im = i8.karatsuba_g_i8(
            xr[:, sl], xi[:, sl],
            tuple(w[k1] for w in wr),
            tuple(w[k1] for w in wi),
            tuple(w[k1] for w in ws),
            extra_scale=1.0 / LANES,
        )
        crs.append(re)
        cis.append(im)
    yr_ref[:] = jnp.concatenate(crs, axis=1)
    yi_ref[:] = jnp.concatenate(cis, axis=1)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")
    rng = np.random.default_rng(0)
    xr = put((rng.normal(size=(B, N)) * 0.01).astype(np.float32))
    xi = put((rng.normal(size=(B, N)) * 0.01).astype(np.float32))

    gtabs = _ls_tables(N, False, False, 1.0 / LANES)
    gmm_tables = [jnp.asarray(gtabs[k]) for k in _LS_ORDER]
    i8_tables = make_i8full_tables()

    OPS = {
        "copy": (copy_split_pallas, (10, 50)),
        "slicestore": (
            lambda r, i: _call(_slicestore_kernel, [], r, i, 0), (10, 50)),
        "concatstore": (
            lambda r, i: _call(_concatstore_kernel, [], r, i, 0), (10, 50)),
        "gmm_concat": (
            lambda r, i: _call(
                _gmm_concat_kernel, gmm_tables, r, i, 18 * 2 * B * N * LANES
            ), (10, 50)),
        "i8_concat": (
            lambda r, i: _call(
                _i8_concat_kernel, i8_tables, r, i, 9 * 2 * B * N * LANES
            ), (8, 24)),
    }

    def make_chain(op):
        def make(K):
            @jax.jit
            def chain(r):
                i = xi
                for _ in range(K):
                    r, i = op(r, i)
                    r, i = i, r
                return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])
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
    log("compiling chain programs...")
    t0 = time.perf_counter()
    for name, d in CH.items():
        try:
            d["lo"], d["hi"] = d["lo"].result(), d["hi"].result()
        except Exception as e:
            log(f"  {name}: COMPILE FAILED: {e!r}")
            d["lo"] = None
    log(f"compiles done in {time.perf_counter()-t0:.0f}s")

    for rep in range(3):
        for name, d in CH.items():
            if d["lo"] is None:
                continue
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
        if d.get("reps"):
            med = sorted(d["reps"])[len(d["reps"]) // 2]
            log(f"  {name}: {med*1e3:.3f} ms "
                f"({4*B*N*4/med/1e9:.0f} GB/s summed)")


if __name__ == "__main__":
    main()
