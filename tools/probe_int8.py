#!/usr/bin/env python
"""Round-4 probe: can an exact int8-limb contraction beat the bf16
HIGHEST floor on the real chip?  (VERDICT r3 item 1.)

Measures, with the bench's own chain-differential protocol at the
flagship shape (n=1024, b=16384, bt=256):

  copy    — pure two-plane copy (the session's traffic ceiling)
  gmm     — bf16 HIGHEST G-matmul floor twin (18 128-wide passes/slice)
  i8mm    — the SAME MAC count as 18 int8 passes (9 stacked matmuls,
            minimal VPU): the raw Mosaic int8 MXU rate
  i8dec   — digit decomposition + ONE stacked matmul per product:
            isolates the VPU ladder cost
  i8full  — the real 6-product balanced-int8 Karatsuba contraction
            (ops/_int8_contract.py) incl. scales and recombination

plus a one-shot SNR of i8full vs float64 numpy.

Decision table: i8mm ~= gmm          -> Mosaic int8 not 2x: dead.
                i8full >> i8mm + eps -> VPU ladder kills it: dead.
                i8full < gmm         -> integrate (4x3-digit variant
                                        for accuracy; see BASELINE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from godsp_tpu._dtypes import put
from godsp_tpu.dsputils import snr_db
from godsp_tpu.ops import _int8_contract as i8
from godsp_tpu.ops.pallas_fft import LANES, _ls_tables
from godsp_tpu.utils.host import to_host
from godsp_tpu.utils.metrics import copy_split_pallas, gmm_floor_pallas

N, B, BT = 1024, 16384, 256
N1 = N // LANES


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _specs(tables):
    data_spec = pl.BlockSpec((BT, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in tables
    ]
    return data_spec, const


def _call(kern, tables, xr, xi, flops):
    b = xr.shape[0]
    data_spec, const = _specs(tables)
    return pl.pallas_call(
        kern,
        grid=(b // BT,),
        in_specs=[data_spec, data_spec] + const,
        out_specs=(data_spec, data_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, N), jnp.float32),
            jax.ShapeDtypeStruct((b, N), jnp.float32),
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


# --- i8mm: raw int8 MXU rate (same MAC count as the gmm twin) ---------

def _i8mm_kernel(xr_ref, xi_ref, w0, w1, w2, yr_ref, yi_ref):
    xr, xi = xr_ref[:], xi_ref[:]
    sc = np.float32(1e-5)
    for k1 in range(N1):
        sl = slice(k1 * LANES, (k1 + 1) * LANES)
        a = (xr[:, sl] * np.float32(100.0)).astype(jnp.int8)
        b = (xi[:, sl] * np.float32(100.0)).astype(jnp.int8)
        s = ((xr[:, sl] + xi[:, sl]) * np.float32(50.0)).astype(jnp.int8)
        acc_r = None
        acc_i = None
        for d in (a, b, s):
            q0, q1, q2 = i8.mm_i8_stacked((d, d, d), (w0[k1], w1[k1], w2[k1]))
            r = q0 + q1
            im = q2
            acc_r = r if acc_r is None else acc_r + r
            acc_i = im if acc_i is None else acc_i + im
        yr_ref[:, sl] = acc_r.astype(jnp.float32) * sc
        yi_ref[:, sl] = acc_i.astype(jnp.float32) * sc


def make_i8mm_tables():
    rng = np.random.default_rng(7)
    w0 = rng.integers(-100, 100, size=(N1, LANES, 3 * LANES)).astype(np.int8)
    w1 = rng.integers(-100, 100, size=(N1, LANES, 2 * LANES)).astype(np.int8)
    w2 = rng.integers(-100, 100, size=(N1, LANES, LANES)).astype(np.int8)
    return [jnp.asarray(w) for w in (w0, w1, w2)]


# --- i8dec: digit ladder cost + 1/3 of the matmuls --------------------

def _i8dec_kernel(xr_ref, xi_ref, w0, w1, w2, yr_ref, yi_ref):
    xr, xi = xr_ref[:], xi_ref[:]
    for k1 in range(N1):
        sl = slice(k1 * LANES, (k1 + 1) * LANES)
        ar, ai = xr[:, sl], xi[:, sl]
        as_ = ar + ai
        m = jnp.max(jnp.abs(ar) + jnp.abs(ai), axis=-1, keepdims=True)
        ck, s_out = i8.row_quant_scales(m)
        s_out = s_out * np.float32(1.0 / LANES)
        acc_r = None
        acc_i = None
        for x in (ar, ai, as_):
            d = i8.digits3(x * ck)
            q = i8._mm(d[0], w0[k1])  # one stacked matmul per product
            r = q[:, :LANES] + q[:, LANES : 2 * LANES]
            im = q[:, 2 * LANES :]
            acc_r = r if acc_r is None else acc_r + r
            acc_i = im if acc_i is None else acc_i + im
        yr_ref[:, sl] = acc_r.astype(jnp.float32) * s_out
        yi_ref[:, sl] = acc_i.astype(jnp.float32) * s_out


# --- i8full: the real contraction -------------------------------------

def make_i8full_tables():
    tabs = _ls_tables(N, False, False)
    parts = {"r": [], "i": [], "s": []}
    for k1 in range(N1):
        gr = np.asarray(tabs["gr"][k1], np.float64)
        gi = np.asarray(tabs["gi"][k1], np.float64)
        for key, mat in (("r", gr), ("i", gi), ("s", (gr + gi) / 2.0)):
            parts[key].append(i8.stack_tables_np(mat))
    out = []
    for key in ("r", "i", "s"):
        for j in range(3):
            out.append(jnp.asarray(np.stack([p[j] for p in parts[key]])))
    return out  # wr0 wr1 wr2 wi0 wi1 wi2 ws0 ws1 ws2, each (N1, ...)


def _i8full_kernel(xr_ref, xi_ref, *rest):
    *tabs, yr_ref, yi_ref = rest
    wr = tabs[0:3]
    wi = tabs[3:6]
    ws = tabs[6:9]
    xr, xi = xr_ref[:], xi_ref[:]
    for k1 in range(N1):
        sl = slice(k1 * LANES, (k1 + 1) * LANES)
        re, im = i8.karatsuba_g_i8(
            xr[:, sl], xi[:, sl],
            tuple(w[k1] for w in wr),
            tuple(w[k1] for w in wi),
            tuple(w[k1] for w in ws),
            extra_scale=1.0 / LANES,
        )
        yr_ref[:, sl] = re
        yi_ref[:, sl] = im


def i8full_op(xr, xi):
    tables = make_i8full_tables()
    return _call(_i8full_kernel, tables, xr, xi, flops=9 * 2 * B * N * LANES)


def i8mm_op(xr, xi):
    tables = make_i8mm_tables()
    return _call(_i8mm_kernel, tables, xr, xi, flops=9 * 2 * B * N * LANES)


def i8dec_op(xr, xi):
    tables = make_i8mm_tables()
    return _call(_i8dec_kernel, tables, xr, xi, flops=3 * 2 * B * N * LANES)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")
    rng = np.random.default_rng(0)

    if stage in ("compile", "all"):
        # Minimal int8 dot: does Mosaic accept it at all?
        def tiny(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        a = rng.integers(-128, 128, size=(256, 128)).astype(np.int8)
        b = rng.integers(-128, 128, size=(128, 128)).astype(np.int8)
        try:
            out = pl.pallas_call(
                tiny,
                out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
            )(jnp.asarray(a), jnp.asarray(b))
            want = a.astype(np.int32) @ b.astype(np.int32)
            ok = np.array_equal(np.asarray(to_host(out)), want)
            log(f"int8 dot in pallas: compiles, exact={ok}")
        except Exception as e:
            log(f"int8 dot in pallas FAILED: {e!r}")
            return

    if stage in ("snr", "all"):
        xs = (rng.normal(size=(256, N)) * 0.1).astype(np.float32)
        ys = (rng.normal(size=(256, N)) * 0.1).astype(np.float32)
        r, im = i8full_op(put(xs), put(ys))
        got = np.asarray(to_host(r), np.float64) + 1j * np.asarray(
            to_host(im), np.float64
        )
        tabs = _ls_tables(N, False, False)
        want = np.empty_like(got)
        for k1 in range(N1):
            sl = slice(k1 * LANES, (k1 + 1) * LANES)
            g = (np.asarray(tabs["gr"][k1], np.float64)
                 + 1j * np.asarray(tabs["gi"][k1], np.float64))
            want[:, sl] = (
                (xs[:, sl].astype(np.float64)
                 + 1j * ys[:, sl].astype(np.float64)) @ g / LANES
            )
        log(f"i8full on-chip SNR vs f64: {snr_db(got, want):.1f} dB")

    if stage in ("time", "all"):
        xr = put((rng.normal(size=(B, N)) * 0.01).astype(np.float32))
        xi = put((rng.normal(size=(B, N)) * 0.01).astype(np.float32))

        OPS = {
            "copy": copy_split_pallas,
            "gmm": gmm_floor_pallas,
            "i8mm": i8mm_op,
            "i8dec": i8dec_op,
            "i8full": i8full_op,
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

        DEPTHS = {  # heavy kernel bodies get shorter unrolled chains
            "copy": (10, 50), "gmm": (10, 50), "i8mm": (10, 34),
            "i8dec": (10, 34), "i8full": (8, 24),
        }
        pool = ThreadPoolExecutor(max_workers=4)
        CH = {}
        for name, op in OPS.items():
            mk = make_chain(op)
            lo, hi = DEPTHS[name]
            CH[name] = {
                "diff": hi - lo,
                "lo": pool.submit(lambda m=mk, k=lo: m(k).lower(xr).compile()),
                "hi": pool.submit(lambda m=mk, k=hi: m(k).lower(xr).compile()),
            }
        log("compiling 10 chain programs...")
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
                gbs = 4 * B * N * 4 / med / 1e9
                log(f"  {name}: {med*1e3:.3f} ms  ({gbs:.0f} GB/s summed)")


if __name__ == "__main__":
    main()
