"""Chip A/B: outer-kernel level-1 as one rank-3 dot vs the d2-slice
loop (ops/pallas_outer.py set_l1_single_dot), at the 2^24 plan shape.

Direct outer_dft_split chains (no inner jit cache to poison the toggle
A/B — cf. the voided probe_giant5 public-fft A/B).
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from godsp_tpu._dtypes import put
from godsp_tpu.ops import pallas_outer as po

D1, D2, N3 = 64, 32, 8192
ROWS = D1 * D2


def mk(single, K):
    def build():
        po.set_l1_single_dot(single)

        @jax.jit
        def c(xr, xi):
            for k in range(K):
                xr, xi = po.outer_dft_split(
                    xr * (1.0 + 1e-9 * k), xi, D1, D2)
            return jnp.abs(xr[0, 0, 0]) + jnp.abs(xi[0, 0, 0])
        return c
    return build


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    xr = put(rng.normal(size=(1, ROWS, N3)).astype(np.float32) * 0.01)
    xi = put(rng.normal(size=(1, ROWS, N3)).astype(np.float32) * 0.01)
    pool = ThreadPoolExecutor(4)
    lowered = {}
    for single in (False, True):
        po.set_l1_single_dot(single)
        for K in (2, 8):
            lowered[(single, K)] = mk(single, K)().lower(xr, xi)
    po.set_l1_single_dot(False)
    t0 = time.perf_counter()
    progs = {k: pool.submit(v.compile) for k, v in lowered.items()}
    try:
        progs = {k: v.result() for k, v in progs.items()}
    except Exception as e:
        print("compile failed:", repr(e)[:300], flush=True)
        sys.exit(1)
    print(f"compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    ref = None
    for single in (False, True):
        got = float(np.asarray(progs[(single, 2)](xr, xi)))
        if ref is None:
            ref = got
        else:
            print(f"outputs match: {abs(got-ref) <= 1e-3 * abs(ref)}",
                  flush=True)
        float(np.asarray(progs[(single, 8)](xr, xi)))
    for single in (False, True):
        lo, hi = progs[(single, 2)], progs[(single, 8)]
        reps = []
        for _ in range(3):
            bl = bh = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(np.asarray(lo(xr, xi)))
                bl = min(bl, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(np.asarray(hi(xr, xi)))
                bh = min(bh, time.perf_counter() - t0)
            reps.append(max((bh - bl) / 6, 1e-9))
        per = sorted(reps)[1]
        print(f"single_dot={single}: {per*1e3:.3f} ms  "
              f"reps={[f'{r*1e3:.3f}' for r in reps]}", flush=True)
