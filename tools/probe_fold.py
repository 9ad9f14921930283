"""Chip probe: is the giant-N fold at the hardware transpose bound?

Times the real fold (5-axis, digit-absorbing) against a PLAIN 2-D
f32 transpose of the same array shape ((rows, n3) -> (n3, rows)) and a
plain copy, same session.  If fold ~= plain transpose, the fold's extra
digit bookkeeping is free and its cost is the transpose speed-of-light
on this chip — a structural bound, not unmeasured slack.
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
from godsp_tpu.fft.large import _digit_axes, _fold_to_natural

D1, D2, N3 = 64, 32, 8192
ROWS = D1 * D2
N = ROWS * N3


def mk_fold(K):
    k3 = _digit_axes(N3)
    axes = [(D1, 1), (D2, D1)] + [(s, ROWS * st) for s, st in k3]

    @jax.jit
    def c(xr, xi):
        for k in range(K):
            yr = _fold_to_natural(xr * (1.0 + 1e-9 * k), (), 1, N, axes)
            yi = _fold_to_natural(xi, (), 1, N, axes)
            xr, xi = yr.reshape(ROWS, N3), yi.reshape(ROWS, N3)
        return jnp.abs(xr[0, 0]) + jnp.abs(xi[0, 0])
    return c


def mk_t2d(K):
    @jax.jit
    def c(xr, xi):
        for k in range(K):
            yr = (xr * (1.0 + 1e-9 * k)).T
            yi = xi.T
            xr, xi = yr.reshape(ROWS, N3), yi.reshape(ROWS, N3)
        return jnp.abs(xr[0, 0]) + jnp.abs(xi[0, 0])
    return c


def mk_copy(K):
    @jax.jit
    def c(xr, xi):
        for k in range(K):
            xr = xr * (1.0 + 1e-9 * k) + 1e-12
            xi = xi + 1e-12
        return jnp.abs(xr[0, 0]) + jnp.abs(xi[0, 0])
    return c


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    xr = put(rng.normal(size=(ROWS, N3)).astype(np.float32) * 0.01)
    xi = put(rng.normal(size=(ROWS, N3)).astype(np.float32) * 0.01)
    pool = ThreadPoolExecutor(6)
    progs = {}
    for nm, mk in (("fold", mk_fold), ("t2d", mk_t2d), ("copy", mk_copy)):
        progs[nm] = (
            pool.submit(lambda f=mk(2): f.lower(xr, xi).compile()),
            pool.submit(lambda f=mk(8): f.lower(xr, xi).compile()),
        )
    progs = {k: (a.result(), b.result()) for k, (a, b) in progs.items()}
    for lo, hi in progs.values():
        float(np.asarray(lo(xr, xi)))
        float(np.asarray(hi(xr, xi)))
    for nm, (lo, hi) in progs.items():
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
        print(f"{nm}: {per*1e3:.3f} ms  reps={[f'{r*1e3:.3f}' for r in reps]}",
              flush=True)
