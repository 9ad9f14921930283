"""Chip decomposition of the 2^24 giant-FFT pipeline (one session, so
the bimodal clock can't skew component ratios):

  outer   fused outer-level kernel alone (ops/pallas_outer.py)
  outer_e einsum outer levels alone (the large.py fallback structure)
  rows    kernel row FFT alone (2048 x 8192, digit out)
  fold    the 5-axis fold-to-natural transpose alone
  total   public fft.fft at 2^24 (sum check)
  k28     2^28 total with the VMEM-safe lane tile (T=128)
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from godsp_tpu import fft
from godsp_tpu._dtypes import put
from godsp_tpu.fft import large as lg
from godsp_tpu.fft.large import _digit_axes, _fold_to_natural, _tables
from godsp_tpu.ops.pallas_fft import fft_pow2_split
from godsp_tpu.ops.pallas_outer import outer_dft_split

LOG2N = 24
N = 1 << LOG2N
D1, D2, N3 = lg._plan(N)
ROWS = D1 * D2


def mk_outer(K):
    @jax.jit
    def c(xr, xi):
        for k in range(K):
            xr, xi = outer_dft_split(xr * (1.0 + 1e-9 * k), xi, D1, D2)
        return jnp.abs(xr[0, 0, 0]) + jnp.abs(xi[0, 0, 0])
    return c


def mk_outer_e(K):
    f1p, tap, tbp, f2p, tcp = _tables(N, False)
    J = lambda a: jnp.asarray(a, jnp.float32)

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    @jax.jit
    def c(xr, xi):
        for k in range(K):
            x3r = xr.reshape(1, D1, D2 * N3) * (1.0 + 1e-9 * k)
            x3i = xi.reshape(1, D1, D2 * N3)
            mm = lambda F, v: jnp.einsum(
                "ki,bin->bkn", F, v, precision=jax.lax.Precision.HIGHEST)
            f1r, f1i = J(f1p[0]), J(f1p[1])
            ar = mm(f1r, x3r) - mm(f1i, x3i)
            ai = mm(f1r, x3i) + mm(f1i, x3r)
            a4r = ar.reshape(1, D1, D2, N3)
            a4i = ai.reshape(1, D1, D2, N3)
            twr, twi = cmul(
                J(tap[0])[:, :, None], J(tap[1])[:, :, None],
                J(tbp[0])[:, None, :], J(tbp[1])[:, None, :],
            )
            br, bi = cmul(a4r, a4i, twr, twi)
            mm2 = lambda F, v: jnp.einsum(
                "ci,bkin->bkcn", F, v, precision=jax.lax.Precision.HIGHEST)
            f2r, f2i = J(f2p[0]), J(f2p[1])
            cr = mm2(f2r, br) - mm2(f2i, bi)
            ci = mm2(f2r, bi) + mm2(f2i, br)
            br, bi = cmul(cr, ci, J(tcp[0]), J(tcp[1]))
            xr = br.reshape(1, ROWS, N3)
            xi = bi.reshape(1, ROWS, N3)
        return jnp.abs(xr[0, 0, 0]) + jnp.abs(xi[0, 0, 0])
    return c


def mk_rows(K):
    @jax.jit
    def c(xr, xi):
        for k in range(K):
            xr, xi = fft_pow2_split(
                xr * (1.0 + 1e-9 * k), xi, inverse=False, order="digit")
        return jnp.abs(xr[0, 0]) + jnp.abs(xi[0, 0])
    return c


def mk_fold(K):
    k3 = _digit_axes(N3)
    axes = [(D1, 1), (D2, D1)] + [(s, D1 * D2 * st) for s, st in k3]

    @jax.jit
    def c(xr, xi):
        for k in range(K):
            yr = _fold_to_natural(xr * (1.0 + 1e-9 * k), (), 1, N, axes)
            yi = _fold_to_natural(xi, (), 1, N, axes)
            xr = yr.reshape(ROWS, N3)
            xi = yi.reshape(ROWS, N3)
        return jnp.abs(xr[0, 0]) + jnp.abs(xi[0, 0])
    return c


def mk_total(K, n=N):
    sN = np.float32(1.0 / n)

    @jax.jit
    def c(zz):
        for k in range(K):
            zz = fft.fft(zz)
            if k % 2 == 1:
                zz = zz * sN
        return jnp.abs(jnp.real(zz[0])) + jnp.abs(jnp.imag(zz[0]))
    return c


def measure(name, lo, hi, args, k_lo, k_hi):
    for f in (lo, hi):
        float(np.asarray(f(*args)))
    reps = []
    for _ in range(3):
        bl = bh = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(lo(*args)))
            bl = min(bl, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(hi(*args)))
            bh = min(bh, time.perf_counter() - t0)
        reps.append(max((bh - bl) / (k_hi - k_lo), 1e-9))
    per = sorted(reps)[1]
    print(f"{name}: {per*1e3:.3f} ms  reps={[f'{r*1e3:.3f}' for r in reps]}",
          flush=True)
    return per


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  plan 2^{LOG2N} = "
          f"({D1}, {D2}, {N3})", flush=True)
    rng = np.random.default_rng(0)
    xr3 = put(rng.normal(size=(1, ROWS, N3)).astype(np.float32) * 0.01)
    xi3 = put(rng.normal(size=(1, ROWS, N3)).astype(np.float32) * 0.01)
    xr2 = xr3.reshape(ROWS, N3)
    xi2 = xi3.reshape(ROWS, N3)
    z = jax.jit(jax.lax.complex)(xr2.reshape(N), xi2.reshape(N))
    z.block_until_ready()

    pool = ThreadPoolExecutor(6)
    specs = {
        "outer": (mk_outer, (xr3, xi3), 2, 8),
        "outer_einsum": (mk_outer_e, (xr3, xi3), 2, 8),
        "rows": (mk_rows, (xr2, xi2), 2, 8),
        "fold": (mk_fold, (xr2, xi2), 2, 8),
        "total": (mk_total, (z,), 2, 8),
    }
    progs = {}
    t0 = time.perf_counter()
    for nm, (mk, args, k_lo, k_hi) in specs.items():
        lo = mk(k_lo)
        hi = mk(k_hi)
        progs[nm] = (
            pool.submit(lambda f=lo, a=args: f.lower(*a).compile()),
            pool.submit(lambda f=hi, a=args: f.lower(*a).compile()),
        )
    progs = {k: (a.result(), b.result()) for k, (a, b) in progs.items()}
    print(f"compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    for nm, (mk, args, k_lo, k_hi) in specs.items():
        measure(nm, progs[nm][0], progs[nm][1], args, k_lo, k_hi)

    # 2^28 with the VMEM-safe tile
    del xr3, xi3, xr2, xi2, z
    N28 = 1 << 28
    r28 = rng.normal(size=(1 << 14, 1 << 14)).astype(np.float32) * 0.01

    @jax.jit
    def toz(a, b):
        return (a + 1j * b).reshape(N28)

    z28 = toz(put(r28), put(r28 * 0.5))
    z28.block_until_ready()
    del r28
    lo = mk_total(2, N28).lower(z28)
    hi = mk_total(4, N28).lower(z28)
    lo, hi = pool.submit(lo.compile), pool.submit(hi.compile)
    lo, hi = lo.result(), hi.result()
    measure("total_2pow28", lo, hi, (z28,), 2, 4)
