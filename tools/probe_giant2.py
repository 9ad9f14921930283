"""Chip probe: giant-N (2^24) outer-level variants for fft/large.py.

The three-level einsum plan measured 4.52 ms at 2^24 (vs the old
two-level 4.1 ms) — the dense HIGHEST einsums are HBM-amplified by the
6-pass bf16 limb expansion.  Variants:

  v0    current structure (4 real matmuls/level, fused twiddle product)
  vseq  sequential twiddle application (Ta then Tb; no (d1,d2,n3)
        broadcast product for XLA to materialize)
  vkar  Karatsuba 3-matmul complex einsums + sequential twiddle
  vhigh Karatsuba + sequential + Precision.HIGH (3-pass limbs) on the
        OUTER levels only (kernel level stays HIGHEST) — SNR checked
  v16k  n3=16384 rows (d1=32, d2=32): fewer outer flops, split-DIF rows
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

from godsp_tpu.fft import large as lg
from godsp_tpu.fft.large import _digit_axes, _fold_to_natural, _tables
from godsp_tpu.ops.pallas_fft import fft_pow2_split

LOG2N = 24
N = 1 << LOG2N
_HI = jax.lax.Precision.HIGHEST


def fls(xr, xi, d1, d2, n3, tw_seq, kara, prec):
    """fft_large_split body with variant knobs (forward only)."""
    n = xr.shape[-1]
    lead = xr.shape[:-1]
    b = int(np.prod(lead, dtype=np.int64)) if lead else 1

    # tables for THIS (d1, d2, n3) — recompute locally (not _plan-keyed)
    sign = -2j * np.pi
    from godsp_tpu.fft.four_step import dft_matrix

    f1 = dft_matrix(d1)
    k1 = np.arange(d1, dtype=np.float64)
    ta = np.exp(sign * np.outer(k1, np.arange(d2, dtype=np.float64) * n3) / n)
    tb = np.exp(sign * np.outer(k1, np.arange(n3, dtype=np.float64)) / n)
    f2 = dft_matrix(d2) if d2 > 1 else None
    k2 = np.arange(d2, dtype=np.float64)
    tc = (
        np.exp(sign * np.outer(k2, np.arange(n3, dtype=np.float64)) / (d2 * n3))
        if d2 > 1 else None
    )
    J = lambda a: jnp.asarray(a, dtype=jnp.float32)

    def cmm(F, vr, vi, spec):
        fr, fi = J(F.real), J(F.imag)
        mm = lambda A, v: jnp.einsum(spec, A, v, precision=prec)
        if kara:
            m1 = mm(fr, vr)
            m2 = mm(fi, vi)
            m3 = mm(fr + fi, vr + vi)
            return m1 - m2, m3 - m1 - m2
        return mm(fr, vr) - mm(fi, vi), mm(fr, vi) + mm(fi, vr)

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    x3r = xr.reshape(b, d1, d2 * n3)
    x3i = xi.reshape(b, d1, d2 * n3)
    ar, ai = cmm(f1, x3r, x3i, "ki,bin->bkn")

    a4r = ar.reshape(b, d1, d2, n3)
    a4i = ai.reshape(b, d1, d2, n3)
    if tw_seq:
        tar, tai = J(ta.real)[:, :, None], J(ta.imag)[:, :, None]
        br_, bi_ = cmul(a4r, a4i, tar, tai)
        tbr, tbi = J(tb.real)[:, None, :], J(tb.imag)[:, None, :]
        br_, bi_ = cmul(br_, bi_, tbr, tbi)
    else:
        twr, twi = cmul(
            J(ta.real)[:, :, None], J(ta.imag)[:, :, None],
            J(tb.real)[:, None, :], J(tb.imag)[:, None, :],
        )
        br_, bi_ = cmul(a4r, a4i, twr, twi)

    if f2 is not None:
        cr, ci = cmm(f2, br_, bi_, "ci,bkin->bkcn")
        br_, bi_ = cmul(cr, ci, J(tc.real), J(tc.imag))

    br_ = br_.reshape(b * d1 * d2, n3)
    bi_ = bi_.reshape(b * d1 * d2, n3)
    yr, yi = fft_pow2_split(br_, bi_, inverse=False, order="digit")
    k3_axes = _digit_axes(n3)
    axes = [(d1, 1), (d2, d1)] + [(s, d1 * d2 * st) for s, st in k3_axes]
    yr = _fold_to_natural(yr, lead, b, n, axes)
    yi = _fold_to_natural(yi, lead, b, n, axes)
    return yr, yi


VARIANTS = {
    "v0":    dict(d1=64, d2=32, n3=8192, tw_seq=False, kara=False, prec=_HI),
    "vseq":  dict(d1=64, d2=32, n3=8192, tw_seq=True, kara=False, prec=_HI),
    "vkar":  dict(d1=64, d2=32, n3=8192, tw_seq=True, kara=True, prec=_HI),
    "vhigh": dict(d1=64, d2=32, n3=8192, tw_seq=True, kara=True,
                  prec=jax.lax.Precision.HIGH),
    "v16k":  dict(d1=32, d2=32, n3=16384, tw_seq=True, kara=True, prec=_HI),
}


def build_input():
    # multi-tone over planes (device-built)
    tones = [(3, 0.5, 0.1), (12345, 0.25, -0.3), ((N >> 1) + 7, 0.125, 0.7)]
    hi_len, lo_len = N >> 14, 1 << 14
    phis = []
    for f, a, ph in tones:
        phi_hi = np.mod(
            np.arange(hi_len, dtype=np.float64) * float((f * lo_len) % N) / N,
            1.0,
        )
        phi_lo = np.mod(np.arange(lo_len, dtype=np.float64) * f / N + ph, 1.0)
        phis.append((jnp.asarray(phi_hi.astype(np.float32)),
                     jnp.asarray(phi_lo.astype(np.float32))))

    @jax.jit
    def build(ps):
        zr = jnp.zeros((hi_len, lo_len), jnp.float32)
        zi = jnp.zeros((hi_len, lo_len), jnp.float32)
        for (f, a, ph), (phi, plo) in zip(tones, ps):
            ah, al = 2.0 * np.pi * phi, 2.0 * np.pi * plo
            ch, sh = jnp.cos(ah)[:, None], jnp.sin(ah)[:, None]
            cl, sl = jnp.cos(al)[None, :], jnp.sin(al)[None, :]
            zr = zr + np.float32(a) * (ch * cl - sh * sl)
            zi = zi + np.float32(a) * (sh * cl + ch * sl)
        return zr.reshape(N), zi.reshape(N)

    xr, xi = build(phis)
    xr.block_until_ready()
    return xr, xi, tones


def snr_of(name, cfg, xr, xi, tones):
    @jax.jit
    def err(xr, xi):
        yr, yi = fls(xr, xi, **cfg)
        sig = err_ = 0.0
        for (f, a, ph) in tones:
            wr = N * a * jnp.cos(2 * np.pi * ph)
            wi = N * a * jnp.sin(2 * np.pi * ph)
            sig = sig + wr * wr + wi * wi
            err_ = err_ + (yr[f] - wr) ** 2 + (yi[f] - wi) ** 2
            yr = yr.at[f].set(0.0)
            yi = yi.at[f].set(0.0)
        return sig, err_ + jnp.sum(yr * yr) + jnp.sum(yi * yi)

    s, e = (float(v) for v in err(xr, xi))
    return 10.0 * np.log10(s / max(e, 1e-300))


def chain(cfg, K):
    @jax.jit
    def run(xr, xi):
        for k in range(K):
            xr, xi = fls(xr * (1.0 + 1e-9 * k), xi, **cfg)
        return jnp.abs(xr[0]) + jnp.abs(xi[0])

    return run


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    xr, xi, tones = build_input()
    names = sys.argv[1:] or list(VARIANTS)
    pool = ThreadPoolExecutor(4)
    progs = {}
    t0 = time.perf_counter()
    for nm in names:
        cfg = VARIANTS[nm]
        progs[(nm, 2)] = pool.submit(
            lambda c=cfg: chain(c, 2).lower(xr, xi).compile()
        )
        progs[(nm, 6)] = pool.submit(
            lambda c=cfg: chain(c, 6).lower(xr, xi).compile()
        )
    progs = {k: v.result() for k, v in progs.items()}
    print(f"compiled {len(progs)} programs in "
          f"{time.perf_counter()-t0:.0f}s", flush=True)
    for nm in names:
        for K in (2, 6):
            float(np.asarray(progs[(nm, K)](xr, xi)))
    for nm in names:
        reps = []
        for _ in range(3):
            bl = bh = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(np.asarray(progs[(nm, 2)](xr, xi)))
                bl = min(bl, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(np.asarray(progs[(nm, 6)](xr, xi)))
                bh = min(bh, time.perf_counter() - t0)
            reps.append((bh - bl) / 4)
        per = sorted(reps)[1]
        snr = snr_of(nm, VARIANTS[nm], xr, xi, tones)
        print(f"{nm}: {per*1e3:.3f} ms  snr={snr:.1f} dB  "
              f"reps={[f'{r*1e3:.3f}' for r in reps]}", flush=True)
