"""Chip A/B: the 128-peel giant plan vs the balanced fused two-level
plan at 2^24 (VERDICT r4 next-round #4: attack the outer kernel's
d<128 MXU utilization).

The fused kernel contracts at K = d1, d2 < 128 and the MXU consumes a
full K=128 systolic pass regardless of depth, so (64, 32) costs ~3.3
pass-equivalents in ONE HBM pass.  The peel plan runs k = 2 single-level
d=128 contractions (full MXU depth) in TWO HBM passes, then the
flagship 1024-row kernel instead of 8192 rows.  Which wins is a
measured question; stage walls pin the winner's decomposition.

All A/Bs same-session, 3-rep chain-differential medians; direct
fft_large_split calls under per-leg jax.jit closures (the public fft's
inner jit cache would void a toggle A/B — BASELINE.md round 4 NB).
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from godsp_tpu.fft import large as lg
from godsp_tpu.ops.pallas_fft import fft_pow2_split
from godsp_tpu.ops.pallas_outer import outer_dft_split
from godsp_tpu.utils.metrics import copy_split_pallas

_F32 = jnp.float32
N = 1 << 24


def make_plan_chain(peel_on, n=N):
    def make(K):
        @jax.jit
        def chain(xr, xi):
            prev = lg._peel_on
            lg._peel_on = peel_on  # trace-time read; per-leg closures
            try:
                for k in range(K):
                    yr, yi = lg.fft_large_split(xr, xi)
                    s = 1.0 / np.float32(n)
                    xr = yr * s
                    xi = yi * s
            finally:
                lg._peel_on = prev
            return jnp.abs(xr[0]) + jnp.abs(xi[0])

        return chain

    return make


def make_stage_chain(op):
    def make(K):
        @jax.jit
        def chain(xr, xi):
            for k in range(K):
                xr, xi = op(xr * (1.0 + 1e-6 * k), xi)
            return jnp.abs(xr.reshape(-1)[0]) + jnp.abs(xi.reshape(-1)[0])

        return chain

    return make


def st_peel1(xr, xi):
    yr, yi = outer_dft_split(
        xr.reshape(1, 128, N // 128), xi.reshape(1, 128, N // 128), 128, 1
    )
    return yr.reshape(N), yi.reshape(N)


def st_peel2(xr, xi):
    yr, yi = outer_dft_split(
        xr.reshape(128, 128, N // (128 * 128)),
        xi.reshape(128, 128, N // (128 * 128)), 128, 1,
    )
    return yr.reshape(N), yi.reshape(N)


def st_rows1024(xr, xi):
    yr, yi = fft_pow2_split(
        xr.reshape(N // 1024, 1024), xi.reshape(N // 1024, 1024),
        order="digit",
    )
    return yr.reshape(N), yi.reshape(N)


def st_rows8192(xr, xi):
    yr, yi = fft_pow2_split(
        xr.reshape(N // 8192, 8192), xi.reshape(N // 8192, 8192),
        order="digit",
    )
    return yr.reshape(N), yi.reshape(N)


def st_fold_peel(xr, xi):
    axes = [(128, 1), (128, 128), (8, 16384), (128, 131072)]
    yr = lg._fold_to_natural(xr.reshape(1, N), (), 1, N, axes)
    yi = lg._fold_to_natural(xi.reshape(1, N), (), 1, N, axes)
    return yr.reshape(N), yi.reshape(N)


def st_fold_fused(xr, xi):
    axes = [(64, 1), (32, 64), (64, 2048), (128, 131072)]
    yr = lg._fold_to_natural(xr.reshape(1, N), (), 1, N, axes)
    yi = lg._fold_to_natural(xi.reshape(1, N), (), 1, N, axes)
    return yr.reshape(N), yi.reshape(N)


def st_rows1024_nat(xr, xi):
    yr, yi = fft_pow2_split(
        xr.reshape(N // 1024, 1024), xi.reshape(N // 1024, 1024),
        order="natural",
    )
    return yr.reshape(N), yi.reshape(N)


def st_fold_nat(xr, xi):
    axes = [(128, 1), (128, 128), (1024, 16384)]
    yr = lg._fold_to_natural(xr.reshape(1, N), (), 1, N, axes)
    yi = lg._fold_to_natural(xi.reshape(1, N), (), 1, N, axes)
    return yr.reshape(N), yi.reshape(N)


def st_copy(xr, xi):
    yr, yi = copy_split_pallas(
        xr.reshape(N // 8192, 8192), xi.reshape(N // 8192, 8192)
    )
    return yr.reshape(N), yi.reshape(N)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    gen = jax.jit(lambda k: jax.random.normal(k, (N,), _F32) * 0.01)
    xr = gen(key)
    xi = gen(jax.random.PRNGKey(1))
    xr.block_until_ready(); xi.block_until_ready()

    # numerics: both plans vs a 5-tone oracle
    rng = np.random.default_rng(9)
    bins = rng.choice(N, size=5, replace=False)
    t = np.arange(N, dtype=np.float64)
    sig = np.zeros(N, np.complex128)
    for b in bins:
        sig += np.exp(2j * np.pi * b * t / N)
    sr = jnp.asarray(sig.real, _F32)
    si = jnp.asarray(sig.imag, _F32)
    ref = np.zeros(N, np.complex128)
    for b in bins:
        ref[b] = N
    from godsp_tpu.dsputils import snr_db
    for name, on in (("peel", True), ("fused", False)):
        prev = lg._peel_on
        lg._peel_on = on
        try:
            f = jax.jit(lambda a, b: lg.fft_large_split(a, b))
            yr, yi = f(sr, si)
            got = np.asarray(yr) + 1j * np.asarray(yi)
        finally:
            lg._peel_on = prev
        print(f"{name} snr: {snr_db(got, ref):.1f} dB", flush=True)

    KLO, KHI = 3, 9
    specs = {
        "plan_peel": (make_plan_chain(True), (KLO, KHI)),
        "plan_fused": (make_plan_chain(False), (KLO, KHI)),
        "peel1": (make_stage_chain(st_peel1), (4, 16)),
        "peel2": (make_stage_chain(st_peel2), (4, 16)),
        "rows1024": (make_stage_chain(st_rows1024), (4, 16)),
        "rows8192": (make_stage_chain(st_rows8192), (4, 16)),
        "rows1024nat": (make_stage_chain(st_rows1024_nat), (4, 16)),
        "fold_peel": (make_stage_chain(st_fold_peel), (4, 16)),
        "fold_fused": (make_stage_chain(st_fold_fused), (4, 16)),
        "fold_nat": (make_stage_chain(st_fold_nat), (4, 16)),
        "copy": (make_stage_chain(st_copy), (4, 16)),
    }
    N20 = 1 << 20
    gen20 = jax.jit(lambda k: jax.random.normal(k, (N20,), _F32) * 0.01)
    xr20 = gen20(jax.random.PRNGKey(4))
    xi20 = gen20(jax.random.PRNGKey(5))
    xr20.block_until_ready(); xi20.block_until_ready()
    specs["plan20_peel"] = (make_plan_chain(True, N20), (4, 16))
    specs["plan20_fused"] = (make_plan_chain(False, N20), (4, 16))
    inputs = {nm: (xr20, xi20) if nm.startswith("plan20") else (xr, xi)
              for nm in specs}
    pool = ThreadPoolExecutor(6)
    progs = {
        (nm, K): pool.submit(
            lambda f=mk(K), xs=inputs[nm]: f.lower(*xs).compile()
        )
        for nm, (mk, ks) in specs.items()
        for K in ks
    }
    progs = {k: v.result() for k, v in progs.items()}
    print("compiled", len(progs), flush=True)

    for nm, (_mk, (klo, khi)) in specs.items():
        xr_n, xi_n = inputs[nm]
        lo, hi = progs[(nm, klo)], progs[(nm, khi)]
        for f in (lo, hi):
            float(np.asarray(f(xr_n, xi_n)))
        reps, tries = [], 0
        while len(reps) < 3 and tries < 6:
            tries += 1
            bl = bh = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(np.asarray(lo(xr_n, xi_n)))
                bl = min(bl, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(np.asarray(hi(xr_n, xi_n)))
                bh = min(bh, time.perf_counter() - t0)
            if bh - bl < 1e-4:
                continue
            reps.append((bh - bl) / (khi - klo))
        per = sorted(reps)[len(reps) // 2]
        print(f"{nm:11s}: {per*1e3:.3f} ms  reps="
              f"{[f'{r*1e3:.3f}' for r in reps]}", flush=True)


if __name__ == "__main__":
    main()
