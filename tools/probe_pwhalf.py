"""Chip A/B: fused Pwelch with the half-Hermitian contraction vs the
full digit contraction (ops/pallas_pwelch.py packed_half).

Bench-style chain differential (K=6 vs 22) at the bench's headline
geometry (nfft=1024, stride=512) plus the phase-class case (stride=160).
packed_half is passed EXPLICITLY to pwelch_power_partials — the module
global would race across the parallel-compile pool (first probe run
produced inf-dB "parity": all four traces had taken the same path).
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from godsp_tpu import window as win
from godsp_tpu._dtypes import put
from godsp_tpu.dsputils import snr_db
from godsp_tpu.ops import pallas_pwelch as pw


def one_sided(x, w, nfft, stride, segs, half):
    mask = jnp.ones(x.shape[:-1] + (segs,), jnp.float32)
    partials = pw.pwelch_power_partials(
        x, mask, w, nfft, stride, pad=nfft, packed_half=half
    )
    s = partials.sum(axis=-2)
    if half:
        return pw.packed_to_natural_onesided(s, nfft)
    return pw.digit_to_natural_bins(s, nfft)[..., : nfft // 2 + 1]


def chain(w, nfft, stride, segs, half, K):
    @jax.jit
    def run(xx):
        acc = 0.0
        for k in range(K):
            acc = acc + one_sided(
                xx * (1.0 + 1e-6 * k), w, nfft, stride, segs, half
            )[0]
        return acc

    return run


def measure(nfft, stride):
    segs = 4096
    L = stride * segs + nfft
    rng = np.random.default_rng(0)
    sig = put(rng.normal(size=L).astype(np.float32) * 0.1)
    w = jnp.asarray(win.window_table_np("hann", nfft), jnp.float32)
    pool = ThreadPoolExecutor(4)
    progs = {
        (half, K): pool.submit(
            lambda f=chain(w, nfft, stride, segs, half, K), s=sig:
            f.lower(s).compile()
        )
        for half in (False, True)
        for K in (6, 22)
    }
    progs = {k: v.result() for k, v in progs.items()}
    for v in progs.values():
        float(np.asarray(v(sig)))
    for half in (False, True):
        reps = []
        for _ in range(3):
            bl = bh = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(np.asarray(progs[(half, 6)](sig)))
                bl = min(bl, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(np.asarray(progs[(half, 22)](sig)))
                bh = min(bh, time.perf_counter() - t0)
            reps.append((bh - bl) / 16)
        per = sorted(reps)[1]
        print(
            f"nfft={nfft} stride={stride} half={half}: {per*1e3:.3f} ms "
            f"({per/segs*1e9:.1f} ns/frame, "
            f"{segs*stride/per/1e9:.2f} Gsamples/s)  reps="
            f"{[f'{r*1e3:.3f}' for r in reps]}",
            flush=True,
        )
    a = np.asarray(jax.jit(
        lambda x: one_sided(x, w, nfft, stride, segs, True)
    )(sig))
    b = np.asarray(jax.jit(
        lambda x: one_sided(x, w, nfft, stride, segs, False)
    )(sig))
    print(f"  half-vs-full chip snr: {snr_db(a, b.astype(np.float64)):.1f} dB",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    measure(1024, 512)
    measure(1024, 160)
