"""Sweep the lane-slice kernel's row-chunk size on the flagship shape.

Measures the PRODUCTION path (ops.pallas_fft.fft_pow2_split) at
n=1024 b=16384 for each chunk setting, digit and natural order, with an
interleaved whole-block copy co-measure per setting to cancel clock
drift.  Each setting gets its own jit wrapper (the knob is a trace-time
global; reusing one jitted fn would not retrace).

Usage: python tools/probe_chunk.py [n batch [spec...]]
  spec = chunk | chunk@bt   (chunk in {none, INT}; bt = batch_tile)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    def parse(spec):
        shared = spec.startswith("s:")
        if shared:
            spec = spec[2:]
        chunk, _, bt = spec.partition("@")
        return (None if chunk == "none" else int(chunk),
                int(bt) if bt else None, shared)

    specs = [parse(s) for s in sys.argv[3:]] or [
        (None, None, False), (128, None, False), (64, None, False),
        (32, None, False)]

    import jax
    import jax.numpy as jnp  # noqa: F401 (chain bodies)

    from godsp_tpu.ops import pallas_fft as pf
    from godsp_tpu.utils.metrics import copy_split_pallas, time_chain_diff

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    dev = jax.devices()[0]
    log("device:", dev.device_kind)
    rng = np.random.default_rng(0)
    xr = jax.device_put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
    xi = jax.device_put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
    s = np.float32(1.0 / (float(n) * float(n)))  # defeat chain overflow
    nbytes = 2 * batch * n * 4  # both planes, one direction

    cbt = min(256, (1 << 25) // (32 * n))  # 64 MB scoped-vmem cap

    def copy_ref():
        def make(K):
            @jax.jit
            def chain(r):
                i = xi
                for _ in range(K):
                    r, i = copy_split_pallas(r, i, batch_tile=cbt)
                    r, i = i, r
                return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])
            return chain
        return time_chain_diff(make, xr, k_lo=10, k_hi=26, iters=6) * 1e3

    nat_fused = os.environ.get("NAT_FUSED", "1") != "0"
    dimsem = os.environ.get("DIMSEM", "arbitrary")

    def fft_ms(chunk, natural, bt, shared):
        pf.set_ls_chunk_rows(chunk)
        pf.set_ls_shared_f2(shared)
        pf.set_natural_fused(nat_fused)
        pf.set_fft_dim_semantics(dimsem)
        order = "natural" if natural else "digit"

        def make(K):
            @jax.jit
            def chain(r):
                i = xi
                for k in range(K):
                    r, i = pf.fft_pow2_split(r, i, order=order,
                                             batch_tile=bt)
                    r, i = i, r
                    if k % 4 == 3:
                        r, i = r * s, i * s
                return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])
            return chain
        try:
            return time_chain_diff(make, xr, k_lo=10, k_hi=26, iters=6) * 1e3
        finally:
            pf.set_ls_chunk_rows(None)
            pf.set_ls_shared_f2(False)
            pf.set_natural_fused(True)
            pf.set_fft_dim_semantics("arbitrary")

    for chunk, bt, shared in specs:
        for natural in (False, True):
            t0 = time.time()
            try:
                ms = fft_ms(chunk, natural, bt, shared)
            except Exception as e:  # noqa: BLE001
                log(f"[chunk] rows={chunk} bt={bt} sh={int(shared)} "
                    f"nat={natural} FAILED: {type(e).__name__}: {e}")
                continue
            cms = copy_ref()
            gbs = 2 * nbytes / ms * 1e-6  # rd+wr
            cgbs = 2 * nbytes / cms * 1e-6
            log(f"[chunk] rows={chunk!s:>5} bt={bt!s:>4} sh={int(shared)} "
                f"nat={int(natural)}: {ms:.3f} ms {gbs:.0f} GB/s  "
                f"(copy {cms:.3f} ms {cgbs:.0f} GB/s, ratio "
                f"{ms / cms:.2f})  [{time.time() - t0:.0f}s]")


if __name__ == "__main__":
    main()
