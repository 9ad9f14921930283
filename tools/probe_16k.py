"""n=16384 structure shoot-out on the real chip.

Variants (all b=1024 — same total bytes as the flagship shape):
  b3d        current default: batched-3D kernel structure
  ls@bt/ch   lane-slice structure force-enabled at n1=128 (probe-only:
             _LS_MAX_N1 monkeypatched), batch_tile bt, chunk rows ch
  split      fft_large_split with set_large_min(16384): N1=2 direct
             butterfly + two lane-slice 8192 rows + interleave transpose
  k8192      n=8192 b=2048 per-element reference (the 1.3x target base)

Each with an interleaved whole-block copy co-measure.
Usage: python tools/probe_16k.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    want = set(sys.argv[1:]) or {
        "b3d", "ls32", "ls32c8", "ls64c16", "split", "k8192"}

    import jax
    import jax.numpy as jnp

    from godsp_tpu.fft import large
    from godsp_tpu.ops import pallas_fft as pf
    from godsp_tpu.utils.metrics import copy_split_pallas, time_chain_diff

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    log("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    r0 = jax.device_put(np.float32(0.0))

    shapes = {}

    def planes(b, n):
        if (b, n) not in shapes:
            shapes[(b, n)] = (
                jax.device_put(
                    (rng.normal(size=(b, n)) * 0.01).astype(np.float32)),
                jax.device_put(
                    (rng.normal(size=(b, n)) * 0.01).astype(np.float32)),
            )
        return shapes[(b, n)]

    def copy_ref(b, n):
        xr, xi = planes(b, n)
        cbt = min(256, (1 << 25) // (32 * n))  # 64 MB scoped-vmem cap

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

    def run(name, b, n, body, k_hi=26):
        if name not in want:
            return
        t0 = time.time()
        xr, xi = planes(b, n)
        s = np.float32(1.0 / (float(n) * float(n)))

        def make(K):
            @jax.jit
            def chain(r):
                i = xi
                for k in range(K):
                    r, i = body(r, i)
                    r, i = i, r
                    if k % 4 == 3:
                        r, i = r * s, i * s
                return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])
            return chain
        try:
            ms = time_chain_diff(make, xr, k_lo=10, k_hi=k_hi, iters=6) * 1e3
        except Exception as e:  # noqa: BLE001
            log(f"[16k] {name} FAILED: {type(e).__name__}: {e}")
            return
        log(f"[16k] {name}: {ms:.3f} ms (copy ref pending)")
        cms = copy_ref(b, n)
        nbytes = 2 * b * n * 4
        per_elem_ns = ms * 1e6 / (b * n)
        log(f"[16k] {name}: {ms:.3f} ms ({2*nbytes/ms*1e-6:.0f} GB/s, "
            f"{per_elem_ns:.3f} ns/elem; copy {cms:.3f} ms, ratio "
            f"{ms/cms:.2f})  [{time.time()-t0:.0f}s]")

    B16, N16 = 1024, 16384

    run("b3d", B16, N16,
        lambda a, c: pf.fft_pow2_split(a, c, order="natural"))

    def ls_body(bt, ch):
        def body(a, c):
            pf._LS_MAX_N1 = 128  # probe-only
            pf.set_ls_chunk_rows(ch)
            try:
                return pf.fft_pow2_split(a, c, order="natural",
                                         batch_tile=bt)
            finally:
                pf._LS_MAX_N1 = 64
                pf.set_ls_chunk_rows(None)
        return body

    run("ls32", B16, N16, ls_body(32, None))
    run("ls32c8", B16, N16, ls_body(32, 8))
    run("ls64c16", B16, N16, ls_body(64, 16))

    def split_body(a, c):
        large.set_large_min(16384)
        try:
            return large.fft_large_split(a, c)
        finally:
            large.set_large_min(32768)

    run("split", B16, N16, split_body)

    run("k8192", 2048, 8192,
        lambda a, c: pf.fft_pow2_split(a, c, order="natural"))


if __name__ == "__main__":
    main()
