"""Primitive idiom costs for the lane-slice kernel floor (round 3).

The round-2/3 anatomy runs show the n=1024 kernel's time is invariant
to matmul structure (fused-G == shared-F2), matmul precision
(DEFAULT == HIGHEST), and compute content (G-matmuls-only == full), and
that a ZERO-compute whole->sliced copy costs the same ~2x-copy floor.
So measure the data-movement idioms in isolation (all read 2 f32
planes (256, 1024), store 2 whole planes):

  v0copy      pure whole->whole copy (the reference floor)
  v1half3     3 rounds of lane split@512 + butterfly add/sub + concat
              (the full-width DIF step-1 shape)
  v2slice8    split into 8 @128, add 1.0, concat, whole store
  v3reshape   (256,1024) -> (2048,128) value reshape, add, back
  v4bd1       ONE block-diag matmul (256,1024)@(1024,1024) DEFAULT/plane
  v5bd_hi     same but 6 limb matmuls (the HIGHEST-equivalent pair cost)
  v6full      full-width DIF + twiddle + 18 BD limb matmuls (the
              candidate kernel, correctness not wired — cost probe only)

Usage: python tools/probe_anatomy2.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    want = set(sys.argv[1:]) or {
        "v0copy", "v1half3", "v2slice8", "v3reshape", "v4bd1", "v5bd_hi",
        "v6full",
    }

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from godsp_tpu.ops import pallas_fft as pf
    from godsp_tpu.utils.metrics import time_chain_diff

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    log("device:", jax.devices()[0].device_kind)
    n, batch, bt = 1024, 16384, 256
    n1 = n // 128
    rng = np.random.default_rng(0)
    xr = jax.device_put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
    xi = jax.device_put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))

    F32 = jnp.float32

    def run_kernel_variant(name, body, tables=(), k_lo=10, k_hi=26,
                           post_scale=0.5):
        """body(xr_val, xi_val, *table_vals) -> (yr, yi) whole-width."""
        if name not in want:
            return
        t0 = time.time()

        def kern(*refs):
            xr_ref, xi_ref, *rest = refs
            *tab_refs, yr_ref, yi_ref = rest
            tvals = [t[:] for t in tab_refs]
            yr, yi = body(xr_ref[:], xi_ref[:], *tvals)
            yr_ref[:] = yr
            yi_ref[:] = yi

        data_spec = pl.BlockSpec(
            (bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        const_specs = [
            pl.BlockSpec(
                t.shape, lambda i, nd=t.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
            for t in tables
        ]

        def op(a, b):
            return pl.pallas_call(
                kern,
                grid=(batch // bt,),
                in_specs=[data_spec, data_spec] + const_specs,
                out_specs=(data_spec, data_spec),
                out_shape=(
                    jax.ShapeDtypeStruct((batch, n), F32),
                    jax.ShapeDtypeStruct((batch, n), F32),
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 << 20,
                    dimension_semantics=("arbitrary",),
                ),
            )(a, b, *tables)

        def make(K):
            @jax.jit
            def chain(r):
                i = xi
                for _ in range(K):
                    r, i = op(r, i)
                    r, i = i, r
                    r = r * np.float32(post_scale)  # bound magnitudes
                    i = i * np.float32(post_scale)
                return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])
            return chain

        try:
            ms = time_chain_diff(make, xr, k_lo=k_lo, k_hi=k_hi, iters=6) * 1e3
        except Exception as e:  # noqa: BLE001
            log(f"[anat2] {name} FAILED: {type(e).__name__}: {e}")
            return
        gbs = 4 * batch * n * 4 / ms * 1e-6
        log(f"[anat2] {name}: {ms:.3f} ms {gbs:.0f} GB/s rd+wr "
            f"[{time.time() - t0:.0f}s]")

    # v0: pure copy.
    run_kernel_variant("v0copy", lambda a, b: (a, b))

    # v1: three rounds of half split + butterfly + concat (full-width
    # DIF step-1 data movement; twiddle rows omitted — VPU-trivial).
    def half3(a, b):
        for _ in range(3):
            h = a.shape[1] // 2
            au, av = a[:, :h], a[:, h:]
            bu, bv = b[:, :h], b[:, h:]
            a = jnp.concatenate([au + av, au - av], axis=1)
            b = jnp.concatenate([bu + bv, bu - bv], axis=1)
        return a, b

    run_kernel_variant("v1half3", half3)

    # v2: 8-way 128-lane split + concat.
    def slice8(a, b):
        sa = [a[:, k * 128 : (k + 1) * 128] + 1.0 for k in range(n1)]
        sb = [b[:, k * 128 : (k + 1) * 128] + 1.0 for k in range(n1)]
        return jnp.concatenate(sa, axis=1), jnp.concatenate(sb, axis=1)

    run_kernel_variant("v2slice8", slice8)

    # v3: value reshape to (bt*n1, 128) and back.
    def resh(a, b):
        a2 = a.reshape(bt * n1, 128) + 1.0
        b2 = b.reshape(bt * n1, 128) + 1.0
        return a2.reshape(bt, n), b2.reshape(bt, n)

    run_kernel_variant("v3reshape", resh)

    # Block-diagonal F2 (digit-column order baked in trace-time).
    from godsp_tpu.fft.four_step import dft_matrix

    f2 = dft_matrix(128)
    bd_r = np.zeros((n, n), np.float32)
    bd_i = np.zeros((n, n), np.float32)
    for k in range(n1):
        bd_r[k * 128 : (k + 1) * 128, k * 128 : (k + 1) * 128] = f2.real
        bd_i[k * 128 : (k + 1) * 128, k * 128 : (k + 1) * 128] = f2.imag
    bd_rj = jnp.asarray(bd_r)
    bd_ij = jnp.asarray(bd_i)

    import functools

    dn = (((1,), (0,)), ((), ()))
    mm = functools.partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=F32,
    )

    # v4: one BD matmul per plane at DEFAULT.
    def bd1(a, b, br, bi):
        return mm(a, br), mm(b, br)

    run_kernel_variant("v4bd1", bd1, tables=(bd_rj, bd_ij),
                       post_scale=1.0 / 256)

    # v5: HIGHEST-equivalent complex product: 3 Karatsuba products x
    # 6 limb matmuls each = 18 BD matmuls (cost shape of the candidate).
    bd_s = bd_r + bd_i
    bd_limbs = {}
    for nm, mat in (("r", bd_r), ("i", bd_i), ("s", bd_s)):
        bd_limbs[nm] = tuple(jnp.asarray(v) for v in pf._limb3_np(mat))
    tabs5 = bd_limbs["r"] + bd_limbs["i"] + bd_limbs["s"]

    def bd_hi(a, b, *tl):
        fr, fi, fs = tl[0:3], tl[3:6], tl[6:9]
        m1 = pf._mm_limbs(pf._limb3(a), fr)
        m2 = pf._mm_limbs(pf._limb3(b), fi)
        m3 = pf._mm_limbs(pf._limb3(a + b), fs)
        return m1 - m2, m3 - m1 - m2

    run_kernel_variant("v5bd_hi", bd_hi, tables=tabs5, post_scale=1.0 / 256)

    # v6: DIF stages + broadcast twiddle + 18 BD limb matmuls — the full
    # candidate cost (tables not mathematically wired; pure cost probe).
    tw = jnp.asarray((rng.normal(size=(1, n))).astype(np.float32))

    def full(a, b, twr, *tl):
        a, b = half3(a, b)
        ar = a * twr - b * twr
        ai = a * twr + b * twr
        return bd_hi(ar, ai, *tl)

    run_kernel_variant("v6full", full, tables=(tw,) + tabs5,
                       post_scale=1.0 / 4096)


if __name__ == "__main__":
    main()
