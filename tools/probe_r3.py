#!/usr/bin/env python
"""Round-3 perf probes (VERDICT r2 items 3 and 4).

Probes, each timed with the heavy-depth chain differential
(utils.metrics.time_chain_diff) and co-measured against the session's
copy ceiling so clock-mode drift cancels:

  1. batch_tile sweep at n=4096 and n=8192 on the lane-slice kernel
     (is the default tile leaving grid-step overhead on the table?);
  2. n=16384 with the lane-slice structure enabled at n1=128
     (vs the batched-3D default);
  3. the in-kernel complex interleave/deinterleave idea for the public
     fft() path is probed separately (tools/probe_c64.py).

Usage: python tools/probe_r3.py [section ...]  (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    sections = set(sys.argv[1:]) or {
        "bt4096", "bt8192", "ls16384", "anatomy1024", "conv_c64"
    }

    import jax
    import jax.numpy as jnp

    from godsp_tpu._dtypes import put
    from godsp_tpu.ops import pallas_fft as pf
    from godsp_tpu.utils.metrics import copy_split_pallas, time_chain_diff

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")

    def bench_fft(n, batch, bt, k_lo=10, k_hi=26, iters=8):
        rng = np.random.default_rng(0)
        xr = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
        xi = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
        s = np.float32(1.0 / (float(n) * float(n)))

        def make(K):
            @jax.jit
            def chain(r):
                i = xi
                for k in range(K):
                    r, i = pf.fft_pow2_split(r, i, order="digit", batch_tile=bt)
                    r, i = i, r
                    if k % 4 == 3:
                        r, i = r * s, i * s
                return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])

            return chain

        per = time_chain_diff(make, xr, k_lo=k_lo, k_hi=k_hi, iters=iters)
        return per, 4 * batch * n * 4 / per / 1e9

    def bench_copy(n, batch, bt=None):
        bt = bt or min(256, (1 << 25) // (32 * n))  # 64 MB VMEM cap
        rng = np.random.default_rng(1)
        xr = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
        xi = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))

        def make(K):
            @jax.jit
            def chain(r):
                i = xi
                for _ in range(K):
                    r, i = copy_split_pallas(r, i, batch_tile=bt)
                    r, i = i, r
                return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])

            return chain

        per = time_chain_diff(make, xr, k_lo=10, k_hi=26, iters=8)
        return per, 4 * batch * n * 4 / per / 1e9

    if "anatomy1024" in sections:
        # Decompose the flagship kernel's cost: DMA floor (pure copy),
        # DMA+VPU (step-1 network only), DMA+MXU (G matmuls only),
        # DEFAULT-precision full kernel (MXU/6), full kernel, and
        # batch-tile / store-pattern variants.
        import jax.numpy as jnp_
        from functools import partial
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n, batch, n1 = 1024, 16384, 8

        # Persistent copy-reference chains (compiled ONCE, re-timed before
        # every variant): the chip clock is bimodal across minutes, so each
        # variant is reported as a ratio to an adjacent copy measurement.
        _ref = {}

        def copy_ref():
            if "make" not in _ref:
                rng = np.random.default_rng(9)
                _ref["xr"] = put(
                    (rng.normal(size=(batch, n)) * 0.01).astype(np.float32)
                )
                xi_r = put(
                    (rng.normal(size=(batch, n)) * 0.01).astype(np.float32)
                )

                def cmake(K):
                    @jax.jit
                    def chain(r):
                        i = xi_r
                        for _ in range(K):
                            r, i = copy_split_pallas(r, i, batch_tile=256)
                            r, i = i, r
                        return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])

                    return chain

                _ref["lo"], _ref["hi"] = cmake(10), cmake(26)
                for f in (_ref["lo"], _ref["hi"]):
                    float(np.asarray(f(_ref["xr"])))
            best_lo = best_hi = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                float(np.asarray(_ref["lo"](_ref["xr"])))
                best_lo = min(best_lo, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(np.asarray(_ref["hi"](_ref["xr"])))
                best_hi = min(best_hi, time.perf_counter() - t0)
            return max((best_hi - best_lo) / 16, 1e-9)

        def run_variant(name, kern_body, bt=256, tables=(), k_lo=10, k_hi=26,
                        semantics="arbitrary"):
            rng = np.random.default_rng(0)
            xr = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
            xi = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
            spec = pl.BlockSpec(
                (bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            cspecs = [
                pl.BlockSpec(
                    t.shape, lambda i, nd=t.ndim: (0,) * nd,
                    memory_space=pltpu.VMEM,
                )
                for t in tables
            ]

            def call(r, i):
                return pl.pallas_call(
                    kern_body,
                    grid=(batch // bt,),
                    in_specs=[spec, spec] + cspecs,
                    out_specs=(spec, spec),
                    out_shape=(
                        jax.ShapeDtypeStruct((batch, n), jnp_.float32),
                        jax.ShapeDtypeStruct((batch, n), jnp_.float32),
                    ),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=96 << 20,
                        dimension_semantics=(semantics,),
                    ),
                )(r, i, *tables)

            s = np.float32(1.0 / (float(n) * float(n)))

            def make(K):
                @jax.jit
                def chain(r):
                    i = xi
                    for k in range(K):
                        r, i = call(r, i)
                        r, i = i, r
                        if k % 4 == 3:
                            r, i = r * s, i * s
                    return jnp_.abs(r[0, 0]) + jnp_.abs(i[0, 0])

                return chain

            try:
                t0 = time.perf_counter()
                cper = copy_ref()
                per = time_chain_diff(make, xr, k_lo=k_lo, k_hi=k_hi, iters=8)
                gbs = 4 * batch * n * 4 / per / 1e9
                log(
                    f"[anat] {name} bt={bt}: {per*1e3:.3f} ms {gbs:.0f} GB/s "
                    f"(copy_ref {cper*1e3:.3f} ms, ratio {per/cper:.2f}) "
                    f"[{time.perf_counter()-t0:.0f}s]"
                )
                return per
            except Exception as e:
                log(f"[anat] {name} bt={bt} FAILED: {type(e).__name__}: "
                    f"{str(e)[:200]}")
                return None

        LANES = pf.LANES
        tabs = pf._ls_tables(n, False, False)
        TAB = [jnp_.asarray(tabs[k]) for k in pf._LS_ORDER]

        def k_copy(xr_ref, xi_ref, yr_ref, yi_ref):
            yr_ref[:] = xr_ref[:]
            yi_ref[:] = xi_ref[:]

        def k_copy_sliced(xr_ref, xi_ref, yr_ref, yi_ref):
            xr, xi = xr_ref[:], xi_ref[:]
            for k in range(n1):
                sl = slice(k * LANES, (k + 1) * LANES)
                yr_ref[:, sl] = xr[:, sl]
                yi_ref[:, sl] = xi[:, sl]

        def k_step1_only(xr_ref, xi_ref, yr_ref, yi_ref):
            xr, xi = xr_ref[:], xi_ref[:]
            pairs = [
                (xr[:, k * LANES:(k + 1) * LANES],
                 xi[:, k * LANES:(k + 1) * LANES])
                for k in range(n1)
            ]
            A = pf._dft_slices(pairs, False)
            for k1 in range(n1):
                yr_ref[:, k1 * LANES:(k1 + 1) * LANES] = A[k1][0]
                yi_ref[:, k1 * LANES:(k1 + 1) * LANES] = A[k1][1]

        def k_gmm_only(xr_ref, xi_ref, *rest):
            *tabs_, yr_ref, yi_ref = rest
            xr, xi = xr_ref[:], xi_ref[:]
            for k1 in range(n1):
                sl = slice(k1 * LANES, (k1 + 1) * LANES)
                cr, ci = pf._karatsuba_g(xr[:, sl], xi[:, sl], k1, tabs_)
                yr_ref[:, sl] = cr
                yi_ref[:, sl] = ci

        def k_full(xr_ref, xi_ref, *rest):
            pf._fft_kernel_ls(
                xr_ref, xi_ref, *rest, n1=n1, inverse=False,
                real_input=False, natural_out=False,
            )

        def k_full_concat(xr_ref, xi_ref, *rest):
            *tabs_, yr_ref, yi_ref = rest
            xr, xi = xr_ref[:], xi_ref[:]
            pairs = [
                (xr[:, k * LANES:(k + 1) * LANES],
                 xi[:, k * LANES:(k + 1) * LANES])
                for k in range(n1)
            ]
            A = pf._dft_slices(pairs, False)
            C = [pf._karatsuba_g(A[k][0], A[k][1], k, tabs_)
                 for k in range(n1)]
            yr_ref[:] = jnp_.concatenate([c[0] for c in C], axis=1)
            yi_ref[:] = jnp_.concatenate([c[1] for c in C], axis=1)

        def k_gmm_default(xr_ref, xi_ref, *rest):
            # DEFAULT-precision (1-pass) G matmuls: 6x fewer MXU passes.
            # If this matches k_gmm_only, the MXU is NOT the bound.
            *tabs_, yr_ref, yi_ref = rest
            gr, gi, gs = tabs_
            from functools import partial as _part
            dn = (((1,), (0,)), ((), ()))
            mm = _part(
                jax.lax.dot_general, dimension_numbers=dn,
                preferred_element_type=jnp_.float32,
            )
            xr, xi = xr_ref[:], xi_ref[:]
            for k1 in range(n1):
                sl = slice(k1 * LANES, (k1 + 1) * LANES)
                m1 = mm(xr[:, sl], gr[k1])
                m2 = mm(xi[:, sl], gi[k1])
                m3 = mm(xr[:, sl] + xi[:, sl], gs[k1])
                yr_ref[:, sl] = m1 - m2
                yi_ref[:, sl] = m3 - m1 - m2

        def make_subtiled(n_sub):
            # Split the block's rows into n_sub chunks; run network +
            # matmuls per chunk.  If VPU (network) and MXU (G matmuls)
            # serialize within a step — in-order issue: ALL butterflies,
            # then all matmuls — chunking lets the hardware overlap
            # net(chunk j+1) on the VPU with mm(chunk j) on the MXU:
            # expected ~(step1/n_sub + gmm) instead of (step1 + gmm).
            def k_sub(xr_ref, xi_ref, *rest):
                *tabs_, yr_ref, yi_ref = rest
                bt = xr_ref.shape[0]
                cs = bt // n_sub
                xr, xi = xr_ref[:], xi_ref[:]
                for j in range(n_sub):
                    rows = slice(j * cs, (j + 1) * cs)
                    pairs = [
                        (xr[rows, k * LANES:(k + 1) * LANES],
                         xi[rows, k * LANES:(k + 1) * LANES])
                        for k in range(n1)
                    ]
                    A = pf._dft_slices(pairs, False)
                    for k1 in range(n1):
                        cr, ci = pf._karatsuba_g(A[k1][0], A[k1][1], k1, tabs_)
                        yr_ref[rows, k1 * LANES:(k1 + 1) * LANES] = cr
                        yi_ref[rows, k1 * LANES:(k1 + 1) * LANES] = ci

            return k_sub

        run_variant("copy whole->whole", k_copy)
        run_variant("copy whole->sliced", k_copy_sliced)
        run_variant("step1 network only", k_step1_only)
        run_variant("G matmuls only (HIGHEST)", k_gmm_only, tables=TAB)
        run_variant("G matmuls only (DEFAULT)", k_gmm_default, tables=TAB)
        run_variant("full kernel (= prod)", k_full, tables=TAB)
        run_variant("full kernel PARALLEL sem", k_full, tables=TAB,
                    semantics="parallel")
        run_variant("full kernel concat-store", k_full_concat, tables=TAB)
        run_variant("subtiled x2", make_subtiled(2), tables=TAB)
        run_variant("subtiled x4", make_subtiled(4), tables=TAB)
        run_variant("subtiled x8", make_subtiled(8), tables=TAB)
        run_variant("full kernel bt=512", k_full, bt=512, tables=TAB)
        run_variant("full kernel bt=1024", k_full, bt=1024, tables=TAB)

    if "conv_c64" in sections:
        # What do the c64 <-> split-plane conversion passes cost, and is
        # the bitcast view free?  (public fft() floor decomposition)
        import jax.numpy as jnp_

        n, batch = 1024, 16384
        rng = np.random.default_rng(3)
        xc = put(
            (rng.normal(size=(batch, n)) + 1j * rng.normal(size=(batch, n)))
            .astype(np.complex64) * 0.01
        )

        def make_conv(K):
            @jax.jit
            def chain(z):
                for _ in range(K):
                    # extract + recombine with a twist so it can't fold away
                    r, i = jnp_.real(z), jnp_.imag(z)
                    z = jax.lax.complex(i, r)
                return jnp_.abs(jnp_.real(z[0, 0])) + jnp_.abs(jnp_.imag(z[0, 0]))

            return chain

        per = time_chain_diff(make_conv, xc, k_lo=10, k_hi=26, iters=8)
        log(f"[c64] extract+recombine roundtrip: {per*1e3:.3f} ms "
            f"({2*batch*n*8/per/1e9:.0f} GB/s as one r+w pass)")

        def make_bitcast(K):
            @jax.jit
            def chain(z):
                acc = 0.0
                for k in range(K):
                    v = jax.lax.bitcast_convert_type(z, jnp_.float32)
                    v = v.reshape(batch, 2 * n)
                    acc = acc + v[0, 0] * (1.0 + 1e-9 * k)
                return acc

            return chain

        try:
            per_b = time_chain_diff(make_bitcast, xc, k_lo=10, k_hi=26, iters=8)
            log(f"[c64] bitcast view + reshape: {per_b*1e3:.4f} ms/app "
                f"(free if ~0)")
        except Exception as e:
            log(f"[c64] bitcast probe FAILED: {type(e).__name__}: {str(e)[:200]}")

        # Planes-native natural-order kernel (the fft_split hot path).
        xr = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
        xi = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
        s = np.float32(1.0 / (float(n) * float(n)))

        def make_nat(K):
            @jax.jit
            def chain(r):
                i = xi
                for k in range(K):
                    r, i = pf.fft_pow2_split(r, i, order="natural")
                    r, i = i, r
                    if k % 4 == 3:
                        r, i = r * s, i * s
                return jnp_.abs(r[0, 0]) + jnp_.abs(i[0, 0])

            return chain

        per_n = time_chain_diff(make_nat, xr, k_lo=10, k_hi=26, iters=8)
        log(f"[c64] planes natural-fused kernel: {per_n*1e3:.3f} ms "
            f"({4*batch*n*4/per_n/1e9:.0f} GB/s, "
            f"{4*batch*n*4/per_n/1e9/819:.3f} roofline)")

    if "large24" in sections:
        # Decompose fft_large_split at N=2^24 (balanced split 4096x4096):
        # the two step-1 swapaxes, the kernel passes, the twiddle multiply,
        # and the combined final transpose — which passes dominate the
        # measured 4.6 ms (58 GB/s)?
        import jax.numpy as jnp_

        from godsp_tpu.fft import large as lg

        N = 1 << 24
        n1, n2 = lg._split(N)
        log(f"[large24] split {n1} x {n2}")
        rng = np.random.default_rng(5)
        xr = put((rng.normal(size=(n1, n2)) * 0.01).astype(np.float32))
        xi = put((rng.normal(size=(n1, n2)) * 0.01).astype(np.float32))

        def timeit(name, f, k_lo=2, k_hi=8, iters=5):
            def make(K):
                @jax.jit
                def chain(r):
                    i = xi
                    for k in range(K):
                        r, i = f(r, i)
                        r, i = i, r
                    return jnp_.abs(r.reshape(-1)[0]) + jnp_.abs(i.reshape(-1)[0])

                return chain

            try:
                t0 = time.perf_counter()
                per = time_chain_diff(make, xr, k_lo=k_lo, k_hi=k_hi, iters=iters)
                gbs = 2 * N * 4 * 2 / per / 1e9  # r+w both planes
                log(f"[large24] {name}: {per*1e3:.3f} ms ({gbs:.0f} GB/s r+w) "
                    f"[{time.perf_counter()-t0:.0f}s]")
                return per
            except Exception as e:
                log(f"[large24] {name} FAILED: {type(e).__name__}: {str(e)[:160]}")
                return None

        timeit("swapaxes pair", lambda r, i: (
            jnp_.swapaxes(r, 0, 1), jnp_.swapaxes(i, 0, 1)))

        def kern_rows(r, i):
            return pf.fft_pow2_split(r, i, order="digit")

        timeit("kernel rows (digit)", kern_rows)

        f1p, tw = lg._tables(N, False)
        assert tw[0] == "fac"
        _, (thr, thi), (tlr, tli) = tw
        s = tlr.shape[1]
        thr_j = jnp_.asarray(thr, jnp_.float32)[:, :, None]
        thi_j = jnp_.asarray(thi, jnp_.float32)[:, :, None]
        tlr_j = jnp_.asarray(tlr, jnp_.float32)[:, None, :]
        tli_j = jnp_.asarray(tli, jnp_.float32)[:, None, :]

        def twid(r, i):
            twr = thr_j * tlr_j - thi_j * tli_j
            twi = thr_j * tli_j + thi_j * tlr_j
            a4r = r.reshape(n1, n2 // s, s)
            a4i = i.reshape(n1, n2 // s, s)
            return (
                (a4r * twr - a4i * twi).reshape(n1, n2),
                (a4r * twi + a4i * twr).reshape(n1, n2),
            )

        timeit("factored twiddle mult", twid)

        m = n2 // 128
        perm = (2, 1, 0)

        def final_tr(r, i):
            rr = jnp_.transpose(r.reshape(n1, m, 128), perm).reshape(n1, n2)
            ii = jnp_.transpose(i.reshape(n1, m, 128), perm).reshape(n1, n2)
            return rr, ii

        timeit("combined final transpose", final_tr)

        def full(r, i):
            return lg.fft_large_split(r.reshape(-1), i.reshape(-1))

        def full_wrap(r, i):
            a, b = full(r, i)
            return a.reshape(n1, n2), b.reshape(n1, n2)

        timeit("full fft_large_split", full_wrap)

    if "bt4096" in sections:
        n, batch = 4096, 4096
        cper, cgbs = bench_copy(n, batch)
        log(f"[4096] copy ceiling: {cper*1e3:.3f} ms {cgbs:.0f} GB/s")
        for bt in (64, 128, 256):
            try:
                t0 = time.perf_counter()
                per, gbs = bench_fft(n, batch, bt)
                log(
                    f"[4096] bt={bt}: {per*1e3:.3f} ms {gbs:.0f} GB/s "
                    f"({gbs/819:.3f} roofline, {cper/per:.3f} of ceiling) "
                    f"[{time.perf_counter()-t0:.0f}s incl compile]"
                )
            except Exception as e:
                log(f"[4096] bt={bt} FAILED: {e}")

    if "bt8192" in sections:
        n, batch = 8192, 2048
        cper, cgbs = bench_copy(n, batch)
        log(f"[8192] copy ceiling: {cper*1e3:.3f} ms {cgbs:.0f} GB/s")
        for bt in (32, 64, 128):
            try:
                per, gbs = bench_fft(n, batch, bt)
                log(
                    f"[8192] bt={bt}: {per*1e3:.3f} ms {gbs:.0f} GB/s "
                    f"({gbs/819:.3f} roofline, {cper/per:.3f} of ceiling)"
                )
            except Exception as e:
                log(f"[8192] bt={bt} FAILED: {e}")

    if "ls16384" in sections:
        n, batch = 16384, 1024
        cper, cgbs = bench_copy(n, batch)
        log(f"[16384] copy ceiling: {cper*1e3:.3f} ms {cgbs:.0f} GB/s")
        # Current default: batched-3D (n1=128 > _LS_MAX_N1).
        try:
            per, gbs = bench_fft(n, batch, None if False else 32)
            log(
                f"[16384] batched-3D bt=32: {per*1e3:.3f} ms {gbs:.0f} GB/s "
                f"({gbs/819:.3f} roofline, {cper/per:.3f} of ceiling)"
            )
        except Exception as e:
            log(f"[16384] batched-3D FAILED: {e}")
        # Lane-slice at n1=128 (statically unrolled 7-stage network).
        saved = pf._LS_MAX_N1
        pf._LS_MAX_N1 = 128
        try:
            for bt in (16, 32):
                try:
                    t0 = time.perf_counter()
                    # Parity gate first (cheap rows).
                    rng = np.random.default_rng(2)
                    xs = (rng.normal(size=(32, n)) * 0.1).astype(np.float32)
                    ys = (rng.normal(size=(32, n)) * 0.1).astype(np.float32)
                    r, i = pf.fft_pow2_split(
                        put(xs), put(ys), order="digit", batch_tile=bt
                    )
                    from godsp_tpu.dsputils import snr_db
                    from godsp_tpu.utils.host import to_host

                    got = np.asarray(to_host(r), np.float64) + 1j * np.asarray(
                        to_host(i), np.float64
                    )
                    F = np.fft.fft(xs.astype(np.float64) + 1j * ys)
                    n1 = n // 128
                    want = np.ascontiguousarray(
                        F.reshape(32, 128, n1).swapaxes(-1, -2).reshape(32, n)
                    )
                    s = float(snr_db(got, want))
                    per, gbs = bench_fft(n, batch, bt)
                    log(
                        f"[16384] lane-slice bt={bt}: {per*1e3:.3f} ms "
                        f"{gbs:.0f} GB/s ({gbs/819:.3f} roofline, "
                        f"{cper/per:.3f} of ceiling) snr={s:.1f} dB "
                        f"[{time.perf_counter()-t0:.0f}s incl compile]"
                    )
                except Exception as e:
                    log(f"[16384] lane-slice bt={bt} FAILED: {e}")
        finally:
            pf._LS_MAX_N1 = saved


if __name__ == "__main__":
    main()
