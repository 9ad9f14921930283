"""Chip probe: SUBLANE-DIF peel — can a VPU radix-2 butterfly network
across ROWS beat the dense d=128 MXU contraction for the giant plan's
peel levels?

The refuted all-VPU lane-DIF (probe_vdif, r4) died on LANE shuffles.
Rows are SUBLANES: a butterfly pairs row i with row i+h via
pltpu.roll(x, +-h, 0) — no lane movement at all — and runs in EXACT
f32 (no bf16-limb tax: the dense peel pays 18 limb passes/matmul at
HIGHEST, ~6x the paper bf16 rate; measured peel stage 0.59-0.66 ms at
2^24 vs its 0.36 ms copy pass).  7 stages of roll+select+twiddle per
(128, T) block; output rows emerge BIT-REVERSED (k1 = bitrev7(row)),
with the post-twiddle Tb row-permuted to match, so the data equals the
dense peel's up to a row permutation the plan's fold can absorb.

VERDICT (measured 2026-08-20, same session, 3-rep medians, 2^24):
    sdif 1.211 ms | dense MXU peel 0.620 ms | copy pass 0.397 ms
— the sublane-DIF runs at ~2x the dense contraction.  REFUTED.
Numerics are correct (137.1 dB vs the dense peel after the bit-reversal
row map), and the f32-exact butterflies do beat the limb scheme on
precision — but the 7 stages each materialize ~6 full-block values in
VMEM (2 rolls, sums/difs, twiddled branch, select) per plane: ~40+
VMEM value-passes per block vs the matmul form's operands streaming
through the systolic array once per limb pass.  VPU FLOPs were never
the constraint; VMEM value traffic is.  With probe_vdif (lane-DIF,
3.8x), probe_facdft (factored MXU, 25x), probe_int8 (int8 at the bf16
rate) and this, every structural alternative to the dense HIGHEST
contraction — on both axes of the machine — is closed by measurement.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from godsp_tpu.dsputils import snr_db
from godsp_tpu.ops.pallas_outer import outer_dft_split
from godsp_tpu.utils.metrics import copy_split_pallas

_F32 = jnp.float32
N = 1 << 24
D = 128
REST = N // D  # 131072
T = 8192       # lane tile (matches the dense peel's)


def _bitrev(i, bits=7):
    return int(format(i, f"0{bits}b")[::-1], 2)


def _sdif_tables():
    """Per-stage (128, 1) twiddle columns + the bit-reversed-row Tb.

    Stage s (s = 0 first, half h = 64 >> s): a b-position row i twiddles
    by W_m^{i mod h} with m = 2h.  Rows at a-positions get 1 (they take
    the sum branch; the select masks make the value irrelevant, but 1
    keeps the table exact).  Tb_braided[r, t] = W_{D*rest}^{bitrev(r) t}
    factored hi x lo over the lane grid like the dense kernel's."""
    tw_r, tw_i = [], []
    for s in range(7):
        h = 64 >> s
        m = 2 * h
        col = np.ones(D, np.complex128)
        for i in range(D):
            if (i // h) % 2 == 1:
                col[i] = np.exp(-2j * np.pi * (i % h) / m)
        tw_r.append(col.real.astype(np.float32).reshape(D, 1))
        tw_i.append(col.imag.astype(np.float32).reshape(D, 1))
    # post twiddle, rows braided to the bit-reversed output order
    k1 = np.array([_bitrev(r) for r in range(D)], np.float64)
    j = np.arange(REST // T, dtype=np.float64)
    t = np.arange(T, dtype=np.float64)
    n = D * REST
    tb_hi = np.exp(-2j * np.pi * np.outer(k1, j * T) / n)
    tb_lo = np.exp(-2j * np.pi * np.outer(k1, t) / n)
    c32 = lambda a: np.ascontiguousarray(a, np.float32)
    return (
        [c32(v) for v in tw_r], [c32(v) for v in tw_i],
        c32(tb_hi.real), c32(tb_hi.imag), c32(tb_lo.real), c32(tb_lo.imag),
    )


def sdif_peel(xr, xi, interpret=False):
    tw_r, tw_i, tbhr, tbhi, tblr, tbli = _sdif_tables()
    tables = (
        [jnp.asarray(v) for v in tw_r]
        + [jnp.asarray(v) for v in tw_i]
        + [jnp.asarray(v) for v in (tbhr, tbhi, tblr, tbli)]
    )

    def kern(*refs):
        xr_ref, xi_ref, *rest = refs
        tws = rest[:7]
        twis = rest[7:14]
        tbh_r, tbh_i, tbl_r, tbl_i = rest[14:18]
        yr_ref, yi_ref = rest[18:]
        _sdif_kernel(xr_ref, xi_ref, tws, twis, tbh_r, tbh_i,
                     tbl_r, tbl_i, yr_ref, yi_ref)

    spec = pl.BlockSpec((1, D, T), lambda b, j: (b, 0, j),
                        memory_space=pltpu.VMEM)
    tbl_specs = [
        pl.BlockSpec(t.shape, lambda b, j, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in tables
    ]
    x3r = xr.reshape(1, D, REST)
    x3i = xi.reshape(1, D, REST)
    yr, yi = pl.pallas_call(
        kern,
        grid=(1, REST // T),
        in_specs=[spec, spec] + tbl_specs,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, D, REST), _F32),
            jax.ShapeDtypeStruct((1, D, REST), _F32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x3r, x3i, *tables)
    return yr.reshape(N), yi.reshape(N)


# twiddle columns applied per STAGE: list-of-refs plumbing keeps each
# (128, 1) constant whole; received here as tuples.
def _sdif_kernel(xr_ref, xi_ref, tws, twis, tbhr, tbhi, tblr, tbli,
                 yr_ref, yi_ref):
    j = pl.program_id(1)

    def col(ref):
        v = ref[:]
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, v.shape[1]), 1) == j
        ).astype(_F32)
        return jnp.sum(v * sel, axis=1, keepdims=True)

    xr = xr_ref[:].reshape(D, T)
    xi = xi_ref[:].reshape(D, T)
    iota = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
    for s in range(7):
        h = 64 >> s
        a_pos = ((iota // h) % 2 == 0)
        up_r = pltpu.roll(xr, D - h, 0)
        up_i = pltpu.roll(xi, D - h, 0)
        dn_r = pltpu.roll(xr, h, 0)
        dn_i = pltpu.roll(xi, h, 0)
        sum_r = xr + up_r
        sum_i = xi + up_i
        dif_r = dn_r - xr
        dif_i = dn_i - xi
        wr = tws[s][:]
        wi = twis[s][:]
        vb_r = dif_r * wr - dif_i * wi
        vb_i = dif_r * wi + dif_i * wr
        xr = jnp.where(a_pos, sum_r, vb_r)
        xi = jnp.where(a_pos, sum_i, vb_i)
    bh_r, bh_i = col(tbhr), col(tbhi)
    tr = bh_r * tblr[:] - bh_i * tbli[:]
    ti = bh_r * tbli[:] + bh_i * tblr[:]
    yr_ref[0] = xr * tr - xi * ti
    yi_ref[0] = xr * ti + xi * tr


def dense_peel(xr, xi):
    yr, yi = outer_dft_split(
        xr.reshape(1, D, REST), xi.reshape(1, D, REST), D, 1
    )
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

    # numerics: sdif rows (bit-reversed) vs dense peel rows, small slice
    fs = jax.jit(lambda a, b: sdif_peel(a, b))
    fd = jax.jit(lambda a, b: dense_peel(a, b))
    sr, si_ = fs(xr, xi)
    dr, di = fd(xr, xi)
    perm = np.array([_bitrev(r) for r in range(D)])
    s2 = np.asarray(sr).reshape(D, REST) + 1j * np.asarray(si_).reshape(D, REST)
    d2 = np.asarray(dr).reshape(D, REST) + 1j * np.asarray(di).reshape(D, REST)
    # sdif row r holds dense row bitrev(r)
    s_nat = s2[np.argsort(perm)] if False else s2[np.array(
        [int(np.where(perm == k)[0][0]) for k in range(D)])]
    print(f"sdif vs dense peel: {snr_db(s_nat[:, :4096], d2[:, :4096].astype(np.complex128)):.1f} dB",
          flush=True)

    def chain(op):
        def make(K):
            @jax.jit
            def go(ar, ai):
                for k in range(K):
                    ar, ai = op(ar * (1.0 + 1e-6 * k), ai)
                return jnp.abs(ar.reshape(-1)[0]) + jnp.abs(ai.reshape(-1)[0])

            return go

        return make

    specs = {
        "sdif": chain(lambda a, b: sdif_peel(a, b)),
        "dense": chain(lambda a, b: dense_peel(a, b)),
        "copy": chain(st_copy),
    }
    pool = ThreadPoolExecutor(6)
    progs = {(nm, K): pool.submit(lambda f=mk(K): f.lower(xr, xi).compile())
             for nm, mk in specs.items() for K in (4, 16)}
    progs = {k: v.result() for k, v in progs.items()}
    print("compiled", flush=True)
    for nm in specs:
        lo, hi = progs[(nm, 4)], progs[(nm, 16)]
        for f in (lo, hi):
            float(np.asarray(f(xr, xi)))
        reps, tries = [], 0
        while len(reps) < 3 and tries < 6:
            tries += 1
            bl = bh = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(np.asarray(lo(xr, xi)))
                bl = min(bl, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(np.asarray(hi(xr, xi)))
                bh = min(bh, time.perf_counter() - t0)
            if bh - bl < 1e-4:
                continue
            reps.append((bh - bl) / 12)
        per = sorted(reps)[len(reps) // 2]
        print(f"{nm:6s}: {per*1e3:.3f} ms  reps="
              f"{[f'{r*1e3:.3f}' for r in reps]}", flush=True)


if __name__ == "__main__":
    main()
