"""Chip probe: the MXU-FACTORED lane DFT — the last unmeasured branch of
the precision-floor argument (VERDICT r4 next-round #3).

The flagship kernel's lane contraction is a dense 128-point DFT per
slice: (bt, 128) @ G[k1] (128, 128) — 128 MACs/point, Karatsuba x
HIGHEST (18 bf16 limb passes/slice), measured FLOP-bound at ~0.39 ms
nominal for n=1024/b=16384.  The one cheaper-on-paper MXU scheme never
measured: factor 128 = 16 x 8 (Cooley-Tukey inside the lane dim):

  bin k = ka + 16*kb, lane j = 8*j1 + j2:
  X[k] = sum_{j2} W8^{j2 kb} W128^{j2 ka} [ sum_{j1} v[8j1+j2] W16^{j1 ka} ]

  stage 1: (bt,16,8) . W16 (16,16)  rank-3 dot_general, 16 MACs/point
  twiddle: (8,16) VPU complex multiply
  stage 2: (bt,8,16) . W8  (8,8)    rank-3 dot_general,  8 MACs/point

= 24 MACs/point vs the dense 128 (5.3x fewer), same Karatsuba/HIGHEST
limb scheme.  The outer kernel's d<128 utilization data (~3.3
pass-equivalents at d=16) predicts the small-K contractions waste the
MXU and the saving never lands — but that is an inference from a
different kernel; this probe measures it directly against the SAME
gmm floor twin and copy ceiling, one session, with a numerics check
(factored == dense bit-level SNR on chip).

Result goes to BASELINE.md round 5: after this, every scheme cheaper on
paper than the dense HIGHEST contraction has been built and measured.
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
from godsp_tpu.fft.four_step import dft_matrix, twiddle_2d
from godsp_tpu.ops.pallas_fft import LANES
from godsp_tpu.utils.metrics import copy_split_pallas, gmm_floor_pallas

_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST

N = 1024
B = 16384
BT = 256
N1 = N // LANES  # 8 slices
D1, D2 = 16, 8  # 128 = D1 * D2


def _fac_tables():
    """All-constant tables, 1/128 folded into W16 (chains stay bounded
    with zero extra passes, same stance as gmm_floor_pallas)."""
    w16 = dft_matrix(D1) / LANES          # (16, 16), scaled
    w8 = dft_matrix(D2)                   # (8, 8)
    tmid = twiddle_2d(D2, D1)             # (j2, ka): W128^{j2 ka}
    tw = twiddle_2d(N1, LANES)            # per-slice outer twiddle (8, 128)
    c32 = lambda a: np.ascontiguousarray(a, np.float32)
    return {
        "w16r": c32(w16.real), "w16i": c32(w16.imag),
        "w16s": c32(w16.real + w16.imag),
        "w8r": c32(w8.real), "w8i": c32(w8.imag),
        "w8s": c32(w8.real + w8.imag),
        "tmr": c32(tmid.real), "tmi": c32(tmid.imag),
        "twr": c32(tw.real), "twi": c32(tw.imag),
    }


_TAB_ORDER = ("w16r", "w16i", "w16s", "w8r", "w8i", "w8s",
              "tmr", "tmi", "twr", "twi")


def _kern_fac(xr_ref, xi_ref, w16r, w16i, w16s, w8r, w8i, w8s,
              tmr, tmi, twr, twi, yr_ref, yi_ref):
    x = xr_ref[:]
    y = xi_ref[:]
    mm1 = partial(  # contract lhs dim 1 x rhs dim 0 (rank-3 lhs)
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=_F32, precision=_HI,
    )

    def kara(vr, vi, tr, ti, ts):
        m1 = mm1(vr, tr[:])
        m2 = mm1(vi, ti[:])
        m3 = mm1(vr + vi, ts[:])
        return m1 - m2, m3 - m1 - m2

    for k1 in range(N1):
        sl = slice(k1 * LANES, (k1 + 1) * LANES)
        ar, ai = x[:, sl], y[:, sl]
        # per-slice outer twiddle (exact f32 VPU complex multiply)
        tr = twr[k1, :][None, :]
        ti = twi[k1, :][None, :]
        vr = ar * tr - ai * ti
        vi = ar * ti + ai * tr
        # stage 1: contract j1 with W16 -> (bt, j2=8, ka=16)
        v3r = vr.reshape(BT, D1, D2)
        v3i = vi.reshape(BT, D1, D2)
        s1r, s1i = kara(v3r, v3i, w16r, w16i, w16s)  # (bt, 8, 16)
        # mid twiddle W128^{j2 ka} (VPU, broadcast over bt)
        mr = tmr[:][None, :, :]
        mi = tmi[:][None, :, :]
        u_r = s1r * mr - s1i * mi
        u_i = s1r * mi + s1i * mr
        # stage 2: contract j2 with W8 -> (bt, ka=16, kb=8)
        s2r, s2i = kara(u_r, u_i, w8r, w8i, w8s)
        yr_ref[:, sl] = s2r.reshape(BT, LANES)
        yi_ref[:, sl] = s2i.reshape(BT, LANES)


def fac_pallas(xr, xi, interpret=False):
    tabs = _fac_tables()
    tables = [jnp.asarray(tabs[k]) for k in _TAB_ORDER]
    spec = pl.BlockSpec((BT, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in tables
    ]
    return pl.pallas_call(
        _kern_fac,
        grid=(xr.shape[0] // BT,),
        in_specs=[spec, spec] + const_specs,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(xr.shape, xr.dtype),
            jax.ShapeDtypeStruct(xi.shape, xi.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(18 * 2 * xr.shape[0] * N * (D1 + D2)),
            bytes_accessed=int(4 * xr.shape[0] * N * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xr, xi, *tables)


def _perm_to_dense(v):
    """Factored lane order (ka*8 + kb) -> dense G order (ka + 16*kb),
    per slice, on host."""
    b = v.shape[0]
    v4 = v.reshape(b, N1, D1, D2)
    return np.ascontiguousarray(
        np.transpose(v4, (0, 1, 3, 2)).reshape(b, N)
    )


def check_numerics():
    rng = np.random.default_rng(0)
    xr = (rng.normal(size=(BT, N)) * 0.1).astype(np.float32)
    xi = (rng.normal(size=(BT, N)) * 0.1).astype(np.float32)
    jr, ji = jnp.asarray(xr), jnp.asarray(xi)
    fr, fi = fac_pallas(jr, ji)
    gr, gi = gmm_floor_pallas(jr, ji)
    fac = _perm_to_dense(np.asarray(fr)) + 1j * _perm_to_dense(np.asarray(fi))
    dense = np.asarray(gr) + 1j * np.asarray(gi)
    s = snr_db(fac, dense.astype(np.complex128))
    print(f"factored vs dense-G on chip: {s:.1f} dB", flush=True)
    return s


def main():
    print("devices:", jax.devices(), flush=True)
    s = check_numerics()
    assert s > 120.0, "factored form wrong — timing would be meaningless"

    key = jax.random.PRNGKey(0)
    gen = jax.jit(lambda k: jax.random.normal(k, (B, N), _F32) * 0.01)
    xr = gen(key)
    xi = gen(jax.random.PRNGKey(1))
    xr.block_until_ready(); xi.block_until_ready()

    def make_chain(op):
        def make(K):
            @jax.jit
            def chain(r):
                i = xi
                for _ in range(K):
                    r, i = op(r, i)
                    r, i = i, r
                return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])

            return chain

        return make

    specs = {
        "copy": make_chain(lambda r, i: copy_split_pallas(r, i)),
        "gmm": make_chain(lambda r, i: gmm_floor_pallas(r, i)),
        "fac": make_chain(lambda r, i: fac_pallas(r, i)),
    }
    pool = ThreadPoolExecutor(4)
    progs = {
        (nm, K): pool.submit(lambda f=mk(K): f.lower(xr).compile())
        for nm, mk in specs.items()
        for K in (10, 50)
    }
    progs = {k: v.result() for k, v in progs.items()}
    print("compiled", flush=True)
    for nm in specs:
        lo, hi = progs[(nm, 10)], progs[(nm, 50)]
        for f in (lo, hi):
            float(np.asarray(f(xr)))
        reps, tries = [], 0
        while len(reps) < 3 and tries < 6:
            tries += 1
            bl = bh = float("inf")
            for _ in range(8):
                t0 = time.perf_counter()
                float(np.asarray(lo(xr)))
                bl = min(bl, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(np.asarray(hi(xr)))
                bh = min(bh, time.perf_counter() - t0)
            if bh - bl < 1e-4:
                continue
            reps.append((bh - bl) / 40)
        per = sorted(reps)[len(reps) // 2]
        print(f"{nm:5s}: {per*1e3:.3f} ms  reps="
              f"{[f'{r*1e3:.3f}' for r in reps]}", flush=True)


if __name__ == "__main__":
    main()
