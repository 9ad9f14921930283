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

VERDICT (measured 2026-08-20, one session, 3-rep medians):
    copy ceiling 0.309 ms | dense gmm floor 0.433 ms | FACTORED 10.769 ms
— the factored form is 25x the dense floor (numerics 136.6 dB, correct).
REFUTED.  Two compounding causes, both intrinsic: (a) the MXU consumes a
full K=128 systolic pass regardless of contraction depth, so K=16/K=8
stages cost ~2 dense passes of time for 24/128 of the useful MACs (the
outer kernel's d=16 ~3.3 pass-equivalents figure, confirmed here in the
flagship's own context); (b) the lane-factored layout needs 64-lane
(stage 1) and 8..16-lane (stage 2) operands, inflating VMEM/HBM tiles
2-16x (the direct (bt,16,8) form doesn't compile at all — Mosaic
"unsupported shape cast" on any lane-split reshape).  With this, every
cheaper-on-paper scheme has been built and measured: balanced-int8
(runs at the bf16 rate — probe_int8), all-VPU lane-DIF (3.8x —
probe_vdif), factored MXU lane-DFT (25x — this probe).  The dense
HIGHEST contraction at the gmm floor is the measured optimum on this
toolchain.
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
    """All-constant tables in LAYOUT A (see _kern_fac), 1/128 folded into
    W16 (chains stay bounded with zero extra passes, same stance as
    gmm_floor_pallas)."""
    w16 = dft_matrix(D1) / LANES          # (16, 16), scaled
    w8 = dft_matrix(D2)                   # (8, 8)
    tmid = twiddle_2d(D2, D1)             # (j2, ka): W128^{j2 ka}
    tw = twiddle_2d(N1, LANES)            # per-slice outer twiddle (8, 128)
    # layout A: dim-1 = j1 (16 sublanes), dim-2 = s*8 + j2 (64 lanes)
    twA = tw.reshape(N1, D1, D2).transpose(1, 0, 2).reshape(D1, N1 * D2)
    tmA = np.tile(tmid, (N1, 1))          # (64, 16): row s*8+j2 -> tmid[j2]
    c32 = lambda a: np.ascontiguousarray(a, np.float32)
    return {
        "w16r": c32(w16.real), "w16i": c32(w16.imag),
        "w16s": c32(w16.real + w16.imag),
        "w8r": c32(w8.real), "w8i": c32(w8.imag),
        "w8s": c32(w8.real + w8.imag),
        "tmr": c32(tmA.real), "tmi": c32(tmA.imag),
        "twr": c32(twA.real), "twi": c32(twA.imag),
    }


_TAB_ORDER = ("w16r", "w16i", "w16s", "w8r", "w8i", "w8s",
              "tmr", "tmi", "twr", "twi")


def _kern_fac(xr_ref, xi_ref, w16r, w16i, w16s, w8r, w8i, w8s,
              tmr, tmi, twr, twi, yr_ref, yi_ref):
    """Factored lane DFT in LAYOUT A — the only Mosaic-compilable form.

    The direct form ((bt, 128) slices reshaped to (bt, 16, 8) in-kernel)
    is REJECTED by Mosaic: "infer-vector-layout: unsupported shape cast"
    on the lane-split reshape.  Layout A keeps every step legal:
    operands arrive as (bt, 16, 64) with j1 in SUBLANES and (slice, j2)
    in LANES, stage 1 is ONE rank-3 dot_general over all slices
    (contract j1, K=16), the mid twiddle is an elementwise (64, 16)
    broadcast, and stage 2 slices 8 sublane-groups (contract j2, K=8)
    and concatenates along lanes.  No shape casts.  The price the
    scheme pays in this form — 64-lane operands (2x HBM/VMEM tile
    inflation) and K=16/K=8 contractions (the outer kernel measured
    d=16 at ~3.3 pass-equivalents) — is intrinsic to factoring the
    lane dim on this hardware, not probe overhead.
    """
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

    # outer twiddle (exact f32 VPU complex multiply), all slices at once
    tr = twr[:][None, :, :]
    ti = twi[:][None, :, :]
    vr = x * tr - y * ti
    vi = x * ti + y * tr
    # stage 1: contract j1 (dim 1, K=16) -> (bt, 64, 16) = (bt, s*8+j2, ka)
    s1r, s1i = kara(vr, vi, w16r, w16i, w16s)
    # mid twiddle W128^{j2 ka}: (64, 16) constant, broadcast over bt
    mr = tmr[:][None, :, :]
    mi = tmi[:][None, :, :]
    u_r = s1r * mr - s1i * mi
    u_i = s1r * mi + s1i * mr
    # stage 2 per slice: contract j2 (K=8) -> (bt, 16, 8) = (bt, ka, kb);
    # collect along lanes -> (bt, 16, 64) with dim-2 = s*8 + kb
    pr, pi = [], []
    for s in range(N1):
        sl = slice(s * D2, (s + 1) * D2)
        s2r, s2i = kara(u_r[:, sl, :], u_i[:, sl, :], w8r, w8i, w8s)
        pr.append(s2r)
        pi.append(s2i)
    yr_ref[:] = jnp.concatenate(pr, axis=2)
    yi_ref[:] = jnp.concatenate(pi, axis=2)


def to_layout_a(v):
    """(B, N) planes -> LAYOUT A (B, 16, 64): col s*128 + j1*8 + j2 goes
    to [j1, s*8 + j2] (host/XLA-side, outside the kernel)."""
    B_ = v.shape[0]
    v4 = v.reshape(B_, N1, D1, D2)
    mod = np if isinstance(v, np.ndarray) else jnp
    return mod.transpose(v4, (0, 2, 1, 3)).reshape(B_, D1, N1 * D2)


def fac_pallas(xr3, xi3, interpret=False):
    """xr3/xi3: (B, 16, 64) LAYOUT A planes -> same-shape outputs with
    [b, ka, s*8 + kb] holding slice-s bin ka + 16*kb (dense-G lane k2)."""
    tabs = _fac_tables()
    tables = [jnp.asarray(tabs[k]) for k in _TAB_ORDER]
    spec = pl.BlockSpec((BT, D1, N1 * D2), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in tables
    ]
    return pl.pallas_call(
        _kern_fac,
        grid=(xr3.shape[0] // BT,),
        in_specs=[spec, spec] + const_specs,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(xr3.shape, xr3.dtype),
            jax.ShapeDtypeStruct(xi3.shape, xi3.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(18 * 2 * xr3.shape[0] * N * (D1 + D2)),
            bytes_accessed=int(4 * xr3.shape[0] * N * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xr3, xi3, *tables)


def _a_to_dense(v):
    """LAYOUT A output (B, 16, 64) [b, ka, s*8+kb] -> dense G order
    (B, N) [b, s*128 + ka + 16*kb], on host."""
    B_ = v.shape[0]
    v4 = v.reshape(B_, D1, N1, D2)           # (b, ka, s, kb)
    return np.ascontiguousarray(
        np.transpose(v4, (0, 2, 3, 1)).reshape(B_, N)
    )


def check_numerics():
    rng = np.random.default_rng(0)
    xr = (rng.normal(size=(BT, N)) * 0.1).astype(np.float32)
    xi = (rng.normal(size=(BT, N)) * 0.1).astype(np.float32)
    jr3 = jnp.asarray(to_layout_a(xr))
    ji3 = jnp.asarray(to_layout_a(xi))
    fr, fi = fac_pallas(jr3, ji3)
    gr, gi = gmm_floor_pallas(jnp.asarray(xr), jnp.asarray(xi))
    fac = _a_to_dense(np.asarray(fr)) + 1j * _a_to_dense(np.asarray(fi))
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
    gen3 = jax.jit(
        lambda k: jax.random.normal(k, (B, D1, N1 * D2), _F32) * 0.01
    )
    xr = gen(key)
    xi = gen(jax.random.PRNGKey(1))
    xr3 = gen3(jax.random.PRNGKey(2))
    xi3 = gen3(jax.random.PRNGKey(3))
    for v in (xr, xi, xr3, xi3):
        v.block_until_ready()

    def make_chain(op, other):
        def make(K):
            @jax.jit
            def chain(r):
                i = other
                for _ in range(K):
                    r, i = op(r, i)
                    r, i = i, r
                return jnp.abs(r.reshape(-1)[0]) + jnp.abs(i.reshape(-1)[0])

            return chain

        return make

    specs = {
        "copy": (make_chain(lambda r, i: copy_split_pallas(r, i), xi), xr),
        "gmm": (make_chain(lambda r, i: gmm_floor_pallas(r, i), xi), xr),
        "fac": (make_chain(lambda r, i: fac_pallas(r, i), xi3), xr3),
    }
    pool = ThreadPoolExecutor(4)
    progs = {
        (nm, K): pool.submit(lambda f=mk(K), x=x: f.lower(x).compile())
        for nm, (mk, x) in specs.items()
        for K in (10, 50)
    }
    progs = {k: v.result() for k, v in progs.items()}
    print("compiled", flush=True)
    for nm, (_mk, x) in specs.items():
        lo, hi = progs[(nm, 10)], progs[(nm, 50)]
        for f in (lo, hi):
            float(np.asarray(f(x)))
        reps, tries = [], 0
        while len(reps) < 3 and tries < 6:
            tries += 1
            bl = bh = float("inf")
            for _ in range(8):
                t0 = time.perf_counter()
                float(np.asarray(lo(x)))
                bl = min(bl, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(np.asarray(hi(x)))
                bh = min(bh, time.perf_counter() - t0)
            if bh - bl < 1e-4:
                continue
            reps.append((bh - bl) / 40)
        per = sorted(reps)[len(reps) // 2]
        print(f"{nm:5s}: {per*1e3:.3f} ms  reps="
              f"{[f'{r*1e3:.3f}' for r in reps]}", flush=True)


if __name__ == "__main__":
    main()
