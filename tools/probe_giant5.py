"""Chip A/B at 2^28: recursive two-call fused outer plan vs the einsum
levels (fft/large.py rows > _MAX_ROWS branch).  Also records 2^27.
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from godsp_tpu import fft
from godsp_tpu.fft import large as lg


def build_tones(log2n):
    N = 1 << log2n
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
        return (zr + 1j * zi).reshape(N)

    z = build(phis)
    z.block_until_ready()

    @jax.jit
    def tone_err(zf):
        X = fft.fft(zf)
        sig = err = 0.0
        for (f, a, ph) in tones:
            want = N * a * jnp.exp(2j * np.pi * ph)
            sig = sig + jnp.abs(want) ** 2
            err = err + jnp.abs(X[f] - want) ** 2
            X = X.at[f].set(0.0)
        return sig, err + jnp.sum(jnp.real(X) ** 2 + jnp.imag(X) ** 2)

    return z, tone_err


def chains(z, log2n, k_hi):
    N = 1 << log2n
    sN = np.float32(1.0 / N)

    def make(K):
        @jax.jit
        def chain(zz):
            for k in range(K):
                zz = fft.fft(zz)
                if k % 2 == 1:
                    zz = zz * sN
            return jnp.abs(jnp.real(zz[0])) + jnp.abs(jnp.imag(zz[0]))
        return chain

    return make(2).lower(z), make(k_hi).lower(z)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    pool = ThreadPoolExecutor(4)
    for log2n, k_hi in [(28, 4)]:
        z, tone_err = build_tones(log2n)
        lowered = {}
        for kern in (True, False):
            lg.set_outer_kernel_enabled(kern)
            lowered[kern] = chains(z, log2n, k_hi)
        lg.set_outer_kernel_enabled(True)
        t0 = time.perf_counter()
        progs = {
            k: (pool.submit(v[0].compile), pool.submit(v[1].compile))
            for k, v in lowered.items()
        }
        progs = {k: (a.result(), b.result()) for k, (a, b) in progs.items()}
        print(f"2^{log2n}: compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        for k, (lo, hi) in progs.items():
            float(np.asarray(lo(z)))
            float(np.asarray(hi(z)))
        for kern in (True, False):
            lo, hi = progs[kern]
            reps = []
            for _ in range(3):
                bl = bh = float("inf")
                for _ in range(4):
                    t0 = time.perf_counter()
                    float(np.asarray(lo(z)))
                    bl = min(bl, time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    float(np.asarray(hi(z)))
                    bh = min(bh, time.perf_counter() - t0)
                reps.append(max((bh - bl) / (k_hi - 2), 1e-9))
            per = sorted(reps)[1]
            print(f"  2^{log2n} kern={kern}: {per*1e3:.3f} ms  "
                  f"reps={[f'{r*1e3:.3f}' for r in reps]}", flush=True)
        sig, err = (float(v) for v in tone_err(z))
        print(f"  2^{log2n} kern tone snr: "
              f"{10*np.log10(sig/max(err,1e-300)):.1f} dB", flush=True)
        del z
