"""Chip A/B for the round-4 three-level giant-N plan (fft/large.py).

Measures per-transform wall (chain differential, bench-style) + exact
multi-tone SNR at 2^20 / 2^24 / 2^28.  Compare: r03 two-level plan
measured 2^24 = 4.1 ms, 2^28 = 75 ms (judge rerun 57-81 GB/s one-pass).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from godsp_tpu import fft


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
        phis.append(
            (jnp.asarray(phi_hi.astype(np.float32)),
             jnp.asarray(phi_lo.astype(np.float32)))
        )

    @jax.jit
    def build(ps):
        zr = jnp.zeros((hi_len, lo_len), jnp.float32)
        zi = jnp.zeros((hi_len, lo_len), jnp.float32)
        for (f, a, ph), (phi, plo) in zip(tones, ps):
            ah = 2.0 * np.pi * phi
            al = 2.0 * np.pi * plo
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

    sig, err = (float(v) for v in tone_err(z))
    return z, 10.0 * np.log10(sig / max(err, 1e-300))


def measure(z, log2n, k_hi):
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

    t0 = time.perf_counter()
    lo, hi = make(2), make(k_hi)
    lo_c = lo.lower(z).compile()
    hi_c = hi.lower(z).compile()
    print(f"  compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    for f in (lo_c, hi_c):
        float(np.asarray(f(z)))
    reps = []
    for _ in range(3):
        bl = bh = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(lo_c(z)))
            bl = min(bl, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(hi_c(z)))
            bh = min(bh, time.perf_counter() - t0)
        reps.append(max((bh - bl) / (k_hi - 2), 1e-9))
    per = sorted(reps)[1]
    print(f"  2^{log2n}: {per*1e3:.3f} ms/transform  reps="
          f"{[f'{r*1e3:.3f}' for r in reps]}  "
          f"one-pass {2*N*8/per/1e9:.0f} GB/s", flush=True)
    return per


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for log2n, k_hi in [(20, 16), (24, 8), (28, 4)]:
        z, snr = build_tones(log2n)
        print(f"2^{log2n}: tone snr = {snr:.1f} dB", flush=True)
        measure(z, log2n, k_hi)
        del z
