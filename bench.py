#!/usr/bin/env python
"""Benchmark harness — batched FFT roofline + Pwelch throughput.

Runs on whatever jax.devices() provides (the real TPU chip under axon).
Prints ONE summary JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}
vs_baseline is achieved/target against the BASELINE.json north star
(>=80% of HBM-bandwidth roofline for the batched 1k-point FFT).
Diagnostics go to stderr.

Round-3 contract (VERDICT r2 items 2, 5, 8):
  * every timed section reports wall_s = MEDIAN of its recorded
    wall_s_reps (consistent aggregation across sections and rounds);
  * the flagship FFT co-measures the session's practical copy ceiling
    (utils.metrics.copy_split_pallas — identical traffic, zero compute)
    adjacent to each rep, recording copy_ceiling_gbs and
    fraction_of_copy_ceiling so the "structure-bound at the copy floor"
    claim is checkable from this artifact alone;
  * sections carry snr_db vs float64 host oracles next to their timings;
  * streaming reports BOTH the tunnel-bound h2d number and an on-device
    compute-bound number (pre-staged chunk through the driver's real
    per-chunk program, parallel/streaming._chunk_accumulate);
  * giant-N rows (2^24, 2^28) carry parity via an exact closed-form
    multi-tone oracle evaluated on device.

Timing notes (see utils.metrics): on tunneled TPU transports
block_until_ready is unreliable, so each measurement is a jitted
data-dependent chain of K applications ending in a scalar readback,
timed at TWO chain depths — the difference cancels dispatch/RTT fixed
costs exactly (time_chain_diff).  Complex operands are placed via
_dtypes.put (split-plane transfer).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def med(xs):
    """Median of recorded reps (the uniform aggregation for this bench)."""
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _probe_devices(timeout_s: float = 180.0):
    """jax.devices() in a daemon thread with a timeout: a severed axon
    tunnel makes backend init hang forever, and a hung bench records
    NOTHING — better to emit an error-marked summary line and exit."""
    import threading

    holder = {}

    def worker():
        try:
            import jax

            holder["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 - report any backend failure
            holder["error"] = repr(e)

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        return None, f"jax.devices() unresponsive after {timeout_s:.0f}s"
    if "error" in holder:
        return None, holder["error"]
    return holder["devices"], None


def _digit_np(F: np.ndarray, n1: int) -> np.ndarray:
    """Natural-order spectrum rows -> the kernel's digit order
    (bin k1 + n1*k2 stored at position k1*128 + k2)."""
    b, n = F.shape
    return np.ascontiguousarray(
        F.reshape(b, n // n1, n1).swapaxes(-1, -2).reshape(b, n)
    )


def _pwelch_np(x64: np.ndarray, fs: float, nfft: int, noverlap: int,
               wname="hann") -> np.ndarray:
    """Reference-semantics Pwelch in float64 numpy (pwelch.go:74-145):
    integer-overlap segmentation, window applied at the pad length,
    one-sided with interior-bin doubling, sum(w_nfft^2)*fs norm."""
    from godsp_tpu import window as win

    stride = nfft - noverlap
    L = len(x64)
    nsegs = (L - nfft) // stride + 1
    pad = nfft
    w = win.window_table_np(wname, pad)
    lp = pad // 2 + 1
    idx = np.arange(nsegs)[:, None] * stride + np.arange(nfft)[None, :]
    X = np.fft.rfft(x64[idx] * w, n=pad, axis=-1)
    p = X.real**2 + X.imag**2
    p[:, 1 : lp - 1] *= 2.0
    acc = p.sum(axis=0) / nsegs
    wn = win.window_table_np(wname, nfft)
    return acc / (float(np.sum(wn * wn)) * fs)


def main() -> None:
    devices, dev_err = _probe_devices()
    if devices is None:
        log(f"DEVICE BACKEND UNAVAILABLE: {dev_err}")
        print(json.dumps({
            "metric": "pallas_fft1024_precise_roofline",
            "value": 0.0,
            "unit": "fraction_of_roofline",
            "vs_baseline": 0.0,
            "detail": {"error": f"device backend unavailable: {dev_err}"},
        }), flush=True)
        return

    import jax

    from godsp_tpu import fft, spectral
    from godsp_tpu._dtypes import put
    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.parallel import MeshConfig, make_mesh, stream_pwelch
    from godsp_tpu.utils.host import to_host
    from godsp_tpu.utils.metrics import (
        copy_split_pallas,
        fft_bytes,
        fft_flops,
        hbm_bandwidth_gbs,
        measure_rtt,
        time_chained,
    )

    dev = jax.devices()[0]
    peak = hbm_bandwidth_gbs(dev)
    rtt = measure_rtt()
    log(f"device: {dev.device_kind}, peak HBM {peak} GB/s, readback RTT {rtt*1e3:.1f} ms")

    results = {}
    rng = np.random.default_rng(0)

    # --- Pallas fused-FFT kernel roofline (the headline metric) --------
    # Chained kernel applications with small inputs keep magnitudes
    # bounded; alternation of the planes breaks CSE without extra passes.
    import jax.numpy as jnp

    from godsp_tpu.ops.pallas_fft import fft_pow2_split

    from godsp_tpu.utils.metrics import time_chain_diff

    def bench_pallas(n, batch, k_lo=10, k_hi=26):
        xr = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
        xi = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))

        # Rescale every 4th application (1/n^2 undoes four sqrt(n) RMS
        # growths) so the extra VPU pass dilutes to 1/4 per measured app.
        s = np.float32(1.0 / (float(n) * float(n)))

        def make(K):
            @jax.jit
            def chain(r):
                i = xi
                for k in range(K):
                    r, i = fft_pow2_split(r, i, order="digit")
                    r, i = i, r
                    if k % 4 == 3:
                        r, i = r * s, i * s
                return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])

            return chain

        # Heavy depth: shallow chains are flattered by tunnel-RTT noise.
        per = time_chain_diff(make, xr, k_lo=k_lo, k_hi=k_hi, iters=8)
        gbs = 4 * batch * n * 4 / per / 1e9
        return per, gbs, make, xr

    def kernel_snr(n, rows=64):
        """Digit-order kernel output vs float64 numpy oracle."""
        xs = (rng.normal(size=(rows, n)) * 0.1).astype(np.float32)
        ys = (rng.normal(size=(rows, n)) * 0.1).astype(np.float32)
        r, i = fft_pow2_split(put(xs), put(ys), order="digit")
        got = np.asarray(to_host(r), np.float64) + 1j * np.asarray(
            to_host(i), np.float64
        )
        want = _digit_np(
            np.fft.fft(xs.astype(np.float64) + 1j * ys.astype(np.float64)),
            n // 128,
        )
        return float(snr_db(got, want))

    # The chip clock is BIMODAL across minutes-long windows (the same
    # program measured 0.36 and 0.54 ms in one session), so the flagship
    # takes reps SPACED ACROSS the whole bench run; each rep co-measures
    # the copy ceiling immediately after it, so the per-rep
    # fft-vs-copy-ceiling ratio cancels the clock mode.
    flagship_reps = []
    copy_reps = []
    _flagship = {}
    _copy = {}

    def bench_copy(n=1024, batch=16384):
        if "make" not in _copy:
            _copy["xr"] = put(
                (rng.normal(size=(batch, n)) * 0.01).astype(np.float32)
            )
            _copy["xi"] = put(
                (rng.normal(size=(batch, n)) * 0.01).astype(np.float32)
            )

            def make(K):
                @jax.jit
                def chain(r):
                    i = _copy["xi"]
                    for _ in range(K):
                        r, i = copy_split_pallas(r, i)
                        r, i = i, r
                    return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])

                return chain

            _copy["make"] = make
        return time_chain_diff(
            _copy["make"], _copy["xr"], k_lo=10, k_hi=26, iters=8
        )

    def _update_flagship():
        n, batch = 1024, 16384
        per = med(flagship_reps)
        gbs = 4 * batch * n * 4 / per / 1e9
        copy_per = med(copy_reps)
        copy_gbs = 4 * batch * n * 4 / copy_per / 1e9
        ratios = [c / f for f, c in zip(flagship_reps, copy_reps)]
        results["pallas_fft1024_precise"] = {
            "wall_s": per,
            "wall_s_reps": list(flagship_reps),
            "wall_s_best": min(flagship_reps),
            "gbs": gbs,
            "roofline_fraction": gbs / peak if peak else None,
            "copy_ceiling_wall_s_reps": list(copy_reps),
            "copy_ceiling_gbs": copy_gbs,
            "fraction_of_copy_ceiling": med(ratios),
            "fraction_of_copy_ceiling_reps": ratios,
            "snr_db": _flagship.get("snr"),
        }

    def flagship_rep():
        try:
            per = time_chain_diff(
                _flagship["make"], _flagship["x"], k_lo=10, k_hi=26, iters=8
            )
            per_copy = bench_copy()
        except Exception as e:  # pragma: no cover
            log("flagship rep failed:", e)
            return
        flagship_reps.append(per)
        copy_reps.append(per_copy)
        _update_flagship()
        log(
            f"  flagship rep: {per*1e3:.3f} ms, copy {per_copy*1e3:.3f} ms "
            f"(ratio {per_copy/per:.3f})"
        )

    try:
        per, gbs, mk, xr0 = bench_pallas(1024, 16384)
        flagship_reps.append(per)
        copy_reps.append(bench_copy())
        _flagship.update(make=mk, x=xr0, snr=kernel_snr(1024))
        _update_flagship()
        d = results["pallas_fft1024_precise"]
        log(
            f"pallas fft n=1024 b=16384: {per*1e3:.3f} ms {gbs:.0f} GB/s "
            f"roofline={d['roofline_fraction']:.3f} "
            f"copy_ceiling={d['copy_ceiling_gbs']:.0f} GB/s "
            f"of_ceiling={d['fraction_of_copy_ceiling']:.3f} "
            f"snr={d['snr_db']:.1f} dB"
        )
    except Exception as e:  # pragma: no cover
        log("flagship 1024 section failed:", e)

    for n, batch in ((4096, 4096), (16384, 1024)):
        try:
            per, gbs, _, _ = bench_pallas(n, batch)
            frac = gbs / peak if peak else None
            s = kernel_snr(n, rows=32)
            results[f"pallas_fft{n}_precise"] = {
                "wall_s": per,
                "wall_s_reps": [per],
                "gbs": gbs,
                "roofline_fraction": frac,
                "snr_db": s,
            }
            log(
                f"pallas fft n={n} batch={batch}: {per*1e3:.3f} ms  "
                f"{gbs:.0f} GB/s  roofline={frac and f'{frac:.3f}'}  "
                f"snr={s:.1f} dB"
            )
        except Exception as e:  # pragma: no cover
            log(f"pallas fft {n} section failed:", e)

    # --- public fft() API on c64 (kernel + complex<->plane conversions) --
    try:
        n, batch = 1024, 16384
        xh = (
            rng.normal(size=(batch, n)) + 1j * rng.normal(size=(batch, n))
        ).astype(np.complex64)
        x = put(xh)
        reps = []
        for _ in range(3):
            r = time_chained(
                fft.fft,
                x,
                chain=12,
                name=f"fft{n}",
                flops=fft_flops(n, batch),
                bytes_moved=fft_bytes(n, batch, 8),
            )
            reps.append(r.wall_s)
        per = med(reps)
        gbs = fft_bytes(n, batch, 8) / per / 1e9
        frac = gbs / peak if peak else None
        got = to_host(fft.fft(x[:32]))
        pub_snr = float(snr_db(got, np.fft.fft(xh[:32].astype(np.complex128))))
        results[f"public_fft{n}"] = {
            "wall_s": per,
            "wall_s_reps": reps,
            "gflops": fft_flops(n, batch) / per / 1e9,
            "gbs": gbs,
            "roofline_fraction": frac,
            "snr_db": pub_snr,
        }
        log(
            f"public fft() n={n} batch={batch}: {per*1e3:.3f} ms  "
            f"{gbs:.0f} GB/s  roofline={frac and f'{frac:.3f}'}  "
            f"snr={pub_snr:.1f} dB"
        )
    except Exception as e:  # pragma: no cover
        log("public fft section failed:", e)

    # --- XLA built-in FFT for comparison --------------------------------
    try:
        n, batch = 1024, 16384
        x = put(
            (rng.normal(size=(batch, n)) + 1j * rng.normal(size=(batch, n))).astype(
                np.complex64
            )
        )
        r = time_chained(
            jnp.fft.fft, x, chain=8, name="jnpfft",
            bytes_moved=fft_bytes(n, batch, 8),
        )
        log(f"jnp.fft.fft n={n}: {r.wall_s*1e3:.3f} ms  {r.gbs:.0f} GB/s")
        results["jnp_fft1024"] = {"wall_s": r.wall_s, "gbs": r.gbs}
    except Exception as e:  # pragma: no cover
        log("jnp.fft comparison failed:", e)

    # --- large-N FFT (guarded: a failure here must not lose
    # the summary JSON; see commit 7655643's contract) --------
    try:
        # --- large-N FFT: the reference's benchmark workload (a single
        # 2^20-point complex FFT, fft/fft_test.go:262-280) through the
        # kernel four-step (fft/large.py), vs XLA's built-in FFT. ---------
        n20 = 1 << 20
        z20h = (
            (rng.normal(size=n20) + 1j * rng.normal(size=n20)).astype(np.complex64)
            * 0.01
        )
        z20 = put(z20h)
        s20 = np.float32(1.0 / n20)

        def mk_large(f):
            def make(K):
                @jax.jit
                def chain(z):
                    for k in range(K):
                        z = f(z)
                        if k % 2 == 1:
                            z = z * s20
                    zf = z.reshape(-1)
                    return jnp.abs(jnp.real(zf[0])) + jnp.abs(jnp.imag(zf[0]))

                return chain

            return make

        reps20 = [
            time_chain_diff(mk_large(fft.fft), z20, k_lo=16, k_hi=64, iters=8)
            for _ in range(2)
        ]
        per = med(reps20)
        snr20 = float(snr_db(
            to_host(fft.fft(z20)), np.fft.fft(z20h.astype(np.complex128))
        ))
        results["fft_2pow20"] = {
            "wall_s": per, "wall_s_reps": reps20, "snr_db": snr20
        }
        log(f"fft 2^20 single: {per*1e3:.3f} ms  snr={snr20:.1f} dB")
        try:
            # Shallower chain: a 64-deep jnp.fft.fft program is too large for
            # the remote compile service.  Median-of-2 on both sides.
            reps_jnp = [
                time_chain_diff(mk_large(jnp.fft.fft), z20, k_lo=8, k_hi=24, iters=6)
                for _ in range(2)
            ]
            per_jnp = med(reps_jnp)
            results["fft_2pow20"]["jnp_wall_s"] = per_jnp
            results["fft_2pow20"]["speedup_vs_jnp"] = per_jnp / per
            log(f"  vs jnp.fft.fft: {per_jnp*1e3:.3f} ms ({per_jnp/per:.2f}x)")
        except Exception as e:  # pragma: no cover
            log("jnp 2^20 comparison failed:", e)
    except Exception as e:  # pragma: no cover
        log("large-N 2^20 section failed:", e)

    # --- giant-N FFT: 2^24 and 2^28 through the two-level kernel
    # four-step (fft/large.py:55-62).  Parity via an EXACT closed-form
    # multi-tone oracle (X[k] = N*a_j*e^{2 pi i ph_j} at integer tone
    # bins, 0 elsewhere), built and checked on device — no giant host
    # transfers and no giant host FFT (VERDICT r2 item 9).
    for log2n in (24, 28):
        try:
            N = 1 << log2n
            tones = [(3, 0.5, 0.1), (12345, 0.25, -0.3),
                     ((N >> 1) + 7, 0.125, 0.7)]
            # Exact phases from host-f64 index splits: n = a*2^14 + b, so
            # frac(f*n/N) = frac(frac(f*a*2^14/N) + frac(f*b/N)); each
            # factor is exact in f64 and small enough for f32 trig args.
            hi_len, lo_len = N >> 14, 1 << 14
            amps, phs = [t[1] for t in tones], [t[2] for t in tones]
            phi_his, phi_los = [], []
            for f, a, ph in tones:
                phi_hi = np.mod(
                    np.arange(hi_len, dtype=np.float64)
                    * float((f * lo_len) % N) / N,
                    1.0,
                )
                phi_lo = np.mod(
                    np.arange(lo_len, dtype=np.float64) * f / N + ph, 1.0
                )
                phi_his.append(jnp.asarray(phi_hi.astype(np.float32)))
                phi_los.append(jnp.asarray(phi_lo.astype(np.float32)))

            @jax.jit
            def build_tones(phis_hi, phis_lo):
                zr = jnp.zeros((hi_len, lo_len), jnp.float32)
                zi = jnp.zeros((hi_len, lo_len), jnp.float32)
                for a, ph, plo in zip(amps, phis_hi, phis_lo):
                    arg = 2.0 * np.pi * (ph[:, None] + plo[None, :])
                    zr = zr + np.float32(a) * jnp.cos(arg)
                    zi = zi + np.float32(a) * jnp.sin(arg)
                return (zr + 1j * zi).reshape(N)

            z = build_tones(phi_his, phi_los)
            z.block_until_ready()

            @jax.jit
            def tone_err(zf):
                X = fft.fft(zf)
                tot = jnp.sum(jnp.real(X) ** 2 + jnp.imag(X) ** 2)
                sig = 0.0
                err_at = 0.0
                for (f, a, ph) in tones:
                    want = N * a * jnp.exp(2j * np.pi * ph)
                    got = X[f]
                    sig = sig + jnp.abs(want) ** 2
                    err_at = err_at + jnp.abs(got - want) ** 2
                    tot = tot - jnp.real(got) ** 2 - jnp.imag(got) ** 2
                return sig, tot + err_at

            sig_e, err_e = (float(v) for v in tone_err(z))
            snr_big = float(10.0 * np.log10(sig_e / max(err_e, 1e-300)))

            sN = np.float32(1.0 / N)

            def make_big(K):
                @jax.jit
                def chain(zz):
                    for k in range(K):
                        zz = fft.fft(zz)
                        if k % 2 == 1:
                            zz = zz * sN
                    return jnp.abs(jnp.real(zz[0])) + jnp.abs(jnp.imag(zz[0]))

                return chain

            k_hi = 12 if log2n <= 24 else 6
            per = time_chain_diff(make_big, z, k_lo=2, k_hi=k_hi, iters=4)
            results[f"fft_2pow{log2n}"] = {
                "wall_s": per,
                "wall_s_reps": [per],
                "gbs": 2 * N * 8 / per / 1e9,
                "snr_db": snr_big,
            }
            log(
                f"fft 2^{log2n} single: {per*1e3:.3f} ms  "
                f"{2*N*8/per/1e9:.0f} GB/s  snr={snr_big:.1f} dB (multi-tone)"
            )
        except Exception as e:  # pragma: no cover
            log(f"giant-N 2^{log2n} section failed:", e)

    # --- fused Pallas Pwelch kernel (frame->window->FFT->|.|^2->sum) -----
    from godsp_tpu import window as win
    from godsp_tpu.ops.pallas_pwelch import pwelch_power_sum

    for nfft, stride in ((1024, 512), (256, 256)):
      try:
        segs = (1 << 23) // stride
        L = (segs - 1) * stride + nfft
        sig = put(rng.normal(size=L).astype(np.float32))
        w = jnp.asarray(win.window_table_np("hann", nfft), jnp.float32)

        def make(K, nfft=nfft, stride=stride, segs=segs, w=w):
            @jax.jit
            def chain(xx):
                acc = 0.0
                for k in range(K):
                    acc = acc + pwelch_power_sum(
                        xx * (1.0 + 1e-6 * k), w, nfft, stride, segs
                    )[0]
                return acc

            return chain

        per = time_chain_diff(make, sig, k_lo=6, k_hi=22, iters=8)
        msps = L / per / 1e6
        # Parity on a smaller slice through the PUBLIC path vs the f64
        # numpy reference-semantics oracle.
        noverlap = nfft - stride
        Ls = stride * 2048 + nfft
        xs = rng.normal(size=Ls).astype(np.float32)
        p_dev, _ = spectral.pwelch(
            jnp.asarray(xs), 2.0,
            spectral.PwelchOptions(nfft=nfft, noverlap=noverlap),
        )
        p_ref = _pwelch_np(xs.astype(np.float64), 2.0, nfft, noverlap)
        s = float(snr_db(np.asarray(p_dev), p_ref))
        results[f"pallas_pwelch{nfft}_s{stride}"] = {
            "wall_s": per,
            "wall_s_reps": [per],
            "msamples_per_s": msps,
            "snr_db": s,
        }
        log(
            f"pallas pwelch nfft={nfft} stride={stride}: {per*1e3:.3f} ms  "
            f"{msps:.0f} Msamples/s on-device  snr={s:.1f} dB"
        )
      except Exception as e:  # pragma: no cover
        log("pwelch kernel section failed:", e)

    flagship_rep()  # spaced clock-window sample

    # --- fused mel front end (frame->window->FFT->|.|^2->filterbank) ----
    from godsp_tpu.models import mel_spectrogram
    from godsp_tpu.models.mel import _filterbank_np

    nfft, hop = 1024, 512
    L = hop * 4096 + nfft
    sigh = rng.normal(size=L).astype(np.float32)
    sig = put(sigh)

    def make_mel(K):
        @jax.jit
        def chain(z):
            acc = 0.0
            for k in range(K):
                acc = acc + mel_spectrogram(
                    z * (1.0 + 1e-6 * k), 44100.0, nfft=nfft, hop=hop, n_mels=80
                )[0, 0]
            return acc

        return chain

    try:
        per = time_chain_diff(make_mel, sig, k_lo=4, k_hi=12, iters=8)
        # f64 host oracle on a slice: frames -> hann -> rfft -> power -> fb.
        Lm = hop * 255 + nfft
        xm = sigh[:Lm].astype(np.float64)
        nfr = (Lm - nfft) // hop + 1
        idx = np.arange(nfr)[:, None] * hop + np.arange(nfft)[None, :]
        wm = win.window_table_np("hann", nfft)
        Xm = np.fft.rfft(xm[idx] * wm, axis=-1)
        pm = Xm.real**2 + Xm.imag**2
        fbm = _filterbank_np(80, nfft, 44100.0, 0.0, 22050.0, None)
        mel_ref = pm @ fbm.T
        mel_got = np.asarray(
            mel_spectrogram(
                jnp.asarray(sigh[:Lm]), 44100.0, nfft=nfft, hop=hop, n_mels=80
            )
        )
        s = float(snr_db(mel_got, mel_ref))
        results["mel_frontend_1024"] = {
            "wall_s": per,
            "wall_s_reps": [per],
            "msamples_per_s": L / per / 1e6,
            "snr_db": s,
        }
        log(
            f"fused mel front end: {per*1e3:.3f} ms  "
            f"{L/per/1e6:.0f} Msamples/s  snr={s:.1f} dB"
        )
    except Exception as e:  # pragma: no cover
        log("mel section failed:", e)

    # --- fused ISTFT (IFFT + window + matmul overlap-add in VMEM) -------
    try:
        import godsp_tpu.models._stft_impl as mstft

        nfft_i, hop_i, F_i = 1024, 512, 4096
        L_i = (F_i - 1) * hop_i + nfft_i
        xwh = rng.normal(size=L_i).astype(np.float32)
        xw = put(xwh)
        w_i = mstft._resolve_window("hann", nfft_i, jnp.float32)
        spec_i = mstft.stft(xw, nfft_i, hop=hop_i, window="hann")
        spec_i.block_until_ready()
        out_len = (F_i - 1) * hop_i + nfft_i

        def make_istft(K, fused=True):
            @jax.jit
            def chain(s):
                acc = 0.0
                for k in range(K):
                    acc = acc + mstft._istft_jit(
                        s * (1.0 + 1e-6 * k), w_i, nfft_i, hop_i, out_len,
                        True, nfft_i, fused=fused,
                    )[0]
                return acc

            return chain

        # Heavy depths per the repo's timing discipline (CLAUDE.md:
        # shallow chains are flattered by tunnel-RTT jitter).
        per_f = time_chain_diff(
            lambda K: make_istft(K, True), spec_i, k_lo=8, k_hi=24, iters=6
        )
        per_x = time_chain_diff(
            lambda K: make_istft(K, False), spec_i, k_lo=8, k_hi=24, iters=4
        )
        # Round-trip parity: istft(stft(x)) interior == x (COLA at 50%).
        y_rt = np.asarray(
            mstft.istft(spec_i, nfft_i, hop=hop_i, window="hann")
        )
        snr_rt = float(snr_db(
            y_rt[nfft_i:-nfft_i], xwh[nfft_i : len(y_rt) - nfft_i]
        ))
        results["istft_fused_1024"] = {
            "wall_s": per_f,
            "wall_s_reps": [per_f],
            "msamples_per_s": out_len / per_f / 1e6,
            "xla_wall_s": per_x,
            "speedup_vs_xla": per_x / per_f,
            "snr_db": snr_rt,
        }
        log(
            f"fused istft 1024/512: {per_f*1e3:.3f} ms "
            f"({out_len/per_f/1e6:.0f} Msamples/s), XLA path {per_x*1e3:.3f} ms "
            f"-> {per_x/per_f:.2f}x  roundtrip snr={snr_rt:.1f} dB"
        )
    except Exception as e:  # pragma: no cover
        log("istft section failed:", e)

    # --- fused-halo sharded Pwelch (RDMA inside the kernel) -------------
    # Single chip = a 1-device "sp" ring (self-send): validates and times
    # the compiled remote-DMA kernel; multi-chip overlap needs a pod.
    try:
        from jax.sharding import Mesh

        from godsp_tpu.parallel import pwelch_sharded

        opts_fh = spectral.PwelchOptions(nfft=1024, noverlap=512)
        Lfh = 512 * 4096
        sig_fh_h = rng.normal(size=Lfh).astype(np.float32)
        sig_fh = put(sig_fh_h)
        mesh1 = Mesh(np.array(jax.devices()[:1]), ("sp",))

        def make_fh(K):
            @jax.jit
            def chain(z):
                acc = 0.0
                for k in range(K):
                    p, _ = pwelch_sharded(
                        z * (1.0 + 1e-6 * k), 2.0, opts_fh, mesh=mesh1,
                        halo_impl=("fused", False),
                    )
                    acc = acc + p[0]
                return acc

            return chain

        per = time_chain_diff(make_fh, sig_fh, k_lo=6, k_hi=18, iters=6)
        p_fh, _ = pwelch_sharded(
            sig_fh, 2.0, opts_fh, mesh=mesh1, halo_impl=("fused", False)
        )
        snr_fh = float(snr_db(
            np.asarray(p_fh),
            _pwelch_np(sig_fh_h.astype(np.float64), 2.0, 1024, 512),
        ))
        results["pwelch_fused_halo"] = {
            "wall_s": per,
            "wall_s_reps": [per],
            "msamples_per_s": Lfh / per / 1e6,
            "snr_db": snr_fh,
        }
        log(
            f"fused-halo sharded pwelch (1-dev ring): {per*1e3:.3f} ms  "
            f"{Lfh/per/1e6:.0f} Msamples/s on-device  snr={snr_fh:.1f} dB"
        )
    except Exception as e:  # pragma: no cover
        log("fused-halo bench failed:", e)

    # --- Pwelch streaming: ON-DEVICE compute-bound rate ------------------
    # The h2d number below is transport-bound (tunnel); this one times the
    # driver's REAL per-chunk program (parallel/streaming._chunk_accumulate:
    # halo slice -> sharded partial step -> Neumaier accumulate) on a
    # pre-staged device chunk — the rate a production host with local
    # PCIe/DMA ingest would see (VERDICT r2 item 5).
    try:
        from godsp_tpu.parallel.streaming import _chunk_accumulate

        mesh1d = make_mesh(MeshConfig(dp=1, sp=1), jax.devices()[:1])
        stride_sd, segs_sd = 512, 4096
        chunk_len = segs_sd * stride_sd
        halo_sd, lp_sd = 512, 513
        w_pad_sd = jnp.asarray(win.window_table_np("hann", 1024), jnp.float32)
        ext_sd = put(rng.normal(size=chunk_len + halo_sd).astype(np.float32))
        z_sd = jnp.zeros((1, lp_sd), jnp.float32)

        def make_stream(K):
            @jax.jit
            def chain(ext):
                s, c = z_sd, z_sd
                for k in range(K):
                    s, c = _chunk_accumulate(
                        ext * (1.0 + 1e-6 * k), w_pad_sd, s, c,
                        jnp.int32(segs_sd),
                        mesh1d, 1024, 1024, stride_sd, segs_sd, lp_sd,
                        ("ppermute", False), 1, chunk_len,
                    )
                return s[0, 0] + c[0, 0]

            return chain

        reps_sd = [
            time_chain_diff(make_stream, ext_sd, k_lo=6, k_hi=18, iters=6)
            for _ in range(2)
        ]
        per = med(reps_sd)
        results["pwelch_stream_ondevice"] = {
            "wall_s": per,
            "wall_s_reps": reps_sd,
            "msamples_per_s": chunk_len / per / 1e6,
        }
        log(
            f"pwelch streaming (on-device chunk program): {per*1e3:.3f} ms/chunk  "
            f"{chunk_len/per/1e6:.0f} Msamples/s"
        )
    except Exception as e:  # pragma: no cover
        log("on-device streaming section failed:", e)

    # --- Pwelch streaming throughput incl. host->device transfer --------
    fs = 44100.0
    opts = spectral.PwelchOptions(nfft=1024, noverlap=512)
    total = 1 << 24  # ~16.8 M samples
    sig = rng.normal(size=total).astype(np.float32)
    mesh = make_mesh(MeshConfig(dp=1, sp=1), jax.devices()[:1])
    try:
        stream_pwelch([sig[: 1 << 22]], fs, opts, mesh, segs_per_chunk_shard=4096)  # warm
        # The tunnel's host->device bandwidth is bimodal across
        # minutes-long windows (~30 MB/s to ~1.6 GB/s); median of three
        # runs with all reps recorded (each run is seconds).
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            pxx, freqs = stream_pwelch(
                (sig[i : i + (1 << 22)] for i in range(0, total, 1 << 22)),
                fs,
                opts,
                mesh,
                segs_per_chunk_shard=4096,
            )
            walls.append(time.perf_counter() - t0)
        wall = med(walls)
        msps = total / wall / 1e6
        results["pwelch_stream"] = {
            "wall_s": wall, "wall_s_reps": walls, "msamples_per_s": msps
        }
        log(
            f"pwelch streaming (h2d-bound): {msps:.1f} Msamples/s "
            f"(reps {'/'.join(f'{w:.2f}s' for w in walls)} for {total} samples)"
        )
    except Exception as e:  # pragma: no cover
        log("streaming section failed:", e)

    flagship_rep()  # final clock-window sample

    # --- summary line ----------------------------------------------------
    fl = results.get("pallas_fft1024_precise", {})
    frac1k = fl.get("roofline_fraction") or 0.0
    of_ceiling = fl.get("fraction_of_copy_ceiling") or 0.0
    summary = {
        "metric": "pallas_fft1024_precise_roofline_fraction",
        "value": round(frac1k, 4),
        "unit": "fraction_of_hbm_roofline",
        "vs_baseline": round(frac1k / 0.80, 4),
        "detail": dict(
            results,
            north_star={
                "target": ("fraction>=0.80 of nominal 819 GB/s OR >=0.90 "
                           "of the co-measured copy ceiling"),
                "roofline_fraction_median": round(frac1k, 4),
                "fraction_of_copy_ceiling_median": round(of_ceiling, 4),
                "met": bool(frac1k >= 0.80 or of_ceiling >= 0.90),
            },
        ),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
