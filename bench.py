#!/usr/bin/env python
"""Benchmark harness — batched FFT roofline + Pwelch throughput.

Runs on whatever jax.devices() provides (the real TPU chip under axon).
Prints ONE summary JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}
vs_baseline is achieved/target against the BASELINE.json north star
(>=80% of HBM-bandwidth roofline for the batched 1k-point FFT).
Diagnostics go to stderr.

Timing notes (see utils.metrics): on tunneled TPU transports
block_until_ready is unreliable, so each measurement is a jitted
data-dependent chain of K applications ending in a scalar readback,
timed at TWO chain depths — the difference cancels dispatch/RTT fixed
costs exactly (time_chain_diff).  Complex operands are placed via
_dtypes.put (split-plane transfer).  The streaming number is dominated
by host->device transfer over the tunnel, not device compute (see the
pallas_pwelch on-device rates for the kernel itself).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
    from godsp_tpu.parallel import MeshConfig, make_mesh, stream_pwelch
    from godsp_tpu.utils.metrics import (
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
    import time as _time

    import jax.numpy as jnp

    from godsp_tpu.ops.pallas_fft import fft_pow2_split

    from godsp_tpu.utils.metrics import time_chain_diff

    def bench_pallas(n, batch):
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
        per = time_chain_diff(make, xr, k_lo=10, k_hi=26, iters=8)
        gbs = 4 * batch * n * 4 / per / 1e9
        return per, gbs, make, xr

    # The chip clock is BIMODAL across minutes-long windows (the same
    # program measured 0.36 and 0.54 ms in one session), so the headline
    # takes the best of reps SPACED ACROSS the whole bench run (one
    # more after the pwelch section, one at the end), every rep recorded.
    flagship_reps = []
    _flagship = {}

    def flagship_rep():
        try:
            per = time_chain_diff(
                _flagship["make"], _flagship["x"], k_lo=10, k_hi=26, iters=8
            )
        except Exception as e:  # pragma: no cover
            log("flagship rep failed:", e)
            return
        flagship_reps.append(per)
        n, batch = 1024, 16384
        best = min(flagship_reps)
        gbs = 4 * batch * n * 4 / best / 1e9
        results["pallas_fft1024_precise"] = {
            "wall_s": best,
            "wall_s_reps": list(flagship_reps),
            "gbs": gbs,
            "roofline_fraction": gbs / peak if peak else None,
        }
        log(f"  flagship rep: {per*1e3:.3f} ms (best {best*1e3:.3f})")

    for n, batch in ((1024, 16384), (4096, 4096)):
        per, gbs, make, xr = bench_pallas(n, batch)
        frac = gbs / peak if peak else None
        results[f"pallas_fft{n}_precise"] = {
            "wall_s": per,
            "wall_s_reps": [per],
            "gbs": gbs,
            "roofline_fraction": frac,
        }
        if n == 1024:
            flagship_reps.append(per)
            _flagship.update(make=make, x=xr)
        log(
            f"pallas fft n={n} batch={batch}: {per*1e3:.3f} ms  "
            f"{gbs:.0f} GB/s  roofline={frac and f'{frac:.3f}'}"
        )

    # --- public fft() API on c64 (kernel + complex<->plane conversions) --
    for n, batch in ((1024, 16384),):
        x = put(
            (rng.normal(size=(batch, n)) + 1j * rng.normal(size=(batch, n))).astype(
                np.complex64
            )
        )
        r = time_chained(
            fft.fft,
            x,
            chain=12,
            name=f"fft{n}",
            flops=fft_flops(n, batch),
            bytes_moved=fft_bytes(n, batch, 8),
        )
        frac = r.roofline_fraction(peak)
        results[f"public_fft{n}"] = {
            "wall_s": r.wall_s,
            "gflops": r.gflops,
            "gbs": r.gbs,
            "roofline_fraction": frac,
        }
        log(
            f"public fft() n={n} batch={batch}: {r.wall_s*1e3:.3f} ms  "
            f"{r.gflops:.0f} GFLOP/s  {r.gbs:.0f} GB/s  "
            f"roofline={frac and f'{frac:.3f}'}"
        )

    # --- XLA built-in FFT for comparison --------------------------------
    try:
        import jax.numpy as jnp

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
        z20 = put(
            (rng.normal(size=n20) + 1j * rng.normal(size=n20)).astype(np.complex64)
            * 0.01
        )
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

        per = min(
            time_chain_diff(mk_large(fft.fft), z20, k_lo=16, k_hi=64, iters=8)
            for _ in range(2)
        )
        results["fft_2pow20"] = {"wall_s": per}
        log(f"fft 2^20 single: {per*1e3:.3f} ms")
        try:
            # Shallower chain: a 64-deep jnp.fft.fft program is too large for
            # the remote compile service.  Best-of-2 on both sides: the ratio
            # is double-jittered by the bimodal clock otherwise.
            per_jnp = min(
                time_chain_diff(mk_large(jnp.fft.fft), z20, k_lo=8, k_hi=24, iters=6)
                for _ in range(2)
            )
            results["fft_2pow20"]["jnp_wall_s"] = per_jnp
            results["fft_2pow20"]["speedup_vs_jnp"] = per_jnp / per
            log(f"  vs jnp.fft.fft: {per_jnp*1e3:.3f} ms ({per_jnp/per:.2f}x)")
        except Exception as e:  # pragma: no cover
            log("jnp 2^20 comparison failed:", e)
    except Exception as e:  # pragma: no cover
        log("large-N 2^20 section failed:", e)

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
        results[f"pallas_pwelch{nfft}_s{stride}"] = {
            "wall_s": per,
            "msamples_per_s": msps,
        }
        log(
            f"pallas pwelch nfft={nfft} stride={stride}: {per*1e3:.3f} ms  "
            f"{msps:.0f} Msamples/s on-device"
        )
      except Exception as e:  # pragma: no cover
        log("pwelch kernel section failed:", e)

    flagship_rep()  # spaced clock-window sample

    # --- fused mel front end (frame->window->FFT->|.|^2->filterbank) ----
    from godsp_tpu.models import mel_spectrogram

    nfft, hop = 1024, 512
    L = hop * 4096 + nfft
    sig = put(rng.normal(size=L).astype(np.float32))

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
        results["mel_frontend_1024"] = {
            "wall_s": per,
            "msamples_per_s": L / per / 1e6,
        }
        log(f"fused mel front end: {per*1e3:.3f} ms  {L/per/1e6:.0f} Msamples/s")
    except Exception as e:  # pragma: no cover
        log("mel section failed:", e)

    # --- fused ISTFT (IFFT + window + matmul overlap-add in VMEM) -------
    try:
        import godsp_tpu.models.stft as mstft

        nfft_i, hop_i, F_i = 1024, 512, 4096
        L_i = (F_i - 1) * hop_i + nfft_i
        xw = put(rng.normal(size=L_i).astype(np.float32))
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
        results["istft_fused_1024"] = {
            "wall_s": per_f,
            "msamples_per_s": out_len / per_f / 1e6,
            "xla_wall_s": per_x,
            "speedup_vs_xla": per_x / per_f,
        }
        log(
            f"fused istft 1024/512: {per_f*1e3:.3f} ms "
            f"({out_len/per_f/1e6:.0f} Msamples/s), XLA path {per_x*1e3:.3f} ms "
            f"-> {per_x/per_f:.2f}x"
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
        sig_fh = put(rng.normal(size=Lfh).astype(np.float32))
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
        results["pwelch_fused_halo"] = {
            "wall_s": per,
            "msamples_per_s": Lfh / per / 1e6,
        }
        log(
            f"fused-halo sharded pwelch (1-dev ring): {per*1e3:.3f} ms  "
            f"{Lfh/per/1e6:.0f} Msamples/s on-device"
        )
    except Exception as e:  # pragma: no cover
        log("fused-halo bench failed:", e)

    # --- Pwelch streaming throughput, single chip -----------------------
    fs = 44100.0
    opts = spectral.PwelchOptions(nfft=1024, noverlap=512)
    total = 1 << 24  # ~16.8 M samples
    sig = rng.normal(size=total).astype(np.float32)
    mesh = make_mesh(MeshConfig(dp=1, sp=1), jax.devices()[:1])
    try:
        stream_pwelch([sig[: 1 << 22]], fs, opts, mesh, segs_per_chunk_shard=4096)  # warm
        # The tunnel's host->device bandwidth is bimodal across
        # minutes-long windows (~30 MB/s to ~1.6 GB/s); report the best
        # of three runs with all reps recorded (each run is seconds).
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
        wall = min(walls)
        msps = total / wall / 1e6
        results["pwelch_stream"] = {
            "wall_s": wall, "wall_s_reps": walls, "msamples_per_s": msps
        }
        log(
            f"pwelch streaming: {msps:.1f} Msamples/s "
            f"(reps {'/'.join(f'{w:.2f}s' for w in walls)} for {total} samples)"
        )
    except Exception as e:  # pragma: no cover
        log("streaming section failed:", e)

    flagship_rep()  # final clock-window sample

    # --- summary line ----------------------------------------------------
    frac1k = results["pallas_fft1024_precise"]["roofline_fraction"] or 0.0
    summary = {
        "metric": "pallas_fft1024_precise_roofline_fraction",
        "value": round(frac1k, 4),
        "unit": "fraction_of_hbm_roofline",
        "vs_baseline": round(frac1k / 0.80, 4),
        "detail": results,
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
