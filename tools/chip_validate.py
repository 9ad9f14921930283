#!/usr/bin/env python
"""Real-chip validation drive for the round-2 synthesis stack.

Runs every new surface on the axon TPU with SNR checks against float64
hosts oracles, printing one line per section (all guarded — a failing
section never hides the rest).  Companion to .claude/skills/verify.

  python tools/chip_validate.py [--n1-probe]

--n1-probe additionally times the experimental n1=128 lane-slice
structure at n=16384 against the batched-3D default (slow remote
compile expected; see BASELINE.md round-2 notes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def section(name):
    def deco(fn):
        def run(*a, **k):
            t0 = time.time()
            try:
                msg = fn(*a, **k)
                print(f"[ok] {name}: {msg}  ({time.time()-t0:.1f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[FAIL] {name}: {e!r}  ({time.time()-t0:.1f}s)", flush=True)
        run.__name__ = fn.__name__  # keep --only matching by drive name
        return run
    return deco


@section("istft kernel")
def drive_istft_kernel():
    import jax.numpy as jnp

    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.ops.pallas_istft import istft_overlap_add

    nfft = pad = 1024
    hop, F = 512, 64
    rng = np.random.default_rng(0)
    spec = rng.normal(size=(F, pad)) + 1j * rng.normal(size=(F, pad))
    spec = np.fft.fft(np.fft.ifft(spec).real)
    w = np.hanning(nfft)
    n1 = pad // 128

    def td(p):
        return np.ascontiguousarray(
            p.reshape(F, 128, n1).swapaxes(-1, -2).reshape(F, pad)
        )

    y = np.asarray(
        istft_overlap_add(
            jnp.asarray(td(spec.real), jnp.float32),
            jnp.asarray(td(spec.imag), jnp.float32),
            jnp.asarray(w, jnp.float32), nfft, hop,
        )
    )
    frames = np.fft.ifft(spec).real[:, :nfft]
    ref = np.zeros((F - 1) * hop + nfft)
    for f in range(F):
        ref[f * hop : f * hop + nfft] += w * frames[f]
    return f"snr {snr_db(y, ref):.1f} dB vs f64 OLA oracle"


@section("istft round-trip")
def drive_istft_roundtrip():
    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.models import istft, stft

    rng = np.random.default_rng(1)
    nfft, hop = 1024, 512
    x = rng.normal(size=hop * 100 + nfft).astype(np.float32)
    s = stft(x, nfft, hop=hop)
    y = np.asarray(istft(s, nfft, hop=hop))
    return (
        f"interior snr {snr_db(y[nfft:-nfft], x[nfft:len(y)-nfft]):.1f} dB "
        f"(fused path)"
    )


@section("streaming istft")
def drive_streaming():
    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.models import istft, stft, stream_istft

    rng = np.random.default_rng(2)
    nfft, hop = 1024, 512
    x = rng.normal(size=hop * 64 + nfft).astype(np.float32)
    s = stft(x, nfft, hop=hop)
    got = np.concatenate(
        [np.asarray(b) for b in stream_istft([s[:20], s[20:40], s[40:]],
                                             nfft, hop=hop)]
    )
    ref = np.asarray(istft(s, nfft, hop=hop))
    return f"3-chunk vs one-shot snr {snr_db(got, ref):.1f} dB"


@section("griffin-lim")
def drive_griffin():
    from godsp_tpu.models import griffin_lim, stft
    from godsp_tpu.utils import to_host

    rng = np.random.default_rng(3)
    nfft, hop = 1024, 512
    t = np.arange(hop * 40 + nfft) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    # stft returns complex: to_host, never np.asarray (axon UNIMPLEMENTED
    # poisons the runtime for every later section)
    mag = np.abs(to_host(stft(x, nfft, hop=hop))).astype(np.float32)
    y = np.asarray(griffin_lim(mag, nfft, hop=hop, n_iter=16))
    m2 = np.abs(to_host(stft(y, nfft, hop=hop)))
    rel = np.linalg.norm(m2 - mag) / np.linalg.norm(mag)
    return f"fused-loop spectral mismatch {rel:.3%} after 16 iters"


@section("istft_sharded (1-dev)")
def drive_sharded():
    import jax

    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.models import istft, stft
    from godsp_tpu.parallel import MeshConfig, istft_sharded, make_mesh

    rng = np.random.default_rng(4)
    nfft, hop, F = 1024, 512, 32
    x = rng.normal(size=(F - 1) * hop + nfft).astype(np.float32)
    s = stft(x, nfft, hop=hop)[:F]
    mesh = make_mesh(MeshConfig(dp=1, sp=1), jax.devices()[:1])
    got = np.asarray(istft_sharded(s, mesh, nfft, hop))
    ref = np.asarray(istft(s, nfft, hop=hop))[: F * hop]
    return f"vs unsharded snr {snr_db(got, ref):.1f} dB"


@section("czt/zoom")
def drive_czt():
    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.fft import czt, zoom_fft
    from godsp_tpu.utils import to_host

    rng = np.random.default_rng(5)
    n, m = 1000, 400
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    k = np.arange(m)
    ref = np.array(
        [np.sum(x.astype(np.complex128) * np.exp(-2j * np.pi * kk * np.arange(n) / m))
         for kk in k]
    )
    got = to_host(czt(x, m))
    zf = to_host(zoom_fft(rng.normal(size=512).astype(np.float32), 0.5))
    return f"czt snr {snr_db(got, ref):.1f} dB, zoom shape {zf.shape}"


@section("n1=128 probe")
def drive_n1_128():
    import jax.numpy as jnp

    import godsp_tpu.ops.pallas_fft as pf
    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.utils.metrics import time_chain_diff

    n = 16384
    rng = np.random.default_rng(6)
    batch = 1024
    x = (rng.normal(size=(batch, n)) * 0.01).astype(np.float32)
    y = (rng.normal(size=(batch, n)) * 0.01).astype(np.float32)
    xr, xi = jnp.asarray(x), jnp.asarray(y)

    out = {}
    for name, maxn1 in (("3d", 64), ("ls128", 128)):
        pf._LS_MAX_N1 = maxn1
        t0 = time.time()
        yr, yi = pf.fft_pow2_split(xr, xi)
        compile_s = time.time() - t0
        small = np.asarray(yr[:2]) + 1j * np.asarray(yi[:2])
        snr = snr_db(small, np.fft.fft(x[:2] + 1j * y[:2]))

        def make(K):
            import jax

            @jax.jit
            def chain(r):
                acc_r, acc_i = r, xi
                for _ in range(K):
                    acc_r, acc_i = pf.fft_pow2_split(acc_r * 1e-3, acc_i * 1e-3)
                return acc_r

            return chain

        per = time_chain_diff(make, xr, k_lo=8, k_hi=24, iters=4)
        out[name] = (compile_s, snr, per)
    pf._LS_MAX_N1 = 64
    a, b = out["3d"], out["ls128"]
    return (
        f"3d: compile {a[0]:.0f}s snr {a[1]:.0f}dB {a[2]*1e3:.2f}ms | "
        f"ls128: compile {b[0]:.0f}s snr {b[1]:.0f}dB {b[2]*1e3:.2f}ms"
    )


@section("iir lfilter/filtfilt")
def drive_iir():
    import scipy.signal as ss

    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.models import filtfilt, lfilter

    rng = np.random.default_rng(9)
    x = rng.normal(size=1 << 16).astype(np.float32)
    b, a = ss.butter(4, 0.2)
    y = np.asarray(lfilter(b, a, x))
    yr = ss.lfilter(b, a, x.astype(np.float64))
    z = np.asarray(filtfilt(b, a, x))
    zr = ss.filtfilt(b, a, x.astype(np.float64))
    return (
        f"lfilter snr {snr_db(y, yr):.1f} dB, "
        f"filtfilt snr {snr_db(z, zr):.1f} dB vs scipy f64 (N=65536)"
    )


@section("resample_poly")
def drive_resample_poly():
    import scipy.signal as ss

    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.models import resample_poly

    rng = np.random.default_rng(10)
    x = rng.normal(size=1 << 14).astype(np.float32)
    got = np.asarray(resample_poly(x, 441, 160))
    ref = ss.resample_poly(x.astype(np.float64), 441, 160)
    return f"441/160 snr {snr_db(got, ref):.1f} dB vs scipy f64, shape {got.shape}"


@section("streaming stft/mel")
def drive_stream_stft():
    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.models import mel_spectrogram, stft, stream_mel, stream_stft

    rng = np.random.default_rng(11)
    nfft, hop = 1024, 512
    x = rng.normal(size=hop * 256 + nfft).astype(np.float32)
    blocks = [x[: hop * 100], x[hop * 100 : hop * 200], x[hop * 200 :]]
    from godsp_tpu.utils import to_host

    got = np.concatenate(
        [to_host(b) for b in stream_stft(blocks, nfft, hop=hop)], axis=-2
    )
    ref = to_host(stft(x, nfft, hop=hop))
    mg = np.concatenate(
        [np.asarray(b) for b in stream_mel(blocks, 16000.0, nfft, hop)],
        axis=-2,
    )
    mr = np.asarray(mel_spectrogram(x, 16000.0, nfft, hop))
    return (
        f"stft stream snr {snr_db(got, ref):.1f} dB, "
        f"mel stream snr {snr_db(mg, mr):.1f} dB vs one-shot"
    )


def _ab_fft_split(n, batch, seed, variants, set_toggle, check_rows=4):
    """Shared A/B scaffold: time chained public fft_split at (n, batch)
    under each (name, toggle_value) variant, with SNR vs numpy on the
    first rows.  Returns {name: (snr, per_s, rows_np)}; the toggle is
    restored to its pre-call value afterwards.
    """
    import jax
    import jax.numpy as jnp

    from godsp_tpu._dtypes import put
    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.fft import fft_split
    from godsp_tpu.utils.metrics import time_chain_diff

    rng = np.random.default_rng(seed)
    xr = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))
    xi = put((rng.normal(size=(batch, n)) * 0.01).astype(np.float32))

    def make(K):
        @jax.jit
        def chain(r):
            ar, ai = r, xi
            for _ in range(K):
                ar, ai = fft_split(ar * 1e-2, ai * 1e-2)
            # scalar return: time_chain_diff materializes float(f(x))
            return jnp.abs(ar[0, 0]) + jnp.abs(ai[0, 0])

        return chain

    out = {}
    for name, toggle in variants:
        prev = set_toggle(toggle)
        try:
            yr, yi = fft_split(xr[:check_rows], xi[:check_rows])
            rows = np.asarray(yr) + 1j * np.asarray(yi)
            snr = snr_db(
                rows,
                np.fft.fft(
                    np.asarray(xr[:check_rows]) + 1j * np.asarray(xi[:check_rows])
                ),
            )
            per = time_chain_diff(make, xr, k_lo=8, k_hi=24, iters=4)
            out[name] = (snr, per, rows)
        finally:
            set_toggle(prev)
    return out


@section("natural-fused A/B")
def drive_natural_ab():
    """Public fft() with the in-kernel MXU natural emission vs the XLA
    digit->natural transpose it replaces (the round-1 0.26-roofline gap).
    Also checks the two paths agree elementwise ON CHIP (the interpret-
    mode equality test never exercises the real MXU bf16-limb path)."""
    import godsp_tpu.ops.pallas_fft as pf

    def toggle(on):
        prev = pf._natural_fused
        pf.set_natural_fused(on)
        return prev

    out = _ab_fft_split(
        1024, 16384, 7, (("fused", True), ("xla", False)), toggle
    )
    f, x_ = out["fused"], out["xla"]
    nbad = int(np.sum(f[2] != x_[2]))
    return (
        f"fused {f[1]*1e3:.3f} ms ({f[0]:.0f} dB) vs xla-transpose "
        f"{x_[1]*1e3:.3f} ms ({x_[0]:.0f} dB) -> {x_[1]/f[1]:.2f}x; "
        f"{nbad}/{f[2].size} bins differ on chip"
    )


@section("16384 routing A/B")
def drive_16k_ab():
    from godsp_tpu.fft import large

    def toggle(mn):
        prev = large._MIN_N
        large.set_large_min(mn)
        return prev

    out = _ab_fft_split(
        16384, 1024, 8, (("kernel3d", 32768), ("split", 16384)), toggle,
        check_rows=2,
    )
    a, b = out["kernel3d"], out["split"]
    return (
        f"batched-3D {a[1]*1e3:.3f} ms ({a[0]:.0f} dB) vs lane-slice split "
        f"{b[1]*1e3:.3f} ms ({b[0]:.0f} dB) -> {a[1]/b[1]:.2f}x"
    )


def main():
    import jax

    jax.config.update("jax_platforms", "axon")
    print("devices:", jax.devices(), flush=True)
    drives = [
        drive_istft_kernel,
        drive_istft_roundtrip,
        drive_streaming,
        drive_griffin,
        drive_sharded,
        drive_czt,
        drive_iir,
        drive_resample_poly,
        drive_stream_stft,
        drive_natural_ab,
        drive_16k_ab,
        drive_conv2d,
        drive_cwt,
        drive_shorttime,
        drive_lsim,
        drive_splines,
        drive_fht,
        drive_pwelch_geometry,
        drive_rfft_split,
        drive_pwelch_packed_half,
        drive_outer_split,
        drive_api_smoke,
    ]
    # --only <substr>[,<substr>...]: run matching drives in THIS process
    # (one axon UNIMPLEMENTED poisons the runtime for every later
    # section, so isolate suspects in their own process when debugging).
    if "--only" in sys.argv:
        pats = sys.argv[sys.argv.index("--only") + 1].split(",")
        drives = [d for d in drives if any(p in d.__name__ for p in pats)]
    for d in drives:
        d()
    if "--n1-probe" in sys.argv:
        drive_n1_128()


# --- session-4 surfaces (scipy build-out): drive each new DEVICE path
# once on the chip and report SNR vs a host float64 oracle -----------------


@section("conv2d chain")
def drive_conv2d():
    import scipy.signal as ss

    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.models import convolve2d

    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 96, 80)).astype(np.float32)
    k = rng.normal(size=(9, 7)).astype(np.float32)
    got = np.asarray(convolve2d(a, k, mode="same"))
    ref = np.stack([ss.convolve2d(x.astype(np.float64), k, mode="same")
                    for x in a])
    return f"batched same-mode snr {snr_db(got, ref):.1f} dB"


@section("cwt bank")
def drive_cwt():
    import scipy.signal as _  # noqa: F401 (oracle below is direct numpy)

    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.models import cwt, ricker

    rng = np.random.default_rng(1)
    x = rng.normal(size=2048).astype(np.float32)
    widths = np.arange(1, 33)
    got = np.asarray(cwt(x, ricker, widths))
    ref = np.stack([
        np.convolve(x.astype(np.float64),
                    np.conj(ricker(int(min(10 * w, len(x))), w)[::-1]),
                    mode="same")
        for w in widths
    ])
    return f"32-width scalogram snr {snr_db(got, ref):.1f} dB"


@section("ShortTimeFFT")
def drive_shorttime():
    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.models import ShortTimeFFT
    from godsp_tpu.window.extended import gaussian

    rng = np.random.default_rng(2)
    x = rng.normal(size=4096).astype(np.float32)
    S = ShortTimeFFT(gaussian(256, 64.0), hop=64, fs=16000.0,
                     scale_to="psd")
    Z = S.stft(x)
    back = np.asarray(S.istft(Z, k1=len(x)))
    return (f"stft {Z.shape}, istft round-trip snr "
            f"{snr_db(back, x.astype(np.float64)):.1f} dB")


@section("lsim scan")
def drive_lsim():
    import scipy.signal as ss

    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.models import lsim

    b, a = ss.butter(3, 2.0, analog=True)
    sysc = ss.tf2ss(b, a)
    T = np.linspace(0, 5, 2001)
    U = np.sin(T * 3.0).astype(np.float64)
    _, y, _ = lsim(sysc, U, T)
    _, yr, _ = ss.lsim(sysc, U, T)
    return f"2001-step associative-scan snr {snr_db(np.ravel(np.asarray(y)), np.ravel(yr)):.1f} dB"


@section("spline DCT route")
def drive_splines():
    import scipy.signal as ss

    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.models import cspline1d

    rng = np.random.default_rng(3)
    x = rng.normal(size=2048).astype(np.float32)
    got = np.asarray(cspline1d(x))
    ref = ss.cspline1d(x.astype(np.float64))
    return f"cspline1d snr {snr_db(got, ref):.1f} dB"


@section("pwelch geometry sweep (chip)")
def drive_pwelch_geometry():
    """Randomized fused-geometry property check ON CHIP (VERDICT r3
    item 8): eligible (nfft, pad, stride) combos through the fused
    kernel must match the f64 host oracle >= 120 dB; a couple of
    ineligible combos must be gated out and served by the XLA fallback.
    The CPU interpret twin sweeps ~wider (tests/test_pallas.py
    TestPwelchGeometrySweep); this drive pins the real-Mosaic path.
    """
    import jax.numpy as jnp

    from godsp_tpu import window as win
    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.ops.pallas_pwelch import fused_supported, pwelch_power_sum

    rng = np.random.default_rng(20)
    eligible = []
    while len(eligible) < 6:
        nfft = int(rng.choice([256, 384, 512, 1024, 1536, 2048]))
        pad = nfft * int(rng.choice([1, 1, 2]))
        stride = int(rng.choice([16, 48, 128, 160, 256, 320, 384, 512]))
        if stride <= nfft and fused_supported(nfft, pad, stride):
            if (nfft, pad, stride) not in eligible:
                eligible.append((nfft, pad, stride))
    worst = np.inf
    for nfft, pad, stride in eligible:
        segs = 37
        L = (segs - 1) * stride + nfft
        x = rng.normal(size=L).astype(np.float32)
        w = np.asarray(win.window_table_np("hann", pad))
        got = np.asarray(pwelch_power_sum(
            jnp.asarray(x), jnp.asarray(w, jnp.float32),
            nfft, stride, segs, pad=pad,
        ))
        lp = pad // 2 + 1
        ref = np.zeros(lp)
        for s in range(segs):
            fr = np.zeros(pad)
            fr[:nfft] = x[s * stride : s * stride + nfft].astype(np.float64)
            ref += np.abs(np.fft.fft(fr * w)[:lp]) ** 2
        s = snr_db(got, ref)
        worst = min(worst, s)
        if s < 120.0:
            raise AssertionError(
                f"fused geometry ({nfft},{pad},{stride}): {s:.1f} dB")
    for nfft, pad, stride in [(1024, 1024, 24), (192, 192, 64)]:
        if fused_supported(nfft, pad, stride):
            raise AssertionError(f"gate admitted ({nfft},{pad},{stride})")
    from godsp_tpu import spectral

    x = rng.normal(size=5000).astype(np.float32)
    p, _ = spectral.pwelch(
        x, 2.0, spectral.PwelchOptions(nfft=192, noverlap=128))
    if not np.all(np.isfinite(np.asarray(p))):
        raise AssertionError("fallback path produced non-finite output")
    return (f"{len(eligible)} random eligible geometries on chip, "
            f"worst {worst:.1f} dB; gate + fallback checked")


# --- round-5 surfaces (VERDICT r4 item 8): chip exercises for round-4
# kernels that previously only ran inside bench.py --------------------------


@section("rfft_split (packed kernel)")
def drive_rfft_split():
    """Public one-sided real-input path: the Hermitian-packed kernel at
    a covered size plus the full-transform fallback at a Bluestein size."""
    import jax.numpy as jnp

    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.fft import rfft_split

    rng = np.random.default_rng(30)
    x = (rng.normal(size=(64, 1024)) * 0.1).astype(np.float32)
    yr, yi = rfft_split(jnp.asarray(x))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.rfft(x.astype(np.float64))
    s_kernel = snr_db(got, ref)
    xb = (rng.normal(size=1000) * 0.1).astype(np.float32)
    yrb, yib = rfft_split(jnp.asarray(xb))
    s_fb = snr_db(
        np.asarray(yrb) + 1j * np.asarray(yib),
        np.fft.rfft(xb.astype(np.float64)),
    )
    if min(s_kernel, s_fb) < 120.0:
        raise AssertionError(f"kernel {s_kernel:.1f} / fallback {s_fb:.1f} dB")
    return (f"packed kernel {s_kernel:.1f} dB (n=1024), Bluestein fallback "
            f"{s_fb:.1f} dB (n=1000)")


@section("sharded pwelch packed-half route")
def drive_pwelch_packed_half():
    """The half-Hermitian sharded/streaming Pwelch route vs the full
    contraction (must be bit-identical) and vs the f64 host oracle —
    including the options.pad < nfft head-bin quirk (round-5 fix)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from godsp_tpu import spectral
    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.ops.pallas_pwelch import set_packed_half_enabled
    from godsp_tpu.parallel import pwelch_sharded

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=512 * 1024).astype(np.float32))
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("sp",))
    opts = spectral.PwelchOptions(nfft=1024, noverlap=512)
    p_half, _ = pwelch_sharded(x, 2.0, opts, mesh=mesh1)
    try:
        set_packed_half_enabled(False)
        p_full, _ = pwelch_sharded(x, 2.0, opts, mesh=mesh1)
    finally:
        set_packed_half_enabled(True)
    a, b = np.asarray(p_half), np.asarray(p_full)
    # Bins 0..lp-2 contract against the same G columns -> bit-identical.
    # The NYQUIST bin is computed by the packed kernel's dedicated
    # alternating-sum contraction (different summation order than the
    # full path's G column): algebraically equal, up to 1 ulp apart.
    nbad = int(np.sum(a[:-1] != b[:-1]))
    nyq_rel = abs(float(a[-1]) - float(b[-1])) / max(abs(float(b[-1])), 1e-30)
    if nyq_rel > 1e-6:
        raise AssertionError(f"Nyquist half-vs-full rel {nyq_rel:.2e}")
    # f64 oracle (reference semantics, pwelch.go:101-136)
    xs = np.asarray(x).astype(np.float64)
    stride, nfft, lp = 512, 1024, 513
    nsegs = (len(xs) - nfft) // stride + 1
    import godsp_tpu.window as win

    w = win.window_table_np("hann", nfft)
    idx = np.arange(nsegs)[:, None] * stride + np.arange(nfft)[None, :]
    X = np.fft.rfft(xs[idx] * w, axis=-1)
    p = X.real**2 + X.imag**2
    p[:, 1 : lp - 1] *= 2.0
    ref = p.sum(axis=0) / nsegs / (float(np.sum(w * w)) * 2.0)
    s = snr_db(np.asarray(p_half), ref)
    # pad < nfft head-bin quirk through the half path
    opts2 = spectral.PwelchOptions(nfft=1024, noverlap=512, pad=512)
    p2, _ = pwelch_sharded(x, 2.0, opts2, mesh=mesh1)
    if p2.shape[-1] != 257:
        raise AssertionError(f"pad<nfft shape {p2.shape}")
    if nbad or s < 120.0:
        raise AssertionError(f"{nbad} bins differ half-vs-full, {s:.1f} dB")
    return (f"half==full bit-identical below Nyquist (nyq rel "
            f"{nyq_rel:.1e}), {s:.1f} dB vs f64 oracle, "
            f"pad<nfft -> {p2.shape[-1]} bins")


@section("outer_dft_split (giant-N outer kernel)")
def drive_outer_split():
    """The fused outer-level kernel vs its einsum fallback and vs numpy
    f64 at N=2^21, the smallest d2>1 plan (16,16,8192).  fft_split's
    dispatch re-evaluates the toggle per eager call (no inner jit
    cache), so this A/B is valid — unlike the complex fft API
    (BASELINE.md round-4 probe_giant5 caveat)."""
    import jax.numpy as jnp

    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.fft import fft_split
    from godsp_tpu.fft import large

    N = 1 << 21
    d1, d2, n3 = large._plan(N)
    if d2 <= 1:
        raise AssertionError(f"plan {(d1, d2, n3)} has no outer level")
    rng = np.random.default_rng(32)
    xr = (rng.normal(size=N) * 0.01).astype(np.float32)
    xi = (rng.normal(size=N) * 0.01).astype(np.float32)
    ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))

    out = {}
    try:
        for name, on in (("kernel", True), ("einsum", False)):
            large.set_outer_kernel_enabled(on)
            yr, yi = fft_split(jnp.asarray(xr), jnp.asarray(xi))
            out[name] = np.asarray(yr) + 1j * np.asarray(yi)
    finally:
        large.set_outer_kernel_enabled(True)
    s_k = snr_db(out["kernel"], ref)
    s_e = snr_db(out["einsum"], ref)
    if s_k < 120.0:
        raise AssertionError(f"outer kernel {s_k:.1f} dB")
    return (f"outer kernel {s_k:.1f} dB, einsum fallback {s_e:.1f} dB "
            f"(N=2^21, plan {(d1, d2, n3)})")


@section("fht chain")
def drive_fht():
    import scipy.fft as sf

    from godsp_tpu.dsputils import snr_db
    from godsp_tpu.fft import fht

    r = np.logspace(-2, 2, 256)
    a = (r * np.exp(-(r**2) / 2)).astype(np.float32)
    dln = float(np.log(r[1] / r[0]))
    got = np.asarray(fht(a, dln, mu=0.5))
    ref = sf.fht(a.astype(np.float64), dln, mu=0.5)
    return f"fftlog snr {snr_db(got, ref):.1f} dB"

@section("api smoke sweep")
def drive_api_smoke():
    """Every remaining public DEVICE path not covered by a dedicated
    section, executed once on the chip with tiny inputs and materialized
    via to_host — catches latent transport bugs (eager complex
    transfers, unjitted complex ops) that no CPU test can see.  Entries
    are finiteness/shape smoke checks; numerical parity lives in the CPU
    f64 suite and the dedicated sections."""
    import jax.numpy as jnp

    from godsp_tpu import fft, models, spectral
    from godsp_tpu._dtypes import put
    from godsp_tpu.utils import to_host

    rng = np.random.default_rng(17)
    xr = rng.normal(size=256).astype(np.float32)
    yr2 = rng.normal(size=256).astype(np.float32)
    xc = (rng.normal(size=240) + 1j * rng.normal(size=240)).astype(np.complex64)
    img = rng.normal(size=(24, 32)).astype(np.float32)
    k2 = rng.normal(size=(3, 5)).astype(np.float32)
    x3 = (rng.normal(size=(2, 4, 8))
          + 1j * rng.normal(size=(2, 4, 8))).astype(np.complex64)
    X = np.fft.rfft(xr.astype(np.float64)).astype(np.complex64)
    sos = np.asarray(models.butter(4, 0.2, output="sos"), np.float64)
    t = np.sort(rng.uniform(0, 10, 200)).astype(np.float64)
    yt = np.sin(3.0 * t).astype(np.float64)

    entries = {
        # fft module breadth
        "bluestein_fft": lambda: fft.bluestein_fft(put(xc[:12])),
        "convolve_c64": lambda: fft.convolve(put(xc[:64]), put(xc[64:128])),
        "dct2": lambda: fft.dct(xr),
        "idct2": lambda: fft.idct(xr),
        "dst2": lambda: fft.dst(xr),
        "idst2": lambda: fft.idst(xr),
        "dctn": lambda: fft.dctn(img),
        "idstn": lambda: fft.idstn(img),
        "fftn": lambda: fft.fftn(put(x3)),
        "ifftn": lambda: fft.ifftn(put(x3)),
        "fft2_real": lambda: fft.fft2_real(img),
        "ifft2_real": lambda: fft.ifft2_real(img),
        "four_step_fft": lambda: fft.four_step_fft(put(xc[:128].astype(
            np.complex64))),
        "rfft2": lambda: fft.rfft2(img),
        "irfft2": lambda: fft.irfft2(fft.rfft2(img)),
        "rfftn": lambda: fft.rfftn(np.abs(np.asarray(x3)).astype(np.float32)),
        "irfftn": lambda: fft.irfftn(put(x3[..., :5])),
        "hfft2": lambda: fft.hfft2(put(x3[..., :5])),
        "ihfft2": lambda: fft.ihfft2(img),
        "hfftn": lambda: fft.hfftn(put(x3[..., :5])),
        "ihfftn": lambda: fft.ihfftn(img),
        "ihfft": lambda: fft.ihfft(xr),
        "fhtoffset": lambda: np.float64(fft.fhtoffset(0.1, 0.5)),
        "ifht": lambda: fft.ifht(xr, 0.1, 0.5),
        # spectral breadth
        "welch": lambda: spectral.welch(xr, fs=2.0, nperseg=64)[1],
        "welch_csd": lambda: spectral.welch_csd(xr, yr2, nperseg=64)[1],
        "welch_coherence": lambda: spectral.welch_coherence(
            xr, yr2, nperseg=64)[1],
        "csd": lambda: spectral.csd(xr, yr2, 2.0,
                                    spectral.PwelchOptions(nfft=64))[0],
        "coherence": lambda: spectral.coherence(
            xr, yr2, 2.0, spectral.PwelchOptions(nfft=64))[0],
        "periodogram": lambda: spectral.periodogram(xr, 2.0)[0],
        "lombscargle": lambda: spectral.lombscargle(
            t, yt, np.linspace(0.5, 5, 32)),
        "spectrogram_scipy": lambda: spectral.spectrogram_scipy(
            xr, fs=2.0, nperseg=64)[2],
        "pwelch_from_frames": lambda: spectral.pwelch_from_frames(
            rng.normal(size=(5, 64)).astype(np.float32), 2.0,
            spectral.PwelchOptions(nfft=64))[0],
        # models breadth (device compute paths)
        "correlate": lambda: models.correlate(xr, yr2[:32]),
        "fftconvolve": lambda: models.fftconvolve(xr, yr2[:32]),
        "oaconvolve": lambda: models.oaconvolve(xr, yr2[:32]),
        "correlate2d": lambda: models.correlate2d(img, k2),
        "medfilt": lambda: models.medfilt(xr, 5),
        "medfilt2d": lambda: models.medfilt2d(img, 3),
        "order_filter": lambda: models.order_filter(
            img, np.ones((3, 3)), 4),
        "wiener": lambda: models.wiener(img, 3),
        "savgol_filter": lambda: models.savgol_filter(xr, 11, 3),
        "detrend": lambda: models.detrend(xr),
        "decimate": lambda: models.decimate(xr, 4),
        "resample": lambda: models.resample(xr, 100),
        "upfirdn": lambda: models.upfirdn(yr2[:9], xr, 3, 2),
        "sosfilt": lambda: models.sosfilt(sos, xr),
        "sosfiltfilt": lambda: models.sosfiltfilt(sos, xr),
        "symiirorder1": lambda: models.symiirorder1(xr, 0.5, 0.2),
        "symiirorder2": lambda: models.symiirorder2(xr, 0.5, 0.3),
        "sepfir2d": lambda: models.sepfir2d(
            img, yr2[:5].astype(np.float64), yr2[:5].astype(np.float64)),
        "spline_filter": lambda: models.spline_filter(img),
        "qspline1d": lambda: models.qspline1d(xr),
        "cspline2d": lambda: models.cspline2d(img),
        "gauss_spline": lambda: models.gauss_spline(xr, 3),
        "envelope": lambda: models.envelope(xr),
        "hilbert2": lambda: models.hilbert2(img),
        "square": lambda: models.square(t),
        "sawtooth": lambda: models.sawtooth(t),
        "chirp": lambda: models.chirp(t.astype(np.float32), 0.1, 10.0, 2.0),
        "gausspulse": lambda: models.gausspulse(
            np.linspace(-1, 1, 100), fc=5.0),
        "sweep_poly": lambda: models.sweep_poly(
            t.astype(np.float32), [0.01, 0.1, 1.0]),
        "morlet": lambda: models.morlet(64),
        "morlet2": lambda: models.morlet2(64, 8.0),
        "ricker": lambda: models.ricker(64, 8.0),
        "vectorstrength": lambda: models.vectorstrength(t, 2.0)[0],
        "minimum_phase": lambda: models.minimum_phase(
            models.firwin(31, 0.4) * 1.0),
        "overlap_save": lambda: models.overlap_save(xr, yr2[:17]),
        "fir_filter": lambda: models.fir_filter(yr2[:17], xr),
        "stft_frames": lambda: models.stft_frames(put(xr), 64, 32),
        "mfcc": lambda: models.mfcc(
            rng.normal(size=4096).astype(np.float32), 16000.0),
        "unit_impulse": lambda: models.unit_impulse(16, 3),
        "deconvolve": lambda: models.deconvolve(
            np.convolve(xr[:32], yr2[:5]), yr2[:5])[0],
        "find_peaks": lambda: models.find_peaks(np.asarray(xr))[0],
        "dlsim": lambda: models.dlsim(
            (np.array([[0.5]]), np.array([[1.0]]), np.array([[1.0]]),
             np.array([[0.0]]), 0.1), xr[:64].astype(np.float64))[1],
    }
    fails = []
    for name, fn in entries.items():
        try:
            v = fn()
            arr = to_host(v) if not isinstance(v, np.ndarray) else v
            if not np.all(np.isfinite(np.asarray(arr, dtype=np.complex128)
                                      if np.asarray(arr).dtype.kind == "c"
                                      else np.asarray(arr, np.float64))):
                fails.append(f"{name}: non-finite")
        except Exception as e:  # noqa: BLE001
            fails.append(f"{name}: {e!r}"[:140])
    if fails:
        raise AssertionError(f"{len(fails)}/{len(entries)} failed: " +
                             " | ".join(fails[:6]))
    return f"{len(entries)} public device paths executed + finite on chip"



if __name__ == "__main__":
    main()
