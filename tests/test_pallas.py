"""Pallas kernel tests, run in interpreter mode on CPU (SURVEY.md §5:
interpreter-mode tests are the race-free substitute for sanitizers).
On-chip accuracy/perf is exercised by bench.py and the verify drive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from godsp_tpu.dsputils import snr_db
from godsp_tpu.ops.pallas_fft import (
    default_batch_tile,
    fft_pow2_split,
    supported_size,
)


def _split(x):
    return jnp.asarray(x.real.copy()), jnp.asarray(x.imag.copy())


class TestPallasFFT:
    @pytest.mark.parametrize("n", [256, 512, 1024, 4096])
    def test_forward_vs_numpy(self, n):
        rng = np.random.default_rng(n)
        x = (rng.normal(size=(5, n)) + 1j * rng.normal(size=(5, n))).astype(np.complex64)
        yr, yi = fft_pow2_split(*_split(x), interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert snr_db(got, np.fft.fft(x)) >= 120.0

    def test_digit_order(self):
        n, n1 = 1024, 8
        rng = np.random.default_rng(2)
        x = (rng.normal(size=(4, n)) + 1j * rng.normal(size=(4, n))).astype(np.complex64)
        yr, yi = fft_pow2_split(*_split(x), order="digit", interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft(x)
        # digit order stores X[k1 + n1*k2] at position k1*128 + k2
        ref_digit = np.transpose(ref.reshape(4, 128, n1), (0, 2, 1)).reshape(4, n)
        assert snr_db(got, ref_digit) >= 120.0

    def test_inverse_roundtrip(self):
        rng = np.random.default_rng(3)
        x = (rng.normal(size=(3, 512)) + 1j * rng.normal(size=(3, 512))).astype(
            np.complex64
        )
        yr, yi = fft_pow2_split(*_split(x), interpret=True)
        zr, zi = fft_pow2_split(yr, yi, inverse=True, interpret=True)
        back = (np.asarray(zr) + 1j * np.asarray(zi)) / 512
        assert snr_db(back, x) >= 120.0

    def test_ragged_batch_padding(self):
        rng = np.random.default_rng(4)
        x = (rng.normal(size=(3, 256)) + 1j * rng.normal(size=(3, 256))).astype(
            np.complex64
        )
        yr, yi = fft_pow2_split(*_split(x), batch_tile=16, interpret=True)
        assert yr.shape == (3, 256)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert snr_db(got, np.fft.fft(x)) >= 120.0

    def test_nd_batch(self):
        rng = np.random.default_rng(5)
        x = (rng.normal(size=(2, 3, 256)) + 1j * rng.normal(size=(2, 3, 256))).astype(
            np.complex64
        )
        yr, yi = fft_pow2_split(*_split(x), interpret=True)
        assert yr.shape == (2, 3, 256)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert snr_db(got, np.fft.fft(x)) >= 120.0

    def test_real_input_matches_reference_goldens(self):
        """The kernel agrees with the golden-tested core path."""
        from godsp_tpu import fft as gfft

        rng = np.random.default_rng(6)
        xr = rng.normal(size=(4, 256)).astype(np.float32)
        yr, yi = fft_pow2_split(
            jnp.asarray(xr), jnp.zeros_like(jnp.asarray(xr)), interpret=True
        )
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.asarray(gfft.fft_real(xr.astype(np.float64)))
        assert snr_db(got, ref) >= 120.0

    def test_errors(self):
        x = jnp.zeros((2, 100), jnp.float32)
        with pytest.raises(ValueError, match="unsupported FFT size"):
            fft_pow2_split(x, x)
        x2 = jnp.zeros((2, 256), jnp.float32)
        with pytest.raises(ValueError, match="identical shapes"):
            fft_pow2_split(x2, jnp.zeros((3, 256), jnp.float32))
        with pytest.raises(ValueError, match="unknown order"):
            fft_pow2_split(x2, x2, order="weird")

    def test_natural_fused_bit_exact(self):
        """In-kernel MXU natural-order permute == digit kernel + XLA
        transpose, bit for bit (3-limb bf16 split is exact)."""
        import godsp_tpu.ops.pallas_fft as pf

        rng = np.random.default_rng(11)
        for n in (256, 1024):
            x = (rng.normal(size=(5, n)) + 1j * rng.normal(size=(5, n))).astype(
                np.complex64
            )
            a, b = _split(x)
            yr1, yi1 = fft_pow2_split(a, b, interpret=True)
            pf.set_natural_fused(False)
            try:
                yr0, yi0 = fft_pow2_split(a, b, interpret=True)
            finally:
                pf.set_natural_fused(True)
            np.testing.assert_array_equal(np.asarray(yr1), np.asarray(yr0))
            np.testing.assert_array_equal(np.asarray(yi1), np.asarray(yi0))

    def test_shared_f2_structure(self):
        """Shared-F2 contraction (separate VPU twiddle + hand-rolled
        6-term limb matmuls against one shared F2): same transform, same
        digit layout, >=120 dB, all orders/chunks/inverses."""
        import godsp_tpu.ops.pallas_fft as pf

        rng = np.random.default_rng(12)
        n, b, n1 = 1024, 6, 8
        x = (rng.normal(size=(b, n)) + 1j * rng.normal(size=(b, n))).astype(
            np.complex64
        )
        a, c = _split(x)
        ref = np.fft.fft(x.astype(np.complex128))
        ref_digit = np.transpose(
            ref.reshape(b, 128, n1), (0, 2, 1)
        ).reshape(b, n)
        # chunk=128 -> two unrolled chunk bodies per block (bt=256);
        # tiny chunks explode the unroll count and the compile time.
        for chunk in (None, 128):
            pf.set_ls_shared_f2(True)
            pf.set_ls_chunk_rows(chunk)
            try:
                yr, yi = fft_pow2_split(a, c, order="digit", interpret=True)
                got = np.asarray(yr) + 1j * np.asarray(yi)
                assert snr_db(got, ref_digit) >= 120.0
                yr, yi = fft_pow2_split(a, c, order="natural", interpret=True)
                got = np.asarray(yr) + 1j * np.asarray(yi)
                assert snr_db(got, ref) >= 120.0
                # natural-in inverse with folded 1/N scale
                zr, zi = fft_pow2_split(
                    yr, yi, inverse=True, interpret=True, scale=1.0 / n
                )
                back = np.asarray(zr) + 1j * np.asarray(zi)
                assert snr_db(back, x) >= 120.0
                # digit-in inverse (the convolve-chain tail)
                from godsp_tpu.ops.pallas_fft import ifft_pow2_digit_split

                dr = jnp.asarray(ref_digit.real.astype(np.float32))
                di = jnp.asarray(ref_digit.imag.astype(np.float32))
                zr, zi = ifft_pow2_digit_split(
                    dr, di, interpret=True, scale=1.0 / n
                )
                back = np.asarray(zr) + 1j * np.asarray(zi)
                assert snr_db(back, x) >= 120.0
            finally:
                pf.set_ls_shared_f2(False)
                pf.set_ls_chunk_rows(None)

    def test_split2_16384_layout_helpers(self):
        """Split-digit <-> natural permutations are mutual inverses and
        match the documented index formula (position half*8192 +
        k1*128 + k2 holds bin 2*(k1 + 64*k2) + half)."""
        from godsp_tpu.ops.pallas_fft import (
            digit16384_to_natural,
            natural_to_digit,
        )

        nat = jnp.arange(16384, dtype=jnp.float32)[None]
        dig = np.asarray(natural_to_digit(nat, 16384))[0]
        for q in (0, 1, 127, 128, 8191, 8192, 16383, 5000):
            half, r = divmod(q, 8192)
            k1, k2 = divmod(r, 128)
            assert dig[q] == 2 * (k1 + 64 * k2) + half
        back = np.asarray(digit16384_to_natural(jnp.asarray(dig)[None]))[0]
        np.testing.assert_array_equal(back, np.asarray(nat)[0])

    def test_supported_size(self):
        assert supported_size(256) and supported_size(16384)
        assert not supported_size(128)
        assert not supported_size(1000)
        assert not supported_size(1 << 15)

    def test_default_batch_tile(self):
        for n in (256, 1024, 4096, 16384):
            assert 8 <= default_batch_tile(n) <= 512


class _NpRef:
    """Minimal Pallas-ref shim: reads return jnp arrays, writes land in
    a numpy buffer.  Lets a kernel BODY run as plain eager jnp on CPU —
    the statically unrolled n=16384 split-DIF bodies (two n1=64
    pipelines) take minutes to compile in interpret mode, but their
    math runs in seconds this way, so CPU CI covers the DIF butterfly
    and the DIT recombination (the chip covers the compiled kernel)."""

    def __init__(self, arr):
        self.arr = np.array(arr, dtype=np.float32)

    def __getitem__(self, idx):
        return jnp.asarray(self.arr[idx])

    def __setitem__(self, idx, val):
        self.arr[idx] = np.asarray(val, dtype=np.float32)


class TestSplit2KernelMath:
    """Numerical coverage for the n=16384 split-DIF kernel bodies
    (_fft_kernel_split2 / _ifft_kernel_split2) via the ref shim."""

    N = 16384

    def _run_body(self, body, inputs, tables, out_shapes, **kw):
        refs = [_NpRef(a) for a in inputs] + [_NpRef(t) for t in tables]
        outs = [_NpRef(np.zeros(s, np.float32)) for s in out_shapes]
        body(*refs, *outs, **kw)
        return [o.arr for o in outs]

    def test_forward_split_digit(self):
        from godsp_tpu.ops import pallas_fft as pf

        rng = np.random.default_rng(7)
        x = (rng.normal(size=(2, self.N))
             + 1j * rng.normal(size=(2, self.N))).astype(np.complex64)
        tabs = pf._ls_tables(pf._HALF, False, False)
        w2r, w2i = pf._split2_w(False)
        yr, yi = self._run_body(
            pf._fft_kernel_split2,
            [x.real, x.imag],
            [w2r, w2i] + [tabs[k] for k in pf._LS_ORDER],
            [(2, self.N)] * 2,
            inverse=False,
        )
        want = np.asarray(
            pf.natural_to_digit(jnp.asarray(np.fft.fft(x)), self.N)
        )
        got = yr.astype(np.float64) + 1j * yi.astype(np.float64)
        assert snr_db(got, want) >= 120.0

    def test_inverse_digit_in(self):
        from godsp_tpu.ops import pallas_fft as pf

        rng = np.random.default_rng(8)
        x = (rng.normal(size=(2, self.N))
             + 1j * rng.normal(size=(2, self.N))).astype(np.complex64)
        spec = np.asarray(
            pf.natural_to_digit(jnp.asarray(np.fft.fft(x)), self.N)
        ).astype(np.complex64)
        tabs = pf._ls_tables(pf._HALF, True, True, 1.0 / self.N)
        w2r, w2i = pf._split2_w(True)
        zr, zi = self._run_body(
            pf._ifft_kernel_split2,
            [spec.real, spec.imag],
            [w2r, w2i] + [tabs[k] for k in pf._LS_ORDER],
            [(2, self.N)] * 2,
        )
        got = zr.astype(np.float64) + 1j * zi.astype(np.float64)
        assert snr_db(got, x) >= 120.0

    def test_real_input_16384_standard_digit_layout(self):
        """Documented real-input exception (ADVICE r3): a real-input
        forward at 16384 runs the batched-3D kernel and emits STANDARD
        digit order (bin k1 + 128*k2 at position k1*128 + k2), NOT the
        split-digit layout of natural_to_digit — the two must never be
        paired.  Pins the layout the docstrings promise."""
        rng = np.random.default_rng(9)
        xr = rng.normal(size=(2, self.N)).astype(np.float32)
        yr, yi = fft_pow2_split(
            jnp.asarray(xr), None, order="digit", batch_tile=2,
            interpret=True,
        )
        got = (np.asarray(yr).astype(np.float64)
               + 1j * np.asarray(yi).astype(np.float64))
        F = np.fft.fft(xr.astype(np.float64))
        n1 = 128
        std_digit = np.transpose(
            F.reshape(2, self.N // n1, n1), (0, 2, 1)
        ).reshape(2, self.N)
        assert snr_db(got, std_digit) >= 120.0


from godsp_tpu.ops.pallas_pwelch import (
    digit_to_natural_bins,
    fused_supported,
    pwelch_power_partials,
    pwelch_power_sum,
)


class TestPallasPwelch:
    """Fused Welch kernel vs the golden-tested XLA path (interpret mode)."""

    def _reference_power_sum(self, x, nfft, stride, total_segs):
        """Sum over segments of |FFT(hann * frame)|^2, one-sided, f64."""
        from godsp_tpu import window as win

        w = np.asarray(win.window_table_np("hann", nfft))
        lp = nfft // 2 + 1
        acc = np.zeros(lp)
        for s in range(total_segs):
            fr = np.asarray(x[s * stride : s * stride + nfft], dtype=np.float64)
            spec = np.fft.fft(fr * w)[:lp]
            acc += np.abs(spec) ** 2
        return acc

    @pytest.mark.parametrize(
        "nfft,stride", [(256, 256), (256, 128), (1024, 512), (512, 128)]
    )
    def test_power_sum_vs_reference(self, nfft, stride):
        rng = np.random.default_rng(nfft + stride)
        total_segs = 21
        L = (total_segs - 1) * stride + nfft
        x = rng.normal(size=L).astype(np.float32)
        from godsp_tpu import window as win

        w = jnp.asarray(win.window_table_np("hann", nfft), jnp.float32)
        got = np.asarray(
            pwelch_power_sum(
                jnp.asarray(x), w, nfft, stride, total_segs, interpret=True
            )
        )
        ref = self._reference_power_sum(x, nfft, stride, total_segs)
        assert snr_db(got, ref) >= 100.0

    def test_matches_pwelch_xla_path(self):
        """Fused kernel == spectral.pwelch (same options) within f32."""
        from godsp_tpu import spectral

        rng = np.random.default_rng(7)
        nfft, noverlap, fs = 256, 128, 2.0
        stride = nfft - noverlap
        x = rng.normal(size=stride * 40 + noverlap).astype(np.float64)
        opts = spectral.PwelchOptions(nfft=nfft, noverlap=noverlap)
        ref, freqs_ref = spectral.pwelch(x, fs, opts)  # f64 XLA path on CPU

        from godsp_tpu import window as win

        total_segs = (len(x) - nfft) // stride + 1
        w = jnp.asarray(win.window_table_np("hann", nfft), jnp.float32)
        p = np.asarray(
            pwelch_power_sum(
                jnp.asarray(x, jnp.float32), w, nfft, stride, total_segs,
                interpret=True,
            ),
            dtype=np.float64,
        )
        lp = nfft // 2 + 1
        doubler = np.ones(lp); doubler[1:-1] = 2.0
        w64 = np.asarray(win.window_table_np("hann", nfft))
        pxx = p * doubler / (total_segs * np.sum(w64 * w64) * fs)
        assert snr_db(pxx, np.asarray(ref)) >= 100.0

    def test_masking_drops_segments(self):
        """Masked-out segments contribute nothing, exactly."""
        rng = np.random.default_rng(8)
        nfft = stride = 256
        total, keep = 16, 9
        x = rng.normal(size=total * stride).astype(np.float32)
        from godsp_tpu import window as win

        w = jnp.asarray(win.window_table_np("hann", nfft), jnp.float32)
        mask = jnp.asarray((np.arange(total) < keep).astype(np.float32))
        partials = pwelch_power_partials(
            jnp.asarray(x), mask, w, nfft, stride, interpret=True
        )
        got = np.asarray(
            digit_to_natural_bins(partials.sum(axis=-2), nfft)[: nfft // 2 + 1]
        )
        ref = self._reference_power_sum(x, nfft, stride, keep)
        assert snr_db(got, ref) >= 100.0

    def test_batched_rows(self):
        """Leading dims map to independent signals."""
        rng = np.random.default_rng(9)
        nfft = stride = 256
        segs = 5
        x = rng.normal(size=(3, segs * stride)).astype(np.float32)
        from godsp_tpu import window as win

        w = jnp.asarray(win.window_table_np("hamming", nfft), jnp.float32)
        got = np.asarray(
            pwelch_power_sum(jnp.asarray(x), w, nfft, stride, segs, interpret=True)
        )
        assert got.shape == (3, nfft // 2 + 1)
        for r in range(3):
            ref = np.zeros(nfft // 2 + 1)
            w64 = np.asarray(win.window_table_np("hamming", nfft))
            for s in range(segs):
                fr = x[r, s * stride : s * stride + nfft].astype(np.float64)
                ref += np.abs(np.fft.fft(fr * w64)[: nfft // 2 + 1]) ** 2
            assert snr_db(got[r], ref) >= 100.0

    def test_fused_supported(self):
        assert fused_supported(256, 256, 256)
        assert fused_supported(1024, 1024, 512)
        assert fused_supported(1024, 2048, 512)       # pad > nfft
        assert not fused_supported(1024, 512, 512)    # pad < nfft
        assert not fused_supported(1024, 100000, 512) # pad not kernel-size
        assert not fused_supported(100, 100, 100)     # not a kernel size
        assert not fused_supported(1024, 1024, 100)   # 32 phase classes
        assert not fused_supported(1024, 1024, 7)     # odd stride
        # Generalized framing (round 2): partial-period lane-aligned
        # strides and phase-class strides run fully fused.
        assert fused_supported(1024, 1024, 384)       # nfft % stride != 0
        assert fused_supported(1024, 1024, 160)       # P=4 phase classes
        assert fused_supported(256, 512, 48)          # P=8, gcd=16

    def test_errors(self):
        x = jnp.zeros(1024, jnp.float32)
        m = jnp.ones(4, jnp.float32)
        w = jnp.ones(100, jnp.float32)
        with pytest.raises(ValueError, match="unsupported by the fused kernel"):
            pwelch_power_partials(x, m, w, 100, 100, interpret=True)

    def test_pad_gt_nfft(self):
        """pad > nfft: segments zero-extended in VMEM, PAD-length window
        (pwelch.go:108-109 semantics)."""
        from godsp_tpu import window as win

        rng = np.random.default_rng(11)
        nfft, pad, stride = 256, 512, 128
        segs = 12
        L = (segs - 1) * stride + nfft
        x = rng.normal(size=L).astype(np.float32)
        w = jnp.asarray(win.window_table_np("hann", pad), jnp.float32)
        got = np.asarray(
            pwelch_power_sum(
                jnp.asarray(x), w, nfft, stride, segs, pad=pad, interpret=True
            )
        )
        w64 = np.asarray(win.window_table_np("hann", pad))
        lp = pad // 2 + 1
        ref = np.zeros(lp)
        for s in range(segs):
            fr = np.zeros(pad)
            fr[:nfft] = x[s * stride : s * stride + nfft].astype(np.float64)
            ref += np.abs(np.fft.fft(fr * w64)[:lp]) ** 2
        assert snr_db(got, ref) >= 100.0

    @pytest.mark.parametrize(
        "nfft,pad,stride", [(256, 256, 256), (1024, 1024, 512),
                            (1024, 1024, 160), (256, 512, 128)]
    )
    def test_packed_half_matches_digit_path(self, nfft, pad, stride):
        """The half-Hermitian contraction (packed_half) == the full
        digit-order contraction bin for bin (round-4 rfft-table route:
        half the MXU stream for the one-sided sum)."""
        from godsp_tpu import window as win
        from godsp_tpu.ops import pallas_pwelch as pw

        if not pw.rfft_supported_size(pad):
            pytest.skip("pad outside the rfft kernel range here")
        rng = np.random.default_rng(nfft + pad + stride)
        segs = 23
        L = (segs - 1) * stride + nfft
        x = jnp.asarray(rng.normal(size=L).astype(np.float32))
        w = jnp.asarray(win.window_table_np("hann", pad), jnp.float32)
        try:
            pw.set_packed_half_enabled(True)
            a = np.asarray(pw.pwelch_power_sum(
                x, w, nfft, stride, segs, pad=pad, interpret=True))
            pw.set_packed_half_enabled(False)
            b = np.asarray(pw.pwelch_power_sum(
                x, w, nfft, stride, segs, pad=pad, interpret=True))
        finally:
            pw.set_packed_half_enabled(True)
        assert a.shape == b.shape == (pad // 2 + 1,)
        assert snr_db(a, b.astype(np.float64)) >= 120.0

    @pytest.mark.parametrize(
        "nfft,pad,stride,batched",
        [(256, 256, 128, False),      # m=2, the bench shape class
         (1024, 1024, 256, False),    # m=4 (hrows rounds 3 -> 8)
         (1024, 1024, 128, False),    # m=8
         (256, 512, 128, False),      # pad > nfft through 2-D framing
         (256, 256, 256, False),      # m=1: no halo rows at all
         (1024, 1024, 384, False),    # stride !| nfft: row-concat slice
         (1024, 1024, 512, True)],    # leading dims (R > 1 prep branch)
    )
    def test_framing_2d_matches_row(self, nfft, pad, stride, batched):
        """The 2-D-block framing path (round 5: (bt, stride) rows +
        sublane rolls, fixing the 5x single-sublane DMA waste of flat
        (1, T) blocks) must be BIT-IDENTICAL to the row path — same
        frames, same tables, same contraction order."""
        from godsp_tpu import window as win
        from godsp_tpu.ops import pallas_pwelch as pw

        assert pw._framing_2d_eligible(nfft, stride)
        rng = np.random.default_rng(nfft + pad + stride)
        segs = 21
        L = (segs - 1) * stride + nfft
        shape = (3, L) if batched else (L,)
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        w = jnp.asarray(win.window_table_np("hann", pad), jnp.float32)
        mask = jnp.ones(shape[:-1] + (segs,), jnp.float32)
        try:
            pw.set_framing_2d_enabled(True)
            a = np.asarray(pw.pwelch_power_partials(
                x, mask, w, nfft, stride, pad=pad, interpret=True))
            pw.set_framing_2d_enabled(False)
            b = np.asarray(pw.pwelch_power_partials(
                x, mask, w, nfft, stride, pad=pad, interpret=True))
        finally:
            pw.set_framing_2d_enabled(True)
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize(
        "nfft,pad,stride,bt",
        [(1024, 1024, 160, 256),   # P=4: the speech hop (10 ms @ 16 kHz)
         (1024, 1024, 320, 64),    # P=2
         (256, 256, 48, 64),       # P=8, nfft spans multiple rows
         (1024, 2048, 160, 32)],   # pad > nfft through the 2dp path
    )
    def test_framing_2dp_matches_row(self, nfft, pad, stride, bt):
        """Phase-class 2-D framing (round 5: per-class lane rolls over
        (rpt, P*stride) rows) must be BIT-IDENTICAL to the flat-row
        phase-class path."""
        from godsp_tpu import window as win
        from godsp_tpu.ops import pallas_pwelch as pw

        assert pw.framing_mode(nfft, stride, bt) == "2dp"
        rng = np.random.default_rng(nfft + stride)
        segs = 3 * bt + 5  # partial last tile
        L = (segs - 1) * stride + nfft
        x = jnp.asarray(rng.normal(size=L).astype(np.float32))
        w = jnp.asarray(win.window_table_np("hann", pad), jnp.float32)
        mask = jnp.ones((segs,), jnp.float32)
        try:
            pw.set_framing_2d_enabled(True)
            a = np.asarray(pw.pwelch_power_partials(
                x, mask, w, nfft, stride, pad=pad, segs_per_tile=bt,
                interpret=True))
            pw.set_framing_2d_enabled(False)
            b = np.asarray(pw.pwelch_power_partials(
                x, mask, w, nfft, stride, pad=pad, segs_per_tile=bt,
                interpret=True))
        finally:
            pw.set_framing_2d_enabled(True)
        np.testing.assert_array_equal(a, b)

    def test_mel_traced_filterbank(self):
        """fb arrives as a TRACED array when models.mel runs under jit
        (the bench chain does): the packed-order filterbank construction
        must use jnp ops, never np.asarray(fb) (regression: round-5's
        first packed-fb build raised TracerArrayConversionError inside
        the bench's jitted mel chain)."""
        import jax

        from godsp_tpu import window as win
        from godsp_tpu.ops.pallas_stft import stft_pallas

        nfft = pad = 256
        stride, segs = 128, 21
        L = (segs - 1) * stride + nfft
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=L).astype(np.float32))
        w = jnp.asarray(win.window_table_np("hann", pad), jnp.float32)
        fb_host = rng.random((12, pad // 2 + 1)).astype(np.float32)

        @jax.jit
        def run(xx, fb):
            return stft_pallas(
                xx, w, nfft, stride, segs, out="mel", fb=fb,
                interpret=True,
            )

        got = np.asarray(run(x, jnp.asarray(fb_host)))
        want = np.asarray(stft_pallas(
            x, w, nfft, stride, segs, out="mel", fb=fb_host,
            interpret=True,
        ))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    @pytest.mark.parametrize("stride", [128, 48])
    def test_mel_packed_half_matches_full(self, stride):
        """The mel kernel's half-Hermitian route (round 5: packed rfft
        tables + a packed-order filterbank) vs the full contraction —
        same filterbank weights land on the same bins."""
        from godsp_tpu import window as win
        from godsp_tpu.ops import pallas_pwelch as pw
        from godsp_tpu.ops.pallas_stft import stft_pallas

        nfft = pad = 256
        segs = 70 if stride == 48 else 21
        L = (segs - 1) * stride + nfft
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=L).astype(np.float32))
        w = jnp.asarray(win.window_table_np("hann", pad), jnp.float32)
        fb = jnp.asarray(rng.random((12, pad // 2 + 1)).astype(np.float32))
        try:
            pw.set_packed_half_enabled(True)
            a = np.asarray(stft_pallas(
                x, w, nfft, stride, segs, out="mel", fb=fb, interpret=True))
            pw.set_packed_half_enabled(False)
            b = np.asarray(stft_pallas(
                x, w, nfft, stride, segs, out="mel", fb=fb, interpret=True))
        finally:
            pw.set_packed_half_enabled(True)
        assert snr_db(a, b.astype(np.float64)) >= 120.0

    @pytest.mark.parametrize("stride", [128, 48])
    @pytest.mark.parametrize("kernel", ["stft", "mel", "csd"])
    def test_framing_2d_matches_row_stft_csd(self, kernel, stride):
        """The shared 2-D framing must be bit-identical to row framing
        through EVERY consumer kernel (round-5 refactor: stft/
        spectrogram/mel and csd ride the same framing_blocks as
        pwelch).  stride=48 exercises the phase-class (2dp) mode with
        its per-frame output un-permutation."""
        from godsp_tpu import window as win
        from godsp_tpu.ops import pallas_pwelch as pw
        from godsp_tpu.ops.pallas_csd import csd_power_partials
        from godsp_tpu.ops.pallas_stft import stft_pallas

        nfft = pad = 256
        segs = 70 if stride == 48 else 21
        L = (segs - 1) * stride + nfft
        rng = np.random.default_rng(99)
        x = jnp.asarray(rng.normal(size=L).astype(np.float32))
        y = jnp.asarray(rng.normal(size=L).astype(np.float32))
        w = jnp.asarray(win.window_table_np("hann", pad), jnp.float32)
        mask = jnp.ones((segs,), jnp.float32)
        fb = jnp.asarray(rng.random((12, pad // 2 + 1)).astype(np.float32))

        def run():
            if kernel == "stft":
                return np.asarray(stft_pallas(
                    x, w, nfft, stride, segs, out="power", interpret=True))
            if kernel == "mel":
                return np.asarray(stft_pallas(
                    x, w, nfft, stride, segs, out="mel", fb=fb,
                    interpret=True))
            re, im = csd_power_partials(
                x, y, mask, w, nfft, stride, interpret=True)
            return np.asarray(re) + 1j * np.asarray(im)

        try:
            pw.set_framing_2d_enabled(True)
            a = run()
            pw.set_framing_2d_enabled(False)
            b = run()
        finally:
            pw.set_framing_2d_enabled(True)
        np.testing.assert_array_equal(a, b)

    def test_framing_2d_eligibility(self):
        from godsp_tpu.ops import pallas_pwelch as pw

        assert pw._framing_2d_eligible(1024, 512)
        assert pw._framing_2d_eligible(1024, 128)
        # stride does not divide nfft: still 2-D via the lane-slice of
        # ceil(nfft/stride) concatenated rows (nfft % 128 == 0)
        assert pw._framing_2d_eligible(1024, 384)
        assert not pw._framing_2d_eligible(1024, 160)  # stride % 128 != 0
        assert pw._halo_rows(1024, 512) == 8           # m-1=1 -> 8
        assert pw._halo_rows(1024, 128) == 8           # m-1=7 -> 8
        assert pw._halo_rows(2048, 128) == 16          # m-1=15 -> 16
        assert pw._halo_rows(1024, 384) == 8           # m=ceil=3 -> 8
        assert pw._halo_rows(256, 256) == 0            # m=1: no halo

    def test_packed_layout_pin(self):
        """packed_to_natural_onesided inverts the documented packed
        layout: position j*128 + h*64 + q holds bin (2j+h) + n1*q, and
        the 128 extras lanes broadcast the Nyquist bin."""
        from godsp_tpu.ops.pallas_pwelch import packed_to_natural_onesided

        pad = 1024
        n1, nh = pad // 128, pad // 2
        packed = np.zeros(nh + 128, np.float32)
        for j in range(n1 // 2):
            for h in range(2):
                for q in range(64):
                    packed[j * 128 + h * 64 + q] = (2 * j + h) + n1 * q
        packed[nh:] = pad // 2  # Nyquist broadcast lanes
        nat = np.asarray(packed_to_natural_onesided(jnp.asarray(packed), pad))
        assert nat.shape == (nh + 1,)
        np.testing.assert_array_equal(nat, np.arange(nh + 1, dtype=np.float32))

    def test_packed_half_requires_rfft_pad(self):
        from godsp_tpu.ops import pallas_pwelch as pw

        x = jnp.zeros(16384 * 4, jnp.float32)
        m = jnp.ones(4, jnp.float32)
        w = jnp.ones(16384, jnp.float32)
        with pytest.raises(ValueError, match="packed_half"):
            pw.pwelch_power_partials(
                x, m, w, 16384, 16384, packed_half=True, interpret=True
            )

    def test_pad_gt_nfft_end_to_end(self, monkeypatch):
        """spectral.pwelch fused branch with pad>nfft == XLA path."""
        import importlib

        from jax.experimental.pallas import tpu as pltpu

        from godsp_tpu import spectral

        spwelch = importlib.import_module("godsp_tpu.spectral._pwelch_impl")
        rng = np.random.default_rng(12)
        opts = spectral.PwelchOptions(nfft=256, pad=1024, noverlap=128)
        x = rng.normal(size=10_000).astype(np.float32)
        ref, ref_f = spectral.pwelch(x, 2.0, opts)  # XLA path
        monkeypatch.setattr(
            spwelch, "fused_path_eligible", lambda nfft, pad, stride: True
        )
        with pltpu.force_tpu_interpret_mode():
            got, got_f = spectral.pwelch(x, 2.0, opts)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-12
        )
        np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f))


class TestPallasSTFT:
    """Fused STFT/spectrogram kernel vs the XLA models path."""

    def test_complex_matches_models_stft(self):
        from godsp_tpu.models._stft_impl import _stft_jit
        from godsp_tpu import window as win
        from godsp_tpu.ops.pallas_stft import stft_pallas

        rng = np.random.default_rng(20)
        nfft, hop = 256, 128
        L = hop * 30 + nfft
        x = rng.normal(size=L).astype(np.float32)
        w = jnp.asarray(win.window_table_np("hann", nfft), jnp.float32)
        ref = np.asarray(_stft_jit(jnp.asarray(x), w, nfft, hop, nfft, True))
        n_frames = (L - nfft) // hop + 1
        got = np.asarray(
            stft_pallas(jnp.asarray(x), w, nfft, hop, n_frames, interpret=True)
        )
        assert got.shape == ref.shape == (n_frames, 129)
        assert snr_db(got, ref) >= 100.0

    def test_power_matches(self):
        from godsp_tpu import window as win
        from godsp_tpu.ops.pallas_stft import stft_pallas

        rng = np.random.default_rng(21)
        nfft = hop = 256
        L = 256 * 9
        x = rng.normal(size=L).astype(np.float32)
        w = jnp.asarray(win.window_table_np("hamming", nfft), jnp.float32)
        p = np.asarray(
            stft_pallas(jnp.asarray(x), w, nfft, hop, 9, out="power", interpret=True)
        )
        w64 = np.asarray(win.window_table_np("hamming", nfft))
        for s in range(9):
            fr = x[s * 256 : (s + 1) * 256].astype(np.float64)
            ref = np.abs(np.fft.fft(fr * w64)[:129]) ** 2
            assert snr_db(p[s], ref) >= 95.0

    def test_natural_kernel_bit_exact(self):
        """In-kernel natural emission == digit kernel + XLA transpose."""
        import godsp_tpu.ops.pallas_fft as pf
        from godsp_tpu.ops.pallas_stft import stft_pallas
        from godsp_tpu import window as win

        rng = np.random.default_rng(41)
        nfft, hop = 256, 128
        x = jnp.asarray(rng.normal(size=hop * 20 + nfft).astype(np.float32))
        w = jnp.asarray(win.window_table_np("hann", nfft), jnp.float32)
        n_frames = 20 + 1
        kw = dict(interpret=True)
        s1 = stft_pallas(x, w, nfft, hop, n_frames, **kw)
        p1 = stft_pallas(x, w, nfft, hop, n_frames, out="power", **kw)
        pf.set_natural_fused(False)
        try:
            s0 = stft_pallas(x, w, nfft, hop, n_frames, **kw)
            p0 = stft_pallas(x, w, nfft, hop, n_frames, out="power", **kw)
        finally:
            pf.set_natural_fused(True)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))

    def test_pad_gt_nfft_window_semantics(self):
        """models.stft pads AFTER windowing: the fused path must match
        the XLA path exactly (nfft window zero-extended to pad)."""
        from godsp_tpu.models._stft_impl import _fused_window, _stft_jit
        from godsp_tpu import window as win
        from godsp_tpu.ops.pallas_stft import stft_pallas

        rng = np.random.default_rng(22)
        nfft, hop, pad = 256, 128, 512
        L = 128 * 20 + 256
        x = rng.normal(size=L).astype(np.float32)
        w = jnp.asarray(win.window_table_np("hann", nfft), jnp.float32)
        ref = np.asarray(_stft_jit(jnp.asarray(x), w, nfft, hop, pad, True))
        n_frames = (L - nfft) // hop + 1
        got = np.asarray(
            stft_pallas(
                jnp.asarray(x), _fused_window(w, pad), nfft, hop, n_frames,
                pad=pad, interpret=True,
            )
        )
        assert got.shape == ref.shape
        assert snr_db(got, ref) >= 100.0

    def test_batched(self):
        from godsp_tpu import window as win
        from godsp_tpu.ops.pallas_stft import stft_pallas

        rng = np.random.default_rng(23)
        x = rng.normal(size=(2, 3, 2048)).astype(np.float32)
        w = jnp.asarray(win.window_table_np("hann", 256), jnp.float32)
        got = stft_pallas(jnp.asarray(x), w, 256, 128, 15, interpret=True)
        assert got.shape == (2, 3, 15, 129)

    def test_errors(self):
        from godsp_tpu.ops.pallas_stft import stft_pallas

        x = jnp.zeros(2048, jnp.float32)
        w = jnp.zeros(256, jnp.float32)
        with pytest.raises(ValueError, match="unknown out"):
            stft_pallas(x, w, 256, 128, 4, out="x", interpret=True)
        with pytest.raises(ValueError, match="unsupported"):
            stft_pallas(x, w, 100, 50, 4, interpret=True)


class TestDigitOrderChain:
    """ifft_pow2_digit_split + the zero-reorder convolve chain."""

    def test_digit_inverse_roundtrip(self):
        from godsp_tpu.ops.pallas_fft import ifft_pow2_digit_split

        rng = np.random.default_rng(30)
        n = 512
        x = (rng.normal(size=(4, n)) + 1j * rng.normal(size=(4, n))).astype(
            np.complex64
        )
        yr, yi = fft_pow2_split(*_split(x), order="digit", interpret=True)
        zr, zi = ifft_pow2_digit_split(yr, yi, interpret=True)
        back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
        assert snr_db(back, x) >= 120.0

    def test_pow2_convolve_matches_numpy(self):
        from godsp_tpu.fft import pow2

        rng = np.random.default_rng(31)
        n = 1024
        x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex128)
        y = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex128)
        got = np.asarray(pow2.pow2_convolve(jnp.asarray(x), jnp.asarray(y))) / n
        ref = np.fft.ifft(np.fft.fft(x) * np.fft.fft(y))
        assert snr_db(got, ref) >= 200.0  # f64 four-step path on CPU

    def test_pow2_convolve2_digit_chain(self):
        """The 2-D separable digit-order chain (pow2_convolve2's Pallas
        path, exercised via interpret-mode kernels) matches numpy."""
        from godsp_tpu.ops.pallas_fft import (
            fft_pow2_split,
            ifft_pow2_digit_split,
        )

        rng = np.random.default_rng(37)
        n1, n2 = 256, 512
        x = rng.normal(size=(n1, n2)) + 1j * rng.normal(size=(n1, n2))
        y = rng.normal(size=(n1, n2)) + 1j * rng.normal(size=(n1, n2))

        def fwd2(c):
            r, i = fft_pow2_split(
                jnp.asarray(c.real, jnp.float32),
                jnp.asarray(c.imag, jnp.float32),
                order="digit", interpret=True,
            )
            r, i = r.swapaxes(-1, -2), i.swapaxes(-1, -2)
            return fft_pow2_split(r, i, order="digit", interpret=True)

        xr, xi = fwd2(x)
        yr, yi = fwd2(y)
        pr = xr * yr - xi * yi
        pi = xr * yi + xi * yr
        zr, zi = ifft_pow2_digit_split(pr, pi, scale=1.0 / n1, interpret=True)
        zr, zi = zr.swapaxes(-1, -2), zi.swapaxes(-1, -2)
        zr, zi = ifft_pow2_digit_split(zr, zi, scale=1.0 / n2, interpret=True)
        got = np.asarray(zr) + 1j * np.asarray(zi)
        ref = np.fft.ifft2(np.fft.fft2(x) * np.fft.fft2(y))
        assert snr_db(got, ref) >= 120.0

    def test_digit_errors(self):
        from godsp_tpu.ops.pallas_fft import ifft_pow2_digit_split

        z = jnp.zeros((2, 256), jnp.float32)
        with pytest.raises(ValueError, match="identical shapes"):
            ifft_pow2_digit_split(z, jnp.zeros((3, 256), jnp.float32))
        with pytest.raises(ValueError, match="unsupported FFT size"):
            ifft_pow2_digit_split(jnp.zeros((2, 100)), jnp.zeros((2, 100)))

    def test_mel_output(self):
        """Fused mel contraction == power @ fb.T (interpret mode)."""
        from godsp_tpu import window as win
        from godsp_tpu.models.mel import mel_filterbank
        from godsp_tpu.ops.pallas_stft import stft_pallas

        rng = np.random.default_rng(40)
        nfft = hop = 256
        segs = 10
        x = rng.normal(size=hop * (segs - 1) + nfft).astype(np.float32)
        w = jnp.asarray(win.window_table_np("hann", nfft), jnp.float32)
        fb = mel_filterbank(40, nfft, 8000.0)
        m = np.asarray(
            stft_pallas(jnp.asarray(x), w, nfft, hop, segs, out="mel",
                        fb=fb, interpret=True)
        )
        p = np.asarray(
            stft_pallas(jnp.asarray(x), w, nfft, hop, segs, out="power",
                        interpret=True)
        )
        ref = p @ np.asarray(fb, np.float64).T
        assert m.shape == (segs, 40)
        assert snr_db(m, ref) >= 100.0

    def test_mel_requires_fb(self):
        from godsp_tpu.ops.pallas_stft import stft_pallas

        with pytest.raises(ValueError, match="requires fb"):
            stft_pallas(jnp.zeros(2048, jnp.float32), jnp.zeros(256), 256, 256,
                        4, out="mel", interpret=True)


class TestSemiFused:
    """Odd-geometry paths route through the fused kernel at stride==nfft
    on pre-framed data (forced via interpret + eligibility patch)."""

    def test_pwelch_from_frames_fused_matches_xla(self, monkeypatch):
        import importlib

        from jax.experimental.pallas import tpu as pltpu

        from godsp_tpu import spectral

        spwelch = importlib.import_module("godsp_tpu.spectral._pwelch_impl")
        rng = np.random.default_rng(50)
        nfft, noverlap = 256, 100  # stride 156: not kernel-frameable
        opts = spectral.PwelchOptions(nfft=nfft, noverlap=noverlap)
        x = rng.normal(size=10_000).astype(np.float32)
        ref, _ = spectral.pwelch(x, 2.0, opts)  # XLA path

        monkeypatch.setattr(
            spwelch, "fused_path_eligible",
            lambda nf, pd, st: st == nf,  # only the frames-stream form
        )
        with pltpu.force_tpu_interpret_mode():
            got, _ = spectral.pwelch(x, 2.0, opts)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-12
        )

    def test_stft_odd_hop_fused_matches_xla(self, monkeypatch):
        import importlib

        from jax.experimental.pallas import tpu as pltpu

        mstft = importlib.import_module("godsp_tpu.models._stft_impl")
        rng = np.random.default_rng(51)
        x = rng.normal(size=5000).astype(np.float32)
        ref = np.asarray(mstft.stft(x, 256, hop=100))  # XLA path

        monkeypatch.setattr(
            mstft, "_fused_stft_eligible", lambda nf, pd, st: st == nf
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(mstft.stft(x, 256, hop=100))
        assert got.shape == ref.shape
        assert snr_db(got, ref) >= 100.0


class TestFusedGeometryFuzz:
    """Randomized geometry sweep of the fused Welch kernel vs a
    straightforward float64 reference (seeded, interpret mode)."""

    def test_random_geometries(self):
        from godsp_tpu import window as win

        rng = np.random.default_rng(2026)
        cases = 0
        for _ in range(12):
            nfft = int(rng.choice([256, 512, 1024]))
            # Lane-aligned strides plus phase-class (stride % 16 == 0)
            # ones: audio hops 160/320/480 and gcd=16/32 stress cases.
            candidates = [128, 256, 512, 1024, 48, 96, 160, 208, 320, 480]
            from godsp_tpu.ops.pallas_pwelch import fused_supported

            ok = [d for d in candidates if fused_supported(nfft, nfft, d)]
            stride = int(rng.choice(ok))
            pad = int(nfft * rng.choice([1, 2]))
            segs = int(rng.integers(1, 40))
            extra = int(rng.integers(0, stride))  # ragged tail beyond last seg
            L = (segs - 1) * stride + nfft + extra
            x = rng.normal(size=L).astype(np.float32)
            w = jnp.asarray(win.window_table_np("hann", pad), jnp.float32)
            got = np.asarray(
                pwelch_power_sum(
                    jnp.asarray(x), w, nfft, stride, segs, pad=pad, interpret=True
                )
            )
            w64 = np.asarray(win.window_table_np("hann", pad))
            lp = pad // 2 + 1
            ref = np.zeros(lp)
            for s in range(segs):
                fr = np.zeros(pad)
                fr[:nfft] = x[s * stride : s * stride + nfft].astype(np.float64)
                ref += np.abs(np.fft.fft(fr * w64)[:lp]) ** 2
            assert snr_db(got, ref) >= 95.0, (nfft, stride, pad, segs, L)
            cases += 1
        assert cases == 12

    def test_phase_class_strides(self):
        """Non-lane-aligned strides (stride % 128 != 0) run fully fused
        via phase-class framing; exact vs the float64 reference loop."""
        from godsp_tpu import window as win

        rng = np.random.default_rng(160)
        for nfft, stride, pad in (
            (1024, 160, 1024),  # the VERDICT example geometry (P=4)
            (512, 320, 512),    # P=2
            (256, 48, 512),     # P=8, gcd=16, pad > nfft
            (1024, 480, 1024),  # P=4
        ):
            segs = 23
            L = (segs - 1) * stride + nfft + 37
            x = rng.normal(size=L).astype(np.float32)
            w = jnp.asarray(win.window_table_np("hann", pad), jnp.float32)
            got = np.asarray(
                pwelch_power_sum(
                    jnp.asarray(x), w, nfft, stride, segs, pad=pad, interpret=True
                )
            )
            w64 = np.asarray(win.window_table_np("hann", pad))
            lp = pad // 2 + 1
            ref = np.zeros(lp)
            for s in range(segs):
                fr = np.zeros(pad)
                fr[:nfft] = x[s * stride : s * stride + nfft].astype(np.float64)
                ref += np.abs(np.fft.fft(fr * w64)[:lp]) ** 2
            assert snr_db(got, ref) >= 95.0, (nfft, stride, pad)

    def test_phase_class_stft_order(self):
        """Per-frame outputs are un-permuted back to segment order."""
        from godsp_tpu import window as win
        from godsp_tpu.ops.pallas_stft import stft_pallas

        rng = np.random.default_rng(161)
        nfft, stride, segs = 256, 160, 21
        L = (segs - 1) * stride + nfft
        x = rng.normal(size=L).astype(np.float32)
        w = jnp.asarray(win.window_table_np("hann", nfft), jnp.float32)
        got = np.asarray(
            stft_pallas(
                jnp.asarray(x), w, nfft, stride, segs, out="power",
                interpret=True,
            )
        )
        w64 = np.asarray(win.window_table_np("hann", nfft))
        lp = nfft // 2 + 1
        for s in range(segs):
            fr = x[s * stride : s * stride + nfft].astype(np.float64)
            ref = np.abs(np.fft.fft(fr * w64)[:lp]) ** 2
            assert snr_db(got[s], ref) >= 95.0, s


class TestPallasCSD:
    def test_matches_generic_csd(self):
        """Fused conj(X)Y kernel == the generic spectral path."""
        from godsp_tpu import window as win
        from godsp_tpu.ops.pallas_csd import csd_power_partials
        from godsp_tpu.ops.pallas_pwelch import digit_to_natural_bins

        rng = np.random.default_rng(60)
        nfft, stride = 256, 128
        segs = 17
        L = (segs - 1) * stride + nfft
        x = rng.normal(size=L).astype(np.float32)
        y = (0.5 * np.roll(x, 7) + 0.5 * rng.normal(size=L)).astype(np.float32)
        w = jnp.asarray(win.window_table_np("hann", nfft), jnp.float32)
        mask = jnp.ones(segs, jnp.float32)
        re_p, im_p = csd_power_partials(
            jnp.asarray(x), jnp.asarray(y), mask, w, nfft, stride, interpret=True
        )
        re = np.asarray(digit_to_natural_bins(re_p.sum(-2), nfft))[: nfft // 2 + 1]
        im = np.asarray(digit_to_natural_bins(im_p.sum(-2), nfft))[: nfft // 2 + 1]

        w64 = np.asarray(win.window_table_np("hann", nfft))
        lp = nfft // 2 + 1
        ref = np.zeros(lp, np.complex128)
        for s in range(segs):
            X = np.fft.fft(x[s*stride:s*stride+nfft].astype(np.float64) * w64)[:lp]
            Y = np.fft.fft(y[s*stride:s*stride+nfft].astype(np.float64) * w64)[:lp]
            ref += np.conj(X) * Y
        got = re + 1j * im
        assert snr_db(got, ref) >= 95.0

    def test_spectral_csd_fused_end_to_end(self, monkeypatch):
        import importlib

        from jax.experimental.pallas import tpu as pltpu

        from godsp_tpu import spectral

        spwelch = importlib.import_module("godsp_tpu.spectral._pwelch_impl")
        rng = np.random.default_rng(61)
        opts = spectral.PwelchOptions(nfft=256, noverlap=128)
        x = rng.normal(size=8000).astype(np.float32)
        y = (x * 0.3 + rng.normal(size=8000)).astype(np.float32)
        ref, _ = spectral.csd(x, y, 2.0, opts)  # generic path on CPU
        monkeypatch.setattr(
            spwelch, "fused_path_eligible", lambda nf, pd, st: True
        )
        with pltpu.force_tpu_interpret_mode():
            got, _ = spectral.csd(x, y, 2.0, opts)
        np.testing.assert_allclose(
            np.asarray(got.real), np.asarray(ref.real), rtol=3e-4, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(got.imag), np.asarray(ref.imag), rtol=3e-4, atol=1e-10
        )

    def test_errors(self):
        from godsp_tpu.ops.pallas_csd import csd_power_partials

        x = jnp.zeros(1024, jnp.float32)
        m = jnp.ones(4, jnp.float32)
        w = jnp.ones(256, jnp.float32)
        with pytest.raises(ValueError, match="identical shapes"):
            csd_power_partials(x, jnp.zeros(512, jnp.float32), m, w, 256, 256,
                               interpret=True)
        with pytest.raises(ValueError, match="unsupported"):
            csd_power_partials(x, x, m, w, 100, 100, interpret=True)


class TestPallasISTFT:
    """Fused ISTFT (IFFT + window + matmul overlap-add) vs oracles."""

    @staticmethod
    def _oracle(spec, w, nfft, hop):
        """float64 windowed overlap-add of inverse FFTs (un-normalized)."""
        F = spec.shape[0]
        frames = np.fft.ifft(spec, axis=-1).real[:, :nfft]
        y = np.zeros((F - 1) * hop + nfft)
        for f in range(F):
            y[f * hop : f * hop + nfft] += w * frames[f]
        return y

    @staticmethod
    def _to_digit(p, pad):
        n1 = pad // 128
        lead = p.shape[:-1]
        return np.ascontiguousarray(
            p.reshape(*lead, 128, n1).swapaxes(-1, -2).reshape(*lead, pad)
        )

    # geometries: 50% overlap, m=1 (hop==pad==2*nfft), pad>nfft with m=3,
    # deep zero-extension, and a ragged final tile (F=9 < bt rounding)
    # final case: deep overlap where m-1 = nfft/hop - 1 exceeds the
    # F-clamped tile size (the bt >= m-1 stitch floor regression)
    @pytest.mark.parametrize(
        "nfft,pad,hop,F",
        [(256, 256, 128, 40), (256, 512, 256, 17), (384, 512, 128, 10),
         (128, 1024, 128, 9), (2048, 2048, 128, 8)],
    )
    def test_kernel_vs_numpy(self, nfft, pad, hop, F):
        from godsp_tpu.ops.pallas_istft import (
            istft_fused_supported,
            istft_overlap_add,
        )

        assert istft_fused_supported(nfft, pad, hop)
        rng = np.random.default_rng(nfft + hop)
        spec = rng.normal(size=(F, pad)) + 1j * rng.normal(size=(F, pad))
        spec = np.fft.fft(np.fft.ifft(spec).real)  # conjugate-symmetric
        w = rng.normal(size=nfft) ** 2
        sr = jnp.asarray(self._to_digit(spec.real, pad).astype(np.float32))
        si = jnp.asarray(self._to_digit(spec.imag, pad).astype(np.float32))
        y = istft_overlap_add(
            sr, si, jnp.asarray(w, jnp.float32), nfft, hop, interpret=True
        )
        ref = self._oracle(spec, w, nfft, hop)
        assert y.shape == ref.shape
        assert snr_db(np.asarray(y), ref) >= 120.0

    def test_batched_lead_dims(self):
        from godsp_tpu.ops.pallas_istft import istft_overlap_add

        nfft = pad = 256
        hop, F = 128, 12
        rng = np.random.default_rng(7)
        spec = rng.normal(size=(2, 3, F, pad)) + 1j * rng.normal(
            size=(2, 3, F, pad)
        )
        spec = np.fft.fft(np.fft.ifft(spec).real)
        w = np.hanning(nfft)
        sr = jnp.asarray(self._to_digit(spec.real, pad).astype(np.float32))
        si = jnp.asarray(self._to_digit(spec.imag, pad).astype(np.float32))
        y = np.asarray(
            istft_overlap_add(
                sr, si, jnp.asarray(w, jnp.float32), nfft, hop, interpret=True
            )
        )
        assert y.shape == (2, 3, (F - 1) * hop + nfft)
        for b in range(2):
            for c in range(3):
                ref = self._oracle(spec[b, c], w, nfft, hop)
                assert snr_db(y[b, c], ref) >= 120.0

    def test_natural_in_bit_exact(self):
        """natural_in (in-kernel MXU permute) == digit input path."""
        from godsp_tpu.ops.pallas_istft import istft_overlap_add

        nfft, pad, hop, F = 384, 512, 128, 10
        rng = np.random.default_rng(31)
        spec = rng.normal(size=(F, pad)) + 1j * rng.normal(size=(F, pad))
        spec = np.fft.fft(np.fft.ifft(spec).real)
        w = rng.normal(size=nfft) ** 2
        wj = jnp.asarray(w, jnp.float32)
        y_dig = istft_overlap_add(
            jnp.asarray(self._to_digit(spec.real, pad).astype(np.float32)),
            jnp.asarray(self._to_digit(spec.imag, pad).astype(np.float32)),
            wj, nfft, hop, interpret=True,
        )
        y_nat = istft_overlap_add(
            jnp.asarray(spec.real.astype(np.float32)),
            jnp.asarray(spec.imag.astype(np.float32)),
            wj, nfft, hop, interpret=True, natural_in=True,
        )
        np.testing.assert_array_equal(np.asarray(y_dig), np.asarray(y_nat))

    def test_istft_fused_end_to_end(self, monkeypatch):
        """models.istft via the fused kernel == the XLA _istft_jit path,
        and both reconstruct the input (NOLA round-trip)."""
        import importlib

        from jax.experimental.pallas import tpu as pltpu

        mstft = importlib.import_module("godsp_tpu.models._stft_impl")
        rng = np.random.default_rng(70)
        nfft, hop = 256, 128
        x = rng.normal(size=hop * 40 + nfft).astype(np.float32)
        s = mstft.stft(x, nfft, hop=hop, window="hann")
        ref = np.asarray(mstft.istft(s, nfft, hop=hop, window="hann"))
        monkeypatch.setattr(
            mstft, "_istft_fused_eligible", lambda nf, pd, st: True
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(mstft.istft(s, nfft, hop=hop, window="hann"))
        assert got.shape == ref.shape
        # Edge samples divide by a near-zero NOLA denominator (hann
        # starts at 0), amplifying the kernel's f32 noise; compare the
        # interior tightly and the full signal at the amplified bound.
        assert snr_db(got[nfft:-nfft], ref[nfft:-nfft]) >= 100.0
        assert snr_db(got, ref) >= 90.0
        # Hann is zero at its endpoints: the first/last covered sample
        # has zero synthesis weight and is unrecoverable (same exclusion
        # as tests/test_models.py roundtrips).
        assert snr_db(got[1:-1], np.asarray(x, got.dtype)[1:-1]) >= 90.0

    def test_errors(self):
        from godsp_tpu.ops.pallas_istft import istft_overlap_add

        sr = jnp.zeros((4, 256), jnp.float32)
        w = jnp.ones(256, jnp.float32)
        with pytest.raises(ValueError, match="identical shapes"):
            istft_overlap_add(sr, jnp.zeros((4, 512), jnp.float32), w, 256, 128)
        with pytest.raises(ValueError, match="unsupported"):
            istft_overlap_add(sr, sr, w, 256, 100)


class TestFusedScipyWelch:
    """The scipy-convention welch's fused route (_welch_fused): the
    zero-extended periodic window in the kernel's pad-length slot must
    reproduce scipy's window-then-pad semantics (interpret mode)."""

    @pytest.mark.parametrize("geom", [(1024, 512, 1024), (256, 128, 256),
                                      (512, 0, 1024)])
    def test_matches_scipy(self, geom):
        import scipy.signal as ss

        from godsp_tpu.spectral._welch_impl import _periodic_table_np, _welch_fused

        nperseg, nover, nfft = geom
        rng = np.random.default_rng(0)
        x = rng.normal(size=8192).astype(np.float32)
        wt = _periodic_table_np("hann", nperseg)
        stride = nperseg - nover
        scale = 1.0 / (2.0 * np.sum(wt * wt))
        got = np.asarray(_welch_fused(
            jnp.asarray(x), wt, nperseg, nfft, stride,
            jnp.float32(scale), jnp.float32, interpret=True))
        _, ref = ss.welch(x.astype(np.float64), fs=2.0, window="hann",
                          nperseg=nperseg, noverlap=nover, nfft=nfft,
                          detrend=False)
        assert snr_db(got, ref) >= 120.0


class TestFusedScipySpectrogram:
    """spectrogram_scipy's fused route: per-segment powers through the
    fused STFT kernel with the zero-extended periodic window."""

    @pytest.mark.parametrize("geom", [(1024, 512, 1024), (256, 128, 512)])
    def test_matches_scipy(self, geom):
        import scipy.signal as ss

        from godsp_tpu.spectral._welch_impl import (_periodic_table_np,
                                              _spectrogram_fused_jit)

        nperseg, nover, nfft = geom
        rng = np.random.default_rng(0)
        x = rng.normal(size=8192).astype(np.float32)
        wt = _periodic_table_np(("tukey", 0.25), nperseg)
        step = nperseg - nover
        w_ext = np.zeros(nfft)
        w_ext[:nperseg] = wt
        n_frames = (len(x) - nperseg) // step + 1
        scale = 1.0 / (2.0 * np.sum(wt * wt))
        sxx = np.asarray(_spectrogram_fused_jit(
            jnp.asarray(x), jnp.asarray(w_ext, jnp.float32),
            jnp.float32(scale), nperseg, nfft, step, n_frames,
            interpret=True))
        _, _, ref = ss.spectrogram(x.astype(np.float64), fs=2.0,
                                   nperseg=nperseg, noverlap=nover,
                                   nfft=nfft, detrend=False)
        assert sxx.shape == ref.shape
        assert snr_db(sxx, ref) >= 120.0


class TestFusedScipyCsd:
    """welch_csd's fused route: conj(X)*Y through the cross-spectral
    kernel with the zero-extended periodic window."""

    @pytest.mark.parametrize("geom", [(1024, 512, 1024), (256, 128, 512)])
    def test_matches_scipy(self, geom):
        import scipy.signal as ss

        from godsp_tpu.spectral._welch_impl import (_csd_fused_jit,
                                              _periodic_table_np)

        nperseg, nover, nfft = geom
        rng = np.random.default_rng(0)
        x = rng.normal(size=8192).astype(np.float32)
        y = (0.6 * x + 0.4 * rng.normal(size=8192)).astype(np.float32)
        wt = _periodic_table_np("hann", nperseg)
        stride = nperseg - nover
        w_ext = np.zeros(nfft)
        w_ext[:nperseg] = wt
        scale = 1.0 / (2.0 * np.sum(wt * wt))
        pxy = np.asarray(_csd_fused_jit(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(w_ext, jnp.float32),
            jnp.float32(scale), nperseg, nfft, stride, interpret=True))
        _, ref = ss.csd(x.astype(np.float64), y.astype(np.float64), fs=2.0,
                        nperseg=nperseg, noverlap=nover, nfft=nfft,
                        detrend=False)
        assert snr_db(pxy, ref) >= 120.0


def random_pwelch_geometries(seed: int, count: int):
    """Randomized (nfft, pad, stride, segs, L) Welch geometries spanning
    the fused kernel's gate (VERDICT r3 item 8): lane-aligned strides,
    phase-class strides (% 16), ineligible strides, and ineligible nfft.
    Deterministic in seed; tools/chip_validate.py carries the same
    generator for the on-chip sweep."""
    rng = np.random.default_rng(seed)
    cfgs = []
    while len(cfgs) < count:
        pad = int(rng.choice([256, 512, 1024, 2048]))
        nfft = 128 * int(rng.integers(1, pad // 128 + 1))
        kind = int(rng.integers(0, 4))
        if kind == 0:  # lane-aligned divisor strides
            stride = int(rng.choice([s for s in (64, 128, 256, 512)
                                     if s <= nfft]))
        elif kind == 1:  # phase-class strides
            stride = 16 * int(rng.integers(1, nfft // 16 + 1))
        elif kind == 2:  # ineligible stride
            stride = int(rng.integers(1, nfft + 1))
            if stride % 16 == 0:
                stride += 1
        else:  # ineligible nfft (not a lane multiple)
            nfft = int(rng.integers(pad // 2, pad)) | 1
            stride = 16 * int(rng.integers(1, max(nfft // 16, 2)))
        segs = int(rng.integers(3, 18))
        tail = int(rng.integers(0, stride))
        L = (segs - 1) * stride + nfft + tail
        cfgs.append((nfft, pad, stride, segs, L))
    return cfgs


class TestPwelchGeometrySweep:
    """Randomized property sweep over fused-kernel geometries: eligible
    combos must match the f64 oracle through the fused kernel
    (interpret mode); ineligible combos must be rejected by the gate
    and served correctly by the XLA fallback (spectral.pwelch)."""

    def _oracle(self, x, nfft, pad, stride, segs, w_pad):
        lp = pad // 2 + 1
        acc = np.zeros(lp)
        x64 = np.asarray(x, np.float64)
        w64 = np.asarray(w_pad, np.float64)
        for s in range(segs):
            fr = np.zeros(pad)
            fr[:nfft] = x64[s * stride : s * stride + nfft]
            acc += np.abs(np.fft.fft(fr * w64)[:lp]) ** 2
        return acc

    def test_eligible_fused_vs_oracle(self):
        from godsp_tpu import window as win

        rng = np.random.default_rng(1234)
        tested = 0
        for nfft, pad, stride, segs, L in random_pwelch_geometries(42, 60):
            if not fused_supported(nfft, pad, stride):
                continue
            if tested >= 10:  # interpret-mode compiles dominate runtime
                break
            tested += 1
            x = rng.normal(size=L).astype(np.float32)
            w_pad = win.window_table_np("hann", pad)
            got = np.asarray(pwelch_power_sum(
                jnp.asarray(x), jnp.asarray(w_pad, jnp.float32),
                nfft, stride, segs, pad=pad, interpret=True,
            ))
            ref = self._oracle(x, nfft, pad, stride, segs, w_pad)
            assert snr_db(got, ref) >= 100.0, (nfft, pad, stride, segs, L)
        assert tested >= 5  # the generator must produce eligible combos

    def test_ineligible_rejected_and_fallback_correct(self):
        from godsp_tpu import spectral
        from godsp_tpu import window as win

        rng = np.random.default_rng(99)
        checked_gate = checked_fallback = 0
        for nfft, pad, stride, segs, L in random_pwelch_geometries(7, 60):
            if fused_supported(nfft, pad, stride):
                continue
            checked_gate += 1
            with pytest.raises(ValueError):
                pwelch_power_partials(
                    jnp.zeros((8, L), jnp.float32),
                    jnp.ones((8, segs), jnp.float32),
                    jnp.zeros(pad, jnp.float32), nfft, stride, pad=pad,
                    interpret=True,
                )
            # the public estimator must silently serve the geometry
            # through the XLA path (pad must stay a supported FFT size
            # for the public API, so only stride/nfft misfits checked)
            if checked_fallback < 4 and pad >= nfft:
                checked_fallback += 1
                x = rng.normal(size=L).astype(np.float64)
                opts = spectral.PwelchOptions(
                    nfft=nfft, noverlap=nfft - stride, pad=pad
                ) if stride <= nfft else None
                if opts is None:
                    continue
                p, freqs = spectral.pwelch(x, 2.0, opts)
                w_pad = win.window_table_np("hann", pad)
                acc = self._oracle(x, nfft, pad, stride, segs, w_pad)
                lp = pad // 2 + 1
                acc[1 : lp - 1] *= 2.0
                wn = win.window_table_np("hann", nfft)
                ref = acc / segs / (np.sum(wn * wn) * 2.0)
                assert snr_db(np.asarray(p), ref) >= 100.0, (
                    nfft, pad, stride, segs)
        assert checked_gate >= 10


class TestRfftKernel:
    """Hermitian-packed real-input kernel (rfft_pow2_split) vs
    numpy.fft.rfft (interpret mode)."""

    @pytest.mark.parametrize("n", [256, 1024, 4096])
    def test_natural_vs_numpy(self, n):
        from godsp_tpu.ops.pallas_fft import rfft_pow2_split

        rng = np.random.default_rng(n)
        x = rng.normal(size=(5, n)).astype(np.float32)
        yr, yi = rfft_pow2_split(jnp.asarray(x), interpret=True, batch_tile=5)
        got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
        want = np.fft.rfft(x.astype(np.float64))
        assert got.shape == (5, n // 2 + 1)
        assert snr_db(got, want) >= 120.0

    def test_packed_layout_and_nyquist(self):
        from godsp_tpu.ops.pallas_fft import (
            rfft_packed_to_natural,
            rfft_pow2_split,
        )

        n = 512
        rng = np.random.default_rng(3)
        x = rng.normal(size=(4, n)).astype(np.float32)
        pr, pi, ex = rfft_pow2_split(
            jnp.asarray(x), order="packed", interpret=True, batch_tile=4
        )
        assert pr.shape == (4, n // 2) and ex.shape == (4, 128)
        want = np.fft.rfft(x.astype(np.float64))
        # packed position j*128 + h*64 + q holds bin (2j + h) + n1*q
        n1 = n // 128
        got_p = np.asarray(pr, np.float64) + 1j * np.asarray(pi, np.float64)
        for pos in (0, 1, 63, 64, 127, n // 2 - 1):
            j, r = divmod(pos, 128)
            h, q = divmod(r, 64)
            b = (2 * j + h) + n1 * q
            assert abs(got_p[0, pos] - want[0, b]) <= 1e-3 * (
                1.0 + abs(want[0, b])
            ), (pos, b)
        # extras carry the (real) Nyquist bin, lane-broadcast
        np.testing.assert_allclose(
            np.asarray(ex)[:, 0], want[:, -1].real, rtol=0, atol=1e-3
        )
        yr, yi = rfft_packed_to_natural(pr, pi, ex)
        got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
        assert snr_db(got, want) >= 120.0

    def test_wrapper_and_fallbacks(self):
        from godsp_tpu.fft import rfft_split

        rng = np.random.default_rng(4)
        for n in (100, 128, 1024, 16384):  # Bluestein / small / kernel / split2
            x = rng.normal(size=n).astype(np.float32)
            yr, yi = rfft_split(x)
            got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
            want = np.fft.rfft(x.astype(np.float64))
            assert got.shape == want.shape
            assert snr_db(got, want) >= 100.0, n

    def test_errors(self):
        from godsp_tpu.ops.pallas_fft import rfft_pow2_split

        with pytest.raises(ValueError, match="unsupported rfft size"):
            rfft_pow2_split(jnp.zeros((2, 100), jnp.float32))
        with pytest.raises(ValueError, match="unsupported rfft size"):
            rfft_pow2_split(jnp.zeros((2, 16384), jnp.float32))
        with pytest.raises(ValueError, match="unknown order"):
            rfft_pow2_split(jnp.zeros((2, 256), jnp.float32), order="bad")
