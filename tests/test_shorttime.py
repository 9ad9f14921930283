"""ShortTimeFFT (models/shorttime.py) vs scipy.signal.ShortTimeFFT:
slice geometry, all four FFT modes, paddings, phase shifts, canonical
dual windows, scaling, detrending, batching, and istft round trips."""

import numpy as np
import pytest
import scipy.signal as ss
import scipy.signal.windows as sw

from godsp_tpu.models import ShortTimeFFT


def cmp(a, b, tol=1e-10):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(a, b, rtol=0, atol=tol)


@pytest.fixture(scope="module")
def sig():
    return np.random.default_rng(0).normal(size=57)


CONFIGS = [
    (8, 3, "onesided", "zeros", None, 0),
    (9, 4, "twosided", "even", None, 0),
    (8, 2, "centered", "edge", 16, 0),
    (7, 3, "onesided", "odd", 12, 0),
    (8, 3, "twosided", "zeros", None, None),
    (8, 3, "twosided", "zeros", None, 2),
]


class TestCoreParity:
    @pytest.mark.parametrize("wlen,hop,mode,pad,mfft,pshift", CONFIGS)
    def test_attributes_stft_istft(self, sig, wlen, hop, mode, pad, mfft,
                                   pshift):
        w = sw.gaussian(wlen, wlen / 4, sym=True)
        mine = ShortTimeFFT(w, hop=hop, fs=8.0, fft_mode=mode, mfft=mfft,
                            phase_shift=pshift)
        ref = ss.ShortTimeFFT(w, hop=hop, fs=8.0, fft_mode=mode, mfft=mfft,
                              phase_shift=pshift)
        n = len(sig)
        for att in ["p_min", "k_min", "m_num", "m_num_mid", "f_pts",
                    "delta_t", "delta_f"]:
            assert np.allclose(getattr(mine, att), getattr(ref, att)), att
        assert mine.p_max(n) == ref.p_max(n)
        assert mine.k_max(n) == ref.k_max(n)
        assert mine.lower_border_end == ref.lower_border_end
        assert mine.upper_border_begin(n) == ref.upper_border_begin(n)
        np.testing.assert_allclose(mine.f, ref.f, rtol=1e-12)
        np.testing.assert_allclose(mine.t(n), ref.t(n), rtol=1e-12)
        np.testing.assert_allclose(mine.dual_win, ref.dual_win, rtol=1e-10)
        cmp(mine.stft(sig, padding=pad), ref.stft(sig, padding=pad))
        xr = np.asarray(mine.istft(mine.stft(sig), k1=n))
        cmp(xr, sig, 1e-9)


class TestScalingModes:
    def test_psd_and_onesided2X(self, sig):
        w = sw.hann(10, sym=True)
        mine = ShortTimeFFT(w, hop=4, fs=16.0, scale_to="psd")
        ref = ss.ShortTimeFFT(w, hop=4, fs=16.0, scale_to="psd")
        cmp(mine.stft(sig), ref.stft(sig))
        mine.fft_mode = "onesided2X"
        ref.fft_mode = "onesided2X"
        cmp(mine.stft(sig), ref.stft(sig))
        cmp(mine.istft(mine.stft(sig), k1=len(sig)), sig, 1e-9)

    def test_magnitude(self, sig):
        w = sw.hann(10, sym=True)
        mine = ShortTimeFFT(w, hop=4, fs=16.0, scale_to="magnitude")
        ref = ss.ShortTimeFFT(w, hop=4, fs=16.0, scale_to="magnitude")
        cmp(mine.stft(sig), ref.stft(sig))
        assert abs(mine.fac_psd - ref.fac_psd) < 1e-12
        assert abs(mine.fac_magnitude - ref.fac_magnitude) < 1e-12

    def test_onesided2X_needs_scaling(self):
        w = sw.hann(8, sym=True)
        mine = ShortTimeFFT(w, hop=4, fs=1.0)
        with pytest.raises(ValueError):
            mine.fft_mode = "onesided2X"


class TestSpectrogramDetrend:
    def test_parity(self, sig):
        w = sw.gaussian(8, 2, sym=True)
        mine = ShortTimeFFT(w, hop=3, fs=1.0)
        ref = ss.ShortTimeFFT(w, hop=3, fs=1.0)
        cmp(mine.spectrogram(sig), ref.spectrogram(sig))
        cmp(mine.stft_detrend(sig, "linear"), ref.stft_detrend(sig, "linear"),
            1e-9)
        cmp(mine.stft_detrend(sig, "constant"),
            ref.stft_detrend(sig, "constant"), 1e-9)


class TestFromWindowBatch:
    def test_from_window_and_axes(self, sig):
        mine = ShortTimeFFT.from_window(("kaiser", 5.0), 8.0, 12, 8)
        ref = ss.ShortTimeFFT.from_window(("kaiser", 5.0), 8.0, 12, 8)
        cmp(mine.stft(sig), ref.stft(sig))
        X2 = np.random.default_rng(1).normal(size=(3, 57))
        cmp(mine.stft(X2), ref.stft(X2))
        cmp(mine.stft(X2.T, axis=0), ref.stft(X2.T, axis=0))
        X3 = np.random.default_rng(2).normal(size=(2, 57, 3))
        cmp(mine.stft(X3, axis=1), ref.stft(X3, axis=1))

    def test_invertible_gap(self):
        w = np.ones(4)
        assert ShortTimeFFT(w, hop=4, fs=1.0).invertible
        assert not ShortTimeFFT(w, hop=6, fs=1.0).invertible

    def test_validation(self):
        with pytest.raises(ValueError):
            ShortTimeFFT(np.ones((2, 2)), hop=1, fs=1.0)
        with pytest.raises(ValueError):
            ShortTimeFFT(np.ones(8), hop=0, fs=1.0)
        with pytest.raises(ValueError):
            ShortTimeFFT(np.ones(8), hop=2, fs=1.0, mfft=4)
        with pytest.raises(ValueError):
            ShortTimeFFT(np.ones(8), hop=2, fs=1.0, fft_mode="bogus")
        with pytest.raises(ValueError):
            ShortTimeFFT(np.ones(8), hop=2, fs=1.0).stft(np.zeros(64),
                                                         padding="bogus")
        with pytest.raises(ValueError):
            ShortTimeFFT.from_window("hann", 1.0, 8, 8)


class TestPartialIstft:
    def test_partial_ranges_match_full(self, sig):
        """istft over [k0, k1) equals the slice of the full
        reconstruction (scipy's own istft rejects some of these
        full-S/partial-range combinations; ours handles them)."""
        w = sw.gaussian(8, 2, sym=True)
        S = ShortTimeFFT(w, hop=3, fs=8.0)
        Z = S.stft(sig)
        full = np.asarray(S.istft(Z, k1=len(sig)))
        for k0, k1 in [(5, 40), (10, 57), (0, 20)]:
            part = np.asarray(S.istft(Z, k0=k0, k1=k1))
            cmp(part, full[k0:k1], 0)
            cmp(part, sig[k0:k1], 1e-9)


class TestComplexIstft:
    def test_twosided_complex_roundtrip(self):
        rng = np.random.default_rng(9)
        z = rng.normal(size=40) + 1j * rng.normal(size=40)
        w = sw.gaussian(8, 2, sym=True)
        mine = ShortTimeFFT(w, hop=3, fs=1.0, fft_mode="twosided")
        ref = ss.ShortTimeFFT(w, hop=3, fs=1.0, fft_mode="twosided")
        g = np.asarray(mine.istft(mine.stft(z), k1=40))
        assert np.iscomplexobj(g)
        cmp(g, z, 1e-9)
        cmp(g, np.asarray(ref.istft(ref.stft(z), k1=40)), 1e-9)


def test_onesided_rejects_complex():
    w = sw.hann(8, sym=True)
    S = ShortTimeFFT(w, hop=3, fs=1.0)
    with pytest.raises(ValueError):
        S.stft(np.zeros(32) + 0j)


class TestZeroEdgeWindows:
    """Geometry must follow the window's NONZERO support (review
    finding): hann's zero first sample does not count as overlap."""

    @pytest.mark.parametrize("wspec,hop", [
        ("hann16p", 4), ("hann9s", 3), ("boxcar7", 7), ("padded", 3)])
    def test_geometry_and_stft_parity(self, wspec, hop):
        w = {"hann16p": sw.hann(16, sym=False),
             "hann9s": sw.hann(9, sym=True),
             "boxcar7": sw.boxcar(7),
             "padded": np.r_[0.0, 0.0, sw.gaussian(6, 1.5), 0.0]}[wspec]
        x = np.random.default_rng(3).normal(size=237)
        mine = ShortTimeFFT(w, hop=hop, fs=50.0)
        ref = ss.ShortTimeFFT(w, hop=hop, fs=50.0)
        assert mine.p_min == ref.p_min and mine.k_min == ref.k_min
        assert mine.p_max(237) == ref.p_max(237)
        assert mine.k_max(237) == ref.k_max(237)
        assert mine.lower_border_end == ref.lower_border_end
        assert mine.upper_border_begin(237) == ref.upper_border_begin(237)
        g = np.asarray(mine.stft(x))
        r = ref.stft(x)
        assert g.shape == np.shape(r)
        cmp(g, r)
        if mine.invertible:
            cmp(np.asarray(mine.istft(mine.stft(x), k1=237)),
                np.asarray(ref.istft(r, k1=237)), 1e-9)


class TestClosestDualWindow:
    """closest_STFT_dual_window: per-residue-class affine projection —
    exact scipy parity, real and complex, scaled and not."""

    @pytest.mark.parametrize("scaled", [True, False])
    def test_scipy_parity(self, scaled):
        cases = [
            (sw.hann(16, sym=False), 4, sw.boxcar(16)),
            (sw.hann(16, sym=False), 4, sw.gaussian(16, 3)),
            (sw.gaussian(18, 4), 5, None),
        ]
        from godsp_tpu.models import closest_STFT_dual_window

        for w, hop, des in cases:
            g, fa = closest_STFT_dual_window(w, hop, des, scaled=scaled)
            r, fr = ss.closest_STFT_dual_window(w, hop, des, scaled=scaled)
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=0, atol=1e-12)
            assert abs(fa - fr) < 1e-12
        wc = sw.gaussian(12, 3) * np.exp(1j * np.linspace(0, 1, 12))
        g, fa = closest_STFT_dual_window(wc, 3, scaled=scaled)
        r, fr = ss.closest_STFT_dual_window(wc, 3, scaled=scaled)
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0, atol=1e-12)

    def test_result_is_valid_dual(self):
        from godsp_tpu.models import ShortTimeFFT, closest_STFT_dual_window

        w = sw.hann(16, sym=False)
        d, _ = closest_STFT_dual_window(w, 4, sw.gaussian(16, 3))
        # istft with this dual reconstructs exactly
        x = np.random.default_rng(0).normal(size=100)
        S = ShortTimeFFT(w, 4, fs=1.0, dual_win=np.asarray(d))
        back = np.asarray(S.istft(S.stft(x), k1=100))
        np.testing.assert_allclose(back, x, rtol=0, atol=1e-9)

    def test_validation(self):
        from godsp_tpu.models import closest_STFT_dual_window

        with pytest.raises(ValueError):
            closest_STFT_dual_window(np.ones(8), 0)
        with pytest.raises(ValueError):
            closest_STFT_dual_window(np.ones(8), 4, np.ones(7))
        gap = np.r_[np.ones(2), np.zeros(2)]
        with pytest.raises(ValueError):
            closest_STFT_dual_window(np.tile(gap, 2), 4)


class TestRandomizedConfigSweep:
    """Seeded random sweep over (window, hop, mfft, mode, padding)
    configurations — parity of geometry, stft values, and istft round
    trips against scipy on every draw."""

    def test_sweep(self):
        rng = np.random.default_rng(1234)
        x = rng.normal(size=193)
        modes = ["twosided", "centered", "onesided"]
        pads = ["zeros", "edge", "even", "odd"]
        for trial in range(25):
            wlen = int(rng.integers(4, 24))
            hop = int(rng.integers(1, wlen + 1))
            extra = int(rng.integers(0, 9))
            mfft = wlen + extra
            mode = modes[int(rng.integers(0, len(modes)))]
            pad = pads[int(rng.integers(0, len(pads)))]
            wkind = int(rng.integers(0, 3))
            w = [sw.gaussian(wlen, wlen / 4, sym=True),
                 sw.hann(wlen, sym=False) if wlen > 1 else np.ones(1),
                 sw.triang(wlen)][wkind]
            pshift = [0, None, min(2, mfft - 1)][int(rng.integers(0, 3))]
            mine = ShortTimeFFT(w, hop=hop, fs=7.0, fft_mode=mode,
                                mfft=mfft, phase_shift=pshift)
            ref = ss.ShortTimeFFT(w, hop=hop, fs=7.0, fft_mode=mode,
                                  mfft=mfft, phase_shift=pshift)
            n = len(x)
            info = (trial, wlen, hop, mfft, mode, pad, wkind, pshift)
            assert mine.p_min == ref.p_min, info
            assert mine.p_max(n) == ref.p_max(n), info
            assert mine.lower_border_end == ref.lower_border_end, info
            assert mine.upper_border_begin(n) == ref.upper_border_begin(n), \
                info
            g = np.asarray(mine.stft(x, padding=pad))
            r = ref.stft(x, padding=pad)
            assert g.shape == np.shape(r), info
            np.testing.assert_allclose(g, r, rtol=0, atol=1e-8, err_msg=str(info))
            if mine.invertible:
                back = np.asarray(mine.istft(mine.stft(x), k1=n))
                np.testing.assert_allclose(back, x, rtol=0, atol=1e-8,
                                           err_msg=str(info))
