"""Filter design, zero-phase SOS filtering, decimation, correlation,
waveform generators, detrend — scipy.signal float64 parity.

The reference has no design/synthesis surface (go-dsp consumes
externally designed windows only, window.go:25-152); scipy.signal is
the cross-oracle, at the same 1e-8 abs-or-rel discipline as the
reference's PrettyClose (compare.go:94-96) — most cases sit at f64
round-off.
"""

import numpy as np
import pytest
import scipy.signal as ss

from godsp_tpu.dsputils import detrend
from godsp_tpu.models import (
    bessel,
    butter,
    cheby1,
    cheby2,
    chirp,
    correlate,
    correlation_lags,
    decimate,
    freqz,
    gausspulse,
    group_delay,
    iirfilter,
    sawtooth,
    sosfilt_zi,
    sosfiltfilt,
    sosfreqz,
    square,
    sweep_poly,
    tf2zpk,
    unit_impulse,
    zpk2sos,
    zpk2tf,
)


def allc(a, b, rtol=1e-8, atol=1e-10):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


class TestDesignBA:
    @pytest.mark.parametrize(
        "kw",
        [
            dict(N=4, Wn=0.2),
            dict(N=5, Wn=0.37, btype="highpass"),
            dict(N=3, Wn=[0.2, 0.5], btype="bandpass"),
            dict(N=2, Wn=[0.3, 0.6], btype="bandstop"),
            dict(N=1, Wn=0.5),
            dict(N=4, Wn=100.0, analog=True),
            dict(N=4, Wn=1000.0, fs=8000.0),
        ],
    )
    def test_butter(self, kw):
        b, a = butter(**kw)
        br, ar = ss.butter(**kw)
        allc(b, br)
        allc(a, ar)

    @pytest.mark.parametrize(
        "kw",
        [
            dict(N=6, rp=0.5, Wn=0.25),
            dict(N=5, rp=1.0, Wn=[0.2, 0.4], btype="bandpass"),
            dict(N=3, rp=0.05, Wn=0.6, btype="highpass"),
        ],
    )
    def test_cheby1(self, kw):
        b, a = cheby1(**kw)
        br, ar = ss.cheby1(**kw)
        allc(b, br)
        allc(a, ar)

    @pytest.mark.parametrize(
        "kw",
        [
            dict(N=6, rs=40, Wn=0.25),
            dict(N=4, rs=60, Wn=[0.3, 0.7], btype="bandstop"),
            dict(N=5, rs=50, Wn=0.15, btype="highpass"),
        ],
    )
    def test_cheby2(self, kw):
        b, a = cheby2(**kw)
        br, ar = ss.cheby2(**kw)
        allc(b, br)
        allc(a, ar)

    @pytest.mark.parametrize("norm", ["phase", "delay"])
    def test_bessel(self, norm):
        b, a = bessel(5, 0.3, norm=norm)
        br, ar = ss.bessel(5, 0.3, norm=norm)
        allc(b, br)
        allc(a, ar)

    def test_iirfilter_validation(self):
        with pytest.raises(ValueError):
            iirfilter(0, 0.5)
        with pytest.raises(ValueError):
            iirfilter(4, 1.5)  # outside (0, 1)
        with pytest.raises(ValueError):
            iirfilter(4, [0.5, 0.2], btype="bandpass")  # not increasing
        with pytest.raises(ValueError):
            iirfilter(4, 0.5, ftype="cheby1")  # rp missing
        with pytest.raises(ValueError):
            iirfilter(4, 0.5, output="abc")


class TestSOS:
    @pytest.mark.parametrize(
        "mk",
        [
            lambda o: butter(7, 0.3, output=o),
            lambda o: cheby1(8, 0.05, 0.2, output=o),
            lambda o: butter(6, [0.2, 0.5], btype="bandpass", output=o),
            lambda o: cheby2(9, 60, 0.4, output=o),
            lambda o: butter(5, [0.25, 0.6], btype="bandstop", output=o),
            lambda o: bessel(4, 0.37, btype="highpass", output=o),
        ],
    )
    def test_cascade_matches_zpk(self, mk):
        """The SOS cascade must equal the zpk transfer function; section
        pairing may differ from scipy, so compare responses."""
        sos = mk("sos")
        z, p, k = mk("zpk")
        w = np.linspace(0, np.pi, 257)[1:-1]
        _, h = sosfreqz(sos, worN=w)
        zm = np.exp(1j * w)
        href = k * np.prod(zm[:, None] - z[None], axis=1) / np.prod(
            zm[:, None] - p[None], axis=1
        )
        allc(h, href, rtol=1e-7, atol=1e-9)
        # structural checks: monic a0, correct section count
        assert sos.shape[1] == 6
        np.testing.assert_allclose(sos[:, 3], 1.0)
        assert sos.shape[0] == (len(p) + 1) // 2

    def test_zpk_tf_roundtrip(self):
        b, a = butter(4, 0.3)
        z, p, k = tf2zpk(b, a)
        b2, a2 = zpk2tf(z, p, k)
        allc(b2, b)
        allc(a2, a)

    def test_pure_gain(self):
        sos = zpk2sos([], [], 3.5)
        allc(sos, [[3.5, 0, 0, 1, 0, 0]])

    def test_sosfilt_zi(self):
        sos = ss.butter(7, 0.3, output="sos")
        allc(np.asarray(sosfilt_zi(sos)), ss.sosfilt_zi(sos))

    def test_sosfiltfilt(self):
        rng = np.random.default_rng(0)
        sos = ss.butter(7, 0.3, output="sos")
        x = rng.normal(size=1024)
        allc(np.asarray(sosfiltfilt(sos, x)), ss.sosfiltfilt(sos, x))
        xb = rng.normal(size=(3, 700))
        allc(np.asarray(sosfiltfilt(sos, xb)), ss.sosfiltfilt(sos, xb))
        # explicit padlen + axis
        allc(
            np.asarray(sosfiltfilt(sos, xb.T, axis=0, padlen=37)),
            ss.sosfiltfilt(sos, xb.T, axis=0, padlen=37),
        )
        with pytest.raises(ValueError):
            sosfiltfilt(sos, np.zeros(10))  # padlen >= len


class TestResponses:
    def test_freqz(self):
        b, a = ss.butter(4, 0.3)
        w, h = freqz(b, a, 512)
        wr, hr = ss.freqz(b, a, 512)
        allc(w, wr)
        allc(h, hr)

    def test_freqz_fs_whole_and_grid(self):
        b, a = ss.cheby1(3, 1.0, 0.4)
        w, h = freqz(b, a, 128, whole=True, fs=16000.0)
        wr, hr = ss.freqz(b, a, 128, whole=True, fs=16000.0)
        allc(w, wr)
        allc(h, hr)
        grid = np.linspace(0.1, 3.0, 50)
        _, h = freqz(b, a, worN=grid)
        _, hr = ss.freqz(b, a, worN=grid)
        allc(h, hr)

    def test_sosfreqz(self):
        sos = ss.butter(6, [0.2, 0.5], btype="bandpass", output="sos")
        w, h = sosfreqz(sos, 256)
        wr, hr = ss.sosfreqz(sos, 256)
        allc(w, wr)
        allc(h, hr)

    def test_group_delay(self):
        b, a = ss.butter(4, 0.3)
        # avoid the B(z)=0 point at w=pi where both formulas blow up
        grid = np.linspace(0.01, 2.9, 200)
        _, gd = group_delay((b, a), w=grid)
        _, gr = ss.group_delay((b, a), w=grid)
        allc(gd, gr, rtol=1e-6, atol=1e-8)


class TestDecimate:
    @pytest.mark.parametrize("q", [2, 4, 7])
    def test_iir(self, q):
        rng = np.random.default_rng(q)
        x = rng.normal(size=2048)
        allc(np.asarray(decimate(x, q)), ss.decimate(x, q))
        allc(
            np.asarray(decimate(x, q, zero_phase=False)),
            ss.decimate(x, q, zero_phase=False),
        )

    @pytest.mark.parametrize("q", [2, 5])
    def test_fir(self, q):
        rng = np.random.default_rng(10 + q)
        x = rng.normal(size=2048)
        allc(
            np.asarray(decimate(x, q, ftype="fir")),
            ss.decimate(x, q, ftype="fir"),
            rtol=1e-7,
            atol=1e-9,
        )
        allc(
            np.asarray(decimate(x, q, ftype="fir", zero_phase=False)),
            ss.decimate(x, q, ftype="fir", zero_phase=False),
            rtol=1e-7,
            atol=1e-9,
        )

    def test_q1_matches_scipy(self):
        # scipy still anti-alias-filters at q=1 (no identity shortcut)
        x = np.random.default_rng(5).normal(size=256)
        allc(np.asarray(decimate(x, 1)), ss.decimate(x, 1))


class TestCorrelate:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("la,lb", [(300, 121), (64, 200), (50, 50)])
    def test_real(self, mode, la, lb):
        rng = np.random.default_rng(la + lb)
        a, b = rng.normal(size=la), rng.normal(size=lb)
        allc(np.asarray(correlate(a, b, mode)), ss.correlate(a, b, mode))
        assert (
            np.asarray(correlation_lags(la, lb, mode))
            == ss.correlation_lags(la, lb, mode)
        ).all()

    def test_complex_conjugation(self):
        rng = np.random.default_rng(3)
        a = rng.normal(size=40) + 1j * rng.normal(size=40)
        b = rng.normal(size=25) + 1j * rng.normal(size=25)
        allc(np.asarray(correlate(a, b)), ss.correlate(a, b))

    def test_autocorrelation_peak_at_zero_lag(self):
        rng = np.random.default_rng(4)
        a = rng.normal(size=128)
        c = np.asarray(correlate(a, a))
        lags = np.asarray(correlation_lags(128, 128))
        assert lags[np.argmax(c)] == 0


class TestWaveforms:
    @pytest.mark.parametrize(
        "method", ["linear", "quadratic", "logarithmic", "hyperbolic"]
    )
    def test_chirp(self, method):
        t = np.linspace(0, 10, 1501)
        allc(
            np.asarray(chirp(t, 6, 10, 1, method=method, phi=30)),
            ss.chirp(t, 6, 10, 1, method=method, phi=30),
            rtol=1e-7,
            atol=1e-10,
        )

    def test_chirp_vertex_zero_false(self):
        t = np.linspace(0, 10, 801)
        allc(
            np.asarray(chirp(t, 6, 10, 1, method="quadratic", vertex_zero=False)),
            ss.chirp(t, 6, 10, 1, method="quadratic", vertex_zero=False),
            rtol=1e-7,
            atol=1e-10,
        )

    def test_sweep_poly(self):
        t = np.linspace(0, 10, 1001)
        p = np.array([0.025, -0.36, 1.25, 2.0])
        allc(
            np.asarray(sweep_poly(t, p, phi=12)),
            ss.sweep_poly(t, p, phi=12),
            rtol=1e-7,
            atol=1e-10,
        )

    def test_gausspulse(self):
        t = np.linspace(-0.01, 0.01, 1001)
        yi, yq, ye = gausspulse(t, fc=1000, bw=0.5, retquad=True, retenv=True)
        ri, rq, re = ss.gausspulse(t, fc=1000, bw=0.5, retquad=True, retenv=True)
        allc(np.asarray(yi), ri)
        allc(np.asarray(yq), rq)
        allc(np.asarray(ye), re)

    @pytest.mark.parametrize("duty", [0.3, 0.5, 0.9])
    def test_square(self, duty):
        t = np.linspace(0, 20, 2001)
        allc(np.asarray(square(t, duty)), ss.square(t, duty))

    @pytest.mark.parametrize("width", [0.0, 0.3, 0.5, 1.0])
    def test_sawtooth(self, width):
        t = np.linspace(0, 20, 2001)
        allc(np.asarray(sawtooth(t, width)), ss.sawtooth(t, width))

    def test_unit_impulse(self):
        allc(np.asarray(unit_impulse(7, "mid")), ss.unit_impulse(7, "mid"))
        allc(np.asarray(unit_impulse((3, 4), (1, 2))), ss.unit_impulse((3, 4), (1, 2)))
        allc(np.asarray(unit_impulse(5)), ss.unit_impulse(5))


class TestDetrend:
    def test_linear_constant_axes(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, 333)) + np.linspace(0, 3, 333) * rng.normal(
            size=(4, 1)
        )
        allc(np.asarray(detrend(x)), ss.detrend(x))
        allc(
            np.asarray(detrend(x, type="constant")), ss.detrend(x, type="constant")
        )
        allc(np.asarray(detrend(x, axis=0)), ss.detrend(x, axis=0))
        with pytest.raises(ValueError):
            detrend(x, type="quadratic")


class TestSavgol:
    @pytest.mark.parametrize("W,p,d", [(11, 3, 0), (11, 3, 1), (21, 5, 2), (10, 3, 0)])
    def test_coeffs(self, W, p, d):
        from godsp_tpu.models import savgol_coeffs

        allc(savgol_coeffs(W, p, deriv=d, delta=0.5), ss.savgol_coeffs(W, p, deriv=d, delta=0.5))

    @pytest.mark.parametrize("mode", ["interp", "mirror", "nearest", "constant", "wrap"])
    def test_filter_modes(self, mode):
        from godsp_tpu.models import savgol_filter

        rng = np.random.default_rng(0)
        x = np.cumsum(rng.normal(size=300))
        allc(np.asarray(savgol_filter(x, 11, 3, mode=mode)), ss.savgol_filter(x, 11, 3, mode=mode))

    def test_filter_deriv_batched(self):
        from godsp_tpu.models import savgol_filter

        rng = np.random.default_rng(1)
        xb = rng.normal(size=(3, 200))
        allc(
            np.asarray(savgol_filter(xb, 15, 4, deriv=2, delta=0.1)),
            ss.savgol_filter(xb, 15, 4, deriv=2, delta=0.1),
        )
        allc(
            np.asarray(savgol_filter(xb.T, 9, 2, axis=0)),
            ss.savgol_filter(xb.T, 9, 2, axis=0),
        )

    def test_validation(self):
        from godsp_tpu.models import savgol_coeffs, savgol_filter

        with pytest.raises(ValueError):
            savgol_coeffs(5, 5)  # polyorder >= window
        with pytest.raises(ValueError):
            savgol_filter(np.zeros(100), 10, 3)  # even window, interp
        with pytest.raises(ValueError):
            savgol_filter(np.zeros(5), 11, 3)  # window > signal, interp


class TestFirwin2:
    @pytest.mark.parametrize(
        "kw",
        [
            dict(numtaps=65, freq=[0, 0.3, 0.5, 1], gain=[1, 1, 0, 0]),
            dict(numtaps=64, freq=[0, 0.3, 0.5, 1], gain=[1, 1, 0, 0]),
            dict(numtaps=65, freq=[0, 0.5, 0.5, 1], gain=[1, 1, 0, 0]),
            dict(numtaps=65, freq=[0, 0.3, 1], gain=[0, 1, 0], antisymmetric=True),
            dict(numtaps=64, freq=[0, 0.3, 1], gain=[0, 1, 1], antisymmetric=True),
            dict(numtaps=33, freq=[0, 1], gain=[1, 1], window=("kaiser", 6.0)),
        ],
    )
    def test_scipy_parity(self, kw):
        from godsp_tpu.models import firwin2

        allc(firwin2(**kw), ss.firwin2(**kw), rtol=1e-8, atol=1e-14)

    def test_type_constraints(self):
        from godsp_tpu.models import firwin2

        with pytest.raises(ValueError):
            firwin2(64, [0, 1], [1, 1])  # type II nonzero at Nyquist
        with pytest.raises(ValueError):
            firwin2(65, [0, 1], [1, 0], antisymmetric=True)  # type III
        with pytest.raises(ValueError):
            firwin2(64, [0, 1], [1, 0], antisymmetric=True)  # type IV at 0
        with pytest.raises(ValueError):
            firwin2(65, [0, 0.3, 0.3, 0.3, 1], [1, 1, 0.5, 0, 0])  # triple dup

    def test_kaiser_helpers(self):
        from godsp_tpu.models import kaiser_atten, kaiser_beta, kaiserord

        for a in (10, 30, 80):
            assert abs(kaiser_beta(a) - ss.kaiser_beta(a)) < 1e-12
        assert abs(kaiser_atten(101, 0.1) - ss.kaiser_atten(101, 0.1)) < 1e-9
        assert kaiserord(65, 0.05) == ss.kaiserord(65, 0.05)
        with pytest.raises(ValueError):
            kaiserord(5, 0.05)


class TestMedfilt:
    @pytest.mark.parametrize("k", [3, 5, 9])
    def test_scipy_parity(self, k):
        from godsp_tpu.models import medfilt

        rng = np.random.default_rng(k)
        x = rng.normal(size=257)
        allc(np.asarray(medfilt(x, k)), ss.medfilt(x, k))

    def test_validation(self):
        from godsp_tpu.models import medfilt

        with pytest.raises(ValueError):
            medfilt(np.zeros(10), 4)


class TestColaNola:
    @pytest.mark.parametrize(
        "wname,nper,nov",
        [
            ("hann", 256, 128),
            ("hann", 256, 192),
            ("hamming", 256, 128),
            ("blackman", 256, 100),
            ("rectangular", 256, 0),
            ("rectangular", 256, 128),
        ],
    )
    def test_scipy_parity_same_table(self, wname, nper, nov):
        """Compare against scipy given the SAME window array (the
        framework's tapers are the reference's symmetric ones,
        window.go:25-152, not scipy's periodic STFT strings)."""
        import godsp_tpu.window as win
        from godsp_tpu.models import check_cola, check_nola

        table = win.window_table_np(wname, nper)
        assert check_cola(wname, nper, nov) == ss.check_COLA(table, nper, nov)
        assert check_nola(wname, nper, nov) == ss.check_NOLA(table, nper, nov)

    def test_rectangular_cola(self):
        from godsp_tpu.models import check_cola, check_nola

        assert check_cola("rectangular", 128, 0)
        assert check_nola("hann", 256, 128)
        with pytest.raises(ValueError):
            check_cola("hann", 256, 256)


class TestPeaks:
    """find_peaks/peak_prominences/peak_widths vs scipy (host float64
    analysis path; go-dsp has no peak surface)."""

    @staticmethod
    def _signal():
        rng = np.random.default_rng(0)
        return np.convolve(rng.normal(size=3000), np.hanning(40), "same")

    def test_plain_and_measures(self):
        from godsp_tpu.models import find_peaks, peak_prominences, peak_widths

        x = self._signal()
        g, _ = find_peaks(x)
        r, _ = ss.find_peaks(x)
        assert np.array_equal(g, r)
        for a, b in zip(peak_prominences(x, g), ss.peak_prominences(x, r)):
            allc(a, b)
        for a, b in zip(
            peak_prominences(x, g, wlen=101), ss.peak_prominences(x, r, wlen=101)
        ):
            allc(a, b)
        for a, b in zip(
            peak_widths(x, g, rel_height=0.8), ss.peak_widths(x, r, rel_height=0.8)
        ):
            allc(a, b)

    @pytest.mark.parametrize(
        "kw",
        [
            dict(height=0.5),
            dict(height=(0.2, 2.0)),
            dict(threshold=0.001),
            dict(distance=37),
            dict(prominence=1.0),
            dict(width=10),
            dict(prominence=0.5, width=(5, 40), rel_height=0.7),
        ],
    )
    def test_conditions(self, kw):
        from godsp_tpu.models import find_peaks

        x = self._signal()
        g, gp = find_peaks(x, **kw)
        r, rp = ss.find_peaks(x, **kw)
        assert np.array_equal(g, r)
        assert set(gp) == set(rp)
        for k in gp:
            allc(gp[k], rp[k])

    def test_array_height(self):
        from godsp_tpu.models import find_peaks

        x = self._signal()
        h = np.linspace(0, 1, x.size)
        g, _ = find_peaks(x, height=h)
        r, _ = ss.find_peaks(x, height=h)
        assert np.array_equal(g, r)

    def test_plateaus(self):
        from godsp_tpu.models import find_peaks

        xp = np.array([0, 1, 1, 1, 0, 2, 2, 0, 3, 0], float)
        g, gp = find_peaks(xp, plateau_size=(2, None))
        r, rp = ss.find_peaks(xp, plateau_size=(2, None))
        assert np.array_equal(g, r)
        for k in gp:
            allc(gp[k], rp[k])

    def test_validation(self):
        from godsp_tpu.models import find_peaks, peak_prominences

        with pytest.raises(ValueError):
            find_peaks(np.zeros(10), distance=0.5)
        with pytest.raises(ValueError):
            peak_prominences(np.zeros(10), [20])
        with pytest.raises(ValueError):
            peak_prominences(np.arange(10.0), [5], wlen=2)


class TestOrderSelection:
    """buttord/cheb1ord/cheb2ord vs scipy: exact orders; wn at analytic
    precision (bandstop wn within the bounded-minimizer tolerance)."""

    CASES = [
        ((0.2, 0.3, 1, 40), {}),
        ((0.4, 0.25, 0.5, 50), {}),
        (([0.2, 0.5], [0.1, 0.6], 1, 40), {}),  # bandpass
        (([0.1, 0.6], [0.2, 0.5], 2, 30), {}),  # bandstop
        ((30, 50, 1, 40), dict(analog=True)),
        ((1000, 1200, 2, 60), dict(fs=8000)),
    ]

    @pytest.mark.parametrize("args,kw", CASES)
    @pytest.mark.parametrize("pair", ["butt", "c1", "c2", "el"])
    def test_scipy_parity(self, args, kw, pair):
        from godsp_tpu.models import buttord, cheb1ord, cheb2ord, ellipord

        mine, theirs = {
            "butt": (buttord, ss.buttord),
            "c1": (cheb1ord, ss.cheb1ord),
            "c2": (cheb2ord, ss.cheb2ord),
            "el": (ellipord, ss.ellipord),
        }[pair]
        n1, w1 = mine(*args, **kw)
        n2, w2 = theirs(*args, **kw)
        assert n1 == n2
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                   rtol=1e-4, atol=1e-7)

    def test_design_from_ord(self):
        """The classic loop: estimate order, then design at (N, wn)."""
        from godsp_tpu.models import butter, buttord

        N, wn = buttord(0.2, 0.3, 1, 40)
        b, a = butter(N, wn)
        w = np.linspace(0.01, np.pi - 0.01, 500)
        _, h = ss.freqz(b, a, worN=w)
        # passband loss <= 1 dB at 0.2, stopband attenuation >= 40 dB at 0.3
        hp = np.abs(h[w <= 0.2 * np.pi])
        hs = np.abs(h[w >= 0.3 * np.pi])
        assert 20 * np.log10(hp.min()) >= -1.0001
        assert 20 * np.log10(hs.max()) <= -39.999


class TestConversions:
    def test_sos2tf_sos2zpk(self):
        from godsp_tpu.models import sos2tf, sos2zpk

        sos = ss.butter(7, 0.3, output="sos")
        b1, a1 = sos2tf(sos)
        b2, a2 = ss.sos2tf(sos)
        allc(b1, b2)
        allc(a1, a2)
        z1, p1, k1 = sos2zpk(sos)
        z2, p2, k2 = ss.sos2zpk(sos)
        allc(np.sort_complex(z1), np.sort_complex(z2))
        allc(np.sort_complex(p1), np.sort_complex(p2))
        assert abs(k1 - k2) < 1e-12

    def test_tf2sos_response(self):
        from godsp_tpu.models import tf2sos

        b, a = ss.butter(6, 0.3)
        s1 = tf2sos(b, a)
        w = np.linspace(0.01, np.pi - 0.01, 200)
        _, h1 = ss.sosfreqz(s1, worN=w)
        _, h2 = ss.freqz(b, a, worN=w)
        allc(h1, h2, rtol=1e-7, atol=1e-10)

    def test_normalize(self):
        from godsp_tpu.models import normalize

        for bb, aa in [([0, 2, 4], [2, 1]), ([3, 6], [2, 4, 8])]:
            if bb[0] == 0:
                # Leading-zero numerator: BOTH sides must warn their
                # BadCoefficients (scipy parity includes the warning).
                from godsp_tpu.models import BadCoefficients

                with pytest.warns(BadCoefficients):
                    g = normalize(bb, aa)
                with pytest.warns(ss.BadCoefficients):
                    r = ss.normalize(bb, aa)
            else:
                g = normalize(bb, aa)
                r = ss.normalize(bb, aa)
            allc(g[0], r[0])
            allc(g[1], r[1])
        with pytest.raises(ValueError):
            normalize([1.0], [0.0, 1.0])

    def test_deconvolve(self):
        from godsp_tpu.models import deconvolve

        rng = np.random.default_rng(0)
        sig = rng.normal(size=60)
        div = np.array([1.5, 0.3, -0.2, 0.05])
        q1, r1 = deconvolve(sig, div)
        q2, r2 = ss.deconvolve(sig, div)
        allc(q1, q2, rtol=1e-7, atol=1e-9)
        allc(r1, r2, rtol=1e-7, atol=1e-8)
        # defining identity
        allc(np.convolve(div, q1) + r1, sig, rtol=1e-9, atol=1e-9)
        # divisor longer than signal: zero quotient, remainder = signal
        q, r = deconvolve(np.ones(3), np.ones(5))
        assert q.size == 0
        allc(r, np.ones(3))
        with pytest.raises(ValueError):
            deconvolve(np.ones(5), [0.0, 1.0])


class TestEllip:
    """Elliptic designs vs scipy: the Landen/nome prototype at machine
    precision, through the shared transform/bilinear pipeline."""

    CASES = [(1, 1, 40), (2, 0.5, 40), (3, 1, 40), (4, 3, 60), (5, 0.1, 80),
             (7, 1, 100), (8, 2, 30), (9, 0.5, 120), (12, 1, 60)]

    @pytest.mark.parametrize("N,rp,rs", CASES)
    def test_ellipap(self, N, rp, rs):
        from godsp_tpu.models import ellipap

        z1, p1, k1 = ellipap(N, rp, rs)
        z2, p2, k2 = ss.ellipap(N, rp, rs)
        sz = lambda a: np.sort_complex(np.atleast_1d(np.asarray(a, complex)))
        if len(np.atleast_1d(z2)):
            np.testing.assert_allclose(sz(z1), sz(z2), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(sz(p1), sz(p2), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(k1, k2, rtol=1e-12)

    @pytest.mark.parametrize(
        "kw",
        [
            dict(N=5, rp=1, rs=60, Wn=0.3),
            dict(N=4, rp=0.5, rs=40, Wn=0.25, btype="highpass"),
            dict(N=3, rp=1, rs=50, Wn=[0.2, 0.5], btype="bandpass"),
            dict(N=3, rp=2, rs=40, Wn=[0.2, 0.5], btype="bandstop"),
            dict(N=6, rp=1, rs=80, Wn=100, analog=True),
            dict(N=4, rp=1, rs=60, Wn=1000, fs=8000),
        ],
    )
    def test_ellip_ba(self, kw):
        from godsp_tpu.models import ellip

        b1, a1 = ellip(**kw)
        b2, a2 = ss.ellip(**{("N" if k == "N" else k): v for k, v in kw.items()})
        allc(b1, b2, rtol=1e-9, atol=1e-12)
        allc(a1, a2, rtol=1e-9, atol=1e-12)

    def test_ellip_sos_runs(self):
        from godsp_tpu.models import ellip, sosfilt

        sos = ellip(8, 1, 80, 0.3, output="sos")
        ref = ss.ellip(8, 1, 80, 0.3, output="sos")
        x = np.random.default_rng(0).normal(size=512)
        y1 = np.asarray(sosfilt(sos, x))
        y2 = ss.sosfilt(ref, x)
        allc(y1, y2, rtol=1e-8, atol=1e-10)

    def test_validation(self):
        from godsp_tpu.models import ellip, ellipap, iirfilter

        with pytest.raises(ValueError):
            ellipap(4, 0, 40)
        with pytest.raises(ValueError):
            ellipap(4, 3, 2)  # rs <= rp
        with pytest.raises(ValueError):
            iirfilter(4, 0.3, rp=None, rs=40, ftype="ellip")
        with pytest.raises(ValueError):
            iirfilter(4, 0.3, rp=1, rs=None, ftype="ellip")


class TestIirdesign:
    @pytest.mark.parametrize(
        "args,kw",
        [
            ((0.2, 0.3, 1, 40), {}),
            ((0.3, 0.2, 1, 40), dict(ftype="butter")),  # highpass
            (([0.2, 0.5], [0.1, 0.6], 1, 40), dict(ftype="cheby1")),
            ((1000, 1200, 1, 60), dict(fs=8000)),
        ],
    )
    def test_scipy_parity(self, args, kw):
        from godsp_tpu.models import iirdesign

        b1, a1 = iirdesign(*args, **kw)
        b2, a2 = ss.iirdesign(*args, **kw)
        allc(b1, b2, rtol=1e-7, atol=1e-10)
        allc(a1, a2, rtol=1e-7, atol=1e-10)

    def test_bandstop_meets_spec(self):
        """Bandstop wn rides the golden-section minimum (flat to ~1e-5,
        same tolerance class as scipy's fminbound) so coefficients are
        not bit-comparable — assert the functional band spec instead."""
        from godsp_tpu.models import iirdesign

        wp, ws, gpass, gstop = [0.1, 0.6], [0.2, 0.5], 2.0, 40.0
        b, a = iirdesign(wp, ws, gpass, gstop, ftype="cheby2")
        w = np.linspace(0.005, 0.995, 2000) * np.pi
        _, h = ss.freqz(b, a, worN=w)
        mag = 20 * np.log10(np.abs(h) + 1e-300)
        f = w / np.pi
        assert mag[(f <= wp[0]) | (f >= wp[1])].min() >= -gpass - 1e-3
        assert mag[(f >= ws[0]) & (f <= ws[1])].max() <= -gstop + 1e-3

    def test_validation(self):
        from godsp_tpu.models import iirdesign

        with pytest.raises(ValueError):
            iirdesign(0.2, 0.3, 1, 40, ftype="bessel")
        with pytest.raises(ValueError):
            iirdesign([0.2, 0.5], [0.3, 0.6], 1, 40)  # edges don't nest


class TestNotchPeakComb:
    """iirnotch/iirpeak/iircomb — scipy closed-form parity (exact)."""

    @pytest.mark.parametrize("w0,Q,fs", [(0.3, 30, 2.0), (60, 35, 1000),
                                         (0.1, 5, 2.0)])
    def test_notch_peak(self, w0, Q, fs):
        from godsp_tpu.models import iirnotch, iirpeak

        for mine, ref in [(iirnotch, ss.iirnotch), (iirpeak, ss.iirpeak)]:
            b1, a1 = mine(w0, Q, fs=fs)
            b2, a2 = ref(w0, Q, fs=fs)
            allc(b1, b2, rtol=0, atol=0)
            allc(a1, a2, rtol=0, atol=0)

    def test_notch_rejects(self):
        from godsp_tpu.models import freqz, iirnotch

        b, a = iirnotch(0.3, 30)
        w, h = freqz(b, a, worN=np.array([0.3 * np.pi]))
        assert np.abs(h)[0] < 1e-12

    @pytest.mark.parametrize(
        "kw",
        [
            dict(w0=0.25, Q=30),
            dict(w0=0.25, Q=30, ftype="peak"),
            dict(w0=0.2, Q=10, pass_zero=True),
            dict(w0=0.2, Q=10, ftype="peak", pass_zero=True),
            dict(w0=50, Q=15, fs=1000),
            dict(w0=100, Q=40, fs=1200, ftype="peak"),
        ],
    )
    def test_comb(self, kw):
        from godsp_tpu.models import iircomb

        b1, a1 = iircomb(**kw)
        b2, a2 = ss.iircomb(**kw)
        allc(b1, b2, rtol=0, atol=1e-15)
        allc(a1, a2, rtol=0, atol=1e-15)

    def test_comb_validation(self):
        from godsp_tpu.models import iircomb, iirnotch

        with pytest.raises(ValueError):
            iircomb(0.3, 30)  # 2/0.3 not an integer
        with pytest.raises(ValueError):
            iircomb(0.25, 30, ftype="bogus")
        with pytest.raises(ValueError):
            iirnotch(1.5, 30)  # beyond Nyquist


class TestMiscSignalSurface:
    """argrel extrema family, vectorstrength, generic convolve entries
    — scipy.signal parity."""

    def test_argrel(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=200)
        from godsp_tpu.models import argrelextrema, argrelmax, argrelmin

        for order in (1, 2, 5):
            for mode in ("clip", "wrap"):
                for mine, ref in [(argrelmax, ss.argrelmax),
                                  (argrelmin, ss.argrelmin)]:
                    g = mine(x, order=order, mode=mode)
                    r = ref(x, order=order, mode=mode)
                    for ga, ra in zip(g, r):
                        np.testing.assert_array_equal(ga, ra)
        X = rng.normal(size=(20, 30))
        g = argrelextrema(X, np.greater, axis=1, order=2)
        r = ss.argrelextrema(X, np.greater, axis=1, order=2)
        for ga, ra in zip(g, r):
            np.testing.assert_array_equal(ga, ra)
        with pytest.raises(ValueError):
            argrelmax(x, order=0)
        with pytest.raises(ValueError):
            argrelmax(x, mode="bogus")

    def test_vectorstrength(self):
        from godsp_tpu.models import vectorstrength

        rng = np.random.default_rng(1)
        ev = np.sort(rng.uniform(0, 100, 60))
        s1, p1 = vectorstrength(ev, 3.7)
        s2, p2 = ss.vectorstrength(ev, 3.7)
        assert abs(s1 - s2) < 1e-12 and abs(p1 - p2) < 1e-12
        s1, p1 = vectorstrength(ev, [1.0, 2.5, 7.3])
        s2, p2 = ss.vectorstrength(ev, [1.0, 2.5, 7.3])
        allc(s1, s2, rtol=1e-12, atol=0)
        allc(p1, p2, rtol=1e-12, atol=0)
        with pytest.raises(ValueError):
            vectorstrength(ev, -1.0)

    def test_convolve_entries(self):
        from godsp_tpu.models import convolve, oaconvolve

        rng = np.random.default_rng(2)
        a, b = rng.normal(size=100), rng.normal(size=17)
        for mode in ("full", "same", "valid"):
            allc(np.asarray(convolve(a, b, mode)), ss.convolve(a, b, mode),
                 rtol=1e-9, atol=1e-11)
            allc(np.asarray(oaconvolve(a, b, mode)), ss.oaconvolve(a, b, mode),
                 rtol=1e-9, atol=1e-11)
        with pytest.raises(ValueError):
            convolve(a, b, method="bogus")


class TestMaxLenSeq:
    def test_scipy_parity(self):
        from godsp_tpu.models import max_len_seq

        for nbits in (2, 3, 4, 8, 12):
            s1, f1 = max_len_seq(nbits)
            s2, f2 = ss.max_len_seq(nbits)
            np.testing.assert_array_equal(s1, s2)
            np.testing.assert_array_equal(f1, f2)
        s1, f1 = max_len_seq(4, state=[1, 0, 0, 0], length=20)
        s2, f2 = ss.max_len_seq(4, state=[1, 0, 0, 0], length=20)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(f1, f2)
        s1, f1 = max_len_seq(3, taps=[2], length=10)
        s2, f2 = ss.max_len_seq(3, taps=[2], length=10)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(f1, f2)

    def test_balance_and_flat_spectrum(self):
        from godsp_tpu.models import max_len_seq

        seq, _ = max_len_seq(10)
        assert seq.sum() == 2**9  # one more 1 than 0s
        spec = np.abs(np.fft.fft(seq * 2.0 - 1.0))
        # MLS: all non-DC bins have identical magnitude
        np.testing.assert_allclose(spec[1:], spec[1], rtol=1e-8)

    def test_validation(self):
        from godsp_tpu.models import max_len_seq

        with pytest.raises(ValueError):
            max_len_seq(40)  # no default taps
        with pytest.raises(ValueError):
            max_len_seq(4, taps=[5])
        with pytest.raises(ValueError):
            max_len_seq(4, state=[0, 0, 0, 0])


class TestApiCompletions:
    """lfiltic, tf-form lp2* transforms, freqz_zpk/freqz_sos, findfreqs,
    czt_points, BadCoefficients, check_COLA aliases — scipy parity."""

    def test_lfiltic(self):
        from godsp_tpu.models import lfiltic

        np.testing.assert_allclose(
            lfiltic([1.0, 0.5], [1.0, -0.3, 0.1], y=[2.0, 1.0], x=[0.5]),
            ss.lfiltic([1.0, 0.5], [1.0, -0.3, 0.1], y=[2.0, 1.0], x=[0.5]),
            rtol=1e-12)
        # continuation: state from the past reproduces the full run
        b, a = ss.butter(3, 0.3)
        x = np.random.default_rng(0).normal(size=50)
        y_full = ss.lfilter(b, a, x)
        zi = lfiltic(b, a, y_full[19::-1], x[19::-1])
        y2, _ = ss.lfilter(b, a, x[20:], zi=zi)
        allc(y2, y_full[20:], rtol=1e-9, atol=1e-11)

    def test_lp2_tf_forms(self):
        from godsp_tpu.models import lp2bp, lp2bs, lp2hp, lp2lp

        for fn, rfn in [(lp2lp, ss.lp2lp), (lp2hp, ss.lp2hp)]:
            g = fn([1.0, 2.0], [1.0, 3.0, 4.0], wo=2.0)
            r = rfn([1.0, 2.0], [1.0, 3.0, 4.0], wo=2.0)
            allc(g[0], r[0], rtol=1e-9, atol=1e-11)
            allc(g[1], r[1], rtol=1e-9, atol=1e-11)
        for fn, rfn in [(lp2bp, ss.lp2bp), (lp2bs, ss.lp2bs)]:
            g = fn([1.0, 2.0], [1.0, 3.0, 4.0], wo=2.0, bw=0.5)
            r = rfn([1.0, 2.0], [1.0, 3.0, 4.0], wo=2.0, bw=0.5)
            allc(g[0], r[0], rtol=1e-9, atol=1e-11)
            allc(g[1], r[1], rtol=1e-9, atol=1e-11)

    def test_freqz_zpk_sos(self):
        from godsp_tpu.models import freqz_sos, freqz_zpk

        z, p, k = ss.butter(4, 0.3, output="zpk")
        w = np.linspace(0.01, 3.0, 64)
        _, h1 = freqz_zpk(z, p, k, worN=w)
        _, h2 = ss.freqz_zpk(z, p, k, worN=w)
        allc(h1, h2, rtol=1e-10, atol=1e-12)
        sos = ss.butter(6, 0.3, output="sos")
        _, h1 = freqz_sos(sos, worN=128)
        _, h2 = ss.freqz_sos(sos, worN=128)
        allc(h1, h2, rtol=1e-10, atol=1e-12)

    def test_findfreqs(self):
        from godsp_tpu.models import findfreqs

        for args in [([1, 0], [1, 8, 25], 6), ([], [1, 2], 10),
                     ([1, 3], [1, 0, 9], 8)]:
            allc(findfreqs(*args), ss.findfreqs(*args), rtol=1e-12, atol=0)

    def test_czt_points(self):
        from godsp_tpu.fft import czt_points

        np.testing.assert_allclose(
            czt_points(5, w=np.exp(-2j * np.pi / 7), a=2.0),
            ss.czt_points(5, w=np.exp(-2j * np.pi / 7), a=2.0), rtol=1e-12)

    def test_bad_coefficients_warning(self):
        import warnings

        from godsp_tpu.models import BadCoefficients, normalize

        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            normalize([0.0, 1.0], [1.0, 2.0])
        assert any(r.category is BadCoefficients for r in rec)

    def test_aliases(self):
        from godsp_tpu.models import (check_COLA, check_NOLA, check_cola,
                                      check_nola, choose_conv_method)

        assert check_COLA is check_cola and check_NOLA is check_nola
        assert choose_conv_method(np.ones(10), np.ones(3)) == "fft"
        meth, times = choose_conv_method(np.ones(64), np.ones(8), measure=True)
        assert meth == "fft" and "fft" in times


class TestBandStopObj:
    def test_scipy_parity(self):
        from godsp_tpu.models import band_stop_obj

        passb = np.array([0.1, 0.6])
        stopb = np.array([0.2, 0.5])
        for t in ("butter", "cheby", "ellip"):
            g = band_stop_obj(0.15, 0, passb, stopb, 2.0, 30.0, t)
            r = ss.band_stop_obj(0.15, 0, passb, stopb, 2.0, 30.0, t)
            assert abs(g - r) < 1e-10 * max(1.0, abs(r))
        with pytest.raises(ValueError):
            band_stop_obj(0.15, 0, passb, stopb, 2.0, 30.0, "bogus")

    def test_prototype_reexports(self):
        import godsp_tpu.models as M

        for name in ("buttap", "cheb1ap", "cheb2ap", "besselap", "detrend",
                     "lp2lp_zpk", "lp2hp_zpk", "lp2bp_zpk", "lp2bs_zpk"):
            assert hasattr(M, name), name


class TestFindPeaksCwt:
    def test_scipy_parity(self):
        from godsp_tpu.models import find_peaks_cwt

        xs = np.linspace(0, 10, 400)
        sig = (np.sin(2 * np.pi * xs)
               + 0.3 * np.random.default_rng(0).normal(size=400))
        for widths in (np.arange(1, 20), np.arange(3, 40, 2)):
            g = find_peaks_cwt(sig, widths)
            r = np.asarray(ss.find_peaks_cwt(sig, widths))
            np.testing.assert_array_equal(g, r)
        g = find_peaks_cwt(sig, np.arange(1, 20), min_snr=2.0, noise_perc=20)
        r = np.asarray(ss.find_peaks_cwt(sig, np.arange(1, 20), min_snr=2.0,
                                         noise_perc=20))
        np.testing.assert_array_equal(g, r)

    def test_finds_true_peaks(self):
        from godsp_tpu.models import find_peaks_cwt

        xs = np.linspace(0, 6 * np.pi, 600)
        locs = find_peaks_cwt(np.sin(xs), np.arange(5, 30))
        true = [np.pi / 2 + 2 * np.pi * k for k in range(3)]
        assert len(locs) == 3
        for t, l in zip(true, locs):
            assert abs(xs[l] - t) < 0.1

    def test_validation(self):
        from godsp_tpu.models import find_peaks_cwt

        with pytest.raises(ValueError):
            find_peaks_cwt(np.zeros(50), [5.0, 10.0], max_distances=[1.0])



class TestReviewRegressions:
    """Round-2 self-review regressions (earlier-session range)."""

    def test_bessel_delay_does_not_mutate_registry(self):
        from godsp_tpu.models import design

        before = dict(design._PROTOTYPES)
        b1, a1 = design.bessel(5, 0.3, norm="delay")
        assert design._PROTOTYPES == before
        # registry path still gives phase-normed designs afterwards
        b2, a2 = design.bessel(4, 0.25)
        br, ar = ss.bessel(4, 0.25)
        allc(b2, br)
        allc(a2, ar)
        br, ar = ss.bessel(5, 0.3, norm="delay")
        allc(b1, br)
        allc(a1, ar)

    def test_find_peaks_ndarray_interval(self):
        from godsp_tpu.models import find_peaks

        x = np.array([0.0, 2.0, 0.0, 3.0, 0.0])
        p1, _ = find_peaks(x, prominence=np.array([0.1, 10.0]))
        p2, _ = ss.find_peaks(x, prominence=np.array([0.1, 10.0]))
        np.testing.assert_array_equal(p1, p2)

    def test_tf2zpk_leading_zero_gain(self):
        from godsp_tpu.models import BadCoefficients

        with pytest.warns(BadCoefficients):
            z1, p1, k1 = tf2zpk([0.0, 2.0, 4.0], [1.0, 0.5])
        with pytest.warns(ss.BadCoefficients):
            z2, p2, k2 = ss.tf2zpk([0.0, 2.0, 4.0], [1.0, 0.5])
        allc(np.sort_complex(np.atleast_1d(z1)),
             np.sort_complex(np.atleast_1d(z2)))
        assert abs(k1 - k2) < 1e-12
