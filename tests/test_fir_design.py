"""Optimal FIR design (firls / remez / minimum_phase) vs scipy.signal.

firls is closed-form -> machine-precision parity.  remez converges on a
dense grid that is not bit-identical to scipy's C grid, so taps match to
~1e-4 and the real assertion is equiripple QUALITY: the max weighted
error on a fine continuum grid must not exceed scipy's by more than
0.5% (measured: ours is equal or slightly better on every case).
"""

import numpy as np
import pytest
import scipy.signal as ss

from godsp_tpu.models import firls, minimum_phase, remez


def _ripple(h, bands, desired, weight, ftype, fs=1.0):
    """Max weighted amplitude error over the bands on a 20k-point grid."""
    bands = np.asarray(bands, float).reshape(-1, 2) / fs * 2
    w = np.linspace(0, 1, 20001)[1:-1]
    n = len(h)
    M = (n - 1) / 2
    k = np.arange(n)
    err = 0.0
    for i, (f1, f2) in enumerate(bands):
        f = w[(w >= f1) & (w <= f2)]
        H = np.sum(h[None, :] * np.exp(-1j * np.pi * f[:, None] * k[None, :]), axis=1)
        A = H * np.exp(1j * np.pi * f * M)
        A = A.real if ftype == "bandpass" else A.imag
        D = desired[i] if ftype != "differentiator" else desired[i] * f / 2 * fs
        We = np.asarray(weight)[i] if weight is not None else 1.0
        if ftype == "differentiator" and desired[i] > 1e-4:
            We = We / np.maximum(D, 1e-30)
        err = max(err, np.abs((A - D) * We).max())
    return err


class TestFirls:
    CASES = [
        dict(numtaps=31, bands=[0, 0.2, 0.3, 1], desired=[1, 1, 0, 0]),
        dict(numtaps=51, bands=[0, 0.3, 0.4, 0.7, 0.8, 1],
             desired=[0, 0, 1, 1, 0, 0], weight=[1, 2, 0.5]),
        dict(numtaps=21, bands=[0, 0.1, 0.2, 0.4, 0.45, 1],
             desired=[1, 1, 0.5, 0.2, 0, 0]),
        dict(numtaps=95, bands=[0, 1000, 1500, 4000],
             desired=[1, 1, 0, 0], fs=8000),
    ]

    @pytest.mark.parametrize("kw", CASES)
    def test_scipy_parity(self, kw):
        np.testing.assert_allclose(firls(**kw), ss.firls(**kw),
                                   rtol=1e-7, atol=1e-11)

    def test_validation(self):
        with pytest.raises(ValueError):
            firls(30, [0, 0.5, 0.6, 1], [1, 1, 0, 0])  # even numtaps
        with pytest.raises(ValueError):
            firls(31, [0, 0.6, 0.5, 1], [1, 1, 0, 0])  # decreasing bands
        with pytest.raises(ValueError):
            firls(31, [0, 0.5, 0.6, 1], [1, 1, 0, 0], weight=[1, 2, 3])


class TestRemez:
    CASES = [
        dict(numtaps=31, bands=[0, 0.2, 0.3, 0.5], desired=[1, 0]),
        dict(numtaps=32, bands=[0, 0.2, 0.3, 0.5], desired=[1, 0]),
        dict(numtaps=51, bands=[0, 0.15, 0.2, 0.35, 0.4, 0.5],
             desired=[0, 1, 0], weight=[1, 2, 1]),
        dict(numtaps=32, bands=[0.05, 0.45], desired=[1], type="hilbert"),
        dict(numtaps=31, bands=[0.05, 0.45], desired=[1], type="hilbert"),
        dict(numtaps=24, bands=[0, 0.48], desired=[1], type="differentiator"),
        dict(numtaps=65, bands=[0, 0.1, 0.15, 0.3, 0.35, 0.5],
             desired=[1, 0.5, 0]),
        dict(numtaps=40, bands=[0, 800, 1200, 4000], desired=[1, 0], fs=8000),
        dict(numtaps=7, bands=[0, 0.1, 0.3, 0.5], desired=[1, 0]),
        dict(numtaps=128, bands=[0, 0.22, 0.26, 0.5], desired=[1, 0]),
    ]

    @pytest.mark.parametrize("kw", CASES)
    def test_equiripple_not_worse_than_scipy(self, kw):
        h1 = remez(**kw)
        h2 = ss.remez(**kw)
        ftype = kw.get("type", "bandpass")
        fs = kw.get("fs", 1.0)
        q1 = _ripple(h1, kw["bands"], kw["desired"], kw.get("weight"), ftype, fs)
        q2 = _ripple(h2, kw["bands"], kw["desired"], kw.get("weight"), ftype, fs)
        assert q1 <= q2 * 1.005, (q1, q2)
        # taps agree to grid-quantization level
        np.testing.assert_allclose(h1, h2, rtol=0, atol=2e-4)

    def test_linear_phase_structure(self):
        h = remez(41, [0, 0.2, 0.3, 0.5], [1, 0])
        np.testing.assert_allclose(h, h[::-1], atol=1e-12)  # type I symmetric
        h = remez(31, [0.05, 0.45], [1], type="hilbert")
        np.testing.assert_allclose(h, -h[::-1], atol=1e-12)  # type III antisym

    def test_validation(self):
        with pytest.raises(ValueError):
            remez(2, [0, 0.4], [1])
        with pytest.raises(ValueError):
            remez(31, [0, 0.2, 0.3, 0.5], [1, 0], type="bogus")
        with pytest.raises(ValueError):
            remez(31, [0, 0.3, 0.2, 0.5], [1, 0])
        with pytest.raises(ValueError):
            remez(31, [0, 0.2, 0.3, 0.5], [1, 0, 0])


class TestMinimumPhase:
    @pytest.mark.parametrize("taps", [31, 32, 65])
    def test_scipy_parity(self, taps):
        h = ss.remez(taps, [0, 0.2, 0.3, 1.0], [1, 0], fs=2.0)
        m1 = minimum_phase(h)
        m2 = ss.minimum_phase(h)
        assert len(m1) == len(m2)
        np.testing.assert_allclose(m1, m2, atol=1e-5)

    def test_half_false(self):
        h = ss.firwin(31, 0.4)
        m1 = minimum_phase(h, half=False)
        m2 = ss.minimum_phase(h, method="homomorphic", half=False)
        np.testing.assert_allclose(m1, m2, atol=1e-5)

    def test_magnitude_sqrt(self):
        """half=True: |H_min(f)|^2 approximates |H(f)| (sqrt magnitude)."""
        h = ss.remez(65, [0, 0.2, 0.3, 1.0], [1, 0], fs=2.0)
        m = minimum_phase(h)
        w = np.linspace(0.02, 0.15, 200) * np.pi  # passband interior
        _, Hm = ss.freqz(m, worN=w)
        _, H = ss.freqz(h, worN=w)
        np.testing.assert_allclose(np.abs(Hm) ** 2, np.abs(H), rtol=2e-2)

    def test_validation(self):
        with pytest.raises(ValueError):
            minimum_phase([1.0])
        with pytest.raises(ValueError):
            minimum_phase(np.ones(8), n_fft=4)


class TestMinimumPhaseExplicitNfft:
    def test_small_nfft_parity(self):
        """Review regression: the cepstral fold window must zero the
        Nyquist quefrency for even n_fft (keep it once for odd)."""
        h = ss.remez(31, [0, 0.2, 0.3, 1.0], [1, 0], fs=2.0)
        for nfft in (64, 65, 128):
            np.testing.assert_allclose(
                np.asarray(minimum_phase(h, n_fft=nfft)),
                ss.minimum_phase(h, n_fft=nfft), rtol=0, atol=1e-12)
