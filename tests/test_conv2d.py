"""2-D convolution/correlation, Wiener filter, 2-D analytic signal —
scipy.signal float64 parity over the separable digit-order FFT chain
(fft/pow2.py pow2_convolve2)."""

import numpy as np
import pytest
import scipy.signal as ss

from godsp_tpu.models import (convolve2d, correlate2d, hilbert2,
                              medfilt2d, order_filter, wiener)


def allc(a, b, rtol=1e-9, atol=1e-11):
    a = np.asarray(a)
    assert a.shape == np.asarray(b).shape, (a.shape, np.asarray(b).shape)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    return rng.normal(size=(17, 23)), rng.normal(size=(4, 5))


class TestConvolve2d:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
    def test_scipy_parity(self, imgs, mode, boundary):
        a, b = imgs
        allc(convolve2d(a, b, mode=mode, boundary=boundary),
             ss.convolve2d(a, b, mode=mode, boundary=boundary))
        allc(correlate2d(a, b, mode=mode, boundary=boundary),
             ss.correlate2d(a, b, mode=mode, boundary=boundary))

    def test_fillvalue(self, imgs):
        a, b = imgs
        allc(convolve2d(a, b, mode="same", fillvalue=2.5),
             ss.convolve2d(a, b, mode="same", fillvalue=2.5))

    def test_complex_conjugate(self, imgs):
        a, b = imgs
        rng = np.random.default_rng(1)
        ac = a + 1j * rng.normal(size=a.shape)
        bc = b + 1j * rng.normal(size=b.shape)
        allc(convolve2d(ac, bc), ss.convolve2d(ac, bc))
        allc(correlate2d(ac, bc), ss.correlate2d(ac, bc))

    def test_odd_even_kernel_centering(self):
        """'same' centering differs between conv and corr for even
        kernel sizes — cover both parities per axis."""
        rng = np.random.default_rng(2)
        a = rng.normal(size=(12, 13))
        for ks in [(3, 3), (4, 4), (3, 4), (5, 2)]:
            b = rng.normal(size=ks)
            allc(convolve2d(a, b, mode="same"), ss.convolve2d(a, b, mode="same"))
            allc(correlate2d(a, b, mode="same"), ss.correlate2d(a, b, mode="same"))

    def test_batched(self, imgs):
        a, b = imgs
        stack = np.stack([a, 2 * a, a - 1.0])
        got = np.asarray(convolve2d(stack, b, mode="valid"))
        for i, x in enumerate(stack):
            allc(got[i], ss.convolve2d(x, b, mode="valid"))

    def test_validation(self, imgs):
        a, b = imgs
        with pytest.raises(ValueError):
            convolve2d(a, b, mode="bogus")
        with pytest.raises(ValueError):
            convolve2d(a, b, boundary="bogus")
        with pytest.raises(ValueError):
            convolve2d(b, a, mode="valid")  # in1 smaller
        with pytest.raises(ValueError):
            convolve2d(np.zeros(5), b)  # 1-D


class TestWiener:
    def test_scipy_parity_2d(self, imgs):
        a, _ = imgs
        allc(wiener(a), ss.wiener(a))
        allc(wiener(a, mysize=5, noise=0.1), ss.wiener(a, mysize=5, noise=0.1))
        allc(wiener(a, mysize=(3, 5)), ss.wiener(a, mysize=(3, 5)))

    def test_scipy_parity_1d(self):
        x = np.random.default_rng(3).normal(size=100)
        allc(wiener(x, mysize=7), ss.wiener(x, mysize=7))

    def test_validation(self):
        with pytest.raises(ValueError):
            wiener(np.zeros((2, 2, 2)))
        with pytest.raises(ValueError):
            wiener(np.zeros((8, 8)), mysize=4)  # even size


class TestHilbert2:
    @pytest.mark.parametrize("shape", [(16, 32), (17, 23), (8, 8)])
    def test_scipy_parity(self, shape):
        x = np.random.default_rng(4).normal(size=shape)
        allc(hilbert2(x), ss.hilbert2(x))

    def test_single_quadrant_spectrum(self):
        """The analytic image keeps only the (+,+) frequency quadrant
        (weight 4 there; zero in the other three, up to the DC/axis
        lines) — the defining property of the 2-D analytic signal."""
        x = np.random.default_rng(5).normal(size=(15, 17))
        Z = np.fft.fft2(np.asarray(hilbert2(x)))
        n1, n2 = x.shape
        # strictly negative rows AND/OR columns must be zeroed
        neg1 = np.arange(n1) > (n1 - 1) // 2
        neg2 = np.arange(n2) > (n2 - 1) // 2
        assert np.abs(Z).max() > 1.0  # sanity: spectrum is nonzero
        assert np.abs(Z[neg1, :]).max() < 1e-10
        assert np.abs(Z[:, neg2]).max() < 1e-10

    def test_validation(self):
        with pytest.raises(ValueError):
            hilbert2(np.zeros((4, 4)) + 0j)
        with pytest.raises(ValueError):
            hilbert2(np.zeros(8))


class TestRankFilters:
    def test_medfilt2d(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(17, 13))
        for k in (3, 5, (3, 5)):
            np.testing.assert_array_equal(np.asarray(medfilt2d(x, k)),
                                          ss.medfilt2d(x, k))

    def test_order_filter(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(12, 11))
        dom = np.ones((3, 3))
        dom[0, 0] = dom[2, 1] = 0
        for rank in (0, 3, 6):
            np.testing.assert_array_equal(
                np.asarray(order_filter(x, dom, rank)),
                ss.order_filter(x, dom, rank))

    def test_validation(self):
        with pytest.raises(ValueError):
            order_filter(np.zeros((4, 4)), np.ones((2, 3)), 1)
        with pytest.raises(ValueError):
            order_filter(np.zeros((4, 4)), np.ones((3, 3)), 9)


class TestFirwin2d:
    def test_separable_and_circular(self):
        from godsp_tpu.models import firwin_2d

        h = firwin_2d((9, 11), ("hamming", "hann"), fc=0.3)
        r = ss.firwin_2d((9, 11), ("hamming", "hann"), fc=0.3)
        np.testing.assert_allclose(h, r, rtol=0, atol=1e-13)
        h = firwin_2d((9, 9), "hamming", fc=0.4, circular=True)
        r = ss.firwin_2d((9, 9), "hamming", fc=0.4, circular=True)
        np.testing.assert_allclose(h, r, rtol=0, atol=1e-13)
        with pytest.raises(ValueError):
            firwin_2d((9, 9), ("hamming", "hann"))  # fc missing


class TestEnvelope:
    CASES = [
        dict(),
        dict(bp_in=(5, 50)),
        dict(squared=True),
        dict(residual="all"),
        dict(residual=None),
        dict(n_out=128),
        dict(n_out=300),
        dict(bp_in=(-20, 30)),
        dict(bp_in=(None, 40)),
        dict(bp_in=(10, 50), n_out=100),
    ]

    @pytest.mark.parametrize("kw", CASES)
    def test_real_parity(self, kw):
        from godsp_tpu.models import envelope

        z = np.random.default_rng(0).normal(size=256)
        g = np.asarray(envelope(z, **kw))
        r = np.asarray(ss.envelope(z, **kw))
        assert g.shape == r.shape
        np.testing.assert_allclose(g, r, rtol=1e-9, atol=1e-11)

    def test_complex_and_axis(self):
        from godsp_tpu.models import envelope

        rng = np.random.default_rng(1)
        zc = rng.normal(size=200) + 1j * rng.normal(size=200)
        for kw in [dict(bp_in=(-30, 40)), dict(bp_in=(-30, 40), n_out=100),
                   dict(residual="all")]:
            g = np.asarray(envelope(zc, **kw))
            r = np.asarray(ss.envelope(zc, **kw))
            assert g.shape == r.shape
            np.testing.assert_allclose(g, r, rtol=1e-9, atol=1e-11)
        Z2 = rng.normal(size=(3, 128)).T
        np.testing.assert_allclose(np.asarray(envelope(Z2, axis=0)),
                                   np.asarray(ss.envelope(Z2, axis=0)),
                                   rtol=1e-9, atol=1e-11)

    def test_validation(self):
        from godsp_tpu.models import envelope

        with pytest.raises(ValueError):
            envelope(np.zeros(16), residual="bogus")
        with pytest.raises(ValueError):
            envelope(np.zeros(16), bp_in=(5, 5))


class TestGammatone:
    def test_scipy_parity(self):
        from godsp_tpu.models import gammatone

        for freq, fs in [(440, 16000), (1000, 44100), (0.3, 2)]:
            b1, a1 = gammatone(freq, "iir", fs=fs)
            b2, a2 = ss.gammatone(freq, "iir", fs=fs)
            np.testing.assert_allclose(b1, b2, rtol=1e-11, atol=1e-20)
            np.testing.assert_allclose(a1, a2, rtol=1e-11, atol=1e-12)
        b1, _ = gammatone(800, "fir", fs=16000)
        b2, _ = ss.gammatone(800, "fir", fs=16000)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   rtol=1e-10, atol=1e-14)

    def test_unit_gain_at_center(self):
        from godsp_tpu.models import freqz, gammatone

        b, a = gammatone(440, "iir", fs=16000)
        _, h = freqz(b, a, worN=np.array([2 * np.pi * 440 / 16000]))
        # Slaney's closed-form gain is itself ~1e-6 accurate
        np.testing.assert_allclose(np.abs(h), 1.0, rtol=1e-5)

    def test_validation(self):
        from godsp_tpu.models import gammatone

        with pytest.raises(ValueError):
            gammatone(2.0, "iir")  # beyond Nyquist
        with pytest.raises(ValueError):
            gammatone(0.3, "bogus")


class TestEnvelopeNegativeBand:
    def test_fully_negative_band(self):
        """bp_in entirely below DC (complex input): envelope and both
        residual modes, incl. resampling."""
        from godsp_tpu.models import envelope

        rng = np.random.default_rng(7)
        zc = rng.normal(size=200) + 1j * rng.normal(size=200)
        for kw in [dict(bp_in=(-50, -10)),
                   dict(bp_in=(-50, -10), residual="all"),
                   dict(bp_in=(-50, -10), n_out=120)]:
            g = np.asarray(envelope(zc, **kw))
            r = np.asarray(ss.envelope(zc, **kw))
            assert g.shape == r.shape
            np.testing.assert_allclose(g, r, rtol=1e-9, atol=1e-11)


def test_fillvalue_numpy_scalar():
    """Review regression: np.int64 fillvalues must not silently take
    the zero-fill fast path."""
    rng = np.random.default_rng(11)
    a = rng.normal(size=(8, 9))
    b = rng.normal(size=(3, 4))
    g = np.asarray(convolve2d(a, b, mode="same", fillvalue=np.int64(2)))
    r = ss.convolve2d(a, b, mode="same", fillvalue=2)
    np.testing.assert_allclose(g, r, rtol=1e-9, atol=1e-11)
    with pytest.raises(ValueError):
        convolve2d(a, b, fillvalue=np.array([1.0, 2.0]))
