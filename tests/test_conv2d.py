"""2-D convolution/correlation, Wiener filter, 2-D analytic signal —
scipy.signal float64 parity over the separable digit-order FFT chain
(fft/pow2.py pow2_convolve2)."""

import numpy as np
import pytest
import scipy.signal as ss

from godsp_tpu.models import convolve2d, correlate2d, hilbert2, wiener


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
