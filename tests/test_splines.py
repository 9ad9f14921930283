"""B-spline surface (models/splines.py) vs scipy.signal.

The DCT-II diagonalization is the EXACT half-sample-mirror solution:
lamb=0 paths match scipy to f64 round-off, and the self-exactness test
(B3 * c == x under symmetric padding) holds at 1e-13.  scipy's
smoothing path (lamb>0) uses truncated initial conditions, so its few
boundary samples differ from the exact solution by up to ~3e-3 with a
geometric decay — compare interiors tightly, edges loosely."""

import numpy as np
import pytest
import scipy.signal as ss

import godsp_tpu.models as M


@pytest.fixture(scope="module")
def sig():
    return np.random.default_rng(0).normal(size=200)


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(1).normal(size=(40, 50))


class TestCoefficients:
    def test_cspline1d(self, sig):
        np.testing.assert_allclose(np.asarray(M.cspline1d(sig)),
                                   ss.cspline1d(sig), rtol=1e-11, atol=1e-12)

    def test_cspline1d_smoothing(self, sig):
        c = np.asarray(M.cspline1d(sig, lamb=2.5))
        r = ss.cspline1d(sig, lamb=2.5)
        # scipy's truncated boundary ICs leave a geometric transient
        # (~3e-3 at the edge); deep interior agrees tightly
        np.testing.assert_allclose(c[80:-80], r[80:-80], rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(c, r, rtol=0, atol=5e-3)

    def test_qspline1d(self, sig):
        np.testing.assert_allclose(np.asarray(M.qspline1d(sig)),
                                   ss.qspline1d(sig), rtol=1e-11, atol=1e-12)
        with pytest.raises(ValueError):
            M.qspline1d(sig, lamb=1.0)

    def test_2d(self, img):
        # scipy's 2-D C path truncates at ~1e-6 by default; ours is exact
        np.testing.assert_allclose(np.asarray(M.cspline2d(img)),
                                   ss.cspline2d(img), rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(M.qspline2d(img)),
                                   ss.qspline2d(img), rtol=0, atol=1e-5)

    def test_self_exactness(self, sig):
        """B3 convolved with the coefficients under symmetric padding
        reproduces the input exactly — the defining property."""
        c = np.asarray(M.cspline1d(sig))
        cp = np.pad(c, 1, mode="symmetric")
        recon = (cp[:-2] + 4 * cp[1:-1] + cp[2:]) / 6.0
        np.testing.assert_allclose(recon, sig, rtol=0, atol=1e-12)
        q = np.asarray(M.qspline1d(sig))
        qp = np.pad(q, 1, mode="symmetric")
        recon = (qp[:-2] + 6 * qp[1:-1] + qp[2:]) / 8.0
        np.testing.assert_allclose(recon, sig, rtol=0, atol=1e-12)


class TestEvaluators:
    def test_cspline1d_eval(self, sig):
        cj = ss.cspline1d(sig)
        newx = np.linspace(-7, 210, 333)
        np.testing.assert_allclose(np.asarray(M.cspline1d_eval(cj, newx)),
                                   ss.cspline1d_eval(cj, newx),
                                   rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(
            np.asarray(M.cspline1d_eval(cj, newx, dx=0.5, x0=-2)),
            ss.cspline1d_eval(cj, newx, dx=0.5, x0=-2),
            rtol=1e-12, atol=1e-13)

    def test_qspline1d_eval(self, sig):
        qj = ss.qspline1d(sig)
        newx = np.linspace(-7, 210, 333)
        np.testing.assert_allclose(np.asarray(M.qspline1d_eval(qj, newx)),
                                   ss.qspline1d_eval(qj, newx),
                                   rtol=1e-12, atol=1e-13)

    def test_interpolation_property(self, sig):
        """Evaluating at the knots reproduces the signal."""
        cj = np.asarray(M.cspline1d(sig))
        at_knots = np.asarray(M.cspline1d_eval(cj, np.arange(len(sig))))
        np.testing.assert_allclose(at_knots, sig, rtol=0, atol=1e-11)


class TestSplineFilterGauss:
    def test_spline_filter(self, img):
        got = np.asarray(M.spline_filter(img, 5.0))
        ref = ss.spline_filter(img, 5.0)
        # the lmbda=5 boundary transient spans most of a 40x50 image, so
        # scipy's truncated ICs differ at the few-1e-3 level throughout
        np.testing.assert_allclose(got, ref, rtol=0, atol=5e-3)

    def test_exact_reconstruction(self, img):
        """lamb=0: B3xB3 applied to the 2-D coefficients reproduces the
        image exactly — validates the whole cspline2d+sepfir2d chain."""
        from godsp_tpu.models import sepfir2d

        ck = M.cspline2d(img, 0.0)
        h = np.array([1.0, 4.0, 1.0]) / 6.0
        recon = np.asarray(sepfir2d(ck, h, h))
        np.testing.assert_allclose(recon, img, rtol=0, atol=1e-11)

    def test_gauss_spline(self):
        x = np.linspace(-3, 3, 50)
        np.testing.assert_allclose(np.asarray(M.gauss_spline(x, 3)),
                                   ss.gauss_spline(x, 3),
                                   rtol=1e-12, atol=1e-14)


class TestSymiir:
    def test_symiirorder1(self, sig):
        got = np.asarray(M.symiirorder1(sig, 1.5, 0.4))
        ref = ss.symiirorder1(sig, 1.5, 0.4)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10)

    def test_symiirorder2(self, sig):
        got = np.asarray(M.symiirorder2(sig, 0.3, 0.5))
        ref = ss.symiirorder2(sig, 0.3, 0.5)
        # scipy truncates its boundary sums around 1e-7
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_validation(self, sig):
        with pytest.raises(ValueError):
            M.symiirorder1(sig, 1.0, 1.5)
        with pytest.raises(ValueError):
            M.symiirorder2(sig, 1.5, 0.5)
