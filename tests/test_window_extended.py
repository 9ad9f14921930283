"""Extended window catalogue (window/extended.py) vs
scipy.signal.windows — both symmetric and periodic forms, plus the
get_window dispatcher and its use inside the scipy-convention welch."""

import numpy as np
import pytest
import scipy.signal as ss
import scipy.signal.windows as sw

from godsp_tpu.window import extended as E
from godsp_tpu.window import get_window


def allc(a, b, tol=1e-12):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    if a.size:
        np.testing.assert_allclose(a, b, rtol=0, atol=tol)


PLAIN = ["triang", "parzen", "bohman", "barthann", "cosine", "lanczos"]


class TestPlainWindows:
    @pytest.mark.parametrize("name", PLAIN)
    @pytest.mark.parametrize("M", [1, 2, 7, 8, 16, 51])
    @pytest.mark.parametrize("sym", [True, False])
    def test_scipy_parity(self, name, M, sym):
        allc(getattr(E, name)(M, sym=sym), getattr(sw, name)(M, sym=sym))


class TestParamWindows:
    @pytest.mark.parametrize("M", [2, 8, 16, 51])
    @pytest.mark.parametrize("sym", [True, False])
    def test_gaussians_tukey_exponential(self, M, sym):
        allc(E.gaussian(M, 2.5, sym=sym), sw.gaussian(M, 2.5, sym=sym))
        allc(E.general_gaussian(M, 1.5, 5, sym=sym),
             sw.general_gaussian(M, 1.5, 5, sym=sym))
        allc(E.tukey(M, 0.4, sym=sym), sw.tukey(M, 0.4, sym=sym))
        allc(E.exponential(M, tau=3.0, sym=sym),
             sw.exponential(M, tau=3.0, sym=sym))

    @pytest.mark.parametrize("M", [2, 8, 16, 51])
    @pytest.mark.parametrize("sym", [True, False])
    def test_chebwin_taylor(self, M, sym):
        allc(E.chebwin(M, 80, sym=sym), sw.chebwin(M, 80, sym=sym), 1e-10)
        allc(E.taylor(M, 4, 30, sym=sym), sw.taylor(M, 4, 30, sym=sym), 1e-10)

    def test_tukey_degenerate(self):
        allc(E.tukey(16, 0.0), sw.tukey(16, 0.0))
        allc(E.tukey(16, 1.0), sw.tukey(16, 1.0))

    def test_exponential_center_validation(self):
        with pytest.raises(ValueError):
            E.exponential(16, center=4.0, sym=True)


class TestDpss:
    @pytest.mark.parametrize("M", [16, 65, 128])
    def test_scipy_parity(self, M):
        allc(E.dpss(M, 3), sw.dpss(M, 3), 1e-8)
        allc(E.dpss(M, 3, 5), sw.dpss(M, 3, 5), 1e-8)
        allc(E.dpss(M, 2.5, 4, norm=2), sw.dpss(M, 2.5, 4, norm=2), 1e-8)
        allc(E.dpss(M, 3, norm="subsample"), sw.dpss(M, 3, norm="subsample"),
             1e-8)

    def test_orthonormal(self):
        wins = E.dpss(128, 3, 5, norm=2)
        gram = wins @ wins.T
        allc(gram, np.eye(5), 1e-8)

    def test_validation(self):
        with pytest.raises(ValueError):
            E.dpss(16, 0.0)
        with pytest.raises(ValueError):
            E.dpss(16, 3, 20)
        with pytest.raises(ValueError):
            E.dpss(16, 3, norm="bogus")


class TestGetWindow:
    SPECS = ["hann", "hamming", "blackman", "blackmanharris", "nuttall",
             "flattop", "bartlett", "boxcar", "triang", "parzen", "bohman",
             "barthann", "cosine", "lanczos", ("kaiser", 8.6),
             ("gaussian", 7), ("tukey", 0.25), ("chebwin", 90),
             ("exponential", None, 3.0), ("general_gaussian", 1.5, 7),
             ("dpss", 3), ("taylor", 4, 30), 8.6]

    @pytest.mark.parametrize("fftbins", [True, False])
    def test_scipy_parity(self, fftbins):
        for spec in self.SPECS:
            g = get_window(spec, 64, fftbins=fftbins)
            r = ss.get_window(spec, 64, fftbins=fftbins)
            allc(g, r, 1e-8)

    def test_unknown(self):
        with pytest.raises(ValueError):
            get_window("bogus", 16)
        with pytest.raises(ValueError):
            get_window(("gaussian",), 16)  # missing param

    def test_welch_accepts_catalogue_names(self):
        """The spectral estimators consume the full catalogue."""
        from godsp_tpu.spectral import welch

        x = np.random.default_rng(0).normal(size=2048)
        for wspec in ["parzen", ("chebwin", 80), ("gaussian", 32)]:
            f1, p1 = welch(x, nperseg=256, window=wspec)
            f2, p2 = ss.welch(x, nperseg=256, window=wspec)
            np.testing.assert_allclose(np.asarray(p1), p2, rtol=1e-8,
                                       atol=1e-12)


class TestWindowsNamespace:
    """godsp_tpu.windows — the scipy.signal.windows-style namespace with
    (M, sym) conventions for every catalogue window."""

    CORE = ["boxcar", "bartlett", "blackman", "blackmanharris", "flattop",
            "hamming", "hann", "nuttall"]

    @pytest.mark.parametrize("sym", [True, False])
    def test_core_names(self, sym):
        from godsp_tpu import windows as W

        for M in (1, 2, 8, 16, 51):
            for name in self.CORE:
                g = getattr(W, name)(M, sym=sym)
                r = getattr(sw, name)(M, sym=sym)
                allc(g, r, 1e-13)
            allc(W.kaiser(M, 8.6, sym=sym), sw.kaiser(M, 8.6, sym=sym), 1e-13)
            allc(W.general_cosine(M, [0.4, 0.5, 0.1], sym=sym),
                 sw.general_cosine(M, [0.4, 0.5, 0.1], sym=sym), 1e-13)
            allc(W.general_hamming(M, 0.6, sym=sym),
                 sw.general_hamming(M, 0.6, sym=sym), 1e-13)

    def test_kbd(self):
        from godsp_tpu import windows as W

        for M in (2, 8, 16, 50):
            allc(W.kaiser_bessel_derived(M, 6.0),
                 sw.kaiser_bessel_derived(M, 6.0), 1e-13)
        with pytest.raises(ValueError):
            W.kaiser_bessel_derived(9, 6.0)
        with pytest.raises(ValueError):
            W.kaiser_bessel_derived(8, 6.0, sym=False)

    def test_namespace_completeness(self):
        from godsp_tpu import windows as W

        for name in sw.__all__:
            assert hasattr(W, name), name
