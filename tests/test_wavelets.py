"""CWT bank (models/wavelets.py) vs an independent numpy oracle of the
classic scipy.signal.cwt semantics (cwt was removed from scipy 1.15, so
the oracle is implemented here from the definition: row i = 'same'
convolution with conj(reversed wavelet(min(10*w_i, n), w_i)))."""

import numpy as np
import pytest

from godsp_tpu.models import cwt, morlet, morlet2, ricker


def _oracle(data, wavelet, widths, **kw):
    probe = wavelet(2, widths[0], **kw)
    out = np.empty((len(widths), len(data)),
                   complex if np.iscomplexobj(probe) else float)
    for i, w in enumerate(widths):
        N = int(min(10 * w, len(data)))
        wv = np.conj(np.asarray(wavelet(N, w, **kw))[::-1])
        out[i] = np.convolve(data, wv, mode="same")
    return out


class TestWaveletKernels:
    def test_ricker_properties(self):
        w = ricker(101, 10.0)
        assert w.shape == (101,)
        assert np.argmax(w) == 50  # peak at center
        # zero crossings of the Mexican hat at t = +-a
        assert abs(w[50 + 10] / w[50]) < 0.05
        # integral of the admissible wavelet -> 0 once the support is
        # wide enough to contain the Gaussian tails
        assert abs(ricker(2001, 10.0).sum()) < 1e-10

    def test_morlet2_energy(self):
        for s in (5.0, 13.0):
            w = morlet2(int(20 * s), s)
            np.testing.assert_allclose(np.sum(np.abs(w) ** 2) / np.sqrt(np.pi),
                                       1.0 / np.sqrt(np.pi), rtol=1e-6)

    def test_morlet_complete_term(self):
        wc = morlet(64, complete=True)
        wi = morlet(64, complete=False)
        assert np.abs(wc - wi).max() > 0  # correction applied
        assert np.abs(wc - wi).max() < 1e-5  # but tiny at w=5


class TestCwt:
    def test_ricker_oracle(self):
        x = np.random.default_rng(0).normal(size=500)
        widths = np.arange(1, 31)
        got = np.asarray(cwt(x, ricker, widths))
        np.testing.assert_allclose(got, _oracle(x, ricker, widths),
                                   rtol=1e-9, atol=1e-11)

    def test_morlet2_oracle_complex(self):
        x = np.random.default_rng(1).normal(size=300)
        widths = np.geomspace(1, 25, 12)
        got = np.asarray(cwt(x, morlet2, widths, w=6.0))
        assert np.iscomplexobj(got)
        np.testing.assert_allclose(got, _oracle(x, morlet2, widths, w=6.0),
                                   rtol=1e-9, atol=1e-11)

    def test_length_capping(self):
        x = np.random.default_rng(2).normal(size=40)
        widths = [1, 5, 80]  # 10*80 far exceeds n=40
        got = np.asarray(cwt(x, ricker, widths))
        np.testing.assert_allclose(got, _oracle(x, ricker, widths),
                                   rtol=1e-9, atol=1e-11)

    def test_chirp_ridge(self):
        """The scalogram ridge follows a rising chirp toward smaller
        widths."""
        t = np.linspace(0, 1, 800)
        sig = np.cos(2 * np.pi * (30 * t + 40 * t**2))
        widths = np.geomspace(2, 40, 24)
        C = np.abs(np.asarray(cwt(sig, morlet2, widths, w=6.0)))
        ridge = np.argmax(C, axis=0)
        assert ridge[100] > ridge[-100]

    def test_validation(self):
        with pytest.raises(ValueError):
            cwt(np.zeros((2, 3)), ricker, [1.0])
        with pytest.raises(ValueError):
            cwt(np.zeros(8), ricker, [-1.0])
        with pytest.raises(ValueError):
            cwt(np.zeros(0), ricker, [1.0])
