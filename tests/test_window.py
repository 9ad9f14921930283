"""Window taper tests; golden tables ported from reference
window/window_test.go:23-59."""

import numpy as np
import pytest

from godsp_tpu import window
from godsp_tpu.dsputils import pretty_close

GOLDEN = {
    1: {
        "hamming": [1],
        "hann": [1],
        "bartlett": [1],
        "flat_top": [1],
        "blackman": [1],
    },
    5: {
        "hamming": [0.08, 0.54, 1, 0.54, 0.08],
        "hann": [0, 0.5, 1, 0.5, 0],
        "bartlett": [0, 0.5, 1, 0.5, 0],
        "flat_top": [
            -0.0004210510000000013,
            -0.05473684000000003,
            1,
            -0.05473684000000003,
            -0.0004210510000000013,
        ],
        "blackman": [0, 0.34, 1, 0.34, 0],
    },
    10: {
        "hamming": [
            0.08, 0.18761956, 0.46012184, 0.77, 0.97225861,
            0.97225861, 0.77, 0.46012184, 0.18761956, 0.08,
        ],
        "hann": [
            0, 0.116977778440511, 0.413175911166535, 0.75, 0.969846310392954,
            0.969846310392954, 0.75, 0.413175911166535, 0.116977778440511, 0,
        ],
        "bartlett": [
            0, 0.222222222222222, 0.444444444444444, 0.666666666666667,
            0.888888888888889, 0.888888888888889, 0.666666666666667,
            0.444444444444444, 0.222222222222222, 0,
        ],
        "flat_top": [
            -0.000421051000000, -0.020172031509486, -0.070199042063189,
            0.198210530000000, 0.862476344072674, 0.862476344072674,
            0.198210530000000, -0.070199042063189, -0.020172031509486,
            -0.000421051000000,
        ],
        "blackman": [
            0, 0.0508696327, 0.258000502, 0.63, 0.951129866,
            0.951129866, 0.63, 0.258000502, 0.0508696327, 0,
        ],
    },
}


@pytest.mark.parametrize("L", [1, 5, 10])
@pytest.mark.parametrize("name", ["hamming", "hann", "bartlett", "flat_top", "blackman"])
def test_window_golden(L, name):
    got = np.asarray(window.WINDOWS[name](L))
    assert pretty_close(got, GOLDEN[L][name]), (name, L, got)


def test_rectangular():
    np.testing.assert_allclose(np.asarray(window.rectangular(4)), np.ones(4))


def test_apply():
    # window_test.go:78-82: applying Hamming to a rectangular window
    # reproduces the Hamming table.
    o = window.apply(window.rectangular(10), window.hamming)
    assert pretty_close(np.asarray(o), GOLDEN[10]["hamming"])


def test_apply_by_name():
    o = window.apply(np.ones(5), "hann")
    assert pretty_close(np.asarray(o), GOLDEN[5]["hann"])


def test_apply_batched():
    o = window.apply(np.ones((3, 5)), window.hann)
    assert o.shape == (3, 5)
    for row in np.asarray(o):
        assert pretty_close(row, GOLDEN[5]["hann"])


def test_symmetry():
    for name, wf in window.WINDOWS.items():
        w = np.asarray(wf(33))
        np.testing.assert_allclose(w, w[::-1], atol=1e-15, err_msg=name)


class TestBeyondReferenceWindows:
    """Round-2 additions: blackman-harris, nuttall, kaiser (scipy forms)."""

    def test_vs_scipy(self):
        import scipy.signal.windows as sw

        for name, ref in (
            ("blackman_harris", sw.blackmanharris),
            ("nuttall", sw.nuttall),
        ):
            got = np.asarray(window.WINDOWS[name](64))
            np.testing.assert_allclose(got, ref(64, sym=True), atol=1e-12)

    def test_kaiser_vs_scipy(self):
        import scipy.signal.windows as sw

        w = window.kaiser(8.6)
        np.testing.assert_allclose(
            np.asarray(w(128)), sw.kaiser(128, 8.6, sym=True), rtol=1e-10
        )
        assert np.asarray(w(1)) == [1.0]

    def test_usable_in_pwelch(self):
        from godsp_tpu import spectral

        import jax.numpy as jnp

        x = np.random.default_rng(0).normal(size=2048)
        pxx, _ = spectral.pwelch(
            jnp.asarray(x), 2.0,
            spectral.PwelchOptions(nfft=256, window="blackman_harris"),
        )
        assert pxx.shape == (129,)
        pxx2, _ = spectral.pwelch(
            jnp.asarray(x), 2.0,
            spectral.PwelchOptions(nfft=256, window=window.kaiser(12.0)),
        )
        assert pxx2.shape == (129,)
