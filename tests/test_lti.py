"""LTI systems toolkit (models/lti.py) vs scipy.signal: state-space
conversions, discretization, one-scan simulation, analog responses, and
partial fractions.  The simulation recurrence runs as a device-side
associative scan; parity here is float64 on the CPU backend."""

import numpy as np
import pytest
import scipy.signal as ss

import godsp_tpu.models as M


def allc(a, b, rtol=1e-9, atol=1e-11):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def sysc():
    return ss.tf2ss(*ss.butter(3, 2.0, analog=True))


@pytest.fixture(scope="module")
def sysd(sysc):
    return ss.cont2discrete(sysc, 0.05)


class TestConversions:
    @pytest.mark.parametrize("ba", [([1.0, 3.0, 3.0], [1.0, 2.0, 1.0]),
                                    ([1.0], [1.0, 2.0, 1.0]),
                                    ([2.0, 1.0], [1.0, 0.5])])
    def test_tf2ss(self, ba):
        for g, r in zip(M.tf2ss(*ba), ss.tf2ss(*ba)):
            allc(np.atleast_2d(g), np.atleast_2d(r), rtol=0, atol=1e-13)

    def test_ss2tf_roundtrip(self):
        A, B, C, D = ss.tf2ss(*ss.butter(4, 0.3))
        n1, d1 = M.ss2tf(A, B, C, D)
        n2, d2 = ss.ss2tf(A, B, C, D)
        allc(n1, n2, rtol=1e-8, atol=1e-10)
        allc(d1, d2, rtol=1e-10, atol=1e-12)

    def test_zpk_ss_roundtrip(self):
        z, p, k = ss.butter(3, 0.4, output="zpk")
        A, B, C, D = M.zpk2ss(z, p, k)
        z2, p2, k2 = M.ss2zpk(A, B, C, D)
        # butter's triple zero at -1 re-roots with cube-root conditioning
        # (~(eps)^(1/3) ≈ 1e-5) — inherent to any poly->roots roundtrip
        allc(np.sort_complex(z2), np.sort_complex(z), rtol=1e-4, atol=1e-4)
        allc(np.sort_complex(p2), np.sort_complex(p), rtol=1e-6, atol=1e-7)
        assert abs(k2 - k) < 1e-8

    def test_validation(self):
        with pytest.raises(ValueError):
            M.tf2ss([1.0, 1.0, 1.0], [1.0, 2.0])  # improper
        with pytest.raises(ValueError):
            M.tf2ss([1.0], [0.0, 1.0])


class TestCont2Discrete:
    @pytest.mark.parametrize("meth", ["zoh", "bilinear", "euler",
                                      "backward_diff", "foh", "impulse"])
    def test_scipy_parity(self, sysc, meth):
        g = M.cont2discrete(sysc, 0.05, method=meth)
        r = ss.cont2discrete(sysc, 0.05, method=meth)
        for x, y in zip(g[:4], r[:4]):
            allc(np.atleast_2d(x), np.atleast_2d(y), rtol=1e-12, atol=1e-13)

    def test_gbt_alpha(self, sysc):
        g = M.cont2discrete(sysc, 0.05, method="gbt", alpha=0.3)
        r = ss.cont2discrete(sysc, 0.05, method="gbt", alpha=0.3)
        for x, y in zip(g[:4], r[:4]):
            allc(np.atleast_2d(x), np.atleast_2d(y), rtol=1e-12, atol=1e-13)

    def test_tf_input(self):
        b, a = ss.butter(2, 3.0, analog=True)
        g = M.cont2discrete((b, a), 0.1)
        r = ss.cont2discrete((b, a), 0.1)
        # scipy converts tf input through tf2ss the same way
        for x, y in zip(g[:4], r[:4]):
            allc(np.atleast_2d(x), np.atleast_2d(y), rtol=1e-11, atol=1e-12)

    def test_validation(self, sysc):
        with pytest.raises(ValueError):
            M.cont2discrete(sysc, 0.05, method="bogus")
        with pytest.raises(ValueError):
            M.cont2discrete(sysc, 0.05, method="gbt")  # alpha missing


class TestSimulation:
    def test_dlsim(self, sysd):
        t = np.arange(300) * 0.05
        u = np.sin(t * 1.3)
        _, y1, x1 = M.dlsim(sysd, u)
        ref = ss.dlsim(sysd, u)
        allc(y1.ravel(), np.ravel(ref[1]), rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize("interp", [True, False])
    def test_lsim(self, sysc, interp):
        rng = np.random.default_rng(1)
        T = np.linspace(0, 5, 201)
        U = np.sin(T * 3.0) + 0.2 * rng.normal(size=T.shape)
        _, y1, _ = M.lsim(sysc, U, T, interp=interp)
        _, y2, _ = ss.lsim(sysc, U, T, interp=interp)
        allc(np.ravel(y1), np.ravel(y2), rtol=1e-7, atol=1e-8)

    def test_lsim_x0(self, sysc):
        T = np.linspace(0, 5, 101)
        U = np.cos(T)
        _, y1, _ = M.lsim(sysc, U, T, X0=[0.3, -0.2, 0.1])
        _, y2, _ = ss.lsim(sysc, U, T, X0=[0.3, -0.2, 0.1])
        allc(np.ravel(y1), np.ravel(y2), rtol=1e-7, atol=1e-8)

    def test_impulse_step(self, sysc):
        t1, y1 = M.impulse(sysc)
        t2, y2 = ss.impulse(sysc)
        allc(t1, t2, rtol=1e-9, atol=0)
        allc(np.ravel(y1), np.ravel(y2), rtol=1e-5, atol=1e-7)
        T = np.linspace(0, 4, 120)
        _, y1 = M.step(sysc, T=T)
        _, y2 = ss.step(sysc, T=T)
        allc(np.ravel(y1), np.ravel(y2), rtol=1e-6, atol=1e-8)

    def test_dimpulse_dstep(self, sysd):
        _, y1 = M.dimpulse(sysd, n=60)
        _, y2 = ss.dimpulse(sysd, n=60)
        allc(y1[0], y2[0], rtol=1e-8, atol=1e-10)
        _, y1 = M.dstep(sysd, n=60)
        _, y2 = ss.dstep(sysd, n=60)
        allc(y1[0], y2[0], rtol=1e-8, atol=1e-10)

    def test_validation(self, sysc):
        with pytest.raises(ValueError):
            M.lsim(sysc, np.zeros(5), np.array([0.0, 0.1, 0.3, 0.4, 0.5]))
        with pytest.raises(ValueError):
            M.dlsim(ss.cont2discrete(sysc, 0.1), np.zeros((4, 2)))


class TestAnalogResponses:
    def test_freqs(self):
        b, a = ss.butter(4, 100.0, analog=True)
        w = np.logspace(0, 4, 50)
        _, h1 = M.freqs(b, a, worN=w)
        _, h2 = ss.freqs(b, a, worN=w)
        allc(h1, h2, rtol=1e-10, atol=1e-12)
        w_auto, h_auto = M.freqs(b, a, worN=64)
        assert len(w_auto) == 64 and np.all(np.diff(w_auto) > 0)

    def test_freqs_zpk(self):
        z, p, k = ss.butter(4, 100.0, analog=True, output="zpk")
        w = np.logspace(0, 4, 50)
        _, h1 = M.freqs_zpk(z, p, k, worN=w)
        _, h2 = ss.freqs_zpk(z, p, k, worN=w)
        allc(h1, h2, rtol=1e-10, atol=1e-12)

    def test_bode(self):
        b, a = ss.butter(4, 100.0, analog=True)
        w = np.logspace(0, 4, 50)
        w1, m1, p1 = M.bode((b, a), w=w)
        w2, m2, p2 = ss.bode((b, a), w=w)
        allc(m1, m2, rtol=1e-8, atol=1e-9)
        allc(p1, p2, rtol=1e-8, atol=1e-9)


def _cmp_pf(got, ref, tol=1e-7):
    rg, pg, kg = got
    rs_, ps_, ks_ = ref
    ig = np.lexsort((np.imag(pg).round(6), np.real(pg).round(6),
                     np.abs(rg).round(6)))
    ir = np.lexsort((np.imag(ps_).round(6), np.real(ps_).round(6),
                     np.abs(rs_).round(6)))
    allc(np.asarray(rg)[ig], np.asarray(rs_)[ir], rtol=tol, atol=tol)
    allc(np.asarray(pg)[ig], np.asarray(ps_)[ir], rtol=tol, atol=tol)
    if np.size(kg) and np.size(ks_):
        allc(np.ravel(kg), np.ravel(ks_), rtol=1e-9, atol=1e-10)
    else:
        assert np.size(kg) == 0 or not np.any(np.ravel(kg))
        assert np.size(ks_) == 0 or not np.any(np.ravel(ks_))


class TestPartialFractions:
    S_CASES = [
        ([1.0, 2.0], [1.0, 5.0, 6.0]),
        ([1.0], np.convolve([1, 2], np.convolve([1, 2], [1, 3]))),
        ([3, 1, 2, 1], [1, 2, 1]),
        ([1.0, 0.5, 0.2], [1.0, 0.1, 0.9, 0.3]),
    ]

    @pytest.mark.parametrize("ba", S_CASES)
    def test_residue_parity_and_roundtrip(self, ba):
        b, a = ba
        _cmp_pf(M.residue(b, a), ss.residue(b, a))
        r_, p_, k_ = M.residue(b, a)
        b2, a2 = M.invres(r_, p_, k_)
        sgrid = np.linspace(0.5, 2.0, 7) * 1j
        H1 = np.polyval(np.atleast_1d(np.asarray(b, float)), sgrid) / np.polyval(
            np.asarray(a, float), sgrid)
        H2 = np.polyval(np.real(np.atleast_1d(b2)), sgrid) / np.polyval(
            np.real(np.atleast_1d(a2)), sgrid)
        allc(H1, H2, rtol=1e-7, atol=1e-8)

    Z_CASES = [
        ([1.0, -1.0], [1.0, -1.5, 0.56]),
        ([1.0, 0.2], np.convolve([1.0, -0.5],
                                 np.convolve([1.0, -0.5], [1.0, 0.3]))),
        ([2.0, 1.0, 0.5, -0.1], [1.0, -0.9, 0.2]),
    ]

    @pytest.mark.parametrize("ba", Z_CASES)
    def test_residuez_parity_and_roundtrip(self, ba):
        b, a = ba
        _cmp_pf(M.residuez(b, a), ss.residuez(b, a))
        r_, p_, k_ = M.residuez(b, a)
        b2, a2 = M.invresz(r_, p_, k_)

        def ev(c, z):
            c = np.atleast_1d(c)
            return np.sum(c[None, :] * z[:, None]
                          ** (-np.arange(len(c)))[None, :], axis=1)

        zg = np.exp(1j * np.linspace(0.3, 2.8, 9))
        H1 = ev(np.asarray(b, float), zg) / ev(np.asarray(a, float), zg)
        H2 = ev(np.real(np.atleast_1d(b2)), zg) / ev(
            np.real(np.atleast_1d(a2)), zg)
        allc(H1, H2, rtol=1e-7, atol=1e-8)

    def test_unique_roots(self):
        p = [1.0, 1.0001, 2.0, 2.0, 3.5]
        u1, m1 = M.unique_roots(p, tol=1e-3, rtype="min")
        u2, m2 = ss.unique_roots(p, tol=1e-3, rtype="min")
        allc(np.sort(u1.real), np.sort(np.asarray(u2).real), rtol=1e-12, atol=0)
        assert sorted(m1) == sorted(np.asarray(m2).tolist())
        with pytest.raises(ValueError):
            M.unique_roots(p, rtype="bogus")


class TestResponseExtras:
    def test_bilinear_tf(self):
        from godsp_tpu.models import bilinear

        b1, a1 = bilinear([1.0, 2.0], [1.0, 3.0, 4.0], fs=2.0)
        b2, a2 = ss.bilinear([1.0, 2.0], [1.0, 3.0, 4.0], fs=2.0)
        allc(b1, b2, rtol=1e-10, atol=1e-12)
        allc(a1, a2, rtol=1e-10, atol=1e-12)

    def test_freqresp(self):
        b, a = ss.butter(4, 100.0, analog=True)
        w = np.logspace(0, 4, 40)
        _, h1 = M.freqresp((b, a), w=w)
        _, h2 = ss.freqresp((b, a), w=w)
        allc(h1, h2, rtol=1e-9, atol=1e-11)

    def test_dfreqresp_dbode(self):
        sysd = ([1.0, -0.5], [1.0, -0.8], 0.1)
        w1, h1 = M.dfreqresp(sysd, n=50)
        w2, h2 = ss.dfreqresp(sysd, n=50)
        allc(w1, w2, rtol=0, atol=1e-13)
        allc(h1, h2, rtol=1e-10, atol=1e-12)
        w1, m1, p1 = M.dbode(sysd, n=50)
        w2, m2, p2 = ss.dbode(sysd, n=50)
        allc(w1, w2, rtol=1e-10, atol=1e-10)
        allc(m1, m2, rtol=1e-8, atol=1e-9)
        allc(p1, p2, rtol=1e-8, atol=1e-9)

    def test_abcd_normalize(self):
        A, B, C, D = M.abcd_normalize(A=[[1.0, 0.0], [0.0, 1.0]],
                                      B=[[1.0], [0.0]], C=[[1.0, 0.0]])
        A2, B2, C2, D2 = ss.abcd_normalize(A=[[1.0, 0.0], [0.0, 1.0]],
                                           B=[[1.0], [0.0]], C=[[1.0, 0.0]])
        for g, r in zip((A, B, C, D), (A2, B2, C2, D2)):
            assert g.shape == r.shape
            allc(g, r, rtol=0, atol=0)
        with pytest.raises(ValueError):
            M.abcd_normalize(A=[[1.0, 0.0], [0.0, 1.0]], B=[[1.0], [0.0]])


class TestSepfir2d:
    def test_scipy_parity(self):
        from godsp_tpu.models import sepfir2d

        x = np.random.default_rng(0).normal(size=(8, 9))
        hr = np.array([0.25, 0.5, 0.25])
        hc = np.array([0.2, 0.6, 0.3, 0.6, 0.2])
        allc(np.asarray(sepfir2d(x, hr, hc)), ss.sepfir2d(x, hr, hc),
             rtol=1e-10, atol=1e-12)
        # asymmetric taps exercise the convolution orientation
        hr = np.array([1.0, 2.0, 4.0])
        hc = np.array([1.0, 8.0, 64.0])
        allc(np.asarray(sepfir2d(x, hr, hc)), ss.sepfir2d(x, hr, hc),
             rtol=1e-10, atol=1e-10)

    def test_validation(self):
        from godsp_tpu.models import sepfir2d

        with pytest.raises(ValueError):
            sepfir2d(np.zeros((4, 4)), np.ones(2), np.ones(3))
        with pytest.raises(ValueError):
            sepfir2d(np.zeros(4), np.ones(3), np.ones(3))


class TestSystemClasses:
    """lti/dlti/TransferFunction/ZerosPolesGain/StateSpace — the class
    surface over the functional toolkit, vs scipy's classes."""

    def test_continuous_responses(self):
        b, a = ss.butter(3, 2.0, analog=True)
        mine, ref = M.lti(b, a), ss.lti(b, a)
        _, y1 = mine.impulse()
        _, y2 = ref.impulse()
        allc(np.ravel(y1), np.ravel(y2), rtol=1e-5, atol=1e-6)
        w = np.logspace(-1, 2, 30)
        _, h1 = mine.freqresp(w=w)
        _, h2 = ref.freqresp(w=w)
        allc(h1, h2, rtol=1e-9, atol=1e-11)
        _, m1, p1 = mine.bode(w=w)
        _, m2, p2 = ref.bode(w=w)
        allc(m1, m2, rtol=1e-8, atol=1e-9)
        allc(p1, p2, rtol=1e-8, atol=1e-9)

    def test_conversions_and_discretize(self):
        b, a = ss.butter(3, 2.0, analog=True)
        sys1 = M.lti(b, a)
        sd = sys1.to_ss().to_discrete(0.05)
        ref = ss.cont2discrete(ss.tf2ss(b, a), 0.05)
        allc(sd.A, ref[0], rtol=1e-12, atol=1e-13)
        zpk = sys1.to_zpk()
        ref_zpk = ss.lti(b, a).to_zpk()
        allc(np.sort_complex(zpk.poles), np.sort_complex(ref_zpk.poles),
             rtol=1e-8, atol=1e-9)
        assert sd.dt == 0.05 and sys1.dt is None

    def test_discrete_output(self):
        b, a = ss.butter(3, 2.0, analog=True)
        sd = ss.cont2discrete(ss.tf2ss(b, a), 0.05)
        t = np.arange(100) * 0.05
        u = np.sin(t)
        _, y1, _ = M.dlti(*sd[:4], dt=0.05).output(u, t)
        ref = ss.dlsim(sd, u)
        allc(np.ravel(y1), np.ravel(ref[1]), rtol=1e-8, atol=1e-10)

    def test_validation(self):
        with pytest.raises(ValueError):
            M.lti(np.ones(3))  # 1 element
        with pytest.raises(ValueError):
            M.lti([1.0], [1.0, 0.5]).to_discrete(0.1).to_discrete(0.1)


class TestReviewFindings:
    """Regressions for the session review: per-input dimpulse/dstep,
    dlsim t-interpolation, dbode explicit-w semantics."""

    def test_mimo_dimpulse_dstep(self):
        A = np.array([[0.5, 0.1], [0.0, 0.4]])
        B = np.array([[1.0, 2.0], [0.0, 0.3]])
        C = np.array([[1.0, 0.0]])
        D = np.array([[0.0, 0.5]])
        sysd = (A, B, C, D, 0.1)
        _, y1 = M.dimpulse(sysd, n=4)
        _, y2 = ss.dimpulse(sysd, n=4)
        assert len(y1) == len(y2) == 2
        for g, r in zip(y1, y2):
            allc(np.asarray(g), np.asarray(r), rtol=1e-10, atol=1e-12)
        _, y1 = M.dstep(sysd, n=4)
        _, y2 = ss.dstep(sysd, n=4)
        for g, r in zip(y1, y2):
            allc(np.asarray(g), np.asarray(r), rtol=1e-10, atol=1e-12)

    def test_dlsim_t_interpolation(self):
        b, a = ss.butter(2, 0.3)
        sd = ss.cont2discrete(ss.tf2ss(b, a), 0.1)
        u = np.sin(np.arange(12) * 0.2)
        t = np.arange(12) * 0.2
        g = M.dlsim(sd, u, t=t)
        r = ss.dlsim(sd, u, t=t)
        assert g[0].shape == r[0].shape
        allc(np.ravel(g[1]), np.ravel(r[1]), rtol=1e-9, atol=1e-11)

    def test_dbode_explicit_w(self):
        sysd = ([1.0, -0.5], [1.0, -0.8], 0.1)
        w_in = np.array([0.1, 0.5, 1.0, 2.0])
        for g, r in zip(M.dbode(sysd, w=w_in), ss.dbode(sysd, w=w_in)):
            allc(np.asarray(g), np.asarray(r), rtol=1e-9, atol=1e-10)


class TestPlacePoles:
    """place_poles: SISO Ackermann (unique gain — exact scipy parity)
    and MIMO subspace placement (exact spectrum; gain is a valid
    placement, not scipy's robustness-optimized one)."""

    def test_siso_exact(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(4, 4))
        b = rng.normal(size=(4, 1))
        poles = np.array([-1.0, -2.0, -1.5 + 0.8j, -1.5 - 0.8j])
        fp = M.place_poles(A, b, poles)
        sp = ss.place_poles(A, b, poles)
        allc(fp.gain_matrix, sp.gain_matrix, rtol=1e-8, atol=1e-10)
        allc(np.sort_complex(fp.computed_poles), np.sort_complex(poles),
             rtol=1e-7, atol=1e-8)

    def test_mimo_places_spectrum(self):
        rng = np.random.default_rng(1)
        for _ in range(3):
            A = rng.normal(size=(6, 6))
            B = rng.normal(size=(6, 2))
            poles = np.array([-1.0, -2.0, -3.0, -4.0, -0.5 + 1j, -0.5 - 1j])
            fp = M.place_poles(A, B, poles)
            allc(np.sort_complex(fp.computed_poles), np.sort_complex(poles),
                 rtol=1e-6, atol=1e-7)
            assert np.isrealobj(fp.gain_matrix)
            assert fp.nb_iter >= 1

    def test_validation(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(4, 4))
        B = rng.normal(size=(4, 2))
        with pytest.raises(ValueError):
            M.place_poles(np.zeros((2, 2)), np.zeros((2, 1)), [-1, -2])
        with pytest.raises(ValueError):
            M.place_poles(A, B, [-1, -2, -3, -4 + 1j])  # unpaired complex
        with pytest.raises(ValueError):
            M.place_poles(A, B, [-1, -2, -3])  # wrong count
        with pytest.raises(ValueError):
            M.place_poles(A, B, [-1, -2, -3, -4], method="bogus")
