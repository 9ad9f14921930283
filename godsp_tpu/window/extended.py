"""Extended window family (scipy.signal.windows surface) + get_window.

The reference ships six tapers (window/window.go:25-152, in
godsp_tpu.window); production spectral analysis expects the full scipy
catalogue and the `get_window` name/tuple dispatcher that pwelch-style
estimators consume.  All tables are host float64, generated from the
textbook closed forms (Dolph-Chebyshev via its frequency-domain
definition, Taylor via the F_m cosine coefficients, DPSS via the
symmetric tridiagonal eigenproblem) and cached; on device they are
trace-time constants fused into consumers, same as godsp_tpu.window.

`sym=True` returns symmetric (filter-design) windows; `sym=False` the
DFT-periodic form (one sample of the M+1 symmetric window dropped),
exactly scipy's `fftbins` convention.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = [
    "barthann",
    "bohman",
    "chebwin",
    "cosine",
    "dpss",
    "exponential",
    "gaussian",
    "general_gaussian",
    "get_window",
    "lanczos",
    "parzen",
    "taylor",
    "triang",
    "tukey",
]


def _len_guards(M: int):
    if int(M) != M or M < 0:
        raise ValueError("window length must be a non-negative integer")
    return M <= 1


def _extend(M: int, sym: bool):
    """(length to build, trim) implementing scipy's periodic convention:
    build the M+1 symmetric window, drop the last sample."""
    return (M, False) if sym else (M + 1, True)


def _trim(w: np.ndarray, needs_trim: bool) -> np.ndarray:
    return w[:-1] if needs_trim else w


def triang(M: int, sym: bool = True) -> np.ndarray:
    """Triangular window (scipy.signal.windows.triang — nonzero
    endpoints, unlike bartlett)."""
    if _len_guards(M):
        return np.ones(M)
    M2, trim = _extend(M, sym)
    n = np.arange(1, (M2 + 1) // 2 + 1, dtype=np.float64)
    if M2 % 2 == 0:
        w = (2.0 * n - 1.0) / M2
        w = np.concatenate([w, w[::-1]])
    else:
        w = 2.0 * n / (M2 + 1.0)
        w = np.concatenate([w, w[-2::-1]])
    return _trim(w, trim)


def parzen(M: int, sym: bool = True) -> np.ndarray:
    """Parzen piecewise-cubic window."""
    if _len_guards(M):
        return np.ones(M)
    M2, trim = _extend(M, sym)
    n = np.arange(-(M2 - 1) / 2.0, (M2 - 1) / 2.0 + 0.5, 1.0)
    na = np.extract(n < -(M2 - 1) / 4.0, n)
    nb = np.extract(np.abs(n) <= (M2 - 1) / 4.0, n)
    wa = 2.0 * (1.0 - np.abs(na) / (M2 / 2.0)) ** 3.0
    wb = (1.0 - 6.0 * (np.abs(nb) / (M2 / 2.0)) ** 2.0
          + 6.0 * (np.abs(nb) / (M2 / 2.0)) ** 3.0)
    return _trim(np.concatenate([wa, wb, wa[::-1]]), trim)


def bohman(M: int, sym: bool = True) -> np.ndarray:
    """Bohman window: (1-|x|)cos(pi|x|) + sin(pi|x|)/pi on [-1, 1]."""
    if _len_guards(M):
        return np.ones(M)
    M2, trim = _extend(M, sym)
    fac = np.abs(np.linspace(-1, 1, M2)[1:-1])
    w = (1 - fac) * np.cos(np.pi * fac) + 1.0 / np.pi * np.sin(np.pi * fac)
    return _trim(np.concatenate([[0.0], w, [0.0]]), trim)


def barthann(M: int, sym: bool = True) -> np.ndarray:
    """Modified Bartlett-Hann window."""
    if _len_guards(M):
        return np.ones(M)
    M2, trim = _extend(M, sym)
    n = np.arange(M2, dtype=np.float64)
    fac = np.abs(n / (M2 - 1.0) - 0.5)
    return _trim(0.62 - 0.48 * fac + 0.38 * np.cos(2 * np.pi * fac), trim)


def cosine(M: int, sym: bool = True) -> np.ndarray:
    """Half-cycle sine window."""
    if _len_guards(M):
        return np.ones(M)
    M2, trim = _extend(M, sym)
    return _trim(np.sin(np.pi / M2 * (np.arange(M2) + 0.5)), trim)


def lanczos(M: int, sym: bool = True) -> np.ndarray:
    """Lanczos (sinc) window."""
    if _len_guards(M):
        return np.ones(M)
    M2, trim = _extend(M, sym)
    return _trim(np.sinc(2.0 * np.arange(M2) / (M2 - 1.0) - 1.0), trim)


def exponential(M: int, center: float | None = None, tau: float = 1.0,
                sym: bool = True) -> np.ndarray:
    """Exponential (Poisson) window exp(-|n - center|/tau)."""
    if sym and center is not None:
        raise ValueError("center must be None for symmetric windows")
    if _len_guards(M):
        return np.ones(M)
    M2, trim = _extend(M, sym)
    if center is None:
        center = (M2 - 1) / 2.0
    n = np.arange(M2, dtype=np.float64)
    return _trim(np.exp(-np.abs(n - center) / tau), trim)


def gaussian(M: int, std: float, sym: bool = True) -> np.ndarray:
    """Gaussian window exp(-n^2 / (2 std^2)) about the center."""
    if _len_guards(M):
        return np.ones(M)
    M2, trim = _extend(M, sym)
    n = np.arange(M2, dtype=np.float64) - (M2 - 1) / 2.0
    return _trim(np.exp(-0.5 * (n / std) ** 2), trim)


def general_gaussian(M: int, p: float, sig: float,
                     sym: bool = True) -> np.ndarray:
    """Generalized Gaussian exp(-0.5 |n/sig|^(2p))."""
    if _len_guards(M):
        return np.ones(M)
    M2, trim = _extend(M, sym)
    n = np.arange(M2, dtype=np.float64) - (M2 - 1) / 2.0
    return _trim(np.exp(-0.5 * np.abs(n / sig) ** (2 * p)), trim)


def tukey(M: int, alpha: float = 0.5, sym: bool = True) -> np.ndarray:
    """Tukey (tapered cosine): flat center, cosine-tapered ends."""
    if _len_guards(M):
        return np.ones(M)
    if alpha <= 0:
        return np.ones(M)
    M2, trim = _extend(M, sym)
    if alpha >= 1.0:
        from godsp_tpu.window import window_table_np

        return _trim(window_table_np("hann", M2), trim)
    n = np.arange(M2, dtype=np.float64)
    width = int(np.floor(alpha * (M2 - 1) / 2.0))
    w = np.ones(M2)
    n1 = n[: width + 1]
    w[: width + 1] = 0.5 * (1 + np.cos(np.pi * (-1 + 2.0 * n1 / alpha / (M2 - 1))))
    n3 = n[M2 - width - 1 :]
    w[M2 - width - 1 :] = 0.5 * (
        1 + np.cos(np.pi * (-2.0 / alpha + 1 + 2.0 * n3 / alpha / (M2 - 1)))
    )
    return _trim(w, trim)


def chebwin(M: int, at: float = 100.0, sym: bool = True) -> np.ndarray:
    """Dolph-Chebyshev window with `at` dB equiripple sidelobes: inverse
    DFT of the Chebyshev polynomial evaluated on the frequency circle
    (the window whose spectrum is T_{M-1}(beta cos(pi k/M)))."""
    if _len_guards(M):
        return np.ones(M)
    M2, trim = _extend(M, sym)
    order = M2 - 1.0
    beta = np.cosh(1.0 / order * np.arccosh(10 ** (np.abs(at) / 20.0)))
    k = np.arange(M2, dtype=np.float64)
    x = beta * np.cos(np.pi * k / M2)
    # T_order(x) for |x|>1 via cosh, |x|<=1 via cos (exact continuation)
    p = np.zeros(M2)
    big = x > 1
    small = np.abs(x) <= 1
    p[big] = np.cosh(order * np.arccosh(x[big]))
    p[small] = np.cos(order * np.arccos(x[small]))
    neg = x < -1
    p[neg] = (1 - 2 * (int(order) % 2)) * np.cosh(order * np.arccosh(-x[neg]))
    if M2 % 2:
        w = np.real(np.fft.fft(p))
        half = (M2 + 1) // 2
        w = w[:half] / w[0]
        w = np.concatenate([w[half - 1 : 0 : -1], w])
    else:
        p_c = p * np.exp(1j * np.pi / M2 * np.arange(M2))
        w = np.real(np.fft.fft(p_c))
        half = M2 // 2 + 1
        w = w / max(w[1], 1e-300)
        w = np.concatenate([w[half - 1 : 0 : -1], w[1:half]])
    return _trim(w, trim)


def taylor(M: int, nbar: int = 4, sll: float = 30.0, norm: bool = True,
           sym: bool = True) -> np.ndarray:
    """Taylor window (radar/antenna taper): the near-Chebyshev taper
    with `nbar` nearly-constant sidelobes at -sll dB, via the classic
    F_m cosine-series coefficients."""
    if _len_guards(M):
        return np.ones(M)
    M2, trim = _extend(M, sym)
    B = 10.0 ** (sll / 20.0)
    A = np.arccosh(B) / np.pi
    s2 = nbar**2 / (A**2 + (nbar - 0.5) ** 2)
    ma = np.arange(1, nbar, dtype=np.float64)
    Fm = np.empty(nbar - 1)
    signs = np.empty_like(ma)
    signs[::2] = 1.0
    signs[1::2] = -1.0
    m2 = ma * ma
    for mi, m in enumerate(ma):
        numer = signs[mi] * np.prod(
            1.0 - m2[mi] / s2 / (A**2 + (ma - 0.5) ** 2))
        denom = 2.0 * np.prod(1.0 - m2[mi] / m2[:mi]) * np.prod(
            1.0 - m2[mi] / m2[mi + 1 :])
        Fm[mi] = numer / denom
    n = np.arange(M2, dtype=np.float64)

    def series(pos):
        out = np.ones_like(np.asarray(pos, np.float64))
        for mi, m in enumerate(ma):
            out = out + 2.0 * Fm[mi] * np.cos(
                2.0 * np.pi * m * (pos - M2 / 2.0 + 0.5) / M2)
        return out

    w = series(n)
    if norm:
        # normalize by the series evaluated AT the center point (between
        # samples for even M — analytic, not interpolated)
        w = w / series(np.float64((M2 - 1) / 2.0))
    return _trim(w, trim)


@lru_cache(maxsize=None)
def _dpss_tables(M: int, NW: float, Kmax: int) -> np.ndarray:
    """First Kmax Slepian sequences: eigenvectors of the classic
    symmetric tridiagonal commuting matrix (diag ((M-1-2n)/2)^2 cos(2
    pi W), offdiag n(M-n)/2), ordered by concentration."""
    W = NW / M
    n = np.arange(M, dtype=np.float64)
    T = np.zeros((M, M))
    d = ((M - 1 - 2 * n) / 2.0) ** 2 * np.cos(2 * np.pi * W)
    e = n[1:] * (M - n[1:]) / 2.0
    T[np.arange(M), np.arange(M)] = d
    T[np.arange(M - 1), np.arange(1, M)] = e
    T[np.arange(1, M), np.arange(M - 1)] = e
    vals, vecs = np.linalg.eigh(T)
    wins = vecs[:, ::-1][:, :Kmax].T  # largest eigenvalue first
    # scipy's sign convention: symmetric windows positive mean; the
    # antisymmetric ones start with a positive lobe
    fix = np.ones(Kmax)
    for i in range(Kmax):
        if i % 2 == 0:
            if wins[i].sum() < 0:
                fix[i] = -1.0
        else:
            if wins[i][: M // 2].sum() < 0:
                fix[i] = -1.0
    return wins * fix[:, None]


def dpss(M: int, NW: float, Kmax: int | None = None,
         sym: bool = True, norm=None, return_ratios: bool = False):
    """Discrete prolate spheroidal (Slepian) sequences
    (scipy.signal.windows.dpss semantics): the Kmax most spectrally
    concentrated sequences at half-bandwidth NW/M.  Kmax=None returns
    the single leading window normalized to peak 1 (norm=2: unit
    energy; 'approximate'/'subsample' peak corrections follow scipy's
    defaults only for norm=None)."""
    if Kmax is None:
        single = True
        Kmax = 1
    else:
        single = False
        Kmax = int(Kmax)
    if Kmax < 1 or Kmax > M:
        raise ValueError("Kmax must be in [1, M]")
    if NW <= 0 or NW >= M / 2.0:
        raise ValueError("NW must lie in (0, M/2)")
    if _len_guards(M):
        w = np.ones((Kmax, max(M, 0)))
        return w[0] if single else w
    M2, trim = _extend(M, sym)
    wins = _dpss_tables(M2, float(NW), Kmax).copy()
    if norm is None:
        norm = "approximate" if single else 2
    if norm == 2:
        wins = wins / np.linalg.norm(wins, axis=-1, keepdims=True)
    elif norm in ("approximate", "subsample"):
        wins = wins / np.max(np.abs(wins), axis=-1, keepdims=True)
        if M2 % 2 == 0:
            # the true (inter-sample) peak exceeds the sampled max for
            # even lengths; scale so IT is 1 (scipy's corrections)
            if norm == "approximate":
                correction = M2 * M2 / float(M2 * M2 + NW)
            else:
                from numpy.fft import irfft, rfft

                spec = rfft(wins[0])
                f = np.arange(len(spec))
                shifted = irfft(spec * np.exp(-1j * np.pi * f / M2), n=M2)
                correction = 1.0 / np.max(np.abs(shifted))
            wins = wins * correction
    else:
        raise ValueError("norm must be 2, 'approximate', or 'subsample'")
    wins = wins[:, :-1] if trim else wins
    return wins[0] if single else wins


_PLAIN = {
    "barthann": barthann,
    "brthan": barthann,
    "bth": barthann,
    "bohman": bohman,
    "bman": bohman,
    "bmn": bohman,
    "cosine": cosine,
    "halfcosine": cosine,
    "lanczos": lanczos,
    "sinc": lanczos,
    "parzen": parzen,
    "parz": parzen,
    "par": parzen,
    "triang": triang,
    "triangle": triang,
    "tri": triang,
}

_PARAM = {
    "chebwin": (chebwin, 1),
    "cheb": (chebwin, 1),
    "dpss": (dpss, None),
    "exponential": (exponential, None),
    "poisson": (exponential, None),
    "gaussian": (gaussian, 1),
    "gauss": (gaussian, 1),
    "gss": (gaussian, 1),
    "general gaussian": (general_gaussian, 2),
    "general_gaussian": (general_gaussian, 2),
    "ggs": (general_gaussian, 2),
    "kaiser": (None, 1),  # handled via the core kaiser table
    "ksr": (None, 1),
    "taylor": (taylor, None),
    "taylor_win": (taylor, None),
    "tukey": (tukey, 1),
    "tuk": (tukey, 1),
}

_CORE = {  # names resolved by godsp_tpu.window's reference-parity tables
    "boxcar": "rectangular",
    "box": "rectangular",
    "ones": "rectangular",
    "rect": "rectangular",
    "rectangular": "rectangular",
    "hamming": "hamming",
    "hamm": "hamming",
    "ham": "hamming",
    "hann": "hann",
    "han": "hann",
    "hanning": "hann",
    "bartlett": "bartlett",
    "bart": "bartlett",
    "brt": "bartlett",
    "flattop": "flat_top",
    "flat": "flat_top",
    "flt": "flat_top",
    "flat_top": "flat_top",
    "blackman": "blackman",
    "black": "blackman",
    "blk": "blackman",
    "blackmanharris": "blackman_harris",
    "blackharr": "blackman_harris",
    "bkh": "blackman_harris",
    "blackman_harris": "blackman_harris",
    "nuttall": "nuttall",
    "nutl": "nuttall",
    "nut": "nuttall",
}


def get_window(window, Nx: int, fftbins: bool = True) -> np.ndarray:
    """Resolve a scipy-style window spec to a float64 table
    (scipy.signal.get_window): a plain name, a (name, *params) tuple for
    parametrized windows, or a bare float (kaiser beta).  fftbins=True
    returns the DFT-periodic form."""
    sym = not fftbins
    if isinstance(window, (float, int)) and not isinstance(window, bool):
        window = ("kaiser", float(window))
    if isinstance(window, (str, bytes)):
        name = (window.decode() if isinstance(window, bytes) else window).lower()
        args = ()
    elif isinstance(window, tuple):
        if not window or not isinstance(window[0], str):
            raise ValueError("tuple windows must start with the name")
        name = window[0].lower()
        args = tuple(window[1:])
    else:
        raise ValueError("window must be a string, tuple, or float")
    if name in _CORE:
        from godsp_tpu.window import window_table_np

        core = _CORE[name]
        if core == "rectangular":
            return np.ones(Nx)
        if sym:
            return window_table_np(core, Nx)
        return window_table_np(core, Nx + 1)[:-1]
    if name in ("kaiser", "ksr"):
        from godsp_tpu.window import _kaiser_table

        if len(args) != 1:
            raise ValueError("kaiser needs one parameter (beta)")
        if sym:
            return _kaiser_table(float(args[0]), Nx)
        return _kaiser_table(float(args[0]), Nx + 1)[:-1]
    if name in _PLAIN:
        if args:
            raise ValueError(f"window '{name}' takes no parameters")
        return _PLAIN[name](Nx, sym=sym)
    if name in _PARAM:
        fn, nargs = _PARAM[name]
        if nargs is not None and len(args) != nargs:
            raise ValueError(f"window '{name}' needs {nargs} parameter(s)")
        return np.asarray(fn(Nx, *args, sym=sym), np.float64)
    raise ValueError(f"unknown window: {window!r}")
