"""bench.py helper validation (CPU): the f64 Pwelch oracle, the digit
permutation map, the multi-tone closed-form spectrum algebra, and the
copy-ceiling probe kernel (interpret mode)."""

import numpy as np
import jax.numpy as jnp

import bench
from godsp_tpu import spectral
from godsp_tpu.dsputils import snr_db


def test_pwelch_np_oracle_matches_framework():
    rng = np.random.default_rng(1)
    x = rng.normal(size=10000)
    ref = bench._pwelch_np(x, 2.0, 256, 128)
    p, _ = spectral.pwelch(
        jnp.asarray(x), 2.0, spectral.PwelchOptions(nfft=256, noverlap=128)
    )
    assert snr_db(np.asarray(p), ref) > 120.0


def test_digit_np_map():
    rng = np.random.default_rng(2)
    n, n1 = 1024, 8
    F = rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
    D = bench._digit_np(F, n1)
    for k1, k2 in ((0, 0), (3, 77), (7, 127)):
        assert np.allclose(D[:, k1 * 128 + k2], F[:, k1 + n1 * k2])


def test_multi_tone_oracle_algebra():
    """The bench's on-device SNR decomposition (total energy minus tone
    bins plus tone-bin errors) equals a direct full-spectrum comparison."""
    N = 1 << 12
    tones = [(3, 0.5, 0.1), (123, 0.25, -0.3), ((N >> 1) + 7, 0.125, 0.7)]
    n_idx = np.arange(N)
    z = np.zeros(N, np.complex128)
    for f, a, ph in tones:
        z += a * np.exp(2j * np.pi * (((f * n_idx) % N) / N + ph))
    X = np.fft.fft(z)
    want = np.zeros(N, np.complex128)
    for f, a, ph in tones:
        want[f] = N * a * np.exp(2j * np.pi * ph)
    direct_err = float(np.sum(np.abs(X - want) ** 2))
    decomposed = (
        float(np.sum(np.abs(X) ** 2))
        - sum(float(np.abs(X[f]) ** 2) for f, _, _ in tones)
        + sum(
            float(np.abs(X[f] - N * a * np.exp(2j * np.pi * ph)) ** 2)
            for f, a, ph in tones
        )
    )
    assert np.isclose(direct_err, decomposed, rtol=1e-9)
    sig = sum((N * a) ** 2 for _, a, _ in tones)
    assert 10 * np.log10(sig / max(decomposed, 1e-300)) > 200.0  # f64 fft


def test_copy_split_pallas_interpret():
    from godsp_tpu.utils.metrics import copy_split_pallas

    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32))
    i = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32))
    ro, io = copy_split_pallas(r, i, batch_tile=256, interpret=True)
    assert np.array_equal(np.asarray(ro), np.asarray(r))
    assert np.array_equal(np.asarray(io), np.asarray(i))
