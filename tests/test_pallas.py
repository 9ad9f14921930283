"""Pallas kernel tests, run in interpreter mode on CPU (SURVEY.md §5:
interpreter-mode tests are the race-free substitute for sanitizers).
On-chip accuracy/perf is exercised by bench.py and the verify drive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from godsp_tpu.dsputils import snr_db
from godsp_tpu.ops.pallas_fft import (
    default_batch_tile,
    fft_pow2_split,
    supported_size,
)


def _split(x):
    return jnp.asarray(x.real.copy()), jnp.asarray(x.imag.copy())


class TestPallasFFT:
    @pytest.mark.parametrize("n", [256, 512, 1024, 4096])
    def test_forward_vs_numpy(self, n):
        rng = np.random.default_rng(n)
        x = (rng.normal(size=(5, n)) + 1j * rng.normal(size=(5, n))).astype(np.complex64)
        yr, yi = fft_pow2_split(*_split(x), interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert snr_db(got, np.fft.fft(x)) >= 120.0

    def test_fast_mode_accuracy(self):
        rng = np.random.default_rng(1)
        x = (rng.normal(size=(8, 1024)) + 1j * rng.normal(size=(8, 1024))).astype(
            np.complex64
        )
        yr, yi = fft_pow2_split(*_split(x), mode="fast", interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        # fast mode is capped ~105 dB by the 2-limb bf16 split
        assert snr_db(got, np.fft.fft(x)) >= 95.0

    def test_digit_order(self):
        n, n1 = 1024, 8
        rng = np.random.default_rng(2)
        x = (rng.normal(size=(4, n)) + 1j * rng.normal(size=(4, n))).astype(np.complex64)
        yr, yi = fft_pow2_split(*_split(x), order="digit", interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft(x)
        # digit order stores X[k1 + n1*k2] at position k1*128 + k2
        ref_digit = np.transpose(ref.reshape(4, 128, n1), (0, 2, 1)).reshape(4, n)
        assert snr_db(got, ref_digit) >= 120.0

    def test_inverse_roundtrip(self):
        rng = np.random.default_rng(3)
        x = (rng.normal(size=(3, 512)) + 1j * rng.normal(size=(3, 512))).astype(
            np.complex64
        )
        yr, yi = fft_pow2_split(*_split(x), interpret=True)
        zr, zi = fft_pow2_split(yr, yi, inverse=True, interpret=True)
        back = (np.asarray(zr) + 1j * np.asarray(zi)) / 512
        assert snr_db(back, x) >= 120.0

    def test_ragged_batch_padding(self):
        rng = np.random.default_rng(4)
        x = (rng.normal(size=(3, 256)) + 1j * rng.normal(size=(3, 256))).astype(
            np.complex64
        )
        yr, yi = fft_pow2_split(*_split(x), batch_tile=16, interpret=True)
        assert yr.shape == (3, 256)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert snr_db(got, np.fft.fft(x)) >= 120.0

    def test_nd_batch(self):
        rng = np.random.default_rng(5)
        x = (rng.normal(size=(2, 3, 256)) + 1j * rng.normal(size=(2, 3, 256))).astype(
            np.complex64
        )
        yr, yi = fft_pow2_split(*_split(x), interpret=True)
        assert yr.shape == (2, 3, 256)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert snr_db(got, np.fft.fft(x)) >= 120.0

    def test_real_input_matches_reference_goldens(self):
        """The kernel agrees with the golden-tested core path."""
        from godsp_tpu import fft as gfft

        rng = np.random.default_rng(6)
        xr = rng.normal(size=(4, 256)).astype(np.float32)
        yr, yi = fft_pow2_split(
            jnp.asarray(xr), jnp.zeros_like(jnp.asarray(xr)), interpret=True
        )
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.asarray(gfft.fft_real(xr.astype(np.float64)))
        assert snr_db(got, ref) >= 120.0

    def test_errors(self):
        x = jnp.zeros((2, 100), jnp.float32)
        with pytest.raises(ValueError, match="unsupported FFT size"):
            fft_pow2_split(x, x)
        x2 = jnp.zeros((2, 256), jnp.float32)
        with pytest.raises(ValueError, match="identical shapes"):
            fft_pow2_split(x2, jnp.zeros((3, 256), jnp.float32))
        with pytest.raises(ValueError, match="unknown order"):
            fft_pow2_split(x2, x2, order="weird")
        with pytest.raises(ValueError, match="unknown mode"):
            fft_pow2_split(x2, x2, mode="weird")

    def test_supported_size(self):
        assert supported_size(256) and supported_size(16384)
        assert not supported_size(128)
        assert not supported_size(1000)
        assert not supported_size(1 << 15)

    def test_default_batch_tile(self):
        for n in (256, 1024, 4096, 16384):
            assert 8 <= default_batch_tile(n) <= 512
