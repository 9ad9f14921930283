"""L0 primitive tests; golden tables ported from reference
dsputils/dsputils_test.go and matrix_test.go."""

import jax.numpy as jnp
import numpy as np
import pytest

from godsp_tpu import dsputils


class TestPredicates:
    def test_is_power_of_2(self):
        for n in [1, 2, 4, 8, 1024, 1 << 20]:
            assert dsputils.is_power_of_2(n)
        for n in [3, 5, 6, 7, 9, 1000]:
            assert not dsputils.is_power_of_2(n)

    def test_is_power_of_2_zero_quirk(self):
        # Reference quirk: 0 & -1 == 0 reports true (dsputils.go:34-36).
        assert dsputils.is_power_of_2(0)

    def test_next_power_of_2(self):
        assert dsputils.next_power_of_2(1) == 1
        assert dsputils.next_power_of_2(3) == 4
        assert dsputils.next_power_of_2(1000) == 1024
        assert dsputils.next_power_of_2(1024) == 1024
        assert dsputils.next_power_of_2(1025) == 2048


class TestPadConvert:
    def test_to_complex(self):
        x = dsputils.to_complex([1.0, 2.0, 3.0])
        assert x.dtype.kind == "c"
        np.testing.assert_allclose(np.asarray(x), [1 + 0j, 2 + 0j, 3 + 0j])

    def test_zero_pad(self):
        x = dsputils.zero_pad(jnp.array([1.0, 2.0]), 5)
        np.testing.assert_allclose(np.asarray(x), [1, 2, 0, 0, 0])

    def test_zero_pad_noop_when_long_enough(self):
        x = jnp.array([1.0, 2.0, 3.0])
        assert dsputils.zero_pad(x, 2) is x

    def test_zero_pad_batched(self):
        x = dsputils.zero_pad(jnp.ones((4, 3)), 8)
        assert x.shape == (4, 8)

    def test_zero_pad_2(self):
        assert dsputils.zero_pad_2(jnp.ones(5)).shape == (8,)


class TestSegment:
    def test_golden(self):
        # dsputils_test.go:20-30: 16 points, 3 segs, 50% overlap ->
        # slices [0:8], [4:12], [8:16].
        x = jnp.arange(16, dtype=jnp.complex128)
        segs = dsputils.segment(x, 3, 0.5)
        assert segs.shape == (3, 8)
        expect = np.stack([np.arange(0, 8), np.arange(4, 12), np.arange(8, 16)])
        np.testing.assert_allclose(np.asarray(segs).real, expect)

    def test_too_many_segments(self):
        with pytest.raises(ValueError, match="too many segments"):
            dsputils.segment(jnp.arange(4.0), 100, 0.0)


class TestCompare:
    def test_float_equal(self):
        assert dsputils.float_equal(1.0, 1.0 + 5e-9)
        assert dsputils.float_equal(1e12, 1e12 * (1 + 5e-9))  # relative branch
        assert not dsputils.float_equal(1.0, 1.1)

    def test_pretty_close(self):
        assert dsputils.pretty_close([1.0, 2.0], [1.0, 2.0 + 1e-9])
        assert not dsputils.pretty_close([1.0], [1.0, 2.0])  # length mismatch
        assert not dsputils.pretty_close([1.0, 2.0], [1.0, 2.5])

    def test_pretty_close_c(self):
        assert dsputils.pretty_close_c([1 + 1j], [1 + 1j + 1e-9j])
        assert not dsputils.pretty_close_c([1 + 1j], [1 - 1j])

    def test_snr_db(self):
        assert dsputils.snr_db([1.0, 0.0], [1.0, 0.0]) == float("inf")
        # 1e-6 relative RMS error == 120 dB
        got = np.array([1.0 + 1e-6, 0.0])
        assert abs(dsputils.snr_db(got, np.array([1.0, 0.0])) - 120.0) < 0.1


class TestMatrix:
    def _mk(self):
        # matrix_test.go:12-22
        return dsputils.make_matrix(
            np.array(
                [1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 4, 3, 2, 1],
                dtype=np.complex128,
            ),
            [2, 3, 4],
        )

    def test_dim_golden(self):
        m = self._mk()
        np.testing.assert_allclose(np.asarray(m.dim([1, 0, -1])), [3, 4, 5, 6])
        np.testing.assert_allclose(np.asarray(m.dim([0, -1, 2])), [3, 7, 1])
        np.testing.assert_allclose(np.asarray(m.dim([-1, 1, 3])), [8, 0])

    def test_set_dim_and_value(self):
        m = self._mk()
        s = np.array([10, 11, 12], dtype=np.complex128)
        i = [1, -1, 3]
        m.set_dim(s, i)
        np.testing.assert_allclose(np.asarray(m.dim(i)), s)
        # matrix_test.go:40-42 even passes the -1 lane selector to
        # SetValue; the flat-offset arithmetic accepts it (quirk).
        m.set_value(14, i)
        assert m.value(i) == 14 + 0j

    def test_roundtrip_array(self):
        m = self._mk()
        assert m.array.shape == (2, 3, 4)
        assert m.copy().pretty_close(m)

    def test_make_matrix_2_ragged(self):
        with pytest.raises(ValueError, match="ragged"):
            dsputils.make_matrix_2([[1, 2], [3]])

    def test_to_2d(self):
        m = dsputils.make_matrix_2([[1 + 0j, 2], [3, 4]])
        assert m.to_2d() == [[1 + 0j, 2 + 0j], [3 + 0j, 4 + 0j]]

    def test_invalid_dims(self):
        with pytest.raises(ValueError):
            dsputils.make_matrix(np.zeros(4, np.complex128), [0, 4])
        with pytest.raises(ValueError):
            dsputils.make_matrix(np.zeros(5, np.complex128), [2, 2])
