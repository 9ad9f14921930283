"""Native host-op tests: C++ ops must agree exactly with the numpy
fallbacks (and with the reference's decode quirks, wav.go:144-159)."""

import numpy as np
import pytest

from godsp_tpu import native


class TestDecode:
    def test_u8_quirk_range(self):
        d = np.array([0, 1, 128, 255], dtype=np.uint8)
        out = native.decode_u8(d)
        np.testing.assert_allclose(out, d.astype(np.float32) / 255.0)
        assert out.min() >= 0.0 and out.max() <= 1.0  # [0,1], not [-1,1]

    def test_i16_quirk_range(self):
        d = np.array([-32768, -1, 0, 32767], dtype=np.int16)
        out = native.decode_i16(d)
        np.testing.assert_allclose(
            out, (d.astype(np.float32) + 32768.0) / 65535.0
        )
        assert out[0] == 0.0 and out[-1] == 1.0

    def test_bulk_matches_numpy(self):
        rng = np.random.default_rng(0)
        d = rng.integers(-32768, 32768, size=100001).astype(np.int16)
        np.testing.assert_array_equal(
            native.decode_i16(d), (d.astype(np.float32) + 32768.0) / 65535.0
        )
        u = rng.integers(0, 256, size=100001).astype(np.uint8)
        np.testing.assert_array_equal(
            native.decode_u8(u), u.astype(np.float32) / 255.0
        )


class TestFrame:
    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_overlapped_framing(self, dtype):
        x = np.arange(100, dtype=dtype)
        f = native.frame_signal(x, nfft=16, stride=8)
        assert f.shape == ((100 - 16) // 8 + 1, 16)  # spectral.go:26-33
        for s in range(f.shape[0]):
            np.testing.assert_array_equal(f[s], x[s * 8 : s * 8 + 16])

    def test_short_signal(self):
        assert native.frame_signal(np.zeros(5), 16, 8).shape == (0, 16)

    def test_errors(self):
        with pytest.raises(ValueError, match="1-D"):
            native.frame_signal(np.zeros((2, 5)), 4, 2)
        with pytest.raises(ValueError, match="stride"):
            native.frame_signal(np.zeros(10), 4, 0)


class TestStreamBuffer:
    def test_push_peek_consume(self):
        b = native.StreamBuffer(capacity=16)
        b.push(np.arange(10.0))
        assert len(b) == 10
        np.testing.assert_array_equal(b.peek(4), np.arange(4.0))
        assert len(b) == 10  # peek does not consume
        b.consume(4)
        assert len(b) == 6
        np.testing.assert_array_equal(b.peek(6), np.arange(4.0, 10.0))

    def test_growth_and_compaction(self):
        b = native.StreamBuffer(capacity=8)
        expect = []
        rng = np.random.default_rng(1)
        for i in range(50):
            block = rng.normal(size=rng.integers(1, 2000))
            b.push(block)
            expect.extend(block.tolist())
            if i % 3 == 0 and len(b) > 100:
                got = b.peek(100)
                np.testing.assert_array_equal(got, np.asarray(expect[:100]))
                b.consume(100)
                del expect[:100]
        np.testing.assert_array_equal(b.peek(len(b)), np.asarray(expect))

    def test_peek_beyond_size(self):
        b = native.StreamBuffer()
        b.push(np.ones(3))
        assert b.peek(10).shape == (3,)

    def test_fifo_order_across_wraps(self):
        b = native.StreamBuffer(capacity=4)
        n = 0
        for _ in range(20):
            b.push(np.arange(n, n + 7, dtype=np.float64))
            n += 7
            b.consume(5)
        start = n - len(b)
        np.testing.assert_array_equal(
            b.peek(len(b)), np.arange(start, n, dtype=np.float64)
        )


def test_native_build_available():
    """g++ is part of this image; the compiled path must be active."""
    assert native.available()
