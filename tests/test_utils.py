"""utils: profiling hooks, metrics, host transfer."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from godsp_tpu.utils import BenchResult, annotate, to_host, trace_to
from godsp_tpu.utils.metrics import fft_bytes, fft_flops, hbm_bandwidth_gbs


class TestProfiling:
    def test_trace_to_writes_files(self, tmp_path):
        d = str(tmp_path / "trace")
        with trace_to(d):
            with annotate("test-span"):
                jnp.sum(jnp.ones((64, 64))).block_until_ready()
        found = [
            os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs
        ]
        assert found, "trace produced no files"

    def test_annotate_context(self):
        with annotate("span"):
            pass  # must be a usable context manager


class TestMetrics:
    def test_bench_result(self):
        r = BenchResult(name="x", wall_s=0.5, flops=1e9, bytes_moved=2e9)
        assert r.gflops == pytest.approx(2.0)
        assert r.gbs == pytest.approx(4.0)
        assert "gflops" in r.json_line()

    def test_fft_models(self):
        assert fft_flops(1024, 2) == pytest.approx(2 * 5 * 1024 * 10)
        assert fft_bytes(1024, 2, 8) == 2 * 2 * 1024 * 8

    def test_hbm_table(self):
        # unknown device kind -> None (no fabricated peak)
        class Fake:
            device_kind = "mystery9000"

        assert hbm_bandwidth_gbs(Fake()) is None


class TestToHost:
    def test_passthrough_and_complex(self):
        a = np.ones(4)
        assert to_host(a) is a
        c = to_host(jnp.asarray([1.0 + 2.0j], dtype=jnp.complex128))
        assert c.dtype == np.complex128 and c[0] == 1 + 2j
