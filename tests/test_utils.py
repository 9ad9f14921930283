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

    def test_chain_diff_rejects_implausible_reps(self, monkeypatch):
        """A non-positive / sub-granularity differential must be
        remeasured and, if persistent, raised — never clamped to 1e-9
        (VERDICT r4 weak #4: wall_s_best=1e-09 reached an artifact)."""
        import time as _time

        from godsp_tpu.utils import metrics

        # Fake clock: every timed region appears to take the same wall,
        # so the differential is exactly zero on every attempt.
        t = [0.0]

        def fake_counter():
            t[0] += 1.0
            return t[0]

        monkeypatch.setattr(_time, "perf_counter", fake_counter)

        def make(k):
            return lambda x: jnp.float32(1.0)

        with pytest.raises(RuntimeError, match="plausibility floor"):
            metrics.time_chain_diff(make, jnp.zeros(4), retries=1, iters=1)

    def test_chain_diff_valid_measurement(self):
        """A real (CPU) chain pair yields a positive per-app wall."""
        import jax

        from godsp_tpu.utils import metrics

        x = jnp.ones((256, 1024), jnp.float32)

        def make(k):
            @jax.jit
            def chained(z):
                for _ in range(k):
                    z = jnp.tanh(z @ jnp.eye(1024, dtype=z.dtype))
                return jnp.sum(z[0])

            return chained

        per = metrics.time_chain_diff(
            make, x, k_lo=2, k_hi=30, iters=3, min_diff_s=1e-5
        )
        assert per > 0.0


class TestToHost:
    def test_passthrough_and_complex(self):
        a = np.ones(4)
        assert to_host(a) is a
        c = to_host(jnp.asarray([1.0 + 2.0j], dtype=jnp.complex128))
        assert c.dtype == np.complex128 and c[0] == 1 + 2j
