"""Test harness configuration.

Parity tests run on CPU in float64 (the reference computes in
float64/complex128); multi-chip sharding tests run on a virtual 8-device
CPU mesh via --xla_force_host_platform_device_count, per SURVEY.md §4.
Environment must be set before jax initializes its backends.
"""

import os

# Force CPU regardless of the session's JAX platform (e.g. axon TPU):
# parity tests need float64/complex128, which TPU does not support.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize may register a TPU plugin at interpreter
# startup and set jax_platforms directly, which overrides JAX_PLATFORMS —
# force the config back to CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_wav_dir():
    """Directory of the reference's binary WAV fixtures (read-only)."""
    path = "/root/reference/wav"
    if not os.path.isdir(path):
        pytest.skip("reference WAV fixtures not available")
    return path
