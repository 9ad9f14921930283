"""Multi-chip scaling: device meshes, sharded + streaming Welch PSD.

TPU-native replacement for the reference's goroutine worker pool
(SURVEY.md §2.2): data parallelism over channels ("dp"), sequence
parallelism over the time axis ("sp") with ppermute halo exchange, and
psum periodogram reduction.
"""

from godsp_tpu.parallel.mesh import MeshConfig, make_mesh
from godsp_tpu.parallel.pwelch_sharded import (
    partial_periodogram,
    pwelch_sharded,
    sharded_partial_step,
)
from godsp_tpu.parallel.streaming import StreamingPwelch, stream_pwelch

__all__ = [
    "MeshConfig",
    "StreamingPwelch",
    "make_mesh",
    "partial_periodogram",
    "pwelch_sharded",
    "sharded_partial_step",
    "stream_pwelch",
]
