"""Device-mesh construction for the DSP pipelines.

The reference's only parallelism is an in-process goroutine pool over
butterfly blocks (fft/radix2.go:75-153).  The TPU equivalents
(SURVEY.md §2.2):

  * dp — data parallel over independent signals/channels;
  * sp — sequence parallel over the time axis of one long signal, with
    overlap halos exchanged between neighbor shards.

Multi-host: call jax.distributed.initialize() before building the mesh;
jax.devices() then spans the pod slice and the same code runs unchanged
(collectives ride ICI within a slice, DCN across).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MeshConfig", "make_mesh", "init_distributed", "P", "NamedSharding"]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX (idempotent); returns global device count.

    Call once per host before make_mesh on a pod slice; with no arguments
    the TPU environment is auto-detected (jax.distributed.initialize's
    default).  After this, jax.devices() spans the slice and the same
    mesh/shard_map code runs unchanged — collectives ride ICI within a
    slice and DCN across slices.  Failure policy is fail-fast per JAX
    multi-host convention (SURVEY.md §5); no elastic resize.
    """
    if jax.process_count() == 1 and (num_processes or 1) > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif jax.process_count() == 1 and num_processes is None:
        try:  # auto-detected TPU pod environment (no-op on single host)
            jax.distributed.initialize()
        except Exception:
            pass  # single-process run: nothing to initialize
    return len(jax.devices())


@dataclass(frozen=True)
class MeshConfig:
    """Frozen mesh description (no process-global knobs — the TPU
    counterpart of the reference's SetWorkerPoolSize global,
    fft/fft.go:89-101)."""

    dp: int = 1  # data-parallel (channel/batch) axis size
    sp: int = 1  # sequence-parallel (time) axis size

    @property
    def n_devices(self) -> int:
        return self.dp * self.sp


def make_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("dp", "sp") mesh.

    Default: all local devices on the sp axis (the streaming-Pwelch
    layout — neighbor halos ride ICI).
    """
    devices = list(devices if devices is not None else jax.devices())
    if config is None:
        config = MeshConfig(dp=1, sp=len(devices))
    if config.n_devices > len(devices):
        raise ValueError(
            f"mesh needs {config.n_devices} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[: config.n_devices]).reshape(config.dp, config.sp)
    return Mesh(grid, ("dp", "sp"))
