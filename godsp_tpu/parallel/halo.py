"""Overlap-halo exchange as a Pallas remote-DMA ring kernel.

The hand-written alternative to the `jax.lax.ppermute` halo in
pwelch_sharded (SURVEY.md §5 commits both): each shard sends the first
`halo` samples of its time block directly into its LEFT neighbor's
receive buffer over ICI with `pltpu.make_async_remote_copy`, so device i
receives the head of device i+1's block — exactly the ppermute contract
`perm=[(i, (i-1) % n)]`.

Where it pays: the RDMA starts as soon as the head samples exist and
overlaps with unrelated compute, and it can be fused into a larger
Pallas pipeline (no separate XLA collective op / rendezvous).  The
ppermute path remains the default — it is the simpler, XLA-scheduled
form and the only one exercisable on the CPU test mesh outside
interpreter mode.

Call INSIDE shard_map over a ("dp", "sp") or ("sp",) mesh.  Validated
against ppermute on the 8-device interpret-mode mesh
(tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ring_halo_pallas"]


def _halo_kernel(x_ref, out_ref, send_sem, recv_sem, *, halo, n_sp, has_dp):
    """Send my head to the left neighbor; receive from the right."""
    my_sp = jax.lax.axis_index("sp")
    # int32 literals: under x64, python-int promotion would mix dtypes.
    left_sp = jax.lax.rem(my_sp + jnp.int32(n_sp - 1), jnp.int32(n_sp))
    if has_dp:
        # Multi-axis mesh: MESH addressing moves only the "sp"
        # coordinate (other axes stay at this device's coordinates).
        # Compiled TPU path only — interpret-mode DMA discharge supports
        # single-axis meshes, where the LOGICAL branch below is used and
        # ring-validated against ppermute (tests/test_parallel.py).
        dev_kwargs = dict(
            device_id={"sp": left_sp},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
    else:
        dev_kwargs = dict(
            device_id=left_sp,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[:, pl.ds(0, halo)],
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        **dev_kwargs,
    )
    rdma.start()
    rdma.wait()


def ring_halo_pallas(
    x_local: jax.Array,
    halo: int,
    n_sp: int,
    has_dp: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """(..., L) local time block -> (..., halo) head of the RIGHT
    neighbor's block (ring wraparound at the last shard).

    Must run inside shard_map with an "sp" axis (plus "dp" when has_dp).
    Equivalent to
    `jax.lax.ppermute(x[..., :halo], "sp", [(i, (i-1) % n) for i ...])`.
    """
    if halo <= 0:
        return x_local[..., :0]
    lead = x_local.shape[:-1]
    x2 = x_local.reshape(-1, x_local.shape[-1])
    out = pl.pallas_call(
        lambda x_ref, out_ref, s, r: _halo_kernel(
            x_ref, out_ref, s, r, halo=halo, n_sp=n_sp, has_dp=has_dp
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (x2.shape[0], halo),
            x2.dtype,
            vma=getattr(jax.typeof(x2), "vma", None) or frozenset(),
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            # collective_id is only legal with a custom barrier semaphore;
            # specifying it made the COMPILED path fail ("collective_id
            # has to be unspecified ... when not using a custom barrier").
            has_side_effects=True,
        ),
        interpret=interpret,
    )(x2)
    return out.reshape(*lead, halo)
