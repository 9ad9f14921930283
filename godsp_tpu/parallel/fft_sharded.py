"""Tensor-parallel FFT: one giant transform split across the mesh.

SURVEY.md §2.2 lists this as the TP row of the parallelism map: a single
N-point DFT factored N = p x N2 (p = number of "sp" shards) so each
device computes local batched FFTs while the cross-device data movement
is two `all_to_all` block transposes over ICI (plus one more for
natural output order):

  X[i1, i2] = x[N2*i1 + i2]  (i1 = shard row, i2 local)
  step T1:   all_to_all  -> each device holds all i1 for an i2-slice
  step 1:    A[k1, i2] = sum_i1 F1[k1, i1] X[i1, i2]   (local p x p matmul)
  step 2:    B = A * W_N^{k1 i2}                        (local twiddle)
  step T2:   all_to_all  -> back to row layout, device k1 holds B[k1, :]
  step 3:    Y[k1, k2] = FFT_{N2}(B[k1, :])[k2]         (local, Pallas/XLA)
  output:    Y[k1 + p*k2] — "digit" shard order; order="natural"
             performs a third all_to_all block transpose.

Everything local reuses the framework's batched FFT stack (Pallas kernel
on TPU).  Validated against numpy on the 8-device virtual mesh
(tests/test_parallel.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from godsp_tpu._dtypes import as_complex_array, complex_for, put
from godsp_tpu.dsputils.utils import is_power_of_2

__all__ = ["fft_sharded"]


@lru_cache(maxsize=None)
def _f1_twiddle(p: int, n2_local: int, n2: int, inverse: bool):
    """(F1[p, p], per-shard twiddle builder inputs) as float64 numpy."""
    k1 = np.arange(p, dtype=np.float64)
    f1 = np.exp(-2j * np.pi * np.outer(k1, k1) / p)
    if inverse:
        f1 = np.conj(f1)
    return f1


@lru_cache(maxsize=None)
def _twiddle_tables(p: int, n2: int, inverse: bool):
    """Trace-time f64 split of the step-2 twiddle W_N^{k1 * i2}.

    Shard s holds i2 = s*m + t (m = n2//p), so the factorization
    W^{k1 i2} = W^{k1 s m} * W^{k1 t} splits into
      row[s, k1] = W_N^{k1 * s * m}   (runtime-indexed by shard id)
      col[k1, t] = W_N^{k1 * t}       (shared constant)
    — exact f64 numpy at trace time; nothing requests x64 on device
    (the old runtime float64 arange/astype tripped truncation warnings
    in non-x64 dryruns).
    """
    n = p * n2
    m = n2 // p
    w = -2j * np.pi / n
    k1 = np.arange(p, dtype=np.float64)
    col = np.exp(w * np.outer(k1, np.arange(m, dtype=np.float64)))
    row = np.exp(w * np.outer(k1 * m, k1))  # [s, k1] = W^{k1 s m}
    if inverse:
        col, row = np.conj(col), np.conj(row)
    return col, row


def fft_sharded(
    x,
    mesh: Mesh,
    inverse: bool = False,
    order: str = "natural",
) -> jax.Array:
    """DFT of a single long signal sharded over the mesh's "sp" axis.

    x: (N,) complex/real, N = p * N2 with both p-divisible; sharded (or
    shardable) over "sp".  Returns the unnormalized forward (or
    conjugated inverse) DFT, sharded the same way.  order="natural"
    returns standard bin order (third all_to_all); order="digit" skips
    it and returns Y[k1 + p*k2] at position k1*N2 + k2 — free for
    consumers that reduce over bins or feed a matching inverse.

    The inverse here conjugates the tables and does NOT apply 1/N (match
    the public ifft convention by scaling externally).
    """
    if order not in ("natural", "digit"):
        raise ValueError(f"unknown order: {order}")
    x = as_complex_array(put(x))
    n = x.shape[-1]
    if x.ndim != 1:
        raise ValueError("fft_sharded expects a single 1-D signal")
    p = mesh.shape["sp"]
    if n % (p * p) != 0:
        raise ValueError(f"N={n} must be divisible by p^2={p*p}")
    n2 = n // p
    if not is_power_of_2(n2):
        raise ValueError(f"local length N/p={n2} must be a power of 2")
    cdtype = complex_for(x.dtype)
    return _run_cached(mesh, p, n2, inverse, order, str(cdtype))(x)


@lru_cache(maxsize=None)
def _run_cached(mesh, p: int, n2: int, inverse: bool, order: str, cdtype_name: str):
    """One jitted program per (mesh, geometry): rebuilding the jit per
    call would retrace every time; eager op-by-op complex dispatch is
    also unimplemented on some TPU transports, so everything (including
    the F1 constant, which embeds at trace time) lives under this jit."""
    cdtype = jnp.dtype(cdtype_name)
    n = p * n2

    def shard_fn(xl):
        # xl: (1, n2) — row i1 = my shard index, X[i1, i2] = x[n2*i1 + i2].
        from godsp_tpu.fft.pow2 import pow2_fft

        f1 = jnp.asarray(_f1_twiddle(p, n2 // p, n2, inverse), dtype=cdtype)
        my = jax.lax.axis_index("sp")
        xl = xl.reshape(n2)

        # T1: (n2,) -> (p, n2/p) blocks -> all_to_all so this device holds
        # X[i1, my-th i2 slice] for ALL i1: (p, n2/p).
        blocks = xl.reshape(p, n2 // p)
        cols = jax.lax.all_to_all(blocks, "sp", split_axis=0, concat_axis=0)
        cols = cols.reshape(p, n2 // p)

        # Step 1: p-point DFT over i1 (local matmul, f64 tables).
        a = f1 @ cols  # (p, n2/p)

        # Step 2: twiddle W_N^{k1 * i2} on this device's i2 slice, from
        # the exact trace-time f64 split (row indexed by shard id).
        col, row = _twiddle_tables(p, n2, inverse)
        tw = jnp.asarray(row, cdtype)[my][:, None] * jnp.asarray(col, cdtype)
        a = a * tw

        # T2: back to row layout — device k1 gets B[k1, :] (n2,).
        rows = jax.lax.all_to_all(
            a.reshape(p, n2 // p), "sp", split_axis=0, concat_axis=0
        ).reshape(n2)

        # Step 3: local N2-point FFT (Pallas kernel on TPU when sized).
        y = pow2_fft(rows[None, :], inverse=inverse)[0]  # Y[my + p*k2]

        if order == "digit":
            return y[None, :]

        # Natural order: global transpose of the (p, n2) digit layout.
        # Device k1 holds Y[k1 + p*k2] for all k2; natural position of
        # bin (k1, k2) is k1 + p*k2, i.e. the flattened (n2, p) layout —
        # one more all_to_all plus a local transpose.
        blk = y.reshape(p, n2 // p)  # split k2 into p groups
        got = jax.lax.all_to_all(blk, "sp", split_axis=0, concat_axis=0)
        # got[j] = Y[j + p*(my_group_base + k2')] for k2' in [0, n2/p):
        # interleave to natural order of this device's n2-bin span.
        nat = jnp.transpose(got.reshape(p, n2 // p), (1, 0)).reshape(n2)
        return nat[None, :]

    @jax.jit
    def run(xx):
        out = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=P("sp"),
            out_specs=P("sp"),
            check_vma=False,
        )(xx.reshape(p, n2))
        return out.reshape(n)

    return run
