"""Distributed multi-axis FFT via per-axis FFT + all_to_all transposes.

The sequence-parallel analogue for this workload (SURVEY.md §5 "long
context"): volumes too large for one chip are sharded along their leading
axis; the FFT runs as (local FFT over unsharded axes) -> all_to_all resharding
over ICI -> (local FFT over the remaining axis) -> all_to_all back. Pattern
follows the distributed-NUFFT decomposition referenced in PAPERS.md.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

__all__ = ["fftn_sharded"]


def fftn_sharded(v, mesh, axis_name="x", inverse=False):
    """FFT over all axes of ``v`` (>=2D), sharded on dim 0 of the mesh axis.

    v: complex array (inside jit) of shape (X, Y, ...) with X divisible by
    the mesh axis size; returns same shape/sharding.
    """
    nd = v.ndim
    fft = jnp.fft.ifftn if inverse else jnp.fft.fftn
    p = mesh.shape[axis_name]
    if v.shape[0] % p or v.shape[1] % p:
        raise ValueError(
            f"dims 0 and 1 of {v.shape} must each be divisible by the "
            f"mesh axis size {p}")

    spec0 = P(axis_name, *([None] * (nd - 1)))

    def block(local):
        # local: (X/p, Y, ...); FFT all axes except 0
        local = fft(local, axes=tuple(range(1, nd)))
        # reshard: split axis 1 across devices, gather axis 0
        local = jax.lax.all_to_all(
            local, axis_name, split_axis=1, concat_axis=0, tiled=True)
        # now (X, Y/p, ...): FFT the remaining axis
        local = fft(local, axes=(0,))
        # reshard back
        local = jax.lax.all_to_all(
            local, axis_name, split_axis=0, concat_axis=1, tiled=True)
        return local

    return shard_map(
        block, mesh=mesh, in_specs=(spec0,), out_specs=spec0)(v)
