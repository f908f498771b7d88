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

__all__ = ["fftn_sharded", "fftn_sharded2"]


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


def fftn_sharded2(v, mesh, axes=("x", "y"), inverse=False):
    """FFT over all axes of a >=3D ``v`` pencil-sharded on dims 0 and 1.

    The 2-axis (pencil) decomposition: with v (X, Y, Z, ...) sharded
    (X over ``axes[0]`` size p, Y over ``axes[1]`` size q), each device
    holds an (X/p, Y/q, Z, ...) pencil and every FFT stage is local:

        FFT(z..)  ->  all_to_all[b] (Z->Y)  ->  FFT(y)
                  ->  all_to_all[a] (Y->X)  ->  FFT(x)  -> undo both

    Scales a single volume over p*q chips where the 1-axis slab form
    (:func:`fftn_sharded`) stops at p <= X. Requires X % p == Y % p ==
    Y % q == Z % q == 0.
    """
    nd = v.ndim
    if nd < 3:
        raise ValueError("fftn_sharded2 needs >= 3 dims (pencil form); "
                         "use fftn_sharded for 2D")
    a, b = axes
    p, q = mesh.shape[a], mesh.shape[b]
    X, Y, Z = v.shape[0], v.shape[1], v.shape[2]
    if X % p or Y % p or Y % q or Z % q:
        raise ValueError(
            f"shape {v.shape} not compatible with mesh axes {a}={p}, "
            f"{b}={q}: need X%p == Y%p == Y%q == Z%q == 0")
    fft = jnp.fft.ifftn if inverse else jnp.fft.fftn
    spec = P(a, b, *([None] * (nd - 2)))

    def block(local):
        # (X/p, Y/q, Z, ...): FFT the fully-local trailing axes
        local = fft(local, axes=tuple(range(2, nd)))
        # gather Y by splitting Z over axis b: (X/p, Y, Z/q, ...)
        local = jax.lax.all_to_all(
            local, b, split_axis=2, concat_axis=1, tiled=True)
        local = fft(local, axes=(1,))
        # gather X by splitting Y over axis a: (X, Y/p, Z/q, ...)
        local = jax.lax.all_to_all(
            local, a, split_axis=1, concat_axis=0, tiled=True)
        local = fft(local, axes=(0,))
        # undo both reshards
        local = jax.lax.all_to_all(
            local, a, split_axis=0, concat_axis=1, tiled=True)
        local = jax.lax.all_to_all(
            local, b, split_axis=1, concat_axis=2, tiled=True)
        return local

    return shard_map(block, mesh=mesh, in_specs=(spec,), out_specs=spec)(v)
