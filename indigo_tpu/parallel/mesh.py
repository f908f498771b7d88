"""Device-mesh helpers."""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "shard_along"]


def make_mesh(**axes):
    """Build a Mesh from named axis sizes: ``make_mesh(slice=4, coil=2)``.

    Axis sizes must multiply to at most the available device count; excess
    devices are left unused. An axis size of -1 absorbs the remainder.
    """
    ndev = len(jax.devices())
    names = tuple(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = max(1, ndev // known)
    total = int(np.prod(sizes))
    if total > ndev:
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} "
                         f"devices, only {ndev} available")
    devs = np.asarray(jax.devices()[:total]).reshape(sizes)
    return Mesh(devs, names)


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_along(mesh, axis_name, ndim, dim=0):
    """NamedSharding putting mesh axis ``axis_name`` on array dim ``dim``."""
    spec = [None] * ndim
    spec[dim] = axis_name
    return NamedSharding(mesh, P(*spec))
