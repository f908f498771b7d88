"""Solver-state checkpoint/resume.

The reference has no checkpointing (reconstructions run seconds-minutes;
SURVEY.md §5) — this is the optional TPU-native extra the survey sketches
for very long FISTA/CG runs: snapshot any pytree of solver state to an .npz
(complex leaves stored as split re/im, so files round-trip on backends
without complex buffers) and restore it later.
"""
from __future__ import annotations

import numpy as np

import jax

from . import cplx

__all__ = ["save_state", "load_state"]


def save_state(path, state):
    """Snapshot a pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(
        cplx._encode(state), is_leaf=cplx.iscpair)
    flat = {}
    for i, leaf in enumerate(leaves):
        if cplx.iscpair(leaf):
            flat[f"leaf{i}_re"] = np.asarray(leaf.re)
            flat[f"leaf{i}_im"] = np.asarray(leaf.im)
        else:
            flat[f"leaf{i}"] = np.asarray(leaf)
    np.savez(path, __treedef__=np.frombuffer(
        str(treedef).encode(), dtype=np.uint8), **flat)
    return path


def load_state(path, like=None):
    """Restore a pytree saved by save_state.

    ``like``: a pytree with the same structure (its treedef is used for
    unflattening; required because treedefs aren't generally serializable).
    Without ``like``, returns the flat list of leaves in saved order.
    """
    with np.load(path) as z:
        names = [k for k in z.files if k != "__treedef__"]
        idxs = sorted({int(k.split("_")[0][4:]) for k in names})
        leaves = []
        for i in idxs:
            if f"leaf{i}_re" in z:
                leaves.append(z[f"leaf{i}_re"] + 1j * z[f"leaf{i}_im"])
            else:
                leaves.append(z[f"leaf{i}"])
    if like is None:
        return leaves
    _, treedef = jax.tree_util.tree_flatten(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)
