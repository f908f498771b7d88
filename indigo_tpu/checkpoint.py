"""Solver-state checkpoint/resume.

The reference has no checkpointing (reconstructions run seconds-minutes;
SURVEY.md §5) — this is the optional TPU-native extra the survey sketches
for very long FISTA/CG runs: snapshot any pytree of solver state to an .npz
(complex leaves stored as split re/im, so files round-trip on backends
without complex buffers) and restore it later.

The tree STRUCTURE is serialized alongside the leaves (pickled PyTreeDef —
all indigo_tpu operators are registered pytree nodes with picklable aux
data), so ``load_state(path)`` restores the full pytree with no template.
Only load checkpoints you wrote yourself: like every pickle-based format,
the structure record can execute code on load.
"""
from __future__ import annotations

import pickle

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
    np.savez(path,
             __treedef_pkl__=np.frombuffer(pickle.dumps(treedef),
                                           dtype=np.uint8),
             **flat)
    return path


def load_state(path, like=None):
    """Restore a pytree saved by ``save_state``.

    With no arguments beyond ``path``, the saved tree structure is used and
    the full pytree comes back as written (complex leaves as host numpy
    complex arrays). Passing ``like`` (a pytree with the same structure)
    overrides the stored structure — useful for loading into a tree whose
    node types have since changed.
    """
    with np.load(path) as z:
        names = [k for k in z.files if not k.startswith("__")]
        idxs = sorted({int(k.split("_")[0][4:]) for k in names})
        leaves = []
        for i in idxs:
            if f"leaf{i}_re" in z:
                leaves.append(z[f"leaf{i}_re"] + 1j * z[f"leaf{i}_im"])
            else:
                leaves.append(z[f"leaf{i}"])
        blob = z["__treedef_pkl__"].tobytes() if "__treedef_pkl__" in z \
            else None
    if like is not None:
        _, treedef = jax.tree_util.tree_flatten(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    if blob is None:
        return leaves  # legacy checkpoint without a structure record
    treedef = pickle.loads(blob)
    return jax.tree_util.tree_unflatten(treedef, leaves)
