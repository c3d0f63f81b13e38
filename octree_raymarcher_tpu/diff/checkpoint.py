"""Checkpoint / resume for the inverse-rendering optimization loop.

Capability parity with the reference's (unused) binary chunk persistence
(Ocroot::write/read, src/Octree.cpp:178-201), extended to what a training
loop actually needs to survive preemption: voxel parameters, optimizer
state and step counter round-trip through one npz via
jax.tree_util.tree_flatten — structure-agnostic, so any optax optimizer
state checkpoints without schema code.  World geometry checkpoints
separately via World.save/load (world/world.py).
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_state(path: str, step: int, *trees) -> None:
    """Serialize (step, *pytrees) to an npz.  Leaves are stored flat; the
    treedefs are stored as strings for a structure check on load."""
    arrays = {"step": np.int64(step), "n_trees": np.int64(len(trees))}
    defs = []
    for i, tree in enumerate(trees):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        defs.append(str(treedef))
        arrays[f"t{i}_n"] = np.int64(len(leaves))
        for j, leaf in enumerate(leaves):
            arrays[f"t{i}_{j}"] = np.asarray(leaf)
    arrays["treedefs"] = np.frombuffer(
        json.dumps(defs).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_state(path: str, *templates):
    """Restore (step, *pytrees); ``templates`` give the pytree structures
    (e.g. fresh params / opt_state).  Raises on structure mismatch."""
    z = np.load(path, allow_pickle=False)
    step = int(z["step"])
    n = int(z["n_trees"])
    assert n == len(templates), f"checkpoint has {n} trees, caller expects {len(templates)}"
    saved_defs = json.loads(bytes(z["treedefs"]).decode())
    out = []
    for i, tmpl in enumerate(templates):
        leaves, treedef = jax.tree_util.tree_flatten(tmpl)
        assert str(treedef) == saved_defs[i], (
            f"checkpoint tree {i} structure mismatch:\n{saved_defs[i]}\nvs\n{treedef}"
        )
        k = int(z[f"t{i}_n"])
        assert k == len(leaves), (k, len(leaves))
        restored = [z[f"t{i}_{j}"] for j in range(k)]
        out.append(jax.tree_util.tree_unflatten(treedef, restored))
    return (step, *out)


__all__ = ["save_state", "load_state"]
