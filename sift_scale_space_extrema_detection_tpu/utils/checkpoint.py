"""Checkpoint / resume for pipeline and SLAM state.

The reference has no persistence at all — a page reload loses everything
(SURVEY.md §5.4). Here any pytree (BAState, keypoint buffers, pose
graphs, optimizer state) round-trips through Orbax when available, with
a numpy ``.npz``+JSON fallback so checkpointing never depends on
optional packages.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(k) for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def save_checkpoint(path: str, tree, step: int | None = None) -> str:
    """Save a pytree checkpoint; returns the directory written."""
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckpt_path = os.path.abspath(
            os.path.join(path, f"step_{step}" if step is not None else "state")
        )
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(ckpt_path, tree, force=True)
        checkpointer.wait_until_finished()
        return ckpt_path
    except Exception:
        # numpy fallback: leaves as npz + structure as JSON.
        paths, leaves, _ = _flatten_with_paths(tree)
        name = f"step_{step}" if step is not None else "state"
        np.savez(
            os.path.join(path, name + ".npz"),
            **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )
        with open(os.path.join(path, name + ".json"), "w") as f:
            json.dump({"paths": paths}, f)
        return os.path.join(path, name + ".npz")


def restore_checkpoint_flat(path: str) -> dict:
    """Template-free restore of a checkpoint saved from a FLAT dict.

    Returns ``{key: np.ndarray}``. Used by SLAM resume (models/slam.py)
    where leaf shapes (observation counts, frame index) are unknown
    until the checkpoint is read, so no template pytree can exist.
    """
    if os.path.isdir(path):
        try:
            import orbax.checkpoint as ocp

            checkpointer = ocp.StandardCheckpointer()
            restored = checkpointer.restore(os.path.abspath(path))
            return {k: np.asarray(v) for k, v in dict(restored).items()}
        except Exception:
            pass
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz)
    with open(npz[:-4] + ".json") as f:
        paths = json.load(f)["paths"]

    def clean(p):
        # Flat-dict key paths render as "['key']" via tree_flatten paths.
        return p[2:-2] if p.startswith("['") and p.endswith("']") else p

    return {clean(p): data[f"leaf_{i}"] for i, p in enumerate(paths)}


def restore_checkpoint(path: str, like):
    """Restore a checkpoint into the structure of ``like`` (a template
    pytree with correctly-shaped leaves)."""
    if os.path.isdir(path):
        try:
            import orbax.checkpoint as ocp

            checkpointer = ocp.StandardCheckpointer()
            return checkpointer.restore(os.path.abspath(path), target=like)
        except Exception:
            pass
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    treedef = jax.tree.structure(like)
    like_leaves = jax.tree.leaves(like)
    out = [
        jnp.asarray(v, l.dtype if hasattr(l, "dtype") else None)
        for v, l in zip(leaves, like_leaves)
    ]
    return jax.tree.unflatten(treedef, out)
