"""Checkpoint / resume for training states (orbax-backed).

TPU-native equivalent of the reference's ad-hoc artifacts (SURVEY.md §5):
per-stage npz/ply files remain for interchange
(render.avatar_model.save_avatar_checkpoint, MaterialTrainer.save); this
module adds whole-pytree checkpoints — params + optimizer state + step —
so any trainer resumes exactly (the reference's full optimizer
capture/restore exists but is unused, scene/gaussian_model.py:74-110)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_pytree(path: str, tree: Any, step: Optional[int] = None):
    """Save a pytree checkpoint at ``path`` (directory)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    if step is not None:
        with open(os.path.join(path, "STEP"), "w") as f:
            f.write(str(step))


def restore_pytree(path: str, like: Any = None):
    """Restore a checkpoint; ``like`` provides the target structure."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            restored = ckptr.restore(path, item=like)
        else:
            restored = ckptr.restore(path)
    step = None
    step_file = os.path.join(path, "STEP")
    if os.path.exists(step_file):
        with open(step_file) as f:
            step = int(f.read().strip())
    return restored, step


def latest_checkpoint(base_dir: str, prefix: str = "step_"):
    """searchForMaxIteration equivalent (utils/system_utils.py:26)."""
    if not os.path.isdir(base_dir):
        return None
    steps = []
    for name in os.listdir(base_dir):
        if name.startswith(prefix):
            try:
                steps.append(int(name[len(prefix):]))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(base_dir, f"{prefix}{max(steps)}")


def save_npz_pytree(path: str, tree: Any):
    """Dependency-free fallback: flatten a pytree into one npz."""
    leaves, treedef = jax.tree.flatten(tree)
    np.savez(path, __treedef__=str(treedef),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_npz_pytree(path: str, like: Any):
    """Restore from save_npz_pytree using ``like``'s structure."""
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree.flatten(like)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp
    return jax.tree.unflatten(treedef, [jnp.asarray(l) for l in new_leaves])
