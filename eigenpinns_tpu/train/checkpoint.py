"""Checkpoint / resume (orbax).

The reference checkpoints ad-hoc from notebooks only
(`torch.save({model_state, lambda_refined}, checkpoints/level_{l}_ckpt.pt)`,
iterative_downsampling_continued.ipynb cell 0:318-324; SURVEY.md sec 5).
Here checkpointing is a first-class subsystem: any pytree (params, opt
state, deflation basis, RNG keys, metadata) saves atomically via orbax
and restores with structure/dtype fidelity.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, tree: Any) -> str:
    """Save a pytree checkpoint; returns the absolute path."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: Any | None = None) -> Any:
    """Restore a pytree; `target` (a matching pytree of arrays) restores
    exact structure/dtypes, else generic arrays come back."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if target is not None:
        shapes = jax.tree_util.tree_map(
            lambda x: ocp.utils.to_shape_dtype_struct(x), target)
        return ckptr.restore(path, shapes)
    return ckptr.restore(path)


def latest_checkpoint(directory: str, prefix: str = "step_") -> str | None:
    """Most recent `<prefix><n>` checkpoint directory under `directory`."""
    if not os.path.isdir(directory):
        return None
    best, best_n = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix):
            try:
                n = int(name[len(prefix):])
            except ValueError:
                continue
            if n > best_n:
                best, best_n = os.path.join(directory, name), n
    return best


class TrainCheckpointer:
    """Step-indexed checkpoint/resume for training loops.

    save(step, tree) writes `<dir>/step_<n>`; restore_latest() returns
    (step, tree) of the newest checkpoint or (None, None).
    """

    def __init__(self, directory: str, prefix: str = "step_"):
        self.directory = os.path.abspath(directory)
        self.prefix = prefix
        os.makedirs(self.directory, exist_ok=True)

    def save(self, step: int, tree: Any) -> str:
        return save_checkpoint(
            os.path.join(self.directory, f"{self.prefix}{step}"), tree)

    def restore_latest(self, target: Any | None = None):
        path = latest_checkpoint(self.directory, self.prefix)
        if path is None:
            return None, None
        step = int(os.path.basename(path)[len(self.prefix):])
        return step, restore_checkpoint(path, target)
