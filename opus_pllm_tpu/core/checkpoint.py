"""Orbax checkpointing: save/restore/resume for params and train states.

The reference has no training-resume logic; it only *reads* four PyTorch
checkpoint dialects (SURVEY.md §5). Here Orbax is the native format —
sharding-aware, async-capable — and core/convert.py provides the one-way
importers from the PyTorch dialects.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    """Save any param/state pytree to `path` (overwrites)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    _checkpointer().save(path, tree,
                         save_args=jax.tree.map(lambda _: ocp.SaveArgs(), tree),
                         force=True)


def restore_pytree(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree; `like` (a matching pytree of arrays or
    ShapeDtypeStructs, possibly with shardings) restores into that
    structure/placement."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if like is None:
        return _checkpointer().restore(path)
    targets = jax.tree.map(
        lambda x: ocp.utils.to_shape_dtype_struct(x) if hasattr(x, "shape") else x,
        like)
    return _checkpointer().restore(path, item=targets)


class CheckpointManager:
    """Stepped checkpoints with retention + latest-step resume."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, tree: Any, *, wait: bool = True) -> None:
        """wait=False returns as soon as the save is staged (Orbax
        serializes in the background) — the periodic in-training saves use
        this so checkpointing never stalls the step loop; call wait() (or
        any restore/latest_step-after-save) before relying on the files."""
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.PyTreeSave(tree))
        if wait:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None,
                like: Optional[Any] = None) -> Any:
        import orbax.checkpoint as ocp
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        if like is None:
            return self._mgr.restore(step)
        targets = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x) if hasattr(x, "shape") else x,
            like)
        return self._mgr.restore(step, args=ocp.args.PyTreeRestore(item=targets))
