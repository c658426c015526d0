"""Checkpoint / resume of simulation state pytrees.

The reference has no restart path at all (SURVEY.md section 5.4: snapshots
are write-only).  Here any state pytree (e.g. mrt_cg.TwoPhaseState) can be
checkpointed every N steps and restored, so 100k-step Rayleigh-Taylor runs
survive preemption.

Format: one .npz with the flattened leaves plus a JSON treedef descriptor —
no pickle, no framework lock-in.  An orbax-backed variant is provided for
users who want async/multi-host checkpointing.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save(path: str, state, step: int | None = None) -> None:
    """Write a state pytree to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    payload["_treedef"] = np.frombuffer(
        json.dumps({"repr": str(treedef), "n": len(leaves),
                    "step": step}).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as fh:
        np.savez(fh, **payload)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load(path: str, like):
    """Restore a state pytree; ``like`` supplies the tree structure (an
    example state, e.g. freshly built by the scene's init)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["_treedef"].tobytes()).decode())
        leaves = [data[f"leaf_{i}"] for i in range(meta["n"])]
    _, treedef = jax.tree_util.tree_flatten(like)
    if treedef.num_leaves != meta["n"]:
        raise ValueError(
            f"checkpoint has {meta['n']} leaves, expected {treedef.num_leaves}")
    return jax.tree_util.tree_unflatten(treedef, leaves), meta.get("step")


def latest(directory: str, stem: str = "ckpt"):
    """Newest checkpoint path matching {stem}-{step}.npz, or None."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith(stem + "-") and name.endswith(".npz"):
            try:
                step = int(name[len(stem) + 1:-4])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(directory, name), step
    return best


class Checkpointer:
    """Periodic checkpointing helper: ``maybe_save(step, state)`` writes
    every ``every`` steps and prunes old files beyond ``keep``."""

    def __init__(self, directory: str, every: int, keep: int = 2,
                 stem: str = "ckpt"):
        self.directory = directory
        self.every = every
        self.keep = keep
        self.stem = stem

    def path(self, step: int) -> str:
        return os.path.join(self.directory, f"{self.stem}-{step}.npz")

    def maybe_save(self, step: int, state) -> bool:
        if self.every <= 0 or step % self.every != 0:
            return False
        self.force_save(step, state)
        return True

    def force_save(self, step: int, state) -> None:
        """Write a checkpoint at ``step`` unconditionally (scene drive
        loops that chunk past exact cadence multiples use this), then
        prune to ``keep``."""
        save(self.path(step), state, step=step)
        self._prune()

    def _prune(self) -> None:
        entries = []
        for name in os.listdir(self.directory):
            if name.startswith(self.stem + "-") and name.endswith(".npz"):
                try:
                    entries.append((int(name[len(self.stem) + 1:-4]), name))
                except ValueError:
                    pass
        for _, name in sorted(entries)[:-self.keep or None]:
            os.remove(os.path.join(self.directory, name))

    def restore_latest(self, like):
        path = latest(self.directory, self.stem)
        if path is None:
            return None, None
        return load(path, like)


class OrbaxCheckpointer:
    """Orbax-backed variant for async / multi-host checkpointing of state
    pytrees.  Same maybe_save/restore_latest surface as Checkpointer."""

    def __init__(self, directory: str, every: int, keep: int = 2):
        import orbax.checkpoint as ocp

        self.every = every
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=keep),
        )

    def maybe_save(self, step: int, state) -> bool:
        if self.every <= 0 or step % self.every != 0:
            return False
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        return True

    def restore_latest(self, like):
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(like))
        return restored, step

    def wait(self):
        self._mgr.wait_until_finished()
