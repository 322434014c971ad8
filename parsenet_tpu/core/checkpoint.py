"""Checkpointing via orbax.

Equivalent of the reference's torch.save-on-best-val (train_parsenet.py:
279-289) plus periodic iteration-indexed saves (train_parsenet_e2e.py:
298-306). Saves the full train state pytree (params, batch_stats, opt_state,
step, best metric) and restores it for resume.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: Any, force: bool = False,
             wait: bool = True) -> None:
        """wait=True blocks until the write is durable. orbax saves are
        async under the hood, and a process that exits before the write
        commits loses the checkpoint (Python tears down the thread pool
        before atexit hooks can drain it) — states here are small enough
        (~20 MB) that blocking costs well under a second."""
        self.mngr.save(step, args=ocp.args.StandardSave(state), force=force)
        if wait:
            self.mngr.wait_until_finished()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `state_like`. A target that is a
        sub-tree of the saved state (e.g. params only, without opt_state)
        restores partially."""
        step = self.mngr.latest_step() if step is None else step
        if step is None:
            return None
        try:
            return self.mngr.restore(
                step, args=ocp.args.StandardRestore(state_like))
        except Exception:
            if state_like is None or not isinstance(state_like, dict):
                raise
            # partial restore: load the full saved tree untyped and slice
            # out the requested top-level entries, validating leaf shapes
            import jax
            import numpy as np
            full = self.mngr.restore(step, args=ocp.args.StandardRestore(None))
            missing = [k for k in state_like if k not in full]
            if missing:
                raise KeyError(f"checkpoint lacks entries {missing}; "
                               f"has {list(full.keys())}")
            sub = {k: full[k] for k in state_like}
            want = jax.tree_util.tree_leaves(state_like)
            got = jax.tree_util.tree_leaves(sub)
            if len(want) != len(got) or any(
                    np.shape(a) != np.shape(b) for a, b in zip(got, want)):
                raise ValueError(
                    "checkpoint tree does not match the requested structure "
                    "(wrong model for this checkpoint?)")
            return sub

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def wait(self) -> None:
        self.mngr.wait_until_finished()


def flatten_tree(tree: dict, prefix: str = "") -> dict:
    """Nested dict of arrays -> flat {'a/b/c': array} dict."""
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = v
    return out


def unflatten_tree(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_npz_params(path: str) -> Optional[dict]:
    """Load a committed npz export (scripts/export_params.py) back into the
    nested {params[, batch_stats]} tree with float32 leaves. None when the
    file does not exist — callers fall back to checkpoints / random init."""
    import numpy as np
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        flat = {k: np.asarray(z[k], np.float32) for k in z.files}
    return unflatten_tree(flat)


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (torch semantics, mode=min):
    if the monitored metric does not improve for `patience` epochs, scale the
    lr by `factor` (reference: train_parsenet.py:137-140, patience 8,
    factor 0.5)."""

    def __init__(self, lr: float, patience: int = 8, factor: float = 0.5,
                 min_lr: float = 1e-7, eps: float = 1e-8):
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.eps = eps
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best - self.eps:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr
