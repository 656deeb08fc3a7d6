"""Orbax checkpointing with the reference's dual best-on-val / last policy.

The reference torch.saves a dict of {epoch, model_state_dict, losses, ...}
best-on-validation plus an every-epoch ``_last_epoch`` file
(/root/reference/train_polyupd.py:226-235,
/root/reference/train_poly_unet_cont.py:663-690) and never saves optimizer
state. Here the FULL train state (params, optimizer, BN stats, EMA, step)
and the PRNG key are checkpointed, giving true preemption-safe resume
(SURVEY.md §5) - a capability the reference lacks.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """best/ and last/ checkpoints under a root dir, with metadata."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.best_metric: Optional[float] = None

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _save_atomic(self, name: str, state: Any):
        """Crash-safe save: write to ``<name>.new``, wait until durable,
        then swap into place.

        ``StandardCheckpointer.save(force=True)`` deletes the existing
        final directory when the (async) save STARTS - a process killed
        inside that window leaves NO valid checkpoint, and a subsequent
        ``--resume`` silently restarts from scratch (observed live in the
        round-5 flagship run: a mid-save kill at epoch 11 erased ``last``
        and the resumed process re-trained from epoch 0). The swap keeps
        a complete ``name`` directory on disk at every instant.
        """
        new = self._dir(name + ".new")
        old = self._dir(name + ".old")
        final = self._dir(name)
        shutil.rmtree(new, ignore_errors=True)
        # Also clear orbax's own in-flight tmp dirs: a killed process
        # leaves "<target>.orbax-checkpoint-tmp" behind, and a later save
        # to the same target writes into the poisoned OCDBT database and
        # crashes with a tensorstore rename NOT_FOUND (observed live,
        # round 5: run 2's kill left resume_opt.orbax-checkpoint-tmp and
        # run 3 died saving epoch 10).
        for stale in (new + ".orbax-checkpoint-tmp",
                      final + ".orbax-checkpoint-tmp"):
            shutil.rmtree(stale, ignore_errors=True)
        self._ckpt.save(new, state, force=True)
        self._ckpt.wait_until_finished()  # durable before the swap
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(new, final)
        shutil.rmtree(old, ignore_errors=True)

    def save_last(self, state: Any):
        self._save_atomic("last", state)

    def save_best(self, state: Any, metric: float):
        """Save iff ``metric`` improves (lower = better, val-loss policy)."""
        if self.best_metric is None or metric < self.best_metric:
            self.best_metric = float(metric)
            self._save_atomic("best", state)
            return True
        return False

    def save_resume(self, payload: Any, opt_state: Any = None):
        """Every-epoch preemption-safe resume state.

        ``payload`` (params/epoch/PRNG key/watermarks) goes to ``resume``;
        the optimizer state, when given, goes to a separate ``resume_opt``
        tree because its typed pytree (optax namedtuples) must be restored
        into a freshly-initialized target while the payload restores raw.
        """
        self._save_atomic("resume", payload)
        if opt_state is not None:
            self.save_opt(opt_state)

    def save_opt(self, opt_state: Any):
        """Optimizer-state companion to ``save_last``/``save_resume`` (the
        reference never persists optimizer moments - train_polyupd.py:229
        comments the save out; here Adam state survives preemption)."""
        self._save_atomic("resume_opt", opt_state)

    def restore_opt(self, target: Any) -> Any:
        """Typed restore of the optimizer state saved by ``save_opt``;
        returns ``target`` unchanged when no opt checkpoint exists."""
        if not self.exists("resume_opt"):
            return target
        return self._ckpt.restore(self._dir("resume_opt"), target=target)

    def restore(self, target: Any, which: str = "last") -> Any:
        """Restore into the structure of ``target`` (an abstract state)."""
        return self._ckpt.restore(self._dir(which), target=target)

    def restore_raw(self, which: str = "last") -> Any:
        """Target-free restore: returns the saved pytree as nested dicts of
        arrays. Use for inference-time loads where optimizer-state structure
        does not matter."""
        return self._ckpt.restore(self._dir(which))

    def exists(self, which: str = "last") -> bool:
        return os.path.isdir(self._dir(which))

    def wait(self):
        self._ckpt.wait_until_finished()
