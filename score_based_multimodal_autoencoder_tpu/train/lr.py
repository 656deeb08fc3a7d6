"""Host-side LR scheduling: ReduceLROnPlateau equivalent.

The reference steps torch's ReduceLROnPlateau(patience=5) on the epoch
validation loss (/root/reference/train_polyupd.py:203,217). Here the Adam
transform is built with ``optax.inject_hyperparams`` so the learning rate
is a leaf of the optimizer state; the scheduler rewrites that leaf between
epochs (no recompilation, jit-invisible).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def adam_with_mutable_lr(lr: float) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


class ReduceLROnPlateau:
    def __init__(self, factor: float = 0.1, patience: int = 5,
                 min_lr: float = 0.0):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = None
        self.bad_epochs = 0

    def step(self, opt_state, metric: float):
        """Returns (opt_state, lr): possibly-rescaled optimizer state."""
        if self.best is None or metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        lr = float(opt_state.hyperparams["learning_rate"])
        if self.bad_epochs > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
            self.bad_epochs = 0
        return opt_state, lr
