"""Train state: params + optimizer + BatchNorm stats + optional EMA.

Replaces the reference's ad-hoc per-script (model, optimizer, scheduler)
triples (/root/reference/train_polyupd.py:202-204) with one pytree that
flows through jit/pjit unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    ema_params: Any = None


def create_train_state(
    model,
    variables,
    tx: optax.GradientTransformation,
    with_ema: bool = False,
) -> TrainState:
    params = variables["params"]
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        batch_stats=variables.get("batch_stats"),
        ema_params=jax.tree_util.tree_map(lambda x: x, params) if with_ema else None,
    )
