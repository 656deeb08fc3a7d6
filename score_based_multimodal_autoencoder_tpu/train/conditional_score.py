"""z-conditioned CelebA score training: the ``_cond`` pipeline.

Capability of /root/reference/train_lat_celebhq_unet_cont2_cond.py: the ADM
UNet score network receives a 512-d conditioning vector z computed by
AVERAGING frozen contrastive encoders over a random observed subset
(get_conds, :452-460); DSM loss and samplers thread z through the score
closure; an EMA copy of the params is maintained (:672-674).

Note the reference's ``sde_helper2.loss_fn/em_predictor`` do not accept the
``z_cond`` argument this script passes (SURVEY.md §7.3 - the plumbing was
missing from the mirror). Here no plumbing is needed at all: conditioning
enters by closing the score function over z, so every sampler in
``diffusion.samplers`` works unchanged.
"""

from __future__ import annotations

from itertools import combinations
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..diffusion.losses import dsm_loss
from ..nn.contrastive import average_condition
from .ema import ema_update

ALL_GIVEN_SUBSETS = ("0", "1", "2", "01", "02", "12", "012")


def subset_masks(n_mod: int = 3):
    """All non-empty given-subsets as a (S, n_mod) bool array (the
    reference's all_g list of strings, generalized)."""
    rows = []
    for size in range(1, n_mod + 1):
        for combo in combinations(range(n_mod), size):
            row = [i in combo for i in range(n_mod)]
            rows.append(row)
    return jnp.array(rows)


def make_cond_score_train_step(
    score_model,
    sde,
    encoder: Callable,
    rep_encoder: Callable,
    tx: optax.GradientTransformation,
    *,
    n_mod: int = 3,
    likelihood_weighting: bool = True,
    importance_sampling: bool = False,
    ema_decay: float = 0.999,
):
    """Build the jitted conditional-score step.

    Args:
      encoder: frozen ``inputs -> (B, hw, hw, n_mod)`` latent-grid encoder.
      rep_encoder: frozen ``inputs -> (n_mod, B, D)`` contrastive
        representations (one row per modality).

    Step signature: ``(params, opt_state, ema, inputs, key) ->
    (params, opt_state, ema, loss)``; a random given-subset is drawn per
    step (train_lat_celebhq_unet_cont2_cond.py:118-120).
    """
    masks = subset_masks(n_mod)

    def step(params, opt_state, ema, inputs, key):
        subset_key, loss_key = jax.random.split(key)
        grid = encoder(inputs)
        reps = rep_encoder(inputs)
        mask = masks[jax.random.randint(subset_key, (), 0, masks.shape[0])]
        z_cond = average_condition(reps, mask)

        def loss_fn(p):
            def score_fn(x, t):
                return score_model.apply({"params": p}, x, t, z_cond)

            return dsm_loss(
                loss_key, score_fn, sde, grid,
                likelihood_weighting=likelihood_weighting,
                importance_sampling=importance_sampling)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, ema_decay)
        return params, opt_state, ema, loss

    return step


def make_cond_score_fn(score_model, params, z_cond):
    """Close the z-conditioned score for the samplers (the z_cond plumbing
    the reference's sde_helper2 was missing)."""

    def score_fn(x, t):
        return score_model.apply({"params": params}, x, t, z_cond)

    return score_fn
