"""Exponential moving average of parameters.

ema = decay * ema + (1 - decay) * param per leaf, the rule of
/root/reference/utils.py:79-90 (used by the conditional CelebA score model,
train_lat_celebhq_unet_cont2_cond.py:672-674). Pure tree-map, jit-safe.
"""

import jax


def ema_update(ema_params, params, decay: float = 0.9999):
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
