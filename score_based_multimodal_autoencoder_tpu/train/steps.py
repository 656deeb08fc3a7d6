"""Jitted training/eval steps for both stages of the SBMAE pipeline.

Stage 1 (per-modality VAEs) and stage 2 (joint latent score model) both
reduce to one fused XLA program per optimizer step; the stage-2 step fuses
the frozen-encoder forward with the DSM loss so latents never round-trip to
host (the reference encodes under no_grad then re-dispatches,
/root/reference/train_poly_unet_cont.py:256-276).

All step factories return pure functions ``(state, batch, key) -> ...``
suitable for ``jax.jit`` with sharding annotations from ``parallel.mesh``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..diffusion.losses import dsm_loss
from ..models.vae import vae_loss
from .ema import ema_update


def make_vae_train_step(model, beta: float = 1.0):
    """One VAE optimizer step: recon + beta*KL (train_polyupd.py:77-103)."""

    def train_step(state, batch, key):
        def loss_fn(params):
            (out, mu, logvar), updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch, key=key, train=True, mutable=["batch_stats"],
            )
            recon, kl = vae_loss(batch, out, mu, logvar, beta)
            return recon + kl, (recon, kl, updates["batch_stats"])

        (total, (recon, kl, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, {"total": total, "recon": recon, "kl": kl}

    return train_step


def make_vae_eval_step(model, beta: float = 1.0):
    """Eval-mode VAE loss (running BN stats, mean latent)."""

    def eval_step(state, batch, key):
        out, mu, logvar = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, key=key, train=False,
        )
        recon, kl = vae_loss(batch, out, mu, logvar, beta)
        return {"total": recon + kl, "recon": recon, "kl": kl}

    return eval_step


def make_latent_encoder(vae_models, latent_hw: int, use_mean: bool = True):
    """Build the frozen-encoder that produces the (B, h, w, n_mod) latent grid.

    ``vae_models`` is an ordered list of (model, variables) pairs, one per
    modality (sorted by modality name, matching the reference's channel
    order, train_poly_unet_cont.py:268). Latents of size_z are reshaped to
    (latent_hw, latent_hw) and stacked channels-last.
    """

    def encode(batch_per_mod):
        chans = []
        for (model, variables), x in zip(vae_models, batch_per_mod):
            mu, logvar = model.apply(variables, x, method=model.encoder)
            z = mu  # use_mean: reference encodes with the posterior mean
            chans.append(z.reshape(z.shape[0], latent_hw, latent_hw))
        return jnp.stack(chans, axis=-1)

    return encode


def make_score_train_step(
    score_model,
    sde,
    *,
    likelihood_weighting: bool = True,
    importance_sampling: bool = False,
    encoder: Optional[Callable] = None,
    ema_decay: Optional[float] = None,
):
    """One DSM optimizer step on the latent score network.

    If ``encoder`` is given, ``batch`` is the raw per-modality pixel batch
    and encoding happens inside the same XLA program (stage-2 end-to-end
    step); otherwise ``batch`` is the pre-encoded latent grid.
    """

    def train_step(state, batch, key):
        latents = encoder(batch) if encoder is not None else batch

        def loss_fn(params):
            def score_fn(x, t):
                return state.apply_fn({"params": params}, x, t)

            return dsm_loss(
                key, score_fn, sde, latents,
                likelihood_weighting=likelihood_weighting,
                importance_sampling=importance_sampling,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        if ema_decay is not None and state.ema_params is not None:
            state = state.replace(
                ema_params=ema_update(state.ema_params, state.params, ema_decay)
            )
        return state, loss

    return train_step
