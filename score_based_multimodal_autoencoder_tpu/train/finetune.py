"""Decoder finetuning against the frozen joint score model.

Port of /root/reference/train_psm_upd_res_finetune.py:67-120: per batch,
each modality is independently dropped with probability ``drop_p``; dropped
modalities start from prior noise and are Langevin-completed using the
frozen score model conditioned on the kept modalities' (reparametrized)
encodings; each dropped modality's DECODER is then trained to reconstruct
the original pixels from the completed latent.

TPU-native differences: the reference trains only the randomly dropped
modalities each step (a host-side branch per batch). Here every modality's
decoder takes a gradient step each batch, with per-modality masks zeroing
the loss of kept modalities - same expected gradient, fully static shapes,
one fused XLA program over the vmapped fleet.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..diffusion.annealed import plain_langevin_sampler
from ..models.vae import reparametrize


def make_finetune_step(
    fleet,
    score_fn_flat: Callable,
    *,
    drop_p: float = 0.5,
    n_comp: int = 40,
    lr1: float = 0.2,
    lr2: float = 0.02,
):
    """Build the jitted decoder-finetune step.

    Args:
      fleet: parallel.fleet.VAEFleet (stacked per-modality VAEs).
      score_fn_flat: frozen score over flat concatenated latents
        ``(B, n_mod * size_z) -> same`` (the MLP score-model contract the
        reference uses here, lat_sm2_model LSMPoly64_sm style).

    Returns step(state, batch (n_mod, B, H, W, C), key) ->
    (state, per-modality masked recon losses (n_mod,)).
    """
    n_mod = fleet.n_mod

    def step(state, batch, key):
        drop_key, rep_key, prior_key, lang_key = jax.random.split(key, 4)
        size_z = None

        # Encode all modalities (reparametrized), stack flat.
        def enc_one(params, stats, x, k):
            mu, logvar = fleet.model.apply(
                {"params": params, "batch_stats": stats}, x,
                method=fleet.model.encoder)
            return reparametrize(k, mu, logvar)

        rep_keys = jax.random.split(rep_key, n_mod)
        z_enc = jax.vmap(enc_one)(
            state["params"], state["batch_stats"], batch, rep_keys)
        size_z = z_enc.shape[-1]
        B = z_enc.shape[1]

        dropped = jax.random.uniform(drop_key, (n_mod,)) <= drop_p  # per-mod
        z_init = jnp.where(
            dropped[:, None, None],
            jax.random.normal(prior_key, z_enc.shape), z_enc)
        z_flat = jnp.moveaxis(z_init, 0, 1).reshape(B, n_mod * size_z)
        mask_flat = jnp.repeat(dropped, size_z)

        z_done = plain_langevin_sampler(
            lang_key, score_fn_flat, z_flat, mask_flat,
            lr1=lr1, lr2=lr2, n_comp=n_comp)
        z_done = jnp.moveaxis(
            z_done.reshape(B, n_mod, size_z), 1, 0)  # (n_mod, B, z)
        z_done = jax.lax.stop_gradient(z_done)

        # Decoder-only gradient step, masked to dropped modalities.
        def loss_fn(params):
            def dec_one(p, stats, z):
                return fleet.model.apply(
                    {"params": p, "batch_stats": stats}, z,
                    method=fleet.model.decoder)

            outs = jax.vmap(dec_one)(params, state["batch_stats"], z_done)
            per_mod = jnp.sum(
                (outs - batch) ** 2, axis=tuple(range(2, outs.ndim))
            ).mean(axis=1)  # sum-MSE / batch per modality
            masked = per_mod * dropped.astype(per_mod.dtype)
            return masked.sum(), per_mod

        (_, per_mod), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"])
        updates, new_opt = jax.vmap(fleet.tx.update)(
            grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_state = {"params": new_params, "batch_stats": state["batch_stats"],
                     "opt_state": new_opt}
        return new_state, per_mod * dropped

    return step
