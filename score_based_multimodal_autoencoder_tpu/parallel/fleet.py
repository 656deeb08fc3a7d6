"""Vmapped per-modality VAE fleet: train N identical VAEs as one program.

The reference trains its 10 PolyMNIST VAEs as 10 sequential single-GPU
processes (/root/reference/train_poly.sh:5-14). Here the modality axis is a
leading vmap axis over stacked params/optimizer states, so the whole fleet
is ONE jitted train step; sharded over the mesh's 'fleet' axis it becomes
one-VAE-per-device parallelism (expert-parallel layout), composing with
batch data-parallelism on the 'data' axis.

All fleet state lives in a plain dict-of-stacked-pytrees:
``{"params", "opt_state", "batch_stats"}``, each leaf with leading
``(n_mod, ...)``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..models.vae import ae_reg_loss, vae_loss


class VAEFleet:
    """N identical VAEs (same Flax module) trained/applied in lockstep.

    ``loss_type='vae'`` trains the ELBO (train_polyupd.py:25-29);
    ``loss_type='ae'`` trains the deterministic regularized-AE objective on
    the mean latent (train_polyupdAE.py:31-35) - the reference's AE track,
    whose latents feed the annealed-Langevin samplers.
    """

    def __init__(self, model, n_mod: int, tx: optax.GradientTransformation,
                 beta: float = 1.0, loss_type: str = "vae"):
        self.model = model
        self.n_mod = n_mod
        self.tx = tx
        self.beta = beta
        self.loss_type = loss_type

    # -- state ------------------------------------------------------------
    def init(self, key, sample_x) -> Dict[str, Any]:
        """Stacked variables: vmap over n_mod independent inits."""
        keys = jax.random.split(key, self.n_mod)

        def one(k):
            init_k, noise_k = jax.random.split(k)
            variables = self.model.init(init_k, sample_x, key=noise_k, train=True)
            return variables

        stacked = jax.vmap(one)(keys)
        return {
            "params": stacked["params"],
            "batch_stats": stacked.get("batch_stats"),
            "opt_state": jax.vmap(self.tx.init)(stacked["params"]),
        }

    # -- training ---------------------------------------------------------
    def train_step(self, state: Dict[str, Any], batch, key):
        """One fused optimizer step for every modality.

        ``batch``: (n_mod, B, H, W, C) - modality-major stacked pixels.
        Returns (new_state, metrics dict of (n_mod,) arrays).
        """
        keys = jax.random.split(key, self.n_mod)

        def one(params, batch_stats, opt_state, x, k):
            def loss_fn(p):
                noise_key = None if self.loss_type == "ae" else k
                (out, mu, logvar), updates = self.model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    x, key=noise_key, train=True, mutable=["batch_stats"],
                )
                if self.loss_type == "ae":
                    recon, kl = ae_reg_loss(x, out, mu, self.beta)
                else:
                    recon, kl = vae_loss(x, out, mu, logvar, self.beta)
                return recon + kl, (recon, kl, updates["batch_stats"])

            (total, (recon, kl, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_stats, new_opt, total, recon, kl

        new_params, new_stats, new_opt, total, recon, kl = jax.vmap(one)(
            state["params"], state["batch_stats"], state["opt_state"], batch, keys
        )
        new_state = {"params": new_params, "batch_stats": new_stats,
                     "opt_state": new_opt}
        return new_state, {"total": total, "recon": recon, "kl": kl}

    def eval_loss(self, state: Dict[str, Any], batch, key):
        """Loss-only evaluation (no gradient, eval-mode BatchNorm stats).
        Returns metrics dict of (n_mod,) arrays."""
        keys = jax.random.split(key, self.n_mod)

        def one(params, batch_stats, x, k):
            noise_key = None if self.loss_type == "ae" else k
            out, mu, logvar = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, key=noise_key, train=False)
            if self.loss_type == "ae":
                recon, kl = ae_reg_loss(x, out, mu, self.beta)
            else:
                recon, kl = vae_loss(x, out, mu, logvar, self.beta)
            return recon + kl, recon, kl

        total, recon, kl = jax.vmap(one)(
            state["params"], state["batch_stats"], batch, keys)
        return {"total": total, "recon": recon, "kl": kl}

    # -- inference --------------------------------------------------------
    def _variables(self, state):
        return {"params": state["params"], "batch_stats": state["batch_stats"]}

    def encode(self, state, batch, latent_hw: int):
        """(n_mod, B, H, W, C) pixels -> (B, hw, hw, n_mod) latent grid.

        Posterior means only, matching stage-2 training
        (/root/reference/train_poly_unet_cont.py:257-268).
        """

        def one(params, batch_stats, x):
            mu, _ = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                method=self.model.encoder,
            )
            return mu

        mus = jax.vmap(one)(state["params"], state["batch_stats"], batch)
        B = mus.shape[1]
        return jnp.moveaxis(mus, 0, -1).reshape(B, latent_hw, latent_hw, self.n_mod)

    def decode(self, state, z_grid):
        """(B, hw, hw, n_mod) latent grid -> (n_mod, B, H, W, C) pixels."""
        B = z_grid.shape[0]
        z_flat = jnp.moveaxis(z_grid.reshape(B, -1, self.n_mod), -1, 0)

        def one(params, batch_stats, z):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats}, z,
                method=self.model.decoder,
            )

        return jax.vmap(one)(state["params"], state["batch_stats"], z_flat)

    # -- sharding ---------------------------------------------------------
    def shard_state(self, mesh, state):
        """Shard every stacked leaf's modality axis over the 'fleet' axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("fleet"))
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), state
        )
