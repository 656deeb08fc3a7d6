"""Noise-contrastive training of the pairwise coherence EBM.

Matches /root/reference/train_poly_clwithtime_ebm_IND.py:68-157:
- positives: matched latent pairs (z1, z2) of the same sample,
- negatives: batch-shuffled pairs (independent permutation per modality)
  plus pure N(0, I) noise pairs,
- both positives and shuffled negatives are VP-perturbed to a random time t
  before scoring; the noise negatives are scored at the same t unperturbed,
- logistic losses: L = -log sig(-E_pos) + ( -log sig(E_neg) - log sig(E_noise) )/2.

One fused train step: a random modality pair is drawn per step
(train_poly_clwithtime_ebm_IND.py:104-106), encoders are frozen.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from ..diffusion.losses import sample_importance_weighted_time
from ..utils.shaping import batch_mul


def perturb_vp(key, batch, sde, *, eps=1e-5, importance_sampling=False):
    """VP-perturb a flat latent batch to a random time t; returns (x_t, t)."""
    t_key, z_key = jax.random.split(key)
    B = batch.shape[0]
    if importance_sampling:
        t = sample_importance_weighted_time(t_key, B, sde.beta_0, sde.beta_1, T=sde.T)
    else:
        t = jax.random.uniform(t_key, (B,), minval=eps, maxval=sde.T)
    z = jax.random.normal(z_key, batch.shape, batch.dtype)
    mean, std = sde.marginal_prob(batch, t)
    return mean + batch_mul(std, z), t


def nce_loss(key, energy_fn, sde, z1, z2, mod1, mod2, *, importance_sampling=False):
    """NCE loss for one modality pair; z1/z2 are (B, size_z) clean latents."""
    shuf_key, pos_key, neg_key, noise_key = jax.random.split(key, 4)
    B = z1.shape[0]
    perm1, perm2 = jax.random.split(shuf_key)
    z_pos = jnp.concatenate([z1, z2], axis=1)
    z_neg = jnp.concatenate(
        [z1[jax.random.permutation(perm1, B)], z2[jax.random.permutation(perm2, B)]],
        axis=1,
    )
    z_noise = jax.random.normal(noise_key, z_neg.shape, z_neg.dtype)

    x_pos, t_pos = perturb_vp(pos_key, z_pos, sde, importance_sampling=importance_sampling)
    x_neg, t_neg = perturb_vp(neg_key, z_neg, sde, importance_sampling=importance_sampling)

    e_pos = energy_fn(x_pos, t_pos, mod1, mod2)
    e_neg = energy_fn(x_neg, t_neg, mod1, mod2)
    e_noise = energy_fn(z_noise, t_neg, mod1, mod2)

    loss_pos = -jnp.mean(jax.nn.log_sigmoid(-e_pos))
    loss_neg = 0.5 * (
        -jnp.mean(jax.nn.log_sigmoid(e_neg)) - jnp.mean(jax.nn.log_sigmoid(e_noise))
    )
    return loss_pos + loss_neg


def make_ebm_train_step(
    ebm_model,
    sde,
    tx: optax.GradientTransformation,
    *,
    importance_sampling: bool = False,
):
    """Step over pre-encoded latents: ``(params, opt_state, z1, z2, mod1,
    mod2, key) -> (params, opt_state, loss)``. mod indices are traced, so
    one compiled program serves every random pair draw."""

    def step(params, opt_state, z1, z2, mod1, mod2, key):
        def loss_fn(p):
            def energy_fn(z, t, m1, m2):
                return ebm_model.apply({"params": p}, z, t, m1, m2)

            return nce_loss(key, energy_fn, sde, z1, z2, mod1, mod2,
                            importance_sampling=importance_sampling)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
