"""Discrete-time DDPM: the DiffuseVAE pixel refiner.

Sharpens VAE image reconstructions with a 1000-step epsilon-prediction DDPM
conditioned on the reconstruction by channel concat
(/root/reference/train_celeba_diffvae.py:67-147; used at eval time to
refine the image modality, /root/reference/eval_lat_celeba_hq_all.py:72-122).

Linear beta 1e-4 -> 0.02; images live in [-1, 1] inside the chain (the
trainer rescales from [0, 1]). Ancestral sampling is one ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..utils.shaping import batch_mul


@struct.dataclass
class DDPMSchedule:
    timesteps: int = struct.field(pytree_node=False, default=1000)
    beta_start: float = struct.field(pytree_node=False, default=1e-4)
    beta_end: float = struct.field(pytree_node=False, default=0.02)

    @property
    def betas(self):
        return jnp.linspace(self.beta_start, self.beta_end, self.timesteps)

    def tables(self):
        betas = self.betas
        alphas = 1.0 - betas
        alphas_cumprod = jnp.cumprod(alphas)
        alphas_cumprod_prev = jnp.concatenate([jnp.ones((1,)), alphas_cumprod[:-1]])
        return {
            "betas": betas,
            "sqrt_recip_alphas": jnp.sqrt(1.0 / alphas),
            "sqrt_alphas_cumprod": jnp.sqrt(alphas_cumprod),
            "sqrt_1m_alphas_cumprod": jnp.sqrt(1.0 - alphas_cumprod),
            "posterior_variance": betas * (1.0 - alphas_cumprod_prev)
            / (1.0 - alphas_cumprod),
        }


def q_sample(schedule: DDPMSchedule, x0, t, noise):
    """Forward diffusion draw x_t | x_0 (train_celeba_diffvae.py:95-105)."""
    tab = schedule.tables()
    return batch_mul(tab["sqrt_alphas_cumprod"][t], x0) + batch_mul(
        tab["sqrt_1m_alphas_cumprod"][t], noise
    )


def ddpm_refiner_loss(key, denoise_fn, schedule: DDPMSchedule, x0, cond):
    """MSE(eps, eps_hat) with the condition channel-concatenated
    (train_celeba_diffvae.py:106-113). x0/cond in [-1, 1]."""
    t_key, n_key = jax.random.split(key)
    B = x0.shape[0]
    t = jax.random.randint(t_key, (B,), 0, schedule.timesteps)
    noise = jax.random.normal(n_key, x0.shape, x0.dtype)
    x_noisy = q_sample(schedule, x0, t, noise)
    pred = denoise_fn(jnp.concatenate([x_noisy, cond], axis=-1), t)
    return jnp.mean((noise - pred) ** 2)


def ddpm_refiner_sample(key, denoise_fn, schedule: DDPMSchedule, cond, shape):
    """Ancestral sampling conditioned on ``cond``; returns x0 in [-1, 1]
    (train_celeba_diffvae.py:181-204)."""
    dtype = jnp.asarray(cond).dtype
    # Schedule tables are computed in f32 (a bf16 cumprod over 1000 alphas
    # loses the tail), then the coefficients are cast to the compute dtype
    # so the scan carry stays in cond's dtype - a hardcoded f32 draw +
    # f32 tables used to silently promote a bf16 refiner's whole
    # 1000-step chain to f32.
    tab = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                 schedule.tables())
    init_key, scan_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, dtype)
    B = shape[0]

    def step(carry, t):
        x, key = carry
        key, nkey = jax.random.split(key)
        t_batch = jnp.full((B,), t, jnp.int32)
        eps = denoise_fn(jnp.concatenate([x, cond], axis=-1), t_batch)
        mean = batch_mul(
            tab["sqrt_recip_alphas"][t_batch],
            x - batch_mul(tab["betas"][t_batch] / tab["sqrt_1m_alphas_cumprod"][t_batch], eps),
        )
        noise = jax.random.normal(nkey, x.shape, x.dtype)
        x = jnp.where(
            t > 0,
            mean + batch_mul(jnp.sqrt(tab["posterior_variance"][t_batch]), noise),
            mean,
        )
        return (x, key), None

    ts = jnp.arange(schedule.timesteps - 1, -1, -1)
    (x, _), _ = jax.lax.scan(step, (x, scan_key), ts)
    return x
