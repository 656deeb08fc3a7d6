"""Annealed / plain Langevin samplers for the AE-latent track.

The regularized-AE variant of SBMAE samples latents with NCSN-style
annealed Langevin dynamics instead of a reverse SDE:

- ``annealed_langevin_sampler``: sigma levels linspace(sigma_max, sigma_min,
  L); per level, ``iter_num`` inner steps of
  ``z += alpha * s(z, level)/sigma + c * sqrt(2 alpha) * xi`` with
  ``alpha = er * sigma_l^2 / sigma_L^2``, updating only predicted channels
  (/root/reference/fid_upd10.py:56-110; tuned (er, c, iter) grids at
  /root/reference/eval_lat_celeba_hq_all.py:498-513).
- ``plain_langevin_sampler``: fixed-step Langevin over flat concatenated
  latents for the MLP score models, with the optional late-schedule variant
  (/root/reference/fid_upd10.py:279-290).

Both are single ``lax.scan`` programs (the reference runs L x iter_num
Python-dispatched steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def annealed_langevin_sampler(
    key,
    score_fn,
    x_init,
    predicted_mask,
    *,
    sigma_max: float = 5.0,
    sigma_min: float = 0.1,
    n_levels: int = 200,
    er: float = 2e-3,
    c: float = 0.5,
    iter_num: int = 20,
):
    """Anneal x over sigma levels, updating only ``predicted_mask`` channels.

    Args:
      score_fn: ``(x, level_idx (B,) int32, sigma (B,)) -> score`` - the
        sigma-conditioned score net divided by sigma is applied internally
        per the reference convention (fid_upd10.py:96: ``score/sigma``).
      x_init: (B, H, W, C) grid; observed channels hold clean encodings.
      predicted_mask: (C,) bool, True = channel to update.
      er, c: step-size rate and noise scale; scalars, or (C,) arrays for
        the reference's per-modality tuned grids
        (eval_lat_celeba_hq_all.py:498-513, applied per channel at :273-276).
    """
    # Build the grid in the carry's dtype: f32 constants would promote the
    # scan carry and crash fori_loop/scan for bf16 x_init.
    sigmas = jnp.linspace(sigma_max, sigma_min, n_levels,
                          dtype=x_init.dtype)
    mask = jnp.asarray(predicted_mask)
    er = jnp.asarray(er, x_init.dtype)
    c = jnp.asarray(c, x_init.dtype)
    B = x_init.shape[0]

    def level_step(carry, level):
        x, key = carry
        sigma_l = sigmas[level]
        alpha = er * sigma_l**2 / sigmas[-1] ** 2  # scalar or per-channel
        idx = jnp.full((B,), level, jnp.int32)
        sig = jnp.full((B,), sigma_l, x.dtype)

        def inner(i, carry):
            x, key = carry
            key, nkey = jax.random.split(key)
            s = score_fn(x, idx, sig) / sigma_l
            noise = jax.random.normal(nkey, x.shape, x.dtype)
            x_new = x + alpha * s + c * jnp.sqrt(2 * alpha) * noise
            return jnp.where(mask, x_new, x), key

        x, key = jax.lax.fori_loop(0, iter_num, inner, (x, key))
        return (x, key), None

    (x, _), _ = jax.lax.scan(
        level_step, (x_init, key), jnp.arange(n_levels, dtype=jnp.int32)
    )
    return x


def plain_langevin_sampler(
    key,
    score_fn,
    z_init,
    predicted_mask_flat,
    *,
    lr1: float = 0.2,
    lr2: float = 0.02,
    n_comp: int = 40,
    schedule: bool = False,
):
    """Fixed-step Langevin over flat concatenated latents (B, n_mod*size_z).

    ``score_fn(z) -> score`` over the full concat; only entries where
    ``predicted_mask_flat`` is True are updated. ``schedule=True`` ramps the
    step linearly and adds a final full-strength step (fid_upd10.py:286-290).
    """
    mask = jnp.asarray(predicted_mask_flat)

    def step(carry, i):
        z, key = carry
        key, nkey = jax.random.split(key)
        s = score_fn(z)
        noise = jax.random.normal(nkey, z.shape, z.dtype)
        ramp = ((i + 1).astype(z.dtype) / n_comp)  # z-dtype: keep carry stable
        scale = lr1 * ramp if schedule else lr1
        z_new = z + scale * s + lr2 * noise
        if schedule:
            # Final full-strength extra step (fid_upd10.py:288-290): the
            # SAME sm_out (score at the pre-update z, not recomputed) with
            # a FRESH noise draw; factor 1 * (n_comp/n_comp) = 1.
            key, ekey = jax.random.split(key)
            extra_noise = jax.random.normal(ekey, z.shape, z.dtype)
            extra = z_new + ramp * s + lr2 * extra_noise
            z_new = jnp.where(i == n_comp - 1, extra, z_new)
        return (jnp.where(mask, z_new, z), key), None

    (z, _), _ = jax.lax.scan(step, (z_init, key), jnp.arange(n_comp))
    return z
