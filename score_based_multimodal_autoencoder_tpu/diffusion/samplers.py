"""Reverse-SDE samplers as whole-trajectory ``lax.scan`` programs.

This is the headline TPU win over the reference: the reference runs its N
(100-1000) Euler-Maruyama / Langevin steps as a Python loop with one kernel
dispatch per step (/root/reference/train_poly_unet_cont.py:446-463,
/root/reference/sde_helper2.py:115-128). Here the full trajectory is a
single compiled XLA program - predictor, corrector, observed-channel
re-noising and clamping all fused into one scan body - so sampling runs at
device speed with zero host round-trips.

Conventions
-----------
- Latent grids are channels-LAST: (B, H, W, n_mod). One modality = one
  channel, matching the reference's (B, n_mod, sqrt(z), sqrt(z)) stacking
  (/root/reference/train_poly_unet_cont.py:268) transposed for TPU layout.
- ``score_fn(x, t) -> score`` closes over network params.
- ``score_transform`` is an optional hook ``(score, x, t, key) -> score``
  used for EBM/classifier guidance (see diffusion.guidance).
- Predictor/corrector order differs between reference scripts (SURVEY.md
  §7.4); ``order='pc'`` runs predictor-then-corrector
  (train_poly_unet_cont.py:180-186 style), ``order='cp'`` the reverse
  (sde_helper2.py:121-126 style).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..utils.shaping import batch_mul, flatten_batch


def _apply_transform(score_transform, score, x, t, key):
    if score_transform is None:
        return score
    return score_transform(score, x, t, key)


def em_predictor_step(
    key, x, t, score_fn, sde, *, probability_flow=False, score_transform=None
):
    """One reverse Euler-Maruyama step (sde_helper2.py:45-52).

    Returns ``(x, x_mean)``; trajectory endpoints use ``x_mean``.
    """
    noise_key, guide_key = jax.random.split(key)
    dt = -1.0 / sde.N
    z = jax.random.normal(noise_key, x.shape, x.dtype)
    score = score_fn(x, t)
    score = _apply_transform(score_transform, score, x, t, guide_key)
    drift, diffusion = sde.reverse_drift_diffusion(x, t, score, probability_flow)
    x_mean = x + drift * dt
    x = x_mean + batch_mul(diffusion * math.sqrt(-dt), z)
    return x, x_mean


def langevin_corrector_step(
    key, x, t, score_fn, sde, *, n_steps=1, target_snr=0.16, score_transform=None
):
    """SNR-scaled Langevin MCMC corrector (sde_helper2.py:54-106).

    Step size = (snr * ||noise|| / ||grad||)^2 * 2 * alpha, with the norms
    batch-averaged to scalars exactly as the reference does
    (sde_helper2.py:97-99), and alpha the DDPM alpha for VP-type SDEs.
    """
    alpha = sde.corrector_alpha(t)

    def body(i, carry):
        x, _, key = carry
        key, g_key, n_key = jax.random.split(key, 3)
        grad = score_fn(x, t)
        grad = _apply_transform(score_transform, grad, x, t, g_key)
        noise = jax.random.normal(n_key, x.shape, x.dtype)
        grad_norm = jnp.mean(jnp.linalg.norm(flatten_batch(grad), axis=-1))
        noise_norm = jnp.mean(jnp.linalg.norm(flatten_batch(noise), axis=-1))
        step_size = (target_snr * noise_norm / grad_norm) ** 2 * 2 * alpha
        x_mean = x + batch_mul(step_size, grad)
        x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
        return x, x_mean, key

    x, x_mean, _ = jax.lax.fori_loop(0, n_steps, body, (x, x, key))
    return x, x_mean


def _pc_step(key, x, vec_t, score_fn, sde, *, probability_flow, pc, n_steps,
             target_snr, order, score_transform):
    """One predictor(+corrector) update in the configured order."""
    p_key, c_key = jax.random.split(key)
    if order == "cp" and pc:
        x, x_mean = langevin_corrector_step(
            c_key, x, vec_t, score_fn, sde, n_steps=n_steps,
            target_snr=target_snr, score_transform=score_transform)
    x, x_mean = em_predictor_step(
        p_key, x, vec_t, score_fn, sde, probability_flow=probability_flow,
        score_transform=score_transform)
    if order == "pc" and pc:
        x, x_mean = langevin_corrector_step(
            c_key, x, vec_t, score_fn, sde, n_steps=n_steps,
            target_snr=target_snr, score_transform=score_transform)
    return x, x_mean


def unconditional_sampler(
    key,
    score_fn,
    sde,
    shape,
    *,
    eps=1e-3,
    probability_flow=False,
    pc=False,
    n_steps=1,
    target_snr=0.16,
    order="pc",
    score_transform=None,
    dtype=jnp.float32,
):
    """Sample from the prior and integrate the reverse SDE T -> eps.

    Single fused ``lax.scan`` over all ``sde.N`` steps; returns the final
    ``x_mean`` (the denoised trajectory endpoint, as in
    sde_helper2.py:115-128).
    """
    prior_key, scan_key = jax.random.split(key)
    x0 = sde.prior_sampling(prior_key, shape, dtype)
    timesteps = jnp.linspace(sde.T, eps, sde.N, dtype=dtype)

    def step(carry, t):
        x, _, key = carry
        key, sub = jax.random.split(key)
        vec_t = jnp.full((shape[0],), t, dtype)
        x, x_mean = _pc_step(
            sub, x, vec_t, score_fn, sde, probability_flow=probability_flow,
            pc=pc, n_steps=n_steps, target_snr=target_snr, order=order,
            score_transform=score_transform)
        return (x, x_mean, key), None

    (x, x_mean, _), _ = jax.lax.scan(step, (x0, x0, scan_key), timesteps)
    return x_mean


def conditional_sampler(
    key,
    score_fn,
    sde,
    x_obs,
    observed_mask,
    *,
    eps=1e-3,
    probability_flow=False,
    pc=False,
    n_steps=1,
    target_snr=0.16,
    order="pc",
    noise_obs=False,
    noise_obs_mode="self",
    score_transform=None,
):
    """Any-subset -> any-subset conditional generation via channel clamping.

    The signature capability of SBMAE (/root/reference/
    train_poly_unet_cont.py:404-498, train_lat_celebhq_unet_cont2.py:240-373):
    per reverse step, (a) optionally replace observed channels by a draw from
    the SDE marginal at the current t ("noise_obs"), (b) run the
    predictor(+corrector) on the full (B, H, W, n_mod) grid, (c) clamp the
    observed channels back to their clean encodings. One score model serves
    all 2^n - 1 conditioning directions.

    Args:
      x_obs: (B, H, W, C) clean latent grid; only channels where
        ``observed_mask`` is True are read.
      observed_mask: (C,) bool. True = observed (clamped) channel.
      noise_obs_mode: 'self' reproduces the reference's quirk of using the
        clean latent itself as the noise term, i.e.
        ``mean + std * x_obs`` (train_poly_unet_cont.py:453-454 computes
        ``marginal_prob(z)`` then adds ``std * z`` with the SAME z);
        'fresh' uses an i.i.d. Gaussian draw instead.

    Returns the final grid with predicted channels taken from the last
    ``x_mean`` and observed channels equal to ``x_obs``.
    """
    B = x_obs.shape[0]
    mask = jnp.asarray(observed_mask)  # (C,) broadcasts over (B,H,W,C)
    init_key, scan_key = jax.random.split(key)
    # Unobserved channels start from the SDE's t=T prior (sigma_max-scaled
    # for VESDE; N(0,1) for VP/sub-VP) - a raw normal here would start the
    # reverse-VE chain ~sigma_max off its marginal. Mirrors
    # unconditional_sampler's prior_sampling use.
    prior = sde.prior_sampling(init_key, x_obs.shape).astype(x_obs.dtype)
    x0 = jnp.where(mask, x_obs, prior)
    timesteps = jnp.linspace(sde.T, eps, sde.N, dtype=x_obs.dtype)

    def step(carry, t):
        x, _, key = carry
        key, renoise_key, step_key = jax.random.split(key, 3)
        vec_t = jnp.full((B,), t, x_obs.dtype)

        if noise_obs:
            mean, std = sde.marginal_prob(x_obs, vec_t)
            if noise_obs_mode == "self":
                noised_obs = mean + batch_mul(std, x_obs)
            else:
                noised_obs = mean + batch_mul(
                    std, jax.random.normal(renoise_key, x_obs.shape, x_obs.dtype))
            x = jnp.where(mask, noised_obs, x)

        x, x_mean = _pc_step(
            step_key, x, vec_t, score_fn, sde, probability_flow=probability_flow,
            pc=pc, n_steps=n_steps, target_snr=target_snr, order=order,
            score_transform=score_transform)

        # Clamp observed channels back to the clean encodings.
        x = jnp.where(mask, x_obs, x)
        return (x, x_mean, key), None

    (x, x_mean, _), _ = jax.lax.scan(step, (x0, x0, scan_key), timesteps)
    return jnp.where(mask, x_obs, x_mean)
