"""K-sample objectives for MMVAE+: IWAE and DReG.

Ports /root/reference/train_psm_upd_mmplus_orig.py:64-168 to stacked-tensor
JAX. The microbatch split heuristic for 12GB CUDA memory
(compute_microbatch_split) is unnecessary on TPU with static shapes and is
replaced by whole-batch evaluation; the DReG gradient hook (multiplying
latent cotangents by the self-normalized importance weights) is a
``jax.custom_vjp`` identity.

Sign convention: both functions return the bound to MAXIMIZE (as the
reference's estimators do); trainers minimize the negation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mmplus import laplace_log_prob


def _log_mean_exp(x, axis=0):
    return jax.nn.logsumexp(x, axis=axis) - jnp.log(x.shape[axis])


@jax.custom_vjp
def _scale_grad(x, w):
    return x


def _scale_grad_fwd(x, w):
    return x, w


def _scale_grad_bwd(w, g):
    return (w[..., None] * g, None)


_scale_grad.defvjp(_scale_grad_fwd, _scale_grad_bwd)


def _log_weights(model_out, x, beta, latent_dim_w, *, pu_scale=1.0,
                 stop_q_params=False):
    """lw (n_mod, K, B): importance log-weights per source modality
    (_m_iwae, train_psm_upd_mmplus_orig.py:81-113)."""
    q_loc, q_scale = model_out["q_loc"], model_out["q_scale"]
    if stop_q_params:
        q_loc = jax.lax.stop_gradient(q_loc)
        q_scale = jax.lax.stop_gradient(q_scale)
    us = model_out["us"]  # (n_mod, K, B, u)
    recon_locs = model_out["recon_locs"]  # (src, dst, K, B, H, W, C)
    dec_scale = model_out["dec_scale"]
    n_mod, K, B, dim_u = us.shape

    # log p_u(u_r): Laplace(0, 1)-style prior over the full u.
    lpu = laplace_log_prob(us, 0.0, pu_scale).sum(-1)  # (n_mod, K, B)

    ws = us[..., :latent_dim_w]
    zs = us[..., latent_dim_w:]
    qw_loc, qz_loc = q_loc[..., :latent_dim_w], q_loc[..., latent_dim_w:]
    qw_scale, qz_scale = q_scale[..., :latent_dim_w], q_scale[..., latent_dim_w:]

    # log q_w(w_r | x_r): own modality's private posterior.
    lqw = laplace_log_prob(
        ws, qw_loc[:, None], qw_scale[:, None]).sum(-1)  # (n_mod, K, B)

    # log q_z(z_r): mixture (log-mean-exp) over ALL modalities' z posteriors.
    # (r, r2, K, B): z of source r scored under posterior of modality r2.
    lqz_all = laplace_log_prob(
        zs[:, None], qz_loc[None, :, None], qz_scale[None, :, None]
    ).sum(-1)
    lqz = _log_mean_exp(lqz_all, axis=1)  # (n_mod, K, B)

    # log p(x_d | u_r) summed over destinations d.
    lpx = laplace_log_prob(
        recon_locs, jnp.asarray(x)[None, :, None], dec_scale
    ).reshape(n_mod, n_mod, K, B, -1).sum(-1).sum(1)  # (n_mod, K, B)

    return lpx + beta * (lpu - lqz - lqw)


def m_iwae(model_out, x, *, beta: float = 1.0, latent_dim_w: int = 32):
    """IWAE bound: log-mean-exp over K, mean over modalities, sum over batch
    (m_iwae, train_psm_upd_mmplus_orig.py:115-123)."""
    lw = _log_weights(model_out, x, beta, latent_dim_w)
    return _log_mean_exp(lw, axis=1).mean(0).sum()


def m_dreg(model_out, x, *, beta: float = 1.0, latent_dim_w: int = 32,
           decode_fn=None):
    """DReG estimator (m_dreg, train_psm_upd_mmplus_orig.py:125-168):
    posterior params stop-gradded, objective sum(w_bar * lw) with latent
    cotangents additionally scaled by w_bar (the reference's tensor hook,
    which fires on EVERY gradient path through the latents - including the
    decoder's; pass ``decode_fn(us, fresh_w) -> recon_locs`` to recompute
    the matrix from the hooked latents)."""
    us = model_out["us"]
    # First pass (no grad) for the normalized weights.
    lw_ng = jax.lax.stop_gradient(
        _log_weights(model_out, x, beta, latent_dim_w, stop_q_params=True))
    w_bar = jnp.exp(lw_ng - jax.nn.logsumexp(lw_ng, axis=1, keepdims=True))

    hooked = dict(model_out)
    hooked["us"] = _scale_grad(us, w_bar)
    if decode_fn is not None:
        hooked["recon_locs"] = decode_fn(hooked["us"], model_out["fresh_w"])
    lw = _log_weights(hooked, x, beta, latent_dim_w, stop_q_params=True)
    # (grad_wt * lw).mean(0).sum(): mean over modalities, sum over K and
    # batch (weights are already normalized over K).
    return (w_bar * lw).mean(0).sum()
