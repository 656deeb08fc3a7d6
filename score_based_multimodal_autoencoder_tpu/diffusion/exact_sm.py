"""Exact / single-noise / sliced score-matching losses.

Counterpart of /root/reference/train_psm_upd_res_finetune.py:30-60 (unused
in the shipped pipeline but part of the inventory, SURVEY.md §2.4):

- ``exact_sm_loss``: E[tr(nabla s) + 0.5 ||s||^2] with the exact Jacobian
  trace (jacfwd; fine for the flat-latent MLP scores these were used with).
- ``dsm_single_sigma_loss``: fixed-sigma denoising SM.
- ``sliced_sm_loss``: Hutchinson-sliced trace estimate (v^T J v + 0.5
  (v^T s)^2 with Rademacher v).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_sm_loss(score_fn, x):
    """x: (B, D) flat latents; score_fn: (B, D) -> (B, D)."""

    def single(xi):
        s = score_fn(xi[None])[0]
        jac = jax.jacfwd(lambda v: score_fn(v[None])[0])(xi)
        return jnp.trace(jac) + 0.5 * jnp.sum(s**2)

    return jnp.mean(jax.vmap(single)(x))


def dsm_single_sigma_loss(key, score_fn, x, sigma: float = 0.1):
    """Denoising SM at one noise scale: E||s(x~) + (x~ - x)/sigma^2||^2."""
    noise = sigma * jax.random.normal(key, x.shape, x.dtype)
    x_tilde = x + noise
    target = -noise / sigma**2
    s = score_fn(x_tilde)
    return 0.5 * jnp.mean(jnp.sum((s - target) ** 2, axis=-1))


def sliced_sm_loss(key, score_fn, x, n_slices: int = 1):
    """Sliced score matching with Rademacher projections."""

    def one_slice(key):
        v = jax.random.rademacher(key, x.shape, x.dtype)

        def sv(x):
            return jnp.sum(score_fn(x) * v)

        s = score_fn(x)
        grad_sv = jax.grad(sv)(x)  # (B, D): rows are v^T J
        return jnp.mean(jnp.sum(grad_sv * v, -1) + 0.5 * jnp.sum(s * v, -1) ** 2)

    keys = jax.random.split(key, n_slices)
    return jnp.mean(jax.vmap(one_slice)(keys))
