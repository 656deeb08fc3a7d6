"""Baseline losses (MoPoE/MMVAE sum-ELBO, MVAE subsampled, MVTCAE CVIB).

Ports the loss math of /root/reference/train_psm_upd_mopoe_an.py:39-109
onto the stacked-tensor outputs of MixtureMultimodalVAE.
"""

from __future__ import annotations

import jax.numpy as jnp


def sum_mse(x_hat, x):
    """Sum-MSE / batch (image_loss, train_psm_upd_mopoe_an.py:48-51)."""
    return jnp.sum((x_hat - x) ** 2) / x.shape[0]


def kl_standard(mu, logvar):
    """KL(q || N(0,I)) / batch (calc_kl_loss, train_psm_upd_mopoe_an.py:39-40)."""
    return -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar)) / mu.shape[0]


def kl_between(mu0, logvar0, mu1, logvar1):
    """KL(q0 || q1) / batch (calc_kl_loss_2, train_psm_upd_mopoe_an.py:42-44)."""
    kl2 = -0.5 * jnp.sum(
        1 - jnp.exp(logvar0) / jnp.exp(logvar1)
        - (mu0 - mu1) ** 2 / jnp.exp(logvar1)
        + logvar0 - logvar1
    )
    return kl2 / mu0.shape[0]


def total_rec_loss(outs, inputs):
    """Sum of per-modality sum-MSEs; outs/inputs (n_mod, B, ...)."""
    n_mod = outs.shape[0]
    return sum(sum_mse(outs[i], inputs[i]) for i in range(n_mod))


def total_kl_loss(mus, logvars, kl_cons: float = 1.0):
    """Mean over posterior terms of standard KLs (subset- or modality-major
    stacked: (S, B, z)); train_psm_upd_mopoe_an.py:59-63."""
    S = mus.shape[0]
    total = sum(kl_standard(mus[i], logvars[i]) for i in range(S))
    return kl_cons * total / S


def mvae_loss(elbo_terms, inputs, kl_cons: float = 1.0, elbo_subsample=True):
    """MVAE sub-sampled ELBO (train_psm_upd_mopoe_an.py:65-86)."""
    rec, kl = 0.0, 0.0
    n_mod = inputs.shape[0]

    if elbo_subsample:
        mus, logvars, outs_ind = elbo_terms["individual"]
        for i in range(n_mod):
            kl = kl + kl_standard(mus[i], logvars[i])
            rec = rec + sum_mse(outs_ind[i], inputs[i])

        k_mu, k_logvar, k_mask, k_outs = elbo_terms["subset"]
        kl = kl + kl_standard(k_mu, k_logvar)
        # Reference sums recon only over the drawn subset's modalities
        # (train_psm_upd_mopoe_an.py:77-80); the mask gates each term.
        for i in range(n_mod):
            rec = rec + k_mask[i] * sum_mse(k_outs[i], inputs[i])

    j_mu, j_logvar, j_outs = elbo_terms["joint"]
    kl = kl + kl_standard(j_mu, j_logvar)
    for i in range(n_mod):
        rec = rec + sum_mse(j_outs[i], inputs[i])
    return rec, kl_cons * kl


def mvt_loss(elbo_terms, inputs, kl_cons: float = 1.0, alpha: float = 0.9):
    """MVTCAE CVIB objective (train_psm_upd_mopoe_an.py:88-109)."""
    n_mod = inputs.shape[0]
    j_mu, j_logvar, j_outs = elbo_terms["joint"]
    kl_joint = kl_standard(j_mu, j_logvar)
    rec = sum(sum_mse(j_outs[i], inputs[i]) for i in range(n_mod))

    mus, logvars = elbo_terms["individual"]
    kl2 = sum(kl_between(j_mu, j_logvar, mus[i], logvars[i]) for i in range(n_mod))

    rec_weight = (n_mod - alpha) / n_mod
    cvib_weight = alpha / n_mod
    vib_weight = 1 - alpha
    kld_weighted = cvib_weight * kl2 + vib_weight * kl_joint
    return rec_weight * rec, kl_cons * kld_weighted
