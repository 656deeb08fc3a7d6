"""DSM loss tests: analytic optima, weighting variants, importance sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from score_based_multimodal_autoencoder_tpu.diffusion import (
    VPSDE,
    dsm_loss,
    sample_importance_weighted_time,
)
from score_based_multimodal_autoencoder_tpu.diffusion.losses import (
    _likelihood_importance_cum_weight,
)
from score_based_multimodal_autoencoder_tpu.utils.shaping import batch_mul


def _perfect_score_for_zero_data(sde):
    """For batch == 0, x_t = std * z so the true score is -x/std^2."""

    def score_fn(x, t):
        _, std = sde.marginal_prob(x, t)
        return batch_mul(-1.0 / std**2, x)

    return score_fn


def test_dsm_loss_zero_at_true_score():
    """With data==0 and the exact score, the standard-weighted loss is ~0."""
    sde = VPSDE()
    batch = jnp.zeros((64, 8, 8, 2))
    loss = dsm_loss(
        jax.random.key(0),
        _perfect_score_for_zero_data(sde),
        sde,
        batch,
        likelihood_weighting=False,
    )
    assert float(loss) < 1e-8


def test_dsm_loss_zero_score_baseline():
    """A zero score gives E||z||^2-style loss ~ 1 per dim (mean-reduced ~1)."""
    sde = VPSDE()
    batch = jnp.zeros((256, 8, 8, 2))
    loss = dsm_loss(
        jax.random.key(1), lambda x, t: jnp.zeros_like(x), sde, batch,
        likelihood_weighting=False,
    )
    assert 0.9 < float(loss) < 1.1


def test_dsm_likelihood_weighting_scales_by_g2():
    """Likelihood-weighted loss with zero score = mean g(t)^2 ||z/std||^2 /d."""
    sde = VPSDE()
    key = jax.random.key(2)
    batch = jnp.zeros((512, 4, 4, 1))
    loss = dsm_loss(
        key, lambda x, t: jnp.zeros_like(x), sde, batch,
        likelihood_weighting=True, importance_sampling=False,
    )
    # E_t[g(t)^2 / std(t)^2] under t~U(eps,1): just check finiteness + scale.
    assert np.isfinite(float(loss)) and float(loss) > 1.0


def test_importance_weighted_time_distribution():
    """Importance-sampled t must follow the g^2/sigma^2 density: check the
    cumulative weight of sampled times is ~uniform (inverse-CDF property)."""
    key = jax.random.key(3)
    t = sample_importance_weighted_time(key, 4096, 0.1, 20.0)
    assert float(t.min()) >= 1e-5 and float(t.max()) <= 1.0
    Z = _likelihood_importance_cum_weight(jnp.asarray(1.0), 0.1, 20.0)
    u = np.array(_likelihood_importance_cum_weight(t, 0.1, 20.0) / Z)
    # Kolmogorov-Smirnov-ish check against U(0,1).
    u_sorted = np.sort(u)
    grid = (np.arange(len(u)) + 0.5) / len(u)
    assert np.max(np.abs(u_sorted - grid)) < 0.03


def test_dsm_loss_is_jittable_and_grad_flows():
    sde = VPSDE()
    w = jnp.ones((1,))

    def score_fn_with(w):
        return lambda x, t: w * x

    def loss_of(w, key, batch):
        return dsm_loss(key, score_fn_with(w), sde, batch, likelihood_weighting=False)

    g = jax.jit(jax.grad(loss_of))(w, jax.random.key(0), jnp.ones((8, 4, 4, 1)))
    assert np.isfinite(np.array(g)).all() and float(jnp.abs(g).sum()) > 0
