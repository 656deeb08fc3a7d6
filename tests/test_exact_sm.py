"""Exact/sliced SM loss tests: all three estimate the same objective for a
Gaussian score, and the exact loss is minimized by the true score."""

import jax
import jax.numpy as jnp
import numpy as np

from score_based_multimodal_autoencoder_tpu.diffusion.exact_sm import (
    dsm_single_sigma_loss,
    exact_sm_loss,
    sliced_sm_loss,
)


def test_exact_sm_gaussian_score():
    """For x ~ N(0, I) and s(x) = -a x: J tr = -aD, E||s||^2 = a^2 D ->
    loss = D(a^2/2 - a), minimized at a=1 (the true score)."""
    x = jax.random.normal(jax.random.key(0), (512, 4))

    def loss_at(a):
        return float(exact_sm_loss(lambda v: -a * v, x))

    l_half, l_one, l_two = loss_at(0.5), loss_at(1.0), loss_at(2.0)
    assert l_one < l_half and l_one < l_two
    # Analytic value at a=1: D(1/2 - 1) = -2 (x is approx unit variance).
    np.testing.assert_allclose(l_one, -2.0, atol=0.3)


def test_sliced_matches_exact_in_expectation():
    x = jax.random.normal(jax.random.key(1), (256, 4))
    score_fn = lambda v: -v
    exact = float(exact_sm_loss(score_fn, x))
    sliced = float(sliced_sm_loss(jax.random.key(2), score_fn, x, n_slices=64))
    np.testing.assert_allclose(sliced, exact, rtol=0.15)


def test_dsm_single_sigma_zero_at_target():
    """The loss's minimizer s*(x~) = -(x~-x)/sigma^2; plugging it in -> 0."""
    x = jax.random.normal(jax.random.key(3), (64, 4))
    key = jax.random.key(4)
    sigma = 0.3
    noise = sigma * jax.random.normal(key, x.shape)  # reproduce inner draw

    # score_fn sees only x_tilde; build the oracle via closure over x.
    def oracle(x_tilde):
        return -(x_tilde - x) / sigma**2

    loss = float(dsm_single_sigma_loss(key, oracle, x, sigma))
    assert loss < 1e-8
