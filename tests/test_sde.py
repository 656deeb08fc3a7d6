"""Unit tests for the SDE family against closed-form/analytic values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.diffusion import (
    VPSDE,
    SubVPSDE,
    VESDE,
    get_sde,
)


def test_vpsde_marginal_prob_closed_form():
    sde = VPSDE(beta_0=0.1, beta_1=20.0, N=1000)
    x = jnp.ones((4, 8, 8, 2))
    t = jnp.array([1e-5, 0.25, 0.5, 1.0])
    mean, std = sde.marginal_prob(x, t)
    log_mean = np.array(-0.25 * t**2 * (20.0 - 0.1) - 0.5 * t * 0.1, np.float64)
    np.testing.assert_allclose(mean[:, 0, 0, 0], np.exp(log_mean), rtol=1e-6)
    # expm1 formulation stays accurate even at t=1e-5 (f64 reference here).
    np.testing.assert_allclose(std, np.sqrt(-np.expm1(2 * log_mean)), rtol=1e-4)
    # Variance preserving: mean^2 + std^2 = 1 for unit input.
    np.testing.assert_allclose(mean[:, 0, 0, 0] ** 2 + std**2, 1.0, rtol=1e-6)


def test_vpsde_sde_drift_diffusion():
    sde = VPSDE()
    x = jnp.full((2, 4, 4, 1), 2.0)
    t = jnp.array([0.0, 1.0])
    drift, diffusion = sde.sde(x, t)
    np.testing.assert_allclose(drift[0], -0.5 * 0.1 * 2.0, rtol=1e-6)
    np.testing.assert_allclose(drift[1], -0.5 * 20.0 * 2.0, rtol=1e-6)
    np.testing.assert_allclose(diffusion, np.sqrt([0.1, 20.0]), rtol=1e-6)


def test_vpsde_discretize_matches_ddpm_tables():
    """Closed-form discretize must equal the reference's cached linspace tables."""
    N = 1000
    sde = VPSDE(beta_0=0.1, beta_1=20.0, N=N)
    betas = np.linspace(0.1 / N, 20.0 / N, N)
    alphas = 1.0 - betas
    t = jnp.array([0.0, 0.3, 0.77, 1.0])
    timestep = np.floor(np.array(t) * (N - 1)).astype(int)
    x = jnp.ones((4, 2, 2, 1))
    f, G = sde.discretize(x, t)
    np.testing.assert_allclose(
        f[:, 0, 0, 0], np.sqrt(alphas[timestep]) - 1.0, rtol=5e-4, atol=1e-7
    )
    np.testing.assert_allclose(G, np.sqrt(betas[timestep]), rtol=1e-5)
    np.testing.assert_allclose(sde.corrector_alpha(t), alphas[timestep], rtol=1e-5)


def test_vpsde_prior_logp_standard_normal():
    sde = VPSDE()
    z = jnp.zeros((2, 8, 8, 1))
    d = 64
    np.testing.assert_allclose(
        sde.prior_logp(z), -d / 2 * np.log(2 * np.pi), rtol=1e-6
    )


def test_subvpsde_std_is_unrooted():
    """Faithful quirk: sub-VP marginal std has NO sqrt (SURVEY.md §7.4)."""
    sde = SubVPSDE(beta_0=0.1, beta_1=20.0)
    x = jnp.ones((1, 4, 4, 1))
    t = jnp.array([0.5])
    _, std = sde.marginal_prob(x, t)
    log_mean = -0.25 * 0.25 * (20.0 - 0.1) - 0.5 * 0.5 * 0.1
    np.testing.assert_allclose(std, 1 - np.exp(2 * log_mean), rtol=1e-6)


def test_subvpsde_diffusion_discount():
    sde = SubVPSDE(beta_0=0.1, beta_1=20.0)
    t = jnp.array([0.7])
    x = jnp.ones((1, 2, 2, 1))
    _, diffusion = sde.sde(x, t)
    beta_t = 0.1 + 0.7 * (20.0 - 0.1)
    discount = 1 - np.exp(-2 * 0.1 * 0.7 - (20.0 - 0.1) * 0.49)
    np.testing.assert_allclose(diffusion, np.sqrt(beta_t * discount), rtol=1e-6)


def test_vesde_marginal_and_prior():
    sde = VESDE(sigma_min=0.01, sigma_max=50.0)
    x = jnp.ones((3, 4, 4, 1))
    t = jnp.array([0.0, 0.5, 1.0])
    mean, std = sde.marginal_prob(x, t)
    np.testing.assert_allclose(mean, x)  # VE has identity mean
    np.testing.assert_allclose(std, 0.01 * (50.0 / 0.01) ** np.array(t), rtol=1e-5)
    samples = sde.prior_sampling(jax.random.key(0), (2000, 4))
    assert 45.0 < float(jnp.std(samples)) < 55.0


def test_vesde_discretize_smld():
    N = 100
    sde = VESDE(sigma_min=0.01, sigma_max=50.0, N=N)
    sigmas = np.exp(np.linspace(np.log(0.01), np.log(50.0), N))
    t = jnp.array([0.0, 0.5, 1.0])
    timestep = np.floor(np.array(t) * (N - 1)).astype(int)
    x = jnp.ones((3, 2, 2, 1))
    f, G = sde.discretize(x, t)
    np.testing.assert_allclose(f, 0.0)
    adjacent = np.where(timestep == 0, 0.0, sigmas[np.maximum(timestep - 1, 0)])
    np.testing.assert_allclose(
        G, np.sqrt(sigmas[timestep] ** 2 - adjacent**2), rtol=1e-4
    )


def test_reverse_drift_reduces_to_forward_minus_g2_score():
    sde = VPSDE()
    x = jnp.ones((2, 4, 4, 1))
    t = jnp.array([0.4, 0.9])
    score = jnp.full_like(x, 0.3)
    fwd_drift, diffusion = sde.sde(x, t)
    rev_drift, rev_diff = sde.reverse_drift_diffusion(x, t, score)
    expected = fwd_drift - (diffusion**2)[:, None, None, None] * score
    np.testing.assert_allclose(rev_drift, expected, rtol=1e-6)
    np.testing.assert_allclose(rev_diff, diffusion, rtol=1e-6)
    # probability-flow ODE: half the score term, zero diffusion.
    ode_drift, ode_diff = sde.reverse_drift_diffusion(x, t, score, probability_flow=True)
    np.testing.assert_allclose(
        ode_drift, fwd_drift - 0.5 * (diffusion**2)[:, None, None, None] * score,
        rtol=1e-6,
    )
    np.testing.assert_allclose(ode_diff, 0.0)


def test_get_sde_factory():
    assert isinstance(get_sde("vpsde"), VPSDE)
    assert isinstance(get_sde("subvpsde"), SubVPSDE)
    ve = get_sde("vesde", beta_0=0.02, beta_1=30.0)
    assert isinstance(ve, VESDE) and ve.sigma_min == 0.02 and ve.sigma_max == 30.0
    with pytest.raises(ValueError):
        get_sde("nope")


def test_sde_is_jit_static():
    """SDE dataclasses must pass through jit without retracing per value."""
    sde = VPSDE(N=10)
    calls = []

    @jax.jit
    def f(x, t):
        calls.append(1)
        return sde.marginal_prob(x, t)[1]

    t = jnp.array([0.5])
    f(jnp.ones((1, 2, 2, 1)), t)
    f(jnp.ones((1, 2, 2, 1)) * 2, t)
    assert len(calls) == 1
