"""Sampler tests: determinism, clamping invariants, Gaussian exactness."""

import jax
import jax.numpy as jnp
import numpy as np

from score_based_multimodal_autoencoder_tpu.diffusion import (
    VPSDE,
    conditional_sampler,
    em_predictor_step,
    langevin_corrector_step,
    unconditional_sampler,
)
from score_based_multimodal_autoencoder_tpu.utils.shaping import batch_mul


def _gaussian_score(sde):
    """Exact score of p_t when p_0 = N(0, I): score(x,t) = -x / (m^2+s^2)."""

    def score_fn(x, t):
        m, s = sde.marginal_prob(jnp.ones_like(x), t)
        var = m**2 + batch_mul(s, jnp.ones_like(x)) ** 2
        return -x / var

    return score_fn


def test_unconditional_sampler_deterministic_given_key():
    sde = VPSDE(N=20)
    score_fn = _gaussian_score(sde)
    a = unconditional_sampler(jax.random.key(7), score_fn, sde, (4, 4, 4, 2))
    b = unconditional_sampler(jax.random.key(7), score_fn, sde, (4, 4, 4, 2))
    c = unconditional_sampler(jax.random.key(8), score_fn, sde, (4, 4, 4, 2))
    np.testing.assert_array_equal(np.array(a), np.array(b))
    assert np.abs(np.array(a) - np.array(c)).max() > 1e-4


def test_unconditional_sampler_recovers_standard_normal():
    """With the exact N(0,I) score, reverse-SDE samples must be ~N(0,I)."""
    sde = VPSDE(N=200)
    score_fn = _gaussian_score(sde)
    x = unconditional_sampler(jax.random.key(0), score_fn, sde, (2048, 2, 2, 1))
    flat = np.array(x).ravel()
    assert abs(flat.mean()) < 0.08
    assert abs(flat.std() - 1.0) < 0.08


def test_em_predictor_step_math():
    """x_mean must equal x + rev_drift * dt exactly."""
    sde = VPSDE(N=100)
    x = jnp.ones((2, 2, 2, 1))
    t = jnp.array([0.5, 0.5])
    score = lambda x_, t_: jnp.full_like(x_, -0.2)
    _, x_mean = em_predictor_step(jax.random.key(0), x, t, score, sde)
    drift, diffusion = sde.sde(x, t)
    rev_drift = drift - (diffusion**2)[:, None, None, None] * (-0.2)
    np.testing.assert_allclose(
        np.array(x_mean), np.array(x + rev_drift * (-1.0 / 100)), rtol=1e-6
    )


def test_corrector_step_moves_toward_high_density():
    """Langevin corrector with score of N(0,I) should shrink large x."""
    sde = VPSDE(N=100)
    score = lambda x, t: -x  # score of N(0, I)
    x = jnp.full((8, 4, 4, 1), 5.0)
    t = jnp.full((8,), 0.5)
    x_new, x_mean = langevin_corrector_step(
        jax.random.key(0), x, t, score, sde, n_steps=10, target_snr=0.16
    )
    assert float(jnp.abs(x_mean).mean()) < 5.0


def test_conditional_sampler_clamps_observed_channels():
    sde = VPSDE(N=15)
    score_fn = _gaussian_score(sde)
    x_obs = jnp.arange(4 * 4 * 4 * 3, dtype=jnp.float32).reshape(4, 4, 4, 3) / 100
    mask = jnp.array([True, False, True])
    out = conditional_sampler(jax.random.key(1), score_fn, sde, x_obs, mask)
    np.testing.assert_array_equal(np.array(out[..., 0]), np.array(x_obs[..., 0]))
    np.testing.assert_array_equal(np.array(out[..., 2]), np.array(x_obs[..., 2]))
    assert np.abs(np.array(out[..., 1]) - np.array(x_obs[..., 1])).max() > 1e-3


def test_conditional_sampler_noise_obs_modes_run():
    sde = VPSDE(N=8)
    score_fn = _gaussian_score(sde)
    x_obs = jnp.ones((2, 2, 2, 2))
    mask = jnp.array([True, False])
    for mode in ("self", "fresh"):
        out = conditional_sampler(
            jax.random.key(0), score_fn, sde, x_obs, mask,
            noise_obs=True, noise_obs_mode=mode,
        )
        assert np.isfinite(np.array(out)).all()
        np.testing.assert_array_equal(np.array(out[..., 0]), np.ones((2, 2, 2)))


def test_pc_orders_and_probability_flow():
    # N must be large enough that beta_1/N < 1 (alpha > 0), as in every
    # reference config; tiny N would make the corrector's sqrt(step) NaN.
    sde = VPSDE(N=100)
    score_fn = _gaussian_score(sde)
    for order in ("pc", "cp"):
        out = unconditional_sampler(
            jax.random.key(2), score_fn, sde, (2, 2, 2, 1), pc=True,
            n_steps=2, order=order,
        )
        assert np.isfinite(np.array(out)).all()
    ode = unconditional_sampler(
        jax.random.key(2), score_fn, sde, (2, 2, 2, 1), probability_flow=True
    )
    assert np.isfinite(np.array(ode)).all()


def test_samplers_jit_once():
    sde = VPSDE(N=5)
    score_fn = _gaussian_score(sde)
    traces = []

    @jax.jit
    def sample(key):
        traces.append(1)
        return unconditional_sampler(key, score_fn, sde, (2, 2, 2, 1))

    sample(jax.random.key(0))
    sample(jax.random.key(1))
    assert len(traces) == 1
