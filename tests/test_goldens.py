"""Golden-value regression tests on fixed seeds (SURVEY.md §4 test plan).

Values captured on CPU (float32, highest matmul precision) at round 1.
They pin the exact numerics of the DSM losses, samplers, and the
importance-time bisection: any future refactor that silently changes the
math trips these. Tolerances are loose enough for compiler-version noise
but tight enough to catch semantic changes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from score_based_multimodal_autoencoder_tpu.diffusion import (
    VPSDE,
    conditional_sampler,
    unconditional_sampler,
)
from score_based_multimodal_autoencoder_tpu.diffusion.losses import (
    dsm_loss,
    sample_importance_weighted_time,
)


def _lin_score(x, t):
    return -0.5 * x + 0.1


def test_dsm_loss_goldens():
    sde = VPSDE(N=50)
    batch = jax.random.normal(jax.random.key(42), (16, 4, 4, 2))
    got = float(dsm_loss(jax.random.key(7), _lin_score, sde, batch,
                         likelihood_weighting=False))
    np.testing.assert_allclose(got, 0.4581956, rtol=1e-4)
    got = float(dsm_loss(jax.random.key(7), _lin_score, sde, batch,
                         likelihood_weighting=True))
    np.testing.assert_allclose(got, 8.279298, rtol=1e-4)
    got = float(dsm_loss(jax.random.key(7), _lin_score, sde, batch,
                         likelihood_weighting=True, importance_sampling=True))
    np.testing.assert_allclose(got, 0.6040443, rtol=1e-4)


def test_sampler_goldens():
    sde = VPSDE(N=50)
    x = unconditional_sampler(jax.random.key(3), _lin_score, sde, (4, 4, 4, 2))
    np.testing.assert_allclose(float(x.mean()), 0.9465407, rtol=1e-3)
    np.testing.assert_allclose(float(x.std()), 3.2622564, rtol=1e-3)

    x_obs = jax.random.normal(jax.random.key(9), (4, 4, 4, 2))
    c = conditional_sampler(jax.random.key(5), _lin_score, sde, x_obs,
                            jnp.array([True, False]), noise_obs=True)
    np.testing.assert_allclose(float(c[..., 1].mean()), 1.1113532, rtol=1e-3)
    np.testing.assert_allclose(float(c[..., 1].std()), 3.3992484, rtol=1e-3)
    # Observed channel exactly preserved.
    np.testing.assert_array_equal(np.array(c[..., 0]), np.array(x_obs[..., 0]))


def test_importance_time_goldens():
    t = sample_importance_weighted_time(jax.random.key(11), 8, 0.1, 20.0)
    expected = [0.001321, 1.6e-05, 0.594315, 0.015075, 0.331915, 0.008856,
                1.6e-05, 0.770808]
    np.testing.assert_allclose(np.array(t), expected, rtol=1e-3, atol=1e-6)
