"""Regularized-AE track tests (train_polyupdAE parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from score_based_multimodal_autoencoder_tpu.models import ResVAE
from score_based_multimodal_autoencoder_tpu.models.vae import ae_reg_loss
from score_based_multimodal_autoencoder_tpu.parallel import VAEFleet


def test_ae_reg_loss_formula():
    x = jnp.ones((4, 2, 2, 1))
    x_hat = jnp.zeros((4, 2, 2, 1))
    z = jnp.full((4, 3), 2.0)
    recon, reg = ae_reg_loss(x, x_hat, z, beta=0.5)
    np.testing.assert_allclose(float(recon), 16.0 / 4)
    np.testing.assert_allclose(float(reg), 0.5 * 12.0)  # mean over batch of sum 3*4


def test_ae_fleet_training_reduces_loss_and_is_deterministic():
    vae = ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)), ((16, 8, 8, 2), (8, 8, 8, 2)),
                 size_in=16, size_z=8, img_ch=3, variant="poly")
    fleet = VAEFleet(vae, 2, optax.adam(1e-3), beta=0.01, loss_type="ae")
    state = fleet.init(jax.random.key(0), jnp.zeros((4, 16, 16, 3)))
    batch = jax.random.uniform(jax.random.key(1), (2, 8, 16, 16, 3))
    step = jax.jit(fleet.train_step)
    losses = []
    key = jax.random.key(2)
    for i in range(20):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["total"].mean()))
    assert losses[-1] < losses[0]
    # AE forward is deterministic: same input twice -> same loss.
    _, m1 = step(state, batch, jax.random.key(9))
    _, m2 = step(state, batch, jax.random.key(10))
    np.testing.assert_allclose(np.array(m1["total"]), np.array(m2["total"]),
                               rtol=1e-6)
