"""Minimum end-to-end slice (SURVEY.md §7.2): 2-modality synthetic
PolyMNIST -> VAE fleet -> latent score model -> conditional m0->m1
generation -> coherence/FID protocols. CPU-sized."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from score_based_multimodal_autoencoder_tpu.data import synthetic_polymnist
from score_based_multimodal_autoencoder_tpu.data.loader import to_float01
from score_based_multimodal_autoencoder_tpu.diffusion import VPSDE
from score_based_multimodal_autoencoder_tpu.diffusion.losses import dsm_loss
from score_based_multimodal_autoencoder_tpu.eval.protocols import (
    conditional_protocol,
    unconditional_protocol,
)
from score_based_multimodal_autoencoder_tpu.models import ResVAE
from score_based_multimodal_autoencoder_tpu.nn import LatentUNet
from score_based_multimodal_autoencoder_tpu.parallel import VAEFleet
from score_based_multimodal_autoencoder_tpu.pipeline import SBMAEPipeline


@pytest.fixture(scope="module")
def trained_slice():
    n_mod, size_z, hw = 2, 16, 4
    ds = synthetic_polymnist(n=128, n_mod=n_mod, size=32, seed=0)
    pixels = jnp.asarray(to_float01(ds.images))  # (n_mod, N, 32, 32, 3)
    labels = jnp.asarray(ds.labels)

    vae = ResVAE(
        enc_channel_list=((8, 8, 8, 2), (8, 16, 16, 2)),
        dec_channel_list=((16, 8, 8, 2), (8, 8, 8, 2)),
        size_in=32, size_z=size_z, img_ch=3, variant="poly",
    )
    fleet = VAEFleet(vae, n_mod, optax.adam(1e-3), beta=0.5)
    fleet_state = fleet.init(jax.random.key(0), pixels[0, :8])

    fleet_step = jax.jit(fleet.train_step)
    key = jax.random.key(1)
    vae_losses = []
    for i in range(25):
        key, sub = jax.random.split(key)
        fleet_state, metrics = fleet_step(fleet_state, pixels[:, :64], sub)
        vae_losses.append(float(metrics["total"].mean()))

    sde = VPSDE(N=30)
    score_model = LatentUNet(dim=12, init_dim=8, channels=n_mod, dim_mults=(1, 2))
    grid = fleet.encode(fleet_state, pixels[:, :64], hw)
    score_params = score_model.init(
        jax.random.key(2), grid, jnp.full((64,), 0.5))["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(score_params)

    @jax.jit
    def score_step(params, opt_state, grid, key):
        def loss_fn(p):
            return dsm_loss(
                key, lambda x, t: score_model.apply({"params": p}, x, t),
                sde, grid, likelihood_weighting=False)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    score_losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        score_params, opt_state, loss = score_step(score_params, opt_state, grid, sub)
        score_losses.append(float(loss))

    pipeline = SBMAEPipeline(
        fleet=fleet, fleet_state=fleet_state, score_model=score_model,
        score_params=score_params, sde=sde, latent_hw=hw)
    return dict(pipeline=pipeline, pixels=pixels, labels=labels,
                vae_losses=vae_losses, score_losses=score_losses)


def test_training_losses_decrease(trained_slice):
    assert trained_slice["vae_losses"][-1] < trained_slice["vae_losses"][0]
    assert (
        np.mean(trained_slice["score_losses"][-5:])
        < np.mean(trained_slice["score_losses"][:5])
    )


def test_conditional_generation_preserves_observed(trained_slice):
    p = trained_slice["pipeline"]
    pixels = trained_slice["pixels"][:, :16]
    out = p.sample_conditional(jax.random.key(3), pixels, predicted_mods=[1])
    assert out.shape == pixels.shape
    np.testing.assert_array_equal(np.array(out[0]), np.array(pixels[0]))
    assert np.abs(np.array(out[1]) - np.array(pixels[1])).max() > 1e-3
    assert np.isfinite(np.array(out)).all()
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_unconditional_generation(trained_slice):
    p = trained_slice["pipeline"]
    out = p.sample_unconditional(jax.random.key(4), amount=8)
    assert out.shape == (2, 8, 32, 32, 3)
    assert np.isfinite(np.array(out)).all()


def test_protocols_run(trained_slice):
    p = trained_slice["pipeline"]
    pixels = trained_slice["pixels"][:, :16]
    labels = trained_slice["labels"][:16]

    proj = jax.random.normal(jax.random.key(5), (32 * 32 * 3, 8)) / 50.0

    def feature_fn(imgs):
        return imgs.reshape(imgs.shape[0], -1) @ proj

    def clf_apply(imgs):
        mean = imgs.mean(axis=(1, 2, 3)) * 10
        return jax.nn.one_hot(jnp.clip(mean.astype(jnp.int32), 0, 9), 10)

    res = conditional_protocol(
        p, jax.random.key(6), pixels, labels, [1], clf_apply=clf_apply,
        feature_fn=feature_fn, batch_size=16)
    assert set(res["fid"]) == {1} and np.isfinite(res["fid"][1])
    assert 0.0 <= res["coherence"][1] <= 1.0

    res_u = unconditional_protocol(
        p, jax.random.key(7), pixels, clf_apply=clf_apply,
        feature_fn=feature_fn, batch_size=16)
    assert set(res_u["fid"]) == {0, 1}
    assert 0.0 <= res_u["coherence"] <= 1.0
