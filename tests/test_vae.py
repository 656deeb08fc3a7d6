"""VAE family tests: shapes per shipped config, loss math, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from score_based_multimodal_autoencoder_tpu.models import (
    AttributeVAE,
    PolyMNISTClassifier,
    ResVAE,
    polymnist_vae,
    reparametrize,
    vae_loss,
)
from score_based_multimodal_autoencoder_tpu.models.classifiers import center_crop_28


def test_polymnist_vae_shapes():
    """ResVAE(enc/dec lists, 32, 64, 3): 32x32x3 -> z=64 -> 32x32x3."""
    vae = polymnist_vae(size_z=64)
    x = jnp.zeros((2, 32, 32, 3))
    variables = vae.init(jax.random.key(0), x, key=jax.random.key(1), train=True)
    out, mu, logvar = vae.apply(
        variables, x, key=jax.random.key(2), train=True,
        mutable=["batch_stats"],
    )[0]
    assert out.shape == (2, 32, 32, 3)
    assert mu.shape == (2, 64) and logvar.shape == (2, 64)


def test_celeba_vae_shapes_smoke():
    """Down-scaled CelebA-variant config: 32x32 in, bilinear ups, sigmoid."""
    vae = ResVAE(
        enc_channel_list=((8, 16, 16, 2), (16, 32, 32, 2)),
        dec_channel_list=((32, 32, 16, 2), (16, 16, 8, 2)),
        size_in=32, size_z=16, img_ch=1, variant="celeb",
    )
    x = jnp.zeros((2, 32, 32, 1))
    variables = vae.init(jax.random.key(0), x, key=jax.random.key(1), train=True)
    out, mu, logvar = vae.apply(
        variables, x, key=jax.random.key(2), train=True, mutable=["batch_stats"]
    )[0]
    assert out.shape == (2, 32, 32, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid head


def test_encoder_decoder_methods():
    vae = polymnist_vae(size_z=64)
    x = jnp.zeros((2, 32, 32, 3))
    variables = vae.init(jax.random.key(0), x, key=jax.random.key(1), train=True)
    mu, logvar = vae.apply(variables, x, method=vae.encoder)
    assert mu.shape == (2, 64)
    recon = vae.apply(variables, mu, method=vae.decoder)
    assert recon.shape == (2, 32, 32, 3)


def test_reparametrize_stats():
    key = jax.random.key(0)
    mu = jnp.full((20000, 1), 3.0)
    logvar = jnp.full((20000, 1), jnp.log(4.0))
    z = reparametrize(key, mu, logvar)
    assert abs(float(z.mean()) - 3.0) < 0.05
    assert abs(float(z.std()) - 2.0) < 0.05


def test_vae_loss_matches_reference_formula():
    """Sum-MSE/B + beta * KL/B (train_polyupd.py:25-29)."""
    x = jnp.ones((4, 2, 2, 1))
    x_hat = jnp.zeros((4, 2, 2, 1))
    mu = jnp.full((4, 3), 2.0)
    logvar = jnp.zeros((4, 3))
    recon, kl = vae_loss(x, x_hat, mu, logvar, beta=0.5)
    np.testing.assert_allclose(float(recon), 16.0 / 4)
    # KL per element: -0.5*(1 + 0 - 4 - 1) = 2.0; total 4*3*2/B=4 -> *0.5
    np.testing.assert_allclose(float(kl), 0.5 * 24.0 / 4)


def test_attribute_vae():
    vae = AttributeVAE(size_z=16, att_size=18)
    x = jnp.zeros((4, 18))
    variables = vae.init(jax.random.key(0), x, key=jax.random.key(1), train=True)
    (out, mu, logvar), _ = vae.apply(
        variables, x, key=jax.random.key(2), train=True, mutable=["batch_stats"]
    )
    assert out.shape == (4, 18) and mu.shape == (4, 16)


def test_pmclf_shapes_and_crop():
    clf = PolyMNISTClassifier()
    x32 = jnp.zeros((2, 32, 32, 3))
    x28 = center_crop_28(x32)
    assert x28.shape == (2, 28, 28, 3)
    params = clf.init(jax.random.key(0), x28)
    logits = clf.apply(params, x28)
    assert logits.shape == (2, 10)


def test_batchnorm_running_stats_update():
    vae = polymnist_vae(size_z=8)
    x = jax.random.normal(jax.random.key(3), (4, 32, 32, 3))
    variables = vae.init(jax.random.key(0), x, key=jax.random.key(1), train=True)
    _, updates = vae.apply(
        variables, x, key=jax.random.key(2), train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        np.abs(np.array(a) - np.array(b)).max() > 0 for a, b in zip(after, before)
    )


def test_mopoe_image_classifier():
    """ClfImg geometry (h_vae_model_copy.py:327-342): 64x64 -> 1x1x640 ->
    18 logits; dropout active only in train mode."""
    import jax

    from score_based_multimodal_autoencoder_tpu.models.classifiers import (
        MoPoEImageClassifier,
    )

    clf = MoPoEImageClassifier(size_out=18, width=16)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    variables = clf.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)}, x, True)
    out, _ = clf.apply(variables, x, True,
                       rngs={"dropout": jax.random.key(3)},
                       mutable=["batch_stats"])
    assert out.shape == (2, 18)
    eval_a = clf.apply(variables, x, False)
    eval_b = clf.apply(variables, x, False)
    np.testing.assert_array_equal(np.asarray(eval_a), np.asarray(eval_b))
