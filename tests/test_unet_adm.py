"""ADM UNet + contrastive encoder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.nn.contrastive import (
    AttrRepEncoder,
    ProjectionHead,
    average_condition,
    info_nce_loss,
)
from score_based_multimodal_autoencoder_tpu.nn.unet_adm import (
    ADMSuperResUNet,
    ADMUNet,
    adm_timestep_embedding,
)


def test_timestep_embedding_shape_and_range():
    emb = adm_timestep_embedding(jnp.array([0.0, 1.0, 500.0]), 128)
    assert emb.shape == (3, 128)
    assert float(jnp.abs(emb).max()) <= 1.0 + 1e-6


def _tiny_adm(**kw):
    return ADMUNet(
        in_channels=3, model_channels=16, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2, **kw)


def test_adm_unet_shapes():
    net = _tiny_adm()
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0.0, 10.0])
    params = net.init(jax.random.key(0), x, t)
    out = net.apply(params, x, t)
    assert out.shape == (2, 16, 16, 3)
    # zero-initialized output conv -> exactly zero at init.
    np.testing.assert_allclose(np.array(out), 0.0)


def test_adm_unet_z_conditioning():
    net = _tiny_adm(use_z=True, z_dim=8)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    t = jnp.array([1.0, 2.0])
    z = jax.random.normal(jax.random.key(2), (2, 8))
    params = net.init(jax.random.key(0), x, t, z)
    out_a = net.apply(params, x, t, z)
    out_b = net.apply(params, x, t, jnp.zeros_like(z))
    # Same shape; conditioning changes hidden path (output conv is zero-init,
    # so compare an internal effect via grads instead of raw output).
    assert out_a.shape == out_b.shape

    def loss(p, z):
        return jnp.sum(net.apply(p, x, t, z) ** 2)

    g = jax.grad(loss, argnums=1)(params, z)
    assert g.shape == z.shape


def test_adm_unet_class_conditioning_and_checkpointing():
    net = _tiny_adm(num_classes=5, use_checkpoint=True)
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.array([1.0, 2.0])
    y = jnp.array([0, 3])
    params = net.init(jax.random.key(0), x, t, None, y)
    out = net.apply(params, x, t, None, y)
    assert out.shape == (2, 8, 8, 3)


def test_adm_superres():
    net = ADMSuperResUNet(
        in_channels=6, model_channels=16, out_channels=3, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2))
    x = jnp.zeros((2, 16, 16, 3))
    low = jnp.zeros((2, 8, 8, 3))
    t = jnp.array([1.0, 2.0])
    params = net.init(jax.random.key(0), x, t, low)
    out = net.apply(params, x, t, low)
    assert out.shape == (2, 16, 16, 3)


def test_projection_head_and_infonce():
    head = ProjectionHead(projection_dim=16)
    x = jax.random.normal(jax.random.key(0), (4, 16))
    params = head.init(jax.random.key(1), x)
    out = head.apply(params, x)
    assert out.shape == (4, 16)

    z = jax.random.normal(jax.random.key(2), (8, 16))
    # Identical views -> loss below independent-views baseline log(B).
    aligned = float(info_nce_loss(z, z))
    indep = float(info_nce_loss(z, jax.random.normal(jax.random.key(3), (8, 16))))
    assert aligned < indep


def test_attr_rep_and_average_condition():
    enc = AttrRepEncoder(att_size=18, size_z=32)
    x = jnp.zeros((4, 18))
    variables = enc.init(jax.random.key(0), x, train=True)
    out = enc.apply(variables, x)
    assert out.shape == (4, 32)

    reps = jnp.stack([jnp.full((4, 8), 1.0), jnp.full((4, 8), 3.0),
                      jnp.full((4, 8), 100.0)])
    cond = average_condition(reps, jnp.array([True, True, False]))
    np.testing.assert_allclose(np.array(cond), 2.0)
