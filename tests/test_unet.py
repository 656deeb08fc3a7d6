"""Latent UNet shape/structure tests for the shipped reference configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.nn import LatentUNet


def _make(dim, channels, dim_mults, hw, batch=2, **kw):
    net = LatentUNet(dim=dim, channels=channels, dim_mults=dim_mults, **kw)
    x = jnp.zeros((batch, hw, hw, channels))
    t = jnp.full((batch,), 0.5)
    params = net.init(jax.random.key(0), x, t)
    return net, params, x, t


def test_polymnist_config_shapes():
    """dim=128, channels=10, mults (1,2,2,2) on 8x8 latents
    (train_poly_unet_cont.py:567-572) - smoke-sized here as dim=32."""
    net, params, x, t = _make(32, 10, (1, 2, 2, 2), 8)
    out = net.apply(params, x, t)
    assert out.shape == (2, 8, 8, 10)


def test_celebhq_config_shapes():
    """dim=256, channels=3, mults (1,2,2,2,2) on 16x16 latents
    (train_lat_celebhq_unet_cont2.py:470-472) - smoke-sized as dim=16."""
    net, params, x, t = _make(16, 3, (1, 2, 2, 2, 2), 16)
    out = net.apply(params, x, t)
    assert out.shape == (2, 16, 16, 3)


def test_non_pow2_input_padded_and_cropped():
    """6x6 input must pad to 8x8 internally and crop back
    (unet_model.py:276-283 parity)."""
    net, params, x, t = _make(16, 4, (1, 2), 6)
    out = net.apply(params, x, t)
    assert out.shape == (2, 6, 6, 4)


def test_resnet_block_variant():
    net, params, x, t = _make(16, 3, (1, 2), 8, use_convnext=False)
    out = net.apply(params, x, t)
    assert out.shape == (2, 8, 8, 3)


def test_time_conditioning_changes_output():
    net, params, x, t = _make(16, 3, (1, 2), 8)
    x = jax.random.normal(jax.random.key(1), x.shape)
    out_a = net.apply(params, x, jnp.full((2,), 0.1))
    out_b = net.apply(params, x, jnp.full((2,), 0.9))
    assert np.abs(np.array(out_a) - np.array(out_b)).max() > 1e-5


def test_no_time_emb():
    net = LatentUNet(dim=16, channels=3, dim_mults=(1, 2), with_time_emb=False)
    x = jnp.zeros((2, 8, 8, 3))
    params = net.init(jax.random.key(0), x, None)
    out = net.apply(params, x, None)
    assert out.shape == (2, 8, 8, 3)


def test_bf16_compute_path():
    net = LatentUNet(dim=16, channels=3, dim_mults=(1, 2), dtype=jnp.bfloat16)
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    t = jnp.full((2,), 0.5)
    params = net.init(jax.random.key(0), x, t)
    out = net.apply(params, x, t)
    # Output restored to input dtype; params stay f32.
    assert out.dtype == jnp.float32
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32


def test_gradients_flow_everywhere():
    net, params, x, t = _make(16, 3, (1, 2), 8)
    x = jax.random.normal(jax.random.key(2), x.shape)

    def loss(p):
        return jnp.sum(net.apply(p, x, t) ** 2)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(norms))
    # The finest skip is unused by design, but every PARAM must get grads.
    assert sum(n == 0.0 for n in norms) <= len(norms) * 0.05


def test_fused_norms_parity():
    """fused_norms routes every GroupNorm through the Pallas kernel
    (interpret mode on CPU); same param tree, same outputs/grads."""
    m0 = LatentUNet(dim=16, channels=3, dim_mults=(1, 2))
    m1 = LatentUNet(dim=16, channels=3, dim_mults=(1, 2), fused_norms=True)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    t = jnp.full((2,), 0.4)
    p0 = m0.init(jax.random.key(0), x, t)
    p1 = m1.init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    y0, y1 = m0.apply(p0, x, t), m1.apply(p0, x, t)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4)
    g0 = jax.grad(lambda p: jnp.sum(m0.apply(p, x, t) ** 2))(p0)
    g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, x, t) ** 2))(p0)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-2)


def test_mxu_depthwise_equivalence():
    """DepthwiseConvMXU must reproduce nn.Conv(feature_group_count=C)
    exactly (same params, same math - only the schedule changes)."""
    import jax
    import jax.numpy as jnp

    from flax import linen

    from score_based_multimodal_autoencoder_tpu.nn.blocks import (
        DepthwiseConvMXU,
    )

    C = 12
    x = jax.random.normal(jax.random.key(0), (3, 8, 8, C))
    ref = linen.Conv(C, (7, 7), padding=3, feature_group_count=C)
    rv = ref.init(jax.random.key(1), x)
    mxu = DepthwiseConvMXU(C, 7)
    out_ref = ref.apply(rv, x)
    out_mxu = mxu.apply(rv, x)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_mxu),
                               rtol=1e-5, atol=1e-5)
    # 16x16 matmul path (the default cutoff covers it) AND the explicit
    # fallback path (grid larger than max_positions) both match
    x2 = jax.random.normal(jax.random.key(2), (2, 16, 16, C))
    rv2 = ref.init(jax.random.key(3), x2)
    ref_out = np.asarray(ref.apply(rv2, x2))
    np.testing.assert_allclose(
        ref_out, np.asarray(DepthwiseConvMXU(C, 7).apply(rv2, x2)),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        ref_out,
        np.asarray(DepthwiseConvMXU(C, 7, max_positions=64).apply(rv2, x2)),
        rtol=1e-5, atol=1e-5)
    # gradients flow through the banded-matmul path (training uses it)
    def loss(v):
        return jnp.sum(DepthwiseConvMXU(C, 7).apply(v, x) ** 2)

    g = jax.grad(loss)(rv)
    def loss_ref(v):
        return jnp.sum(ref.apply(v, x) ** 2)

    g_ref = jax.grad(loss_ref)(rv)
    np.testing.assert_allclose(
        np.asarray(g["params"]["kernel"]),
        np.asarray(g_ref["params"]["kernel"]), rtol=1e-4, atol=1e-4)


def test_latent_unet_mxu_depthwise_param_compat():
    """mxu_depthwise=True loads/produces the same param tree and closely
    matching outputs as the reference path."""
    import jax
    import jax.numpy as jnp

    from score_based_multimodal_autoencoder_tpu.nn import LatentUNet

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    t = jnp.full((2,), 0.5)
    a = LatentUNet(dim=16, channels=3, dim_mults=(1, 2))
    b = LatentUNet(dim=16, channels=3, dim_mults=(1, 2), mxu_depthwise=True)
    va = a.init(jax.random.key(1), x, t)
    sa = jax.tree_util.tree_structure(va)
    sb = jax.tree_util.tree_structure(b.init(jax.random.key(1), x, t))
    assert sa == sb
    np.testing.assert_allclose(np.asarray(a.apply(va, x, t)),
                               np.asarray(b.apply(va, x, t)),
                               rtol=1e-4, atol=1e-4)


def test_latent_unet_mxu_max_positions_hybrid():
    """mxu_max_positions gates the MXU depthwise path per level without
    changing the param tree or the math: the hybrid (cutoff 64: conv at
    16x16, MXU at <=8x8 - the celebhq flagship layout) matches both the
    pure-conv and pure-MXU models on shared params."""
    import jax
    import jax.numpy as jnp

    from score_based_multimodal_autoencoder_tpu.nn import LatentUNet

    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.full((2,), 0.5)
    conv = LatentUNet(dim=16, channels=3, dim_mults=(1, 2))
    hybrid = LatentUNet(dim=16, channels=3, dim_mults=(1, 2),
                        mxu_depthwise=True, mxu_max_positions=64)
    full = LatentUNet(dim=16, channels=3, dim_mults=(1, 2),
                      mxu_depthwise=True, mxu_max_positions=256)
    v = conv.init(jax.random.key(1), x, t)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        hybrid.init(jax.random.key(1), x, t))
    ref = np.asarray(conv.apply(v, x, t))
    np.testing.assert_allclose(ref, np.asarray(hybrid.apply(v, x, t)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ref, np.asarray(full.apply(v, x, t)),
                               rtol=1e-4, atol=1e-4)
