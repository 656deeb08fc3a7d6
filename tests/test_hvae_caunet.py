"""HVAE + cross-attention UNet variant tests."""

import jax
import jax.numpy as jnp
import numpy as np

from score_based_multimodal_autoencoder_tpu.models.hvae import HVAE, gaussian_kl
from score_based_multimodal_autoencoder_tpu.nn.cross_attention import (
    CrossAttentionUNet,
    MaskedTokenAttention,
    SigmaNormalizedUNet,
)


def test_gaussian_kl_zero_for_identical():
    mu = jnp.ones((4, 8))
    lv = jnp.zeros((4, 8))
    assert abs(float(gaussian_kl(mu, lv, mu, lv))) < 1e-6
    assert float(gaussian_kl(mu + 1, lv, mu, lv)) > 0


def test_hvae_forward_train_and_eval():
    # Reference demo config scaled down (h_vae_model.py:335-340 comment).
    enc = ((8, 8, 8, 2), (8, 16, 16, 2))
    dec = ((16, 16, 16, 2), (16, 16, 8, 2))
    model = HVAE(enc, dec, res_inp_list=(0, 1), size_in=16, size_z=8)
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    variables = model.init(jax.random.key(1), x, jax.random.key(2), train=True)
    out, mu, logvar, kls = model.apply(variables, x, jax.random.key(3), True)
    assert out.shape == x.shape
    assert kls.shape == (2,)  # one KL per decoder level
    assert np.isfinite(np.array(kls)).all()
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    out_eval, mu2, _ = model.apply(variables, x, jax.random.key(4), False)
    assert out_eval.shape == x.shape


def test_masked_attention_excludes_self():
    """With mask 1-I, a token's output must not depend on its own value."""
    att = MaskedTokenAttention(embed_dim=8, num_heads=2)
    x = jax.random.normal(jax.random.key(0), (2, 3, 8))
    params = att.init(jax.random.key(1), x)
    mask = 1.0 - jnp.eye(3)
    out_a = att.apply(params, x, mask)
    x_mod = x.at[:, 0].set(x[:, 0] + 10.0)  # perturb token 0 only
    out_b = att.apply(params, x_mod, mask)
    # Token 0's own output unchanged (it cannot attend to itself; its q is
    # built from its value though - so compare OTHER tokens' keys only).
    # tokens 1,2 CAN attend to token 0 -> they change:
    assert np.abs(np.array(out_a[:, 1:] - out_b[:, 1:])).max() > 1e-3


def test_cross_attention_unet_shapes():
    net = CrossAttentionUNet(n_mod=3, size_z=16, dim=12, dim_mults=(1, 2))
    x = jnp.zeros((2, 4, 4, 3))
    t = jnp.full((2,), 0.5)
    params = net.init(jax.random.key(0), x, t)
    out = net.apply(params, x, t)
    assert out.shape == (2, 4, 4, 3)


def test_sigma_normalized_unet():
    net = SigmaNormalizedUNet(dim=12, channels=2, dim_mults=(1, 2))
    x = jnp.ones((2, 4, 4, 2))
    sigma = jnp.array([1.0, 2.0])
    params = net.init(jax.random.key(0), x, sigma)
    out = net.apply(params, x, sigma)
    out2 = net.apply(params, x, sigma * 2)
    np.testing.assert_allclose(np.array(out), np.array(out2) * 2, rtol=1e-5)


def test_deep_cross_attention_unet_shapes():
    from score_based_multimodal_autoencoder_tpu.nn.cross_attention import (
        DeepCrossAttentionUNet,
    )

    net = DeepCrossAttentionUNet(n_mod=3, size_z=16, dim=12, dim_mults=(1, 2),
                                 n_block=2)
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 3))
    t = jnp.full((2,), 0.5)
    params = net.init(jax.random.key(1), x, t)
    out = net.apply(params, x, t)
    assert out.shape == (2, 4, 4, 3)
    assert np.isfinite(np.array(out)).all()
    # non-cross variant (all-ones mask) also runs
    net2 = DeepCrossAttentionUNet(n_mod=3, size_z=16, dim=12,
                                  dim_mults=(1, 2), n_block=1, cross=False)
    p2 = net2.init(jax.random.key(2), x, t)
    assert net2.apply(p2, x, t).shape == (2, 4, 4, 3)


def test_energy_unet():
    from score_based_multimodal_autoencoder_tpu.nn.cross_attention import (
        EnergyUNet,
    )

    net = EnergyUNet(dim=12, channels=2, size_z=16, dim_mults=(1, 2))
    x = jax.random.normal(jax.random.key(0), (3, 4, 4, 2))
    t = jnp.full((3,), 0.5)
    params = net.init(jax.random.key(1), x, t)
    score, energy = net.apply(params, x, t)
    assert score.shape == x.shape
    assert energy.shape == (3, 1)
    assert np.isfinite(np.array(energy)).all()


def test_nodown_unet_preserves_resolution():
    from score_based_multimodal_autoencoder_tpu.nn.cross_attention import (
        NoDownUNet,
    )

    net = NoDownUNet(dim=12, channels=2, dim_mults=(1, 2))
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 2))
    t = jnp.full((2,), 0.5)
    params = net.init(jax.random.key(1), x, t)
    out = net.apply(params, x, t)
    assert out.shape == (2, 4, 4, 2)
    assert np.isfinite(np.array(out)).all()


def test_recon_cond_unet():
    from score_based_multimodal_autoencoder_tpu.nn.cross_attention import (
        ReconCondUNet,
    )

    net = ReconCondUNet(dim=12, channels=2, dim_mults=(1, 2))
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 2))
    xh = jax.random.normal(jax.random.key(1), (2, 4, 4, 2))
    t = jnp.full((2,), 0.5)
    params = net.init(jax.random.key(2), x, xh, t)
    out = net.apply(params, x, xh, t)
    assert out.shape == (2, 4, 4, 2)
    # conditioning on a different x_hat must change the output
    out2 = net.apply(params, x, xh + 1.0, t)
    assert np.abs(np.array(out - out2)).max() > 1e-5


def test_latent_unet_z_injection():
    from score_based_multimodal_autoencoder_tpu.nn import LatentUNet

    net = LatentUNet(dim=12, channels=2, dim_mults=(1, 2), z_dim=8)
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 2))
    t = jnp.full((2,), 0.5)
    z = jax.random.normal(jax.random.key(1), (2, 8))
    params = net.init(jax.random.key(2), x, t, z)
    out = net.apply(params, x, t, z)
    assert out.shape == (2, 4, 4, 2)
    out2 = net.apply(params, x, t, z + 1.0)
    assert np.abs(np.array(out - out2)).max() > 1e-5


def test_dual_stream_cross_attention_unet():
    """CRA (unet_model.py:807-853): dual-stream cross attention -> UNet;
    token shape preserved, q-stream and kv-stream both influence output."""
    from score_based_multimodal_autoencoder_tpu.nn.cross_attention import (
        DualStreamCrossAttentionUNet,
    )

    net = DualStreamCrossAttentionUNet(n_mod=3, z_dim=16, grid_h=4, grid_w=4,
                                       unet_dim=12, dim_mults=(1, 2))
    x = jax.random.normal(jax.random.key(0), (2, 3, 16))
    t = jnp.full((2,), 0.5)
    params = net.init(jax.random.key(1), x, t)
    out = net.apply(params, x, t)
    assert out.shape == (2, 3, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_polymnist_classifier_ptrclf_variant():
    """PTRCLF (polymnist_model.py:394-422): dropout + BN variant trains with
    mutable batch stats and collapses to deterministic eval."""
    from score_based_multimodal_autoencoder_tpu.models.classifiers import (
        PolyMNISTClassifier,
    )

    clf = PolyMNISTClassifier(dropout=0.25, batch_norm=True)
    x = jax.random.normal(jax.random.key(0), (4, 28, 28, 3))
    variables = clf.init({"params": jax.random.key(1),
                          "dropout": jax.random.key(2)}, x, train=True)
    assert "batch_stats" in variables
    out, mutated = clf.apply(variables, x, train=True,
                             rngs={"dropout": jax.random.key(3)},
                             mutable=["batch_stats"])
    assert out.shape == (4, 10)
    assert "batch_stats" in mutated
    # Eval mode: deterministic (no dropout rng needed).
    out_a = clf.apply(variables, x)
    out_b = clf.apply(variables, x)
    np.testing.assert_allclose(np.array(out_a), np.array(out_b))


def test_resvae_soft_variant():
    """ResVAESoft (h_vae_model_copy.py:506-546): poly-style blocks with a
    sigmoid output head."""
    from score_based_multimodal_autoencoder_tpu.models import ResVAE

    vae = ResVAE(((4, 8, 8, 2),), ((8, 8, 4, 2),), size_in=8, size_z=8,
                 img_ch=3, variant="soft")
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    variables = vae.init(jax.random.key(1), x)
    out, mu, logvar = vae.apply(variables, x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
