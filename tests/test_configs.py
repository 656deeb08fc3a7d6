"""Config presets reproduce the exact shipped reference configurations."""

import jax
import jax.numpy as jnp

from score_based_multimodal_autoencoder_tpu.diffusion import VPSDE, SubVPSDE, VESDE
from score_based_multimodal_autoencoder_tpu.models.vae import (
    CELEBA_IMG_DEC_CHANNELS,
    CELEBA_IMG_ENC_CHANNELS,
    CELEBA_MASK_ENC_CHANNELS,
    POLYMNIST_DEC_CHANNELS,
    POLYMNIST_ENC_CHANNELS,
)
from score_based_multimodal_autoencoder_tpu.train.configs import (
    ScoreConfig,
    VAEConfig,
)


def test_polymnist_score_preset():
    """Unet(dim=128, channels=10, (1,2,2,2)), 8x8, N_sample=100
    (train_poly_unet_cont.py:567-572, train_poly.sh)."""
    cfg = ScoreConfig.polymnist()
    assert (cfg.dim, cfg.channels, tuple(cfg.dim_mults)) == (128, 10, (1, 2, 2, 2))
    assert (cfg.latent_hw, cfg.sample_n) == (8, 100)
    assert (cfg.beta_0, cfg.beta_1) == (0.1, 20.0)
    model = cfg.build_model()
    assert model.dim == 128 and model.channels == 10


def test_celebhq_score_preset():
    """Unet(dim=256, channels=3, (1,2,2,2,2)), 16x16, N_sample=1000
    (train_lat_celebhq_unet_cont2.py:470-472)."""
    cfg = ScoreConfig.celebhq()
    assert (cfg.dim, cfg.channels, tuple(cfg.dim_mults)) == (256, 3, (1, 2, 2, 2, 2))
    assert (cfg.latent_hw, cfg.sample_n) == (16, 1000)


def test_sde_factory_from_config():
    for name, cls in [("vpsde", VPSDE), ("subvpsde", SubVPSDE), ("vesde", VESDE)]:
        cfg = ScoreConfig.polymnist(sde_type=name)
        assert isinstance(cfg.build_sde(), cls)
        assert cfg.build_sde().N == cfg.n_steps
        assert cfg.build_sde(sample=True).N == cfg.sample_n


def test_vae_presets_reference_channel_lists():
    """Channel lists from train_polyupd.py:196-200, train_celeba_res_hq.py:
    132-133, train_celeba_mask_hq.py:130-131."""
    assert POLYMNIST_ENC_CHANNELS == ((64, 64, 64, 2), (64, 128, 128, 2),
                                      (128, 256, 256, 2))
    assert POLYMNIST_DEC_CHANNELS == ((256, 128, 128, 2), (128, 128, 64, 2),
                                      (64, 64, 64, 2))
    assert CELEBA_IMG_ENC_CHANNELS == ((64, 128, 128, 2), (128, 256, 256, 2),
                                       (256, 512, 512, 2))
    assert CELEBA_IMG_DEC_CHANNELS == ((512, 512, 256, 2), (256, 256, 128, 2),
                                       (128, 128, 64, 2))
    assert CELEBA_MASK_ENC_CHANNELS == ((64, 128, 128, 4), (128, 256, 256, 4))

    poly = VAEConfig.polymnist()
    m = poly.build_model()
    assert m.size_in == 32 and m.size_z == 64 and m.variant == "poly"
    cel = VAEConfig.celeba_image().build_model()
    assert cel.size_in == 128 and cel.size_z == 256 and cel.variant == "celeb"
    attr = VAEConfig.celeba_attr().build_model()
    assert attr.att_size == 18 and attr.size_z == 256


def test_sample_flavor_model_matches_train_flavor():
    """build_model(sample=True) (fused Pallas linear attention on >=64
    position levels) computes the same function as the differentiable
    train-flavor model - identical params, same outputs (f32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from score_based_multimodal_autoencoder_tpu.train.configs import (
        ScoreConfig,
    )

    cfg = ScoreConfig.polymnist_tpu(dim=16)
    train_model = cfg.build_model()
    sample_model = cfg.build_model(sample=True)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 10))
    t = jnp.full((2,), 0.4)
    params = train_model.init(jax.random.key(1), x, t)
    out_train = train_model.apply(params, x, t)
    out_sample = sample_model.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(out_sample),
                               np.asarray(out_train), rtol=1e-4, atol=1e-5)
