"""DiffuseVAE refiner integration with the CelebA pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from score_based_multimodal_autoencoder_tpu.diffusion.ddpm import DDPMSchedule
from score_based_multimodal_autoencoder_tpu.nn.unet_adm import ADMUNet
from score_based_multimodal_autoencoder_tpu.pipeline_celeba import (
    HeterogeneousPipeline,
)


def test_refine_images_runs():
    # Tiny refiner: in = x(3) + cond(3) channels, out = 3 (eval_lat_celeba_
    # hq_all.py:448 config shape-wise).
    refiner = ADMUNet(in_channels=6, model_channels=8, out_channels=3,
                      num_res_blocks=1, attention_resolutions=(),
                      channel_mult=(1, 2))
    x0 = jnp.zeros((2, 16, 16, 6))
    t0 = jnp.zeros((2,), jnp.int32)
    params = refiner.init(jax.random.key(0), x0, t0)["params"]
    schedule = DDPMSchedule(timesteps=10)

    pipe = HeterogeneousPipeline(
        modalities=[], score_model=None, score_params=None, sde=None,
        latent_hw=4)
    imgs = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
    refined = pipe.refine_images(jax.random.key(2), imgs, refiner, params,
                                 schedule)
    assert refined.shape == imgs.shape
    assert float(refined.min()) >= 0.0 and float(refined.max()) <= 1.0
    assert np.isfinite(np.array(refined)).all()
