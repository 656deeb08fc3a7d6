"""Baselines flow through the same eval protocols as the score model."""

import jax
import jax.numpy as jnp
import numpy as np

from score_based_multimodal_autoencoder_tpu.eval.baseline_adapter import (
    BaselineSampler,
)
from score_based_multimodal_autoencoder_tpu.eval.protocols import (
    conditional_protocol,
    unconditional_protocol,
)
from score_based_multimodal_autoencoder_tpu.models.baselines import (
    MixtureMultimodalVAE,
)

ENC = ((8, 8, 8, 2), (8, 16, 16, 2))
DEC = ((16, 8, 8, 2), (8, 8, 8, 2))


def test_baseline_through_protocols():
    n_mod = 3
    model = MixtureMultimodalVAE(
        n_mod=n_mod, enc_channel_list=ENC, dec_channel_list=DEC,
        size_in=32, size_z=16, img_ch=3)
    pixels = jax.random.uniform(jax.random.key(0), (n_mod, 8, 32, 32, 3))
    variables = model.init(jax.random.key(1), pixels, jax.random.key(2),
                           train=True)
    sampler = BaselineSampler(model, variables, "mopoe", n_mod)

    proj = jax.random.normal(jax.random.key(3), (32 * 32 * 3, 8)) / 50

    def feature_fn(imgs):
        return imgs.reshape(imgs.shape[0], -1) @ proj

    res = conditional_protocol(
        sampler, jax.random.key(4), pixels, None, [2],
        feature_fn=feature_fn, batch_size=8)
    assert np.isfinite(res["fid"][2])

    res_u = unconditional_protocol(
        sampler, jax.random.key(5), pixels, feature_fn=feature_fn,
        batch_size=8)
    assert set(res_u["fid"]) == {0, 1, 2}

    # Observed modalities are passed through unchanged.
    out = sampler.sample_conditional(jax.random.key(6), pixels, [2])
    np.testing.assert_array_equal(np.array(out[0]), np.array(pixels[0]))
    assert np.abs(np.array(out[2]) - np.array(pixels[2])).max() > 1e-4
