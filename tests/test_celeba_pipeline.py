"""Heterogeneous CelebA pipeline + 7-given-set protocol, CPU-sized."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.data import synthetic_celeba
from score_based_multimodal_autoencoder_tpu.data.loader import to_float01
from score_based_multimodal_autoencoder_tpu.diffusion import VPSDE
from score_based_multimodal_autoencoder_tpu.eval.celeba_protocol import (
    celeba_protocol,
    evaluate_given_set,
    fgsm_attack_f1,
)
from score_based_multimodal_autoencoder_tpu.models import (
    AttributeVAE,
    ResVAE,
    ResClassifier,
)
from score_based_multimodal_autoencoder_tpu.nn import LatentUNet
from score_based_multimodal_autoencoder_tpu.pipeline_celeba import (
    HeterogeneousPipeline,
    Modality,
)


@pytest.fixture(scope="module")
def celeba_pipe():
    size, z, hw, B = 32, 16, 4, 8
    ds = synthetic_celeba(n=B, size=size, seed=0)
    images = jnp.asarray(to_float01(ds.images))
    masks = jnp.asarray(to_float01(ds.masks))
    attrs = jnp.asarray(ds.visible_attrs())

    img_vae = ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)),
                     ((16, 8, 8, 2), (8, 8, 8, 2)),
                     size_in=size, size_z=z, img_ch=3, variant="celeb")
    mask_vae = ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)),
                      ((16, 8, 8, 2), (8, 8, 8, 2)),
                      size_in=size, size_z=z, img_ch=1, variant="celeb")
    attr_vae = AttributeVAE(size_z=z, att_size=18)

    mods = []
    for name, model, x in [("image", img_vae, images), ("mask", mask_vae, masks),
                           ("attr", attr_vae, attrs)]:
        variables = model.init(jax.random.key(0), x, key=jax.random.key(1),
                               train=True)
        mods.append(Modality(name, model, variables))

    score_model = LatentUNet(dim=12, init_dim=8, channels=3, dim_mults=(1, 2))
    grid0 = jnp.zeros((B, hw, hw, 3))
    score_params = score_model.init(
        jax.random.key(2), grid0, jnp.full((B,), 0.5))["params"]
    pipe = HeterogeneousPipeline(
        modalities=mods, score_model=score_model, score_params=score_params,
        sde=VPSDE(N=10), latent_hw=hw)
    return pipe, images, masks, attrs


def test_encode_decode_grid(celeba_pipe):
    pipe, images, masks, attrs = celeba_pipe
    grid = pipe.encode_grid([images, masks, attrs])
    assert grid.shape == (8, 4, 4, 3)
    outs = pipe.decode_grid(grid)
    assert outs[0].shape == images.shape
    assert outs[1].shape == masks.shape
    assert outs[2].shape == attrs.shape


def test_conditional_given_image_mask(celeba_pipe):
    pipe, images, masks, attrs = celeba_pipe
    outs = pipe.sample_conditional(
        jax.random.key(3), [images, masks, attrs], [True, True, False])
    assert outs[2].shape == attrs.shape
    assert all(np.isfinite(np.array(o)).all() for o in outs)


def test_protocol_all_given_sets(celeba_pipe):
    pipe, images, masks, attrs = celeba_pipe

    proj = jax.random.normal(jax.random.key(4), (32 * 32 * 3, 8)) / 50

    def feature_fn(imgs):
        return imgs.reshape(imgs.shape[0], -1) @ proj

    results = celeba_protocol(
        pipe, jax.random.key(5), images, masks, attrs,
        given_sets=("", "0", "12"), feature_fn=feature_fn, batch_size=8)
    assert len(results) == 3
    for r in results:
        assert 0.0 <= r["mask_f1"] <= 1.0
        assert 0.0 <= r["attr_acc"] <= 1.0
    # image FID present iff image was generated.
    assert "image_fid" in results[0] and "image_fid" in results[2]
    assert "image_fid" not in results[1]


def test_fgsm_attack(celeba_pipe):
    pipe, images, masks, attrs = celeba_pipe
    clf = ResClassifier(((8, 8, 8, 2), (8, 16, 16, 2)), size_out=18)
    variables = clf.init(jax.random.key(0), images, train=True)

    def clf_apply(variables, x):
        return clf.apply(variables, x)

    res = fgsm_attack_f1(clf_apply, variables, images, attrs, epsilon=0.05)
    assert 0.0 <= res["f1"] <= 1.0 and 0.0 <= res["acc"] <= 1.0
