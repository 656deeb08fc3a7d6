"""Heterogeneous (CelebA-style) mixture baseline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.models import AttributeVAE, ResVAE
from score_based_multimodal_autoencoder_tpu.models.baselines.heterogeneous import (
    HeterogeneousMixtureVAE,
)
from score_based_multimodal_autoencoder_tpu.models.baselines import (
    mvt_loss,
    total_kl_loss,
    total_rec_loss,
)


def _make_model(z=8):
    img = ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)), ((16, 8, 8, 2), (8, 8, 8, 2)),
                 size_in=16, size_z=z, img_ch=3, variant="celeb")
    mask = ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)), ((16, 8, 8, 2), (8, 8, 8, 2)),
                  size_in=16, size_z=z, img_ch=1, variant="celeb")
    attr = AttributeVAE(size_z=z, att_size=18)
    return HeterogeneousMixtureVAE(modality_modules=(img, mask, attr), size_z=z)


@pytest.fixture(scope="module")
def het_setup():
    model = _make_model()
    B = 8
    inputs = (
        jax.random.uniform(jax.random.key(0), (B, 16, 16, 3)),
        jax.random.uniform(jax.random.key(1), (B, 16, 16, 1)),
        (jax.random.uniform(jax.random.key(2), (B, 18)) < 0.3).astype(jnp.float32),
    )
    variables = model.init(jax.random.key(3), inputs, jax.random.key(4),
                           mix_type="mopoe", train=True)
    return model, variables, inputs


def test_mopoe_forward_and_loss(het_setup):
    model, variables, inputs = het_setup
    (outs, mus, logvars), _ = model.apply(
        variables, inputs, jax.random.key(5), "mopoe", train=True,
        mutable=["batch_stats"])
    assert len(outs) == 3
    assert outs[0].shape == inputs[0].shape
    assert outs[2].shape == inputs[2].shape
    assert mus.shape[0] == 7  # powerset of 3 modalities
    kl = total_kl_loss(mus, logvars)
    # recon loss per modality (heterogeneous shapes -> manual sum).
    rec = sum(jnp.sum((o - i) ** 2) / i.shape[0] for o, i in zip(outs, inputs))
    assert np.isfinite(float(kl)) and np.isfinite(float(rec))


def test_mvt_forward_and_loss(het_setup):
    model, variables, inputs = het_setup
    out, _ = model.apply(
        variables, inputs, jax.random.key(6), "mvt", train=True,
        mutable=["batch_stats"])
    j_mu, j_lv, outs = out["joint"]
    assert j_mu.shape == (8, 8)
    assert len(outs) == 3


@pytest.mark.parametrize("mix_type", ["mopoe", "mvt"])
def test_cond_gen(het_setup, mix_type):
    model, variables, inputs = het_setup
    outs = model.apply(
        variables, inputs, jnp.array([True, False, True]), jax.random.key(7),
        mix_type, method=model.cond_gen)
    assert len(outs) == 3
    assert all(np.isfinite(np.array(o)).all() for o in outs)


def test_sample(het_setup):
    model, variables, _ = het_setup
    outs = model.apply(variables, jax.random.key(8), 4, method=model.sample)
    assert outs[0].shape == (4, 16, 16, 3)
    assert outs[1].shape == (4, 16, 16, 1)
    assert outs[2].shape == (4, 18)
