"""Heterogeneous MMVAE+ (CelebA variant) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.models import AttributeVAE, ResVAE
from score_based_multimodal_autoencoder_tpu.models.baselines.mmplus_het import (
    HeterogeneousMMVAEPlus,
    m_dreg_het,
    m_iwae_het,
)


@pytest.fixture(scope="module")
def het_mmplus():
    z = 8  # dim_u = w(4) + z(4)
    img = ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)), ((16, 8, 8, 2), (8, 8, 8, 2)),
                 size_in=16, size_z=z, img_ch=3, variant="celeb")
    mask = ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)), ((16, 8, 8, 2), (8, 8, 8, 2)),
                  size_in=16, size_z=z, img_ch=1, variant="celeb")
    attr = AttributeVAE(size_z=z, att_size=18)
    model = HeterogeneousMMVAEPlus(
        modality_modules=(img, mask, attr), latent_dim_w=4, latent_dim_z=4)
    B = 4
    inputs = (
        jax.random.uniform(jax.random.key(0), (B, 16, 16, 3)),
        jax.random.uniform(jax.random.key(1), (B, 16, 16, 1)),
        (jax.random.uniform(jax.random.key(2), (B, 18)) < 0.3).astype(jnp.float32),
    )
    variables = model.init(jax.random.key(3), inputs, jax.random.key(4), 2, True)
    return model, variables, inputs


def test_forward_structure(het_mmplus):
    model, variables, inputs = het_mmplus
    out, _ = model.apply(variables, inputs, jax.random.key(5), 2, True,
                         mutable=["batch_stats"])
    assert out["us"].shape == (3, 2, 4, 8)
    # Nested per-dst shapes.
    assert out["recon"][0][0].shape == (2, 4, 16, 16, 3)
    assert out["recon"][1][1].shape == (2, 4, 16, 16, 1)
    assert out["recon"][0][2].shape == (2, 4, 18)


def test_iwae_and_dreg_het(het_mmplus):
    model, variables, inputs = het_mmplus

    def iwae_loss(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        out, _ = model.apply(v, inputs, jax.random.key(6), 2, True,
                             mutable=["batch_stats"])
        return -m_iwae_het(out, inputs, latent_dim_w=4)

    loss, grads = jax.value_and_grad(iwae_loss)(variables["params"])
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gn) and gn > 0

    def dreg_loss(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        out, _ = model.apply(v, inputs, jax.random.key(6), 2, True,
                             mutable=["batch_stats"])
        return -m_dreg_het(model, v, out, inputs, latent_dim_w=4)

    loss2, grads2 = jax.value_and_grad(dreg_loss)(variables["params"])
    assert np.isfinite(float(loss2))


def test_generate_and_cond_gen(het_mmplus):
    model, variables, inputs = het_mmplus
    outs = model.apply(variables, jax.random.key(7), 3, method=model.generate)
    assert outs[0].shape == (3, 16, 16, 3)
    assert outs[2].shape == (3, 18)
    cond = model.apply(variables, inputs, jnp.array([0]), jax.random.key(8),
                       method=model.cond_gen)
    assert cond[1].shape == (4, 16, 16, 1)
    assert all(np.isfinite(np.array(c)).all() for c in cond)
