"""Baseline tests: PoE math, powerset masks, stratified selection, and one
training step per mix type."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from score_based_multimodal_autoencoder_tpu.models.baselines import (
    MixtureMultimodalVAE,
    kl_between,
    mvae_loss,
    mvt_loss,
    poe,
    powerset_masks,
    stratified_select,
    total_kl_loss,
    total_rec_loss,
)

ENC = ((8, 8, 8, 2), (8, 16, 16, 2))
DEC = ((16, 8, 8, 2), (8, 8, 8, 2))


def _model(n_mod=3):
    return MixtureMultimodalVAE(
        n_mod=n_mod, enc_channel_list=ENC, dec_channel_list=DEC,
        size_in=16, size_z=8, img_ch=3)


def test_powerset_masks():
    m = powerset_masks(3)
    assert m.shape == (7, 3)
    sizes = m.sum(1)
    assert list(sizes) == [1, 1, 1, 2, 2, 2, 3]  # by-size order


def test_poe_two_equal_experts():
    """PoE of two identical Gaussians halves the variance, keeps the mean."""
    mu = jnp.ones((2, 4, 3))
    logvar = jnp.zeros((2, 4, 3))
    mask = jnp.array([[1.0, 1.0]])
    pmu, plogvar = poe(mu, logvar, mask, add_prior="never")
    np.testing.assert_allclose(np.array(pmu[0]), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.array(jnp.exp(plogvar[0])), 0.5, rtol=1e-3)


def test_poe_prior_modes():
    mu = jnp.full((2, 1, 1), 2.0)
    logvar = jnp.zeros((2, 1, 1))
    full = jnp.array([[1.0, 1.0]])
    # 'never': mean stays 2; 'full'/'always' add a zero-mean unit expert:
    # mean -> 2*2/(2+1) = 4/3.
    mu_never, _ = poe(mu, logvar, full, add_prior="never")
    mu_full, _ = poe(mu, logvar, full, add_prior="full")
    np.testing.assert_allclose(float(mu_never[0, 0, 0]), 2.0, rtol=1e-4)
    np.testing.assert_allclose(float(mu_full[0, 0, 0]), 4.0 / 3, rtol=1e-3)


def test_poe_singleton_bypass():
    """|S|=1 with no prior returns the RAW posterior (reference parity)."""
    mu = jnp.array([[[3.0]], [[5.0]]])
    logvar = jnp.array([[[0.5]], [[0.1]]])
    mask = jnp.array([[1.0, 0.0]])
    pmu, plogvar = poe(mu, logvar, mask, add_prior="full")
    np.testing.assert_allclose(float(pmu[0, 0, 0]), 3.0)
    np.testing.assert_allclose(float(plogvar[0, 0, 0]), 0.5)


def test_stratified_select_blocks():
    zs = jnp.stack([jnp.full((8, 2), float(i)) for i in range(4)])  # (4,8,2)
    out = stratified_select(jax.random.key(0), zs, batch_size=8, sample_len=4)
    assert out.shape == (8, 2)
    # Each contiguous block of 2 rows comes from one subset.
    vals = np.array(out[:, 0]).reshape(4, 2)
    assert all(len(set(row)) == 1 for row in vals)
    # Without replacement: 4 distinct subsets for 4 blocks.
    assert len(set(vals[:, 0])) == 4


@pytest.mark.parametrize("mix_type", ["mopoe", "mmvae", "mvae", "mvt"])
def test_forward_and_loss_per_mix_type(mix_type):
    model = _model(n_mod=3)
    inputs = jax.random.uniform(jax.random.key(0), (3, 8, 16, 16, 3))
    variables = model.init(
        jax.random.key(1), inputs, jax.random.key(2), mix_type=mix_type,
        train=True)

    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            inputs, jax.random.key(3), mix_type=mix_type, train=True,
            mutable=["batch_stats"])
        if mix_type in ("mopoe", "mmvae"):
            outs, mus, logvars = out
            rec = total_rec_loss(outs, inputs)
            kl = total_kl_loss(mus, logvars)
        elif mix_type == "mvae":
            rec, kl = mvae_loss(out, inputs)
        else:
            rec, kl = mvt_loss(out, inputs)
        return rec + kl

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.parametrize("mix_type", ["mopoe", "mmvae", "mvae", "mvt"])
def test_cond_gen_shapes(mix_type):
    model = _model(n_mod=3)
    inputs = jax.random.uniform(jax.random.key(0), (3, 8, 16, 16, 3))
    variables = model.init(
        jax.random.key(1), inputs, jax.random.key(2), mix_type="mmvae",
        train=True)
    present = jnp.array([True, False, True])
    outs = model.apply(
        variables, inputs, present, jax.random.key(4), mix_type,
        method=model.cond_gen)
    assert outs.shape == inputs.shape
    assert np.isfinite(np.array(outs)).all()


def test_unconditional_sample():
    model = _model(n_mod=3)
    inputs = jnp.zeros((3, 4, 16, 16, 3))
    variables = model.init(
        jax.random.key(0), inputs, jax.random.key(1), train=True)
    outs = model.apply(variables, jax.random.key(2), 6, method=model.sample)
    assert outs.shape == (3, 6, 16, 16, 3)


def test_kl_between_zero_for_identical():
    mu = jnp.ones((4, 3))
    logvar = jnp.zeros((4, 3))
    assert abs(float(kl_between(mu, logvar, mu, logvar))) < 1e-6
