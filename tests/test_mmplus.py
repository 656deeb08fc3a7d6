"""MMVAE+ tests: Laplace math, forward matrix structure, IWAE/DReG bounds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.models.baselines.mmplus import (
    MMVAEPlus,
    _softmax_scale,
    laplace_log_prob,
    laplace_rsample,
)
from score_based_multimodal_autoencoder_tpu.models.baselines.mmplus_losses import (
    m_dreg,
    m_iwae,
)

ENC = ((8, 8, 8, 2), (8, 16, 16, 2))
DEC = ((16, 8, 8, 2), (8, 8, 8, 2))


def _model(n_mod=2):
    return MMVAEPlus(
        n_mod=n_mod, latent_dim_w=4, latent_dim_z=4,
        enc_channel_list=ENC, dec_channel_list=DEC, size_in=16, img_ch=3)


def test_laplace_sampling_stats():
    loc = jnp.full((20000,), 2.0)
    scale = jnp.full((20000,), 0.5)
    x = laplace_rsample(jax.random.key(0), loc, scale)
    assert abs(float(x.mean()) - 2.0) < 0.05
    # Laplace variance = 2 b^2 = 0.5 -> std ~ 0.707.
    assert abs(float(x.std()) - np.sqrt(0.5)) < 0.05


def test_laplace_log_prob():
    lp = laplace_log_prob(jnp.array(1.0), 1.0, 2.0)
    np.testing.assert_allclose(float(lp), -np.log(4.0), rtol=1e-6)


def test_softmax_scale():
    raw = jnp.zeros((2, 8))
    s = _softmax_scale(raw)
    np.testing.assert_allclose(np.array(s), 1.0 + 1e-6, rtol=1e-5)


@pytest.fixture(scope="module")
def mmplus_setup():
    model = _model(n_mod=2)
    x = jax.random.uniform(jax.random.key(0), (2, 4, 16, 16, 3))
    variables = model.init(jax.random.key(1), x, jax.random.key(2), K=2,
                           train=True)
    return model, variables, x


def test_forward_matrix_shapes(mmplus_setup):
    model, variables, x = mmplus_setup
    out, _ = model.apply(variables, x, jax.random.key(3), 2, True,
                         mutable=["batch_stats"])
    assert out["us"].shape == (2, 2, 4, 8)  # (n_mod, K, B, dim_u)
    assert out["recon_locs"].shape == (2, 2, 2, 4, 16, 16, 3)
    assert out["q_loc"].shape == (2, 4, 8)


def test_iwae_and_dreg_finite_with_grads(mmplus_setup):
    model, variables, x = mmplus_setup

    def iwae_loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, jax.random.key(4), 2, True, mutable=["batch_stats"])
        return -m_iwae(out, x, beta=1.0, latent_dim_w=4)

    loss, grads = jax.value_and_grad(iwae_loss)(variables["params"])
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gn) and gn > 0

    def dreg_loss(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        out, _ = model.apply(v, x, jax.random.key(4), 2, True,
                             mutable=["batch_stats"])

        def decode_fn(us, fresh_w):
            return model.apply(v, us, fresh_w, True,
                               method=model.decode_matrix,
                               mutable=["batch_stats"])[0]

        return -m_dreg(out, x, beta=1.0, latent_dim_w=4, decode_fn=decode_fn)

    loss2, grads2 = jax.value_and_grad(dreg_loss)(variables["params"])
    assert np.isfinite(float(loss2))
    gn2 = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads2))
    assert np.isfinite(gn2) and gn2 > 0


def test_iwae_improves_with_better_recon(mmplus_setup):
    """Sanity: if recon_locs exactly match the data, lpx rises and the
    bound must be higher than with random recons."""
    model, variables, x = mmplus_setup
    out, _ = model.apply(variables, x, jax.random.key(5), 1, True,
                         mutable=["batch_stats"])
    perfect = dict(out)
    n = 2
    perfect["recon_locs"] = jnp.broadcast_to(
        jnp.asarray(x)[None, :, None], out["recon_locs"].shape)
    assert float(m_iwae(perfect, x, latent_dim_w=4)) > float(
        m_iwae(out, x, latent_dim_w=4))


def test_generate_and_cond_gen(mmplus_setup):
    model, variables, x = mmplus_setup
    gen = model.apply(variables, jax.random.key(6), 3, method=model.generate)
    assert gen.shape == (2, 3, 16, 16, 3)
    cond = model.apply(variables, x, jnp.array([0]), jax.random.key(7),
                       method=model.cond_gen)
    assert cond.shape == (2, 4, 16, 16, 3)
    assert np.isfinite(np.array(cond)).all()


def test_mmplus_arch_nets():
    """The MMVAE+-specific dual-branch ResnetBlock nets
    (h_vae_model_copy.py:826-1084) slot into the same model via
    ``arch='mmplus'``: forward matrix, IWAE loss and generation all run."""
    model = MMVAEPlus(n_mod=2, latent_dim_w=4, latent_dim_z=4, size_in=16,
                      img_ch=3, arch="mmplus", nf=8, nf_max=32)
    x = jax.random.uniform(jax.random.key(0), (2, 4, 16, 16, 3))
    variables = model.init(jax.random.key(1), x, jax.random.key(2), K=2,
                           train=True)
    out = model.apply(variables, x, jax.random.key(3), 2, True)
    assert out["recon_locs"].shape == (2, 2, 2, 4, 16, 16, 3)
    assert np.isfinite(np.asarray(out["recon_locs"])).all()
    loss = m_iwae(out, x, latent_dim_w=4)
    assert np.isfinite(float(loss))
    gen = model.apply(variables, jax.random.key(4), 3, False,
                      method=model.generate)
    assert gen.shape == (2, 3, 16, 16, 3)


def test_mmplus_encoder_branch_independence():
    """The w branch must not see the z branch's params: perturbing the
    z-branch conv leaves mu_w unchanged (dual independent encoders,
    h_vae_model_copy.py:838-858)."""
    from score_based_multimodal_autoencoder_tpu.models.baselines.mmplus_nets import (
        MMPlusEncoder,
    )

    enc = MMPlusEncoder(size_in=16, size_z=8, s0=4, nf=8, nf_max=16)
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    variables = enc.init(jax.random.key(1), x)
    mu, lv = enc.apply(variables, x)
    assert mu.shape == lv.shape == (2, 8)
    import flax

    p = flax.core.unfreeze(variables["params"])
    p["branch_z"]["conv_img"]["kernel"] = (
        p["branch_z"]["conv_img"]["kernel"] + 1.0)
    mu2, _ = enc.apply({"params": p}, x)
    np.testing.assert_array_equal(np.asarray(mu[:, :4]),
                                  np.asarray(mu2[:, :4]))
    assert np.abs(np.asarray(mu[:, 4:] - mu2[:, 4:])).max() > 1e-4
