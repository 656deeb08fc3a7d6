"""EBM tests: NCE training separates matched from shuffled pairs; guidance
transforms steer the sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from score_based_multimodal_autoencoder_tpu.diffusion import (
    VPSDE,
    conditional_sampler,
)
from score_based_multimodal_autoencoder_tpu.ebm import (
    PairwiseCoherenceEBM,
    make_ebm_train_step,
    make_pairwise_guidance,
    nce_loss,
    perturb_vp,
)


def _paired_latents(key, n, size_z):
    """Correlated pair: z2 = z1 + small noise (coherent structure)."""
    k1, k2 = jax.random.split(key)
    z1 = jax.random.normal(k1, (n, size_z))
    z2 = z1 + 0.1 * jax.random.normal(k2, (n, size_z))
    return z1, z2


def test_ebm_forward_contract():
    """cl(z_pair_flat, t, mod1, mod2) -> (B, n_class) per the reconstructed
    contract of the missing ClwithTime classes (SURVEY.md §7.3)."""
    ebm = PairwiseCoherenceEBM(size_z=8, n_mod=4, n_class=1, widths=(32, 32))
    z = jnp.zeros((5, 16))
    t = jnp.full((5,), 0.3)
    params = ebm.init(jax.random.key(0), z, t, 0, 1)
    out = ebm.apply(params, z, t, 0, 1)
    assert out.shape == (5, 1)
    # Different pair indices give different energies (embedding conditioning).
    out2 = ebm.apply(params, z, t, 2, 3)
    assert np.abs(np.array(out) - np.array(out2)).max() > 1e-6


def test_perturb_vp_marginal():
    sde = VPSDE()
    x = jnp.ones((512, 8))
    xt, t = perturb_vp(jax.random.key(0), x, sde)
    assert xt.shape == x.shape and t.shape == (512,)
    assert float(t.min()) >= 1e-5 and float(t.max()) <= 1.0


def test_nce_training_separates_pos_from_neg():
    sde = VPSDE()
    size_z = 8
    ebm = PairwiseCoherenceEBM(size_z=size_z, n_mod=2, widths=(64, 64))
    z = jnp.zeros((4, 2 * size_z))
    t = jnp.full((4,), 0.5)
    params = ebm.init(jax.random.key(0), z, t, 0, 1)["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = jax.jit(make_ebm_train_step(ebm, sde, tx))

    key = jax.random.key(1)
    for i in range(200):
        key, dkey, skey = jax.random.split(key, 3)
        z1, z2 = _paired_latents(dkey, 128, size_z)
        params, opt_state, loss = step(params, opt_state, z1, z2, 0, 1, skey)

    # Matched pairs must now score lower energy than shuffled ones at small t.
    z1, z2 = _paired_latents(jax.random.key(99), 256, size_z)
    t = jnp.full((256,), 0.05)
    e_pos = ebm.apply({"params": params}, jnp.concatenate([z1, z2], 1), t, 0, 1)
    z2_shuf = z2[jax.random.permutation(jax.random.key(5), 256)]
    e_neg = ebm.apply({"params": params}, jnp.concatenate([z1, z2_shuf], 1), t, 0, 1)
    assert float(e_pos.mean()) < float(e_neg.mean())


def test_guidance_transform_modifies_predicted_channels_only():
    size_z = 4  # 2x2 grid
    ebm = PairwiseCoherenceEBM(size_z=size_z, n_mod=3, widths=(16,))
    z = jnp.zeros((2, 2 * size_z))
    t = jnp.full((2,), 0.5)
    variables = ebm.init(jax.random.key(0), z, t, 0, 1)

    def efn(zf, tt, i, j):
        return ebm.apply(variables, zf, tt, i, j)

    energy_fns = {(0, 1): efn, (0, 2): efn, (1, 2): efn}
    observed = [True, False, False]
    x = jax.random.normal(jax.random.key(1), (2, 2, 2, 3))
    score = jnp.zeros_like(x)

    tr = make_pairwise_guidance(energy_fns, observed, cl_scale=10.0,
                                mode="predicted_only")
    out = tr(score, x, t, None)
    assert np.abs(np.array(out[..., 0])).max() == 0.0  # observed untouched
    assert np.abs(np.array(out[..., 1])).max() > 0.0
    assert np.abs(np.array(out[..., 2])).max() > 0.0

    tr_all = make_pairwise_guidance(energy_fns, observed, cl_scale=10.0,
                                    mode="all_pairs")
    out_all = tr_all(score, x, t, None)
    assert np.abs(np.array(out_all[..., 0])).max() > 0.0  # pair partner too


def test_guided_conditional_sampler_runs():
    sde = VPSDE(N=10)
    size_z = 4
    ebm = PairwiseCoherenceEBM(size_z=size_z, n_mod=2, widths=(16,))
    variables = ebm.init(
        jax.random.key(0), jnp.zeros((1, 2 * size_z)), jnp.full((1,), 0.5), 0, 1)

    def efn(zf, tt, i, j):
        return ebm.apply(variables, zf, tt, i, j)

    tr = make_pairwise_guidance({(0, 1): efn}, [True, False], 1.0)
    score_fn = lambda x, t: -x
    x_obs = jnp.ones((2, 2, 2, 2))
    out = conditional_sampler(
        jax.random.key(1), score_fn, sde, x_obs, jnp.array([True, False]),
        score_transform=tr,
    )
    assert np.isfinite(np.array(out)).all()
