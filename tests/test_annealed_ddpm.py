"""Annealed Langevin + DDPM refiner tests."""

import jax
import jax.numpy as jnp
import numpy as np

from score_based_multimodal_autoencoder_tpu.diffusion.annealed import (
    annealed_langevin_sampler,
    plain_langevin_sampler,
)
from score_based_multimodal_autoencoder_tpu.diffusion.ddpm import (
    DDPMSchedule,
    ddpm_refiner_loss,
    ddpm_refiner_sample,
    q_sample,
)


def test_annealed_langevin_clamps_and_converges():
    """Score of N(mu=2, sigma^2) per sigma-level pulls predicted channels
    toward 2 while observed channels stay fixed."""

    def score_fn(x, level_idx, sigma):
        # sigma-conditioned score of N(2, 1+sigma^2), scaled by sigma as the
        # NCSN convention expects (the sampler divides by sigma).
        s = sigma.reshape(-1, 1, 1, 1)
        return -(x - 2.0) / (1.0 + s**2) * s

    x0 = jnp.zeros((4, 2, 2, 3))
    mask = jnp.array([True, False, True])  # predict channels 0 and 2
    # alpha = er * sigma_l^2/sigma_min^2 can reach er*(max/min)^2; keep the
    # product ~1 so the toy dynamics stay in the stable-step regime, as the
    # reference's tuned (er, c) grids do.
    out = annealed_langevin_sampler(
        jax.random.key(0), score_fn, x0, mask,
        sigma_max=1.0, sigma_min=0.1, n_levels=50, er=0.01, c=0.1, iter_num=5,
    )
    np.testing.assert_array_equal(np.array(out[..., 1]), 0.0)  # clamped
    assert abs(float(out[..., 0].mean()) - 2.0) < 0.5
    assert np.isfinite(np.array(out)).all()


def test_plain_langevin_masks_and_schedule():
    score_fn = lambda z: -(z - 1.0)
    z0 = jnp.zeros((8, 6))
    mask = jnp.array([True] * 3 + [False] * 3)
    out = plain_langevin_sampler(
        jax.random.key(0), score_fn, z0, mask, lr1=0.2, lr2=0.01, n_comp=50)
    np.testing.assert_array_equal(np.array(out[:, 3:]), 0.0)
    assert abs(float(out[:, :3].mean()) - 1.0) < 0.3
    out_s = plain_langevin_sampler(
        jax.random.key(0), score_fn, z0, mask, lr1=0.2, lr2=0.01, n_comp=50,
        schedule=True)
    assert np.isfinite(np.array(out_s)).all()


def test_ddpm_schedule_tables():
    sch = DDPMSchedule(timesteps=100)
    tab = sch.tables()
    assert tab["betas"].shape == (100,)
    np.testing.assert_allclose(float(tab["betas"][0]), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(tab["betas"][-1]), 0.02, rtol=1e-6)
    # Variance preserving: sqrt_ac^2 + sqrt_1m_ac^2 = 1.
    np.testing.assert_allclose(
        np.array(tab["sqrt_alphas_cumprod"]) ** 2
        + np.array(tab["sqrt_1m_alphas_cumprod"]) ** 2,
        1.0, rtol=1e-5,
    )


def test_q_sample_endpoints():
    sch = DDPMSchedule(timesteps=100)
    x0 = jnp.ones((2, 2, 2, 1))
    noise = jnp.full_like(x0, 0.5)
    t0 = jnp.zeros((2,), jnp.int32)
    xt = q_sample(sch, x0, t0, noise)
    # At t=0 nearly all signal.
    assert abs(float(xt.mean()) - 1.0) < 0.05
    tT = jnp.full((2,), 99, jnp.int32)
    xT = q_sample(sch, x0, tT, noise)
    # Closed form: sqrt(prod alphas)*1 + sqrt(1-prod alphas)*0.5.
    ac = np.prod(1.0 - np.linspace(1e-4, 0.02, 100))
    np.testing.assert_allclose(
        float(xT.mean()), np.sqrt(ac) + np.sqrt(1 - ac) * 0.5, rtol=1e-4
    )


def test_ddpm_loss_and_sample_run():
    sch = DDPMSchedule(timesteps=20)

    def denoise_fn(x_and_cond, t):
        return jnp.zeros_like(x_and_cond[..., :1])

    x0 = jnp.zeros((2, 4, 4, 1))
    cond = jnp.zeros((2, 4, 4, 1))
    loss = ddpm_refiner_loss(jax.random.key(0), denoise_fn, sch, x0, cond)
    assert 0.5 < float(loss) < 1.5  # E||eps||^2 ~ 1 with zero prediction
    out = ddpm_refiner_sample(jax.random.key(1), denoise_fn, sch, cond, x0.shape)
    assert out.shape == x0.shape and np.isfinite(np.array(out)).all()
