"""Mesh-sharded generation: pipeline sampling DP-shards over devices."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from score_based_multimodal_autoencoder_tpu.models import ResVAE
from score_based_multimodal_autoencoder_tpu.nn import LatentUNet
from score_based_multimodal_autoencoder_tpu.parallel import VAEFleet, make_mesh
from score_based_multimodal_autoencoder_tpu.diffusion import VPSDE
from score_based_multimodal_autoencoder_tpu.pipeline import SBMAEPipeline


def _build(mesh=None):
    vae = ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)), ((16, 8, 8, 2), (8, 8, 8, 2)),
                 size_in=16, size_z=16, img_ch=3, variant="poly")
    fleet = VAEFleet(vae, 2, optax.adam(1e-3))
    fleet_state = fleet.init(jax.random.key(0), jnp.zeros((4, 16, 16, 3)))
    model = LatentUNet(dim=12, init_dim=8, channels=2, dim_mults=(1, 2))
    grid0 = jnp.zeros((4, 4, 4, 2))
    params = model.init(jax.random.key(1), grid0, jnp.full((4,), 0.5))["params"]
    return SBMAEPipeline(
        fleet=fleet, fleet_state=fleet_state, score_model=model,
        score_params=params, sde=VPSDE(N=6), latent_hw=4, mesh=mesh)


def test_sharded_sampling_matches_single_device():
    mesh = make_mesh(fleet_size=1)
    single = _build(mesh=None)
    sharded = _build(mesh=mesh)

    out_a = single.sample_unconditional(jax.random.key(2), 16)
    out_b = sharded.sample_unconditional(jax.random.key(2), 16)
    assert len(out_b.sharding.device_set) == 8  # batch spread over the mesh
    # SPMD partitioning reassociates matmul reductions; the reverse SDE
    # amplifies those last-ulp differences over steps. Same RNG + same
    # trajectory structure -> near-identical samples, not bitwise.
    np.testing.assert_allclose(np.array(out_a), np.array(out_b), atol=0.05)
    assert np.abs(np.array(out_a) - np.array(out_b)).mean() < 0.005

    pixels = jax.random.uniform(jax.random.key(3), (2, 16, 16, 16, 3))
    cond_a = single.sample_conditional(jax.random.key(4), pixels, [1])
    cond_b = sharded.sample_conditional(jax.random.key(4), pixels, [1])
    np.testing.assert_allclose(np.array(cond_a), np.array(cond_b), atol=0.05)
    np.testing.assert_array_equal(np.array(cond_b[0]), np.array(pixels[0]))


def test_heterogeneous_sharded_matches_single_device():
    """HeterogeneousPipeline(mesh=...) DP-shards CelebA-style generation
    (leading-batch-axis analogue of the fleet pipeline's sharding)."""
    from score_based_multimodal_autoencoder_tpu.models import (
        AttributeVAE,
        ResVAE,
    )
    from score_based_multimodal_autoencoder_tpu.pipeline_celeba import (
        HeterogeneousPipeline,
        Modality,
    )

    size, z, hw, B = 16, 16, 4, 8
    img_vae = ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)),
                     ((16, 8, 8, 2), (8, 8, 8, 2)),
                     size_in=size, size_z=z, img_ch=3, variant="celeb")
    attr_vae = AttributeVAE(size_z=z, att_size=18)
    images = jax.random.uniform(jax.random.key(0), (B, size, size, 3))
    attrs = (jax.random.uniform(jax.random.key(1), (B, 18)) > 0.5).astype(
        jnp.float32)
    mods = []
    for name, model, x in [("image", img_vae, images), ("attr", attr_vae, attrs)]:
        variables = model.init(jax.random.key(2), x, key=jax.random.key(3),
                               train=True)
        mods.append(Modality(name, model, variables))
    score_model = LatentUNet(dim=12, init_dim=8, channels=2, dim_mults=(1, 2))
    grid0 = jnp.zeros((B, hw, hw, 2))
    score_params = score_model.init(
        jax.random.key(4), grid0, jnp.full((B,), 0.5))["params"]

    def build(mesh):
        return HeterogeneousPipeline(
            modalities=mods, score_model=score_model,
            score_params=score_params, sde=VPSDE(N=6), latent_hw=hw,
            mesh=mesh)

    single, sharded = build(None), build(make_mesh(fleet_size=1))

    out_a = single.sample_unconditional(jax.random.key(5), 8)
    out_b = sharded.sample_unconditional(jax.random.key(5), 8)
    assert len(out_b[0].sharding.device_set) == 8
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=0.05)

    cond_a = single.sample_conditional(jax.random.key(6), [images, attrs],
                                       [True, False])
    cond_b = sharded.sample_conditional(jax.random.key(6), [images, attrs],
                                        [True, False])
    for a, b in zip(cond_a, cond_b):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=0.05)


def test_bake_params_matches_default():
    """bake_params=True (weights embedded as HLO constants - the measured
    +10% small-model path) matches argument plumbing: same math, but XLA
    specializes constant-operand programs (folding/reassociation), and the
    100-step sampler scan amplifies those ULP-level differences (observed
    up to ~1.4e-4 absolute on [0,1] pixels) - so tolerance, not equality."""
    default = _build()
    baked = _build()
    baked.bake_params = True

    out_a = default.sample_unconditional(jax.random.key(5), 8)
    out_b = baked.sample_unconditional(jax.random.key(5), 8)
    np.testing.assert_allclose(np.array(out_a), np.array(out_b), atol=2e-3)

    pixels = jax.random.uniform(jax.random.key(6), (2, 8, 16, 16, 3))
    cond_a = default.sample_conditional(jax.random.key(7), pixels, [1])
    cond_b = baked.sample_conditional(jax.random.key(7), pixels, [1])
    np.testing.assert_allclose(np.array(cond_a), np.array(cond_b), atol=2e-3)
