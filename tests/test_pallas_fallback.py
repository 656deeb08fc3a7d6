"""Product-level Pallas escape hatch (VERDICT r3 next #4): a pallas_call
that fails to compile/run must degrade pipeline generation to the XLA
attention path with a warning - not kill the CLI (the round-3 driver run
died with a Mosaic SIGABRT behind an opaque remote-compile error)."""

import jax
import jax.numpy as jnp
import optax
import pytest

from score_based_multimodal_autoencoder_tpu.diffusion import VPSDE
from score_based_multimodal_autoencoder_tpu.models import ResVAE
from score_based_multimodal_autoencoder_tpu.nn import LatentUNet
from score_based_multimodal_autoencoder_tpu.parallel import VAEFleet
from score_based_multimodal_autoencoder_tpu.pipeline import SBMAEPipeline


@pytest.fixture(scope="module")
def tiny_parts():
    n_mod, hw = 2, 4
    vae = ResVAE(
        enc_channel_list=((8, 8, 8, 2), (8, 16, 16, 2)),
        dec_channel_list=((16, 8, 8, 2), (8, 8, 8, 2)),
        size_in=32, size_z=16, img_ch=3, variant="poly",
    )
    fleet = VAEFleet(vae, n_mod, optax.adam(1e-3), beta=0.5)
    fleet_state = fleet.init(
        jax.random.key(0), jnp.zeros((8, 32, 32, 3)))
    model = LatentUNet(dim=12, init_dim=8, channels=n_mod, dim_mults=(1, 2),
                       pallas_linear_attn=True)
    grid = jnp.zeros((4, hw, hw, n_mod))
    params = model.init(jax.random.key(1), grid, jnp.full((4,), 0.5))["params"]
    return fleet, fleet_state, model, params, hw


def _broken(*a, **kw):
    raise RuntimeError(
        "INTERNAL: remote_compile: HTTP 500: tpu_compile_helper "
        "subprocess exit signal SIGABRT (6)")


def test_pipeline_falls_back_to_xla_on_pallas_failure(tiny_parts, monkeypatch):
    from score_based_multimodal_autoencoder_tpu.ops import linear_attention

    monkeypatch.setattr(linear_attention, "fused_attention_block", _broken)
    monkeypatch.setattr(linear_attention, "fused_linear_attention", _broken)

    fleet, fleet_state, model, params, hw = tiny_parts
    pipe = SBMAEPipeline(
        fleet=fleet, fleet_state=fleet_state, score_model=model,
        score_params=params, sde=VPSDE(N=5), latent_hw=hw)
    assert pipe.score_model.pallas_linear_attn
    with pytest.warns(UserWarning, match="Pallas sampling path failed"):
        out = pipe.sample_unconditional(jax.random.key(0), 4)
    assert out.shape == (2, 4, 32, 32, 3)
    assert not pipe.score_model.pallas_linear_attn  # rebuilt with XLA path
    # Subsequent calls stay on the XLA path with no further warnings.
    out2 = pipe.sample_conditional(
        jax.random.key(1), jnp.zeros((2, 4, 32, 32, 3)), [1])
    assert out2.shape == (2, 4, 32, 32, 3)


def test_demote_pallas_for_mesh_logic(monkeypatch):
    """XLA SPMD cannot partition a pallas_call: under a >1-device mesh on
    the native TPU backend, trainers/pipelines must rebuild with the XLA
    attention path; CPU meshes (interpret mode) and 1-device meshes are
    left alone (parallel/mesh.py demote_pallas_for_mesh)."""
    import numpy as np
    from jax.sharding import Mesh

    from score_based_multimodal_autoencoder_tpu.parallel import (
        demote_pallas_for_mesh,
    )
    from score_based_multimodal_autoencoder_tpu.parallel import mesh as M

    model = LatentUNet(dim=12, init_dim=8, channels=2, dim_mults=(1, 2),
                       pallas_linear_attn=True, pallas_attn_vjp=True)
    mesh8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))

    # CPU backend (this test env): interpret mode partitions fine -> no-op.
    assert demote_pallas_for_mesh(model, mesh8) is model
    # Native TPU backend (faked): demoted under >1 device, kept under 1.
    monkeypatch.setattr(M.jax, "default_backend", lambda: "tpu")
    with pytest.warns(UserWarning, match="cannot partition"):
        demoted = demote_pallas_for_mesh(model, mesh8)
    assert not demoted.pallas_linear_attn and not demoted.pallas_attn_vjp
    assert demote_pallas_for_mesh(model, mesh1) is model
    assert demote_pallas_for_mesh(model, None) is model
    # Models without the knob pass through.
    plain = LatentUNet(dim=12, init_dim=8, channels=2, dim_mults=(1, 2))
    assert demote_pallas_for_mesh(plain, mesh8) is plain


def test_non_pallas_errors_propagate(tiny_parts):
    fleet, fleet_state, model, params, hw = tiny_parts
    pipe = SBMAEPipeline(
        fleet=fleet, fleet_state=fleet_state,
        score_model=model.clone(pallas_linear_attn=False),
        score_params=params, sde=VPSDE(N=5), latent_hw=hw)
    # A genuine error on an XLA-path model must NOT be swallowed.
    with pytest.raises(Exception):
        pipe.sample_conditional(
            jax.random.key(0), jnp.zeros((2, 4, 8, 8, 3)), [99])
