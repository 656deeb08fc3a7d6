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


def test_adapt_pallas_for_mesh_promotes_to_shard_map(monkeypatch):
    """VERDICT r4 next #3: under a native-TPU >1-device mesh a model WITH
    the ``pallas_spmd_mesh`` knob keeps its kernels (shard_map promotion)
    instead of demoting to XLA; knob-less models still demote."""
    import numpy as np
    from jax.sharding import Mesh

    from score_based_multimodal_autoencoder_tpu.parallel import (
        adapt_pallas_for_mesh,
    )
    from score_based_multimodal_autoencoder_tpu.parallel import mesh as M

    model = LatentUNet(dim=12, init_dim=8, channels=2, dim_mults=(1, 2),
                       pallas_linear_attn=True)
    mesh8 = Mesh(np.array(jax.devices()[:8]), ("data",))

    # CPU backend: interpret mode partitions fine -> unchanged.
    assert adapt_pallas_for_mesh(model, mesh8) is model
    # Native TPU backend (faked): promoted, kernels STAY on.
    monkeypatch.setattr(M.jax, "default_backend", lambda: "tpu")
    adapted = adapt_pallas_for_mesh(model, mesh8)
    assert adapted.pallas_linear_attn
    assert adapted.pallas_spmd_mesh == mesh8
    # Idempotent: re-adapting the same mesh returns the model as-is.
    assert adapt_pallas_for_mesh(adapted, mesh8) is adapted
    # No mesh / 1-device mesh: unchanged.
    assert adapt_pallas_for_mesh(model, None) is model


def test_spmd_mesh_kernel_equivalence():
    """The shard_mapped Pallas sites must reproduce the meshless kernel
    output exactly (same kernel, per-device batch tiles; interpret mode on
    the 8-device CPU mesh), including through the differentiable VJP
    variant's gradients, and fall back per-site for non-divisible
    batches."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1),
                ("data", "fleet"))
    B, hw, C = 16, 8, 4
    x = jax.random.normal(jax.random.key(0), (B, hw, hw, C))
    t = jnp.full((B,), 0.5)
    base = LatentUNet(dim=16, init_dim=16, channels=C, dim_mults=(1, 2),
                      pallas_linear_attn=True)
    params = base.init(jax.random.key(1), x, t)
    ref = base.apply(params, x, t)

    spmd = base.clone(pallas_spmd_mesh=mesh)
    dat = NamedSharding(mesh, P("data"))
    out = jax.jit(lambda p, xx: spmd.apply(p, xx, t))(
        params, jax.device_put(x, dat))
    # Not bitwise: the surrounding convs/norms compile differently under
    # the sharded program (measured ~2e-5); the kernel itself is the same.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # Differentiable variant: grads match the meshless VJP kernel.
    vjp_m = base.clone(pallas_attn_vjp=True, pallas_spmd_mesh=mesh)
    vjp_ref = base.clone(pallas_attn_vjp=True)

    def loss(m, p, xx, tt):
        return jnp.sum(m.apply(p, xx, tt) ** 2)

    g1 = jax.jit(jax.grad(
        lambda p: loss(vjp_m, p, jax.device_put(x, dat), t)))(params)
    g2 = jax.grad(lambda p: loss(vjp_ref, p, x, t))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        # Per-leaf relative parity (measured ~3e-6; grads reach ~2.5e4
        # magnitude under the sum-of-squares probe loss).
        scale = float(np.max(np.abs(np.asarray(b)))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=1e-4)

    # Non-divisible batch: the per-site gate falls back to the XLA
    # composition instead of crashing shard_map.
    out2 = spmd.apply(params, x[:10], jnp.full((10,), 0.5))
    assert out2.shape == (10, hw, hw, C)
    assert bool(jnp.isfinite(out2).all())


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


def test_non_pallas_error_on_pallas_pipeline_does_not_demote(tiny_parts):
    """ADVICE r4: a NON-Pallas-shaped error (bad input shape) on a
    Pallas-ENABLED pipeline must propagate as itself - no misleading
    'Pallas sampling path failed' warning, and no permanent demotion to
    the slower XLA path for subsequent valid calls."""
    import warnings

    fleet, fleet_state, model, params, hw = tiny_parts
    pipe = SBMAEPipeline(
        fleet=fleet, fleet_state=fleet_state, score_model=model,
        score_params=params, sde=VPSDE(N=5), latent_hw=hw)
    assert pipe.score_model.pallas_linear_attn
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> failure
        with pytest.raises(Exception) as ei:
            pipe.sample_conditional(
                jax.random.key(0), jnp.zeros((2, 4, 8, 8, 3)), [99])
    assert "Pallas" not in str(ei.value)
    assert pipe.score_model.pallas_linear_attn  # kernel stays enabled
    # A subsequent VALID call still runs (on the Pallas-enabled model).
    out = pipe.sample_conditional(
        jax.random.key(1), jnp.zeros((2, 4, 32, 32, 3)), [1])
    assert out.shape == (2, 4, 32, 32, 3)
