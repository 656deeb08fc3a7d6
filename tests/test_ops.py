"""Pallas fused GroupNorm+act: parity with flax GroupNorm (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from score_based_multimodal_autoencoder_tpu.ops import fused_group_norm_act


def _ref(x, gamma, beta, groups, act):
    gn = nn.GroupNorm(num_groups=groups, use_bias=False, use_scale=False)
    y = gn.init_with_output(jax.random.key(0), x)[0]
    y = y * gamma + beta
    return {"silu": nn.silu, "gelu": nn.gelu, "none": lambda v: v}[act](y)


@pytest.mark.parametrize("act", ["silu", "gelu", "none"])
@pytest.mark.parametrize("groups,C", [(8, 64), (1, 48), (4, 16)])
def test_forward_matches_flax_groupnorm(act, groups, C):
    x = jax.random.normal(jax.random.key(1), (2, 4, 4, C))
    gamma = jax.random.normal(jax.random.key(2), (C,)) * 0.1 + 1.0
    beta = jax.random.normal(jax.random.key(3), (C,)) * 0.1
    out = fused_group_norm_act(x, gamma, beta, groups, 1e-5, act, True)
    ref = _ref(x, gamma, beta, groups, act)
    np.testing.assert_allclose(np.array(out), np.array(ref), rtol=2e-5, atol=2e-5)


def test_gradients_match_autodiff_reference():
    groups, C = 4, 16
    x = jax.random.normal(jax.random.key(1), (2, 4, 4, C))
    gamma = jnp.ones((C,)) * 1.2
    beta = jnp.zeros((C,)) + 0.1
    cot = jax.random.normal(jax.random.key(4), x.shape)

    def ours(x, gamma, beta):
        return jnp.vdot(
            fused_group_norm_act(x, gamma, beta, groups, 1e-5, "silu", True), cot)

    def ref(x, gamma, beta):
        return jnp.vdot(_ref(x, gamma, beta, groups, "silu"), cot)

    g_ours = jax.grad(ours, argnums=(0, 1, 2))(x, gamma, beta)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-4, atol=1e-4)


def test_bf16_input_dtype_preserved():
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 16), jnp.bfloat16)
    out = fused_group_norm_act(
        x, jnp.ones((16,)), jnp.zeros((16,)), 4, 1e-5, "silu", True)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.array(out, np.float32)).all()
