"""Pallas fused GroupNorm+act: parity with flax GroupNorm (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from score_based_multimodal_autoencoder_tpu.ops import fused_group_norm_act


def _ref(x, gamma, beta, groups, act):
    gn = nn.GroupNorm(num_groups=groups, use_bias=False, use_scale=False,
                      epsilon=1e-5)
    y = gn.init_with_output(jax.random.key(0), x)[0]
    y = y * gamma + beta
    # Exact-erf GELU: the kernel matches torch nn.GELU() (see nn/blocks.py).
    return {"silu": nn.silu,
            "gelu": lambda v: nn.gelu(v, approximate=False),
            "none": lambda v: v}[act](y)


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


def test_fused_linear_attention_matches_xla_composition():
    """The Pallas linear-attention kernel == the XLA einsum composition in
    nn.blocks.LinearAttention (same channel-contiguous split, f32
    softmaxes, q scale)."""
    from score_based_multimodal_autoencoder_tpu.ops.linear_attention import (
        fused_linear_attention,
    )

    heads, d = 4, 32
    hidden = heads * d
    B, N = 4, 64
    qkv = jax.random.normal(jax.random.key(0), (B, N, 3 * hidden))
    got = fused_linear_attention(qkv, heads, d, interpret=True)

    q, k, v = [p.reshape(B, N, heads, d) for p in jnp.split(qkv, 3, axis=-1)]
    q = nn.softmax(q, axis=-1) * d ** -0.5
    k = nn.softmax(k, axis=1)
    context = jnp.einsum("bnhd,bnhe->bhde", k, v)
    want = jnp.einsum("bhde,bnhd->bnhe", context, q).reshape(B, N, hidden)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_linear_attention_odd_batch_tile():
    """Auto tile sizing must pick the largest DIVISOR of B under the
    ~2048-row target, not halve until it divides: B=9, N=250 targets
    bt=8, whose largest divisor of 9 is 3 (halving would degenerate to
    bt=1, re-entering the tiny-program-overhead regime)."""
    from score_based_multimodal_autoencoder_tpu.ops.linear_attention import (
        fused_linear_attention,
    )

    heads, d = 2, 8
    hidden = heads * d
    B, N = 9, 250
    qkv = jax.random.normal(jax.random.key(3), (B, N, 3 * hidden))
    got = fused_linear_attention(qkv, heads, d, interpret=True)

    q, k, v = [p.reshape(B, N, heads, d) for p in jnp.split(qkv, 3, axis=-1)]
    q = nn.softmax(q, axis=-1) * d ** -0.5
    k = nn.softmax(k, axis=1)
    context = jnp.einsum("bnhd,bnhe->bhde", k, v)
    want = jnp.einsum("bhde,bnhd->bnhe", context, q).reshape(B, N, hidden)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=2e-5, atol=2e-5)


def test_linear_attention_module_pallas_flag_matches():
    """LinearAttention(pallas_attn=True) produces the same outputs as the
    default path with identical params (sampling-time swap is lossless)."""
    from score_based_multimodal_autoencoder_tpu.nn.blocks import (
        LinearAttention,
    )

    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 16))
    ref_mod = LinearAttention()
    params = ref_mod.init(jax.random.key(2), x)
    want = ref_mod.apply(params, x)
    got = LinearAttention(pallas_attn=True).apply(params, x)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("B,HW", [(2, 4), (2, 8), (3, 16), (5, 4)])
def test_block_fusion_through_prenorm_residual(dtype, B, HW):
    """The WHOLE-block kernel path (PreNormResidual -> wants_block_fusion ->
    fused_attention_block) == the unfused composition with shared params.

    This is the route the shipped sampling presets take (pre_gn handed to
    the child, nn/blocks.py:423-426) - the round-3 regression shipped
    because no test exercised it (VERDICT r3 weak #2). Covers bf16 + f32,
    N in {16, 64, 256} and a batch (5) that does not divide the default
    tile. bf16 tolerance is loose: the kernel computes everything in f32
    (the HIGHER-precision side; measured ~2e-2 max-abs vs the bf16
    composition, see BASELINE.md round 4)."""
    from score_based_multimodal_autoencoder_tpu.nn.blocks import (
        LinearAttention,
        PreNormResidual,
    )

    C = 32
    x = jax.random.normal(jax.random.key(1), (B, HW, HW, C), dtype)
    ref_mod = PreNormResidual(LinearAttention(heads=2, dim_head=8,
                                              dtype=dtype))
    fused_mod = PreNormResidual(
        LinearAttention(heads=2, dim_head=8, dtype=dtype, pallas_attn=True,
                        pallas_min_positions=16, pallas_block=True))
    assert fused_mod.fn.wants_block_fusion(x.shape)
    params = ref_mod.init(jax.random.key(2), x)
    # Checkpoint-identical trees: the fused path must init the SAME params.
    fused_params = fused_mod.init(jax.random.key(2), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(fused_params))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(fused_params)):
        assert a.shape == b.shape and a.dtype == b.dtype
    want = ref_mod.apply(params, x)
    got = fused_mod.apply(params, x)
    tol = 3e-5 if dtype == jnp.float32 else 4e-2
    assert got.dtype == want.dtype
    np.testing.assert_allclose(np.array(got, np.float32),
                               np.array(want, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("segmm", [False, True])
def test_attn_body_formulations_match(segmm):
    """The two joint-head body formulations - concat per-head reduces vs
    the MXU segment-matmul softmax (per-head max shift + block-diagonal
    ones denominator) - are mathematically identical; both must match the
    XLA einsum composition (ops/linear_attention.py _attn_body)."""
    from score_based_multimodal_autoencoder_tpu.ops.linear_attention import (
        fused_attention_block,
        fused_linear_attention,
    )

    heads, d = 4, 32
    hidden = heads * d
    B, N, C = 3, 64, 96
    qkv = jax.random.normal(jax.random.key(0), (B, N, 3 * hidden)) * 3
    got = fused_linear_attention(qkv, heads, d, interpret=True, segmm=segmm)
    q, k, v = [p.reshape(B, N, heads, d) for p in jnp.split(qkv, 3, axis=-1)]
    q = nn.softmax(q, axis=-1) * d ** -0.5
    k = nn.softmax(k, axis=1)
    context = jnp.einsum("bnhd,bnhe->bhde", k, v)
    want = jnp.einsum("bhde,bnhd->bnhe", context, q).reshape(B, N, hidden)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=2e-5, atol=2e-5)

    ks = jax.random.split(jax.random.key(1), 8)
    x = jax.random.normal(ks[0], (B, N, C))
    args = (x, jnp.ones((C,)), jnp.zeros((C,)),
            jax.random.normal(ks[3], (C, 3 * hidden)) * 0.05,
            jax.random.normal(ks[4], (hidden, C)) * 0.05,
            jnp.zeros((C,)), jnp.ones((C,)), jnp.zeros((C,)))
    blk = fused_attention_block(*args, interpret=True, segmm=segmm)
    ref = fused_attention_block(*args, interpret=True, segmm=False)
    np.testing.assert_allclose(np.array(blk), np.array(ref),
                               rtol=2e-5, atol=2e-5)


def test_segmm_softmax_no_underflow_with_offset_head():
    """ADVICE r4 regression: with one head's q logits offset +200, a
    row-GLOBAL max shift underflows exp() for every OTHER head (their
    logits sit ~200 below the row max), zeroing the segment denominator
    and NaN-ing the output. The per-head shift must stay finite and match
    the XLA composition in forward AND backward (the bwd kernel recomputes
    the same softmax)."""
    from score_based_multimodal_autoencoder_tpu.ops.linear_attention import (
        fused_linear_attention,
        fused_linear_attention_vjp,
    )

    heads, d = 4, 32
    hidden = heads * d
    B, N = 2, 32
    qkv = jax.random.normal(jax.random.key(0), (B, N, 3 * hidden))
    # Head 0's q logits dominate the row by +200.
    qkv = qkv.at[:, :, :d].add(200.0)

    q, k, v = [p.reshape(B, N, heads, d) for p in jnp.split(qkv, 3, axis=-1)]
    q = nn.softmax(q, axis=-1) * d ** -0.5
    k = nn.softmax(k, axis=1)
    context = jnp.einsum("bnhd,bnhe->bhde", k, v)
    want = jnp.einsum("bhde,bnhd->bnhe", context, q).reshape(B, N, hidden)

    got = fused_linear_attention(qkv, heads, d, interpret=True, segmm=True)
    assert np.isfinite(np.array(got)).all()
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=2e-5, atol=2e-5)

    cot = jax.random.normal(jax.random.key(1), (B, N, hidden))
    g = jax.grad(lambda x: jnp.vdot(
        fused_linear_attention_vjp(x, heads, d, None, True), cot))(qkv)
    assert np.isfinite(np.array(g)).all()


def test_pallas_vjp_grads_match_xla_composition():
    """fused_linear_attention_vjp's hand-derived backward kernel ==
    autodiff of the XLA einsum composition (the training-side kernel,
    VERDICT r3 next #9; ops/linear_attention.py _linear_attn_bwd_kernel)."""
    from score_based_multimodal_autoencoder_tpu.ops.linear_attention import (
        fused_linear_attention_vjp,
    )

    heads, d = 4, 32
    hidden = heads * d
    B, N = 3, 64
    qkv = jax.random.normal(jax.random.key(0), (B, N, 3 * hidden)) * 2
    cot = jax.random.normal(jax.random.key(1), (B, N, hidden))

    def xla_ref(qkv):
        q, k, v = [p.reshape(B, N, heads, d)
                   for p in jnp.split(qkv, 3, axis=-1)]
        q = nn.softmax(q, axis=-1) * d ** -0.5
        k = nn.softmax(k, axis=1)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        return jnp.einsum("bhde,bnhd->bnhe", context, q).reshape(B, N, hidden)

    def ours(qkv):
        return fused_linear_attention_vjp(qkv, heads, d, None, True)

    np.testing.assert_allclose(np.array(ours(qkv)), np.array(xla_ref(qkv)),
                               rtol=2e-5, atol=2e-5)
    g_ref = jax.grad(lambda x: jnp.vdot(xla_ref(x), cot))(qkv)
    g_ours = jax.grad(lambda x: jnp.vdot(ours(x), cot))(qkv)
    np.testing.assert_allclose(np.array(g_ours), np.array(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_module_pallas_vjp_train_grads_match():
    """LinearAttention(pallas_attn=True, pallas_vjp=True) is differentiable
    and its param/input grads match the XLA path with shared params; the
    whole-block (forward-only) fusion must disable itself under vjp."""
    from score_based_multimodal_autoencoder_tpu.nn.blocks import (
        LinearAttention,
        PreNormResidual,
    )

    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 32))
    ref_mod = PreNormResidual(LinearAttention(heads=2, dim_head=8))
    vjp_mod = PreNormResidual(
        LinearAttention(heads=2, dim_head=8, pallas_attn=True,
                        pallas_vjp=True))
    assert not vjp_mod.fn.wants_block_fusion(x.shape)
    params = ref_mod.init(jax.random.key(2), x)

    def loss(mod, p, x):
        return jnp.sum(jnp.square(mod.apply(p, x)))

    l_ref, g_ref = jax.value_and_grad(
        lambda p: loss(ref_mod, p, x))(params)
    l_vjp, g_vjp = jax.value_and_grad(
        lambda p: loss(vjp_mod, p, x))(params)
    np.testing.assert_allclose(float(l_vjp), float(l_ref), rtol=1e-5)
    # atol 1e-3 on grads of magnitude ~1e2: the segmm body shifts q's
    # softmax by the per-head MEAN (exactly equivalent math; see
    # _seg_softmax), whose float rounding differs from the XLA max-shift
    # composition by up to ~3e-4 on small-magnitude elements at this
    # tiny dim_head=8 config.
    for a, b in zip(jax.tree_util.tree_leaves(g_vjp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=2e-4, atol=1e-3)
    gx_ref = jax.grad(lambda x: loss(ref_mod, params, x))(x)
    gx_vjp = jax.grad(lambda x: loss(vjp_mod, params, x))(x)
    np.testing.assert_allclose(np.array(gx_vjp), np.array(gx_ref),
                               rtol=2e-4, atol=1e-3)


def test_score_config_pallas_train_attn():
    """ScoreConfig.pallas_train_attn: train flavor gets the differentiable
    kernel, sample flavor keeps the forward-only paths."""
    from score_based_multimodal_autoencoder_tpu.train.configs import (
        ScoreConfig,
    )

    cfg = ScoreConfig.polymnist_tpu()  # preset default: train attn ON
    train_model = cfg.build_model(sample=False)
    assert train_model.pallas_linear_attn and train_model.pallas_attn_vjp
    sample_model = cfg.build_model(sample=True)
    assert sample_model.pallas_linear_attn and not sample_model.pallas_attn_vjp
    # opt-out restores the XLA training path; celebhq_tpu default is off
    # (measured a wash at dim=256, BASELINE.md round 4)
    off = ScoreConfig.polymnist_tpu(
        pallas_train_attn=False).build_model(sample=False)
    assert not off.pallas_linear_attn
    cel_train = ScoreConfig.celebhq_tpu().build_model(sample=False)
    assert not cel_train.pallas_linear_attn


def test_block_kernel_lowp_matches_to_bf16_rounding():
    """lowp=True runs the whole-block kernel's four matmuls with bf16
    operands (f32 accumulate): outputs differ from the f32 default only by
    bf16 rounding (measured wash on TPU - BASELINE.md round-4 negative
    results - but kept as a knob)."""
    from score_based_multimodal_autoencoder_tpu.ops.linear_attention import (
        fused_attention_block,
    )

    heads, d = 4, 32
    hidden = heads * d
    B, N, C = 4, 64, 128
    ks = jax.random.split(jax.random.key(1), 8)
    x = jax.random.normal(ks[0], (B, N, C))
    args = (x, jnp.ones((C,)), jnp.zeros((C,)),
            jax.random.normal(ks[3], (C, 3 * hidden)) * 0.05,
            jax.random.normal(ks[4], (hidden, C)) * 0.05,
            jnp.zeros((C,)), jnp.ones((C,)), jnp.zeros((C,)))
    ref = fused_attention_block(*args, interpret=True)
    low = fused_attention_block(*args, interpret=True, lowp=True)
    assert float(jnp.abs(ref - low).max()) < 0.05  # bf16-rounding level
    assert float(jnp.abs(ref - low).max()) > 0.0  # actually took the path


def test_block_fusion_gate_logic():
    """wants_block_fusion: off below min positions, off without pallas_attn
    or with fused_norms, on at the gated sites (nn/blocks.py:348-353)."""
    from score_based_multimodal_autoencoder_tpu.nn.blocks import (
        LinearAttention,
    )

    on = LinearAttention(pallas_attn=True)
    assert on.wants_block_fusion((2, 4, 4, 32))
    assert not on.wants_block_fusion((2, 2, 2, 32))  # N=4 < 16
    assert not LinearAttention().wants_block_fusion((2, 4, 4, 32))
    assert not LinearAttention(
        pallas_attn=True, pallas_block=False).wants_block_fusion((2, 4, 4, 32))
    assert not LinearAttention(
        pallas_attn=True, fused_norms=True).wants_block_fusion((2, 4, 4, 32))


def test_latent_unet_pallas_attn_matches_xla():
    """LatentUNet(pallas_linear_attn=True) (block fusion default-on) ==
    the plain-XLA model with identical params - the model-level test the
    round-3 default flip shipped without (VERDICT r3 next #2)."""
    from score_based_multimodal_autoencoder_tpu.nn.unet import LatentUNet

    kw = dict(dim=16, channels=3, dim_mults=(1, 2), init_dim=16)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    t = jnp.array([0.3, 0.7])
    ref_mod = LatentUNet(**kw)
    params = ref_mod.init(jax.random.key(1), x, t)
    want = ref_mod.apply(params, x, t)
    got = LatentUNet(**kw, pallas_linear_attn=True).apply(params, x, t)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=5e-5, atol=5e-5)
    # The config-level off-switch must route back to the qkv-only kernel.
    got_noblock = LatentUNet(**kw, pallas_linear_attn=True,
                             pallas_block_fusion=False).apply(params, x, t)
    np.testing.assert_allclose(np.array(got_noblock), np.array(want),
                               rtol=5e-5, atol=5e-5)


def test_score_config_threads_block_fusion():
    """ScoreConfig.pallas_block_fusion reaches LatentUNet (ADVICE r3 #3:
    there was no config-level off-switch)."""
    from score_based_multimodal_autoencoder_tpu.train.configs import (
        ScoreConfig,
    )

    cfg = ScoreConfig.polymnist_tpu(pallas_block_fusion=False)
    model = cfg.build_model(sample=True)
    assert model.pallas_linear_attn and not model.pallas_block_fusion
    model = ScoreConfig.polymnist_tpu().build_model(sample=True)
    assert model.pallas_block_fusion


def test_bf16_input_dtype_preserved():
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 16), jnp.bfloat16)
    out = fused_group_norm_act(
        x, jnp.ones((16,)), jnp.zeros((16,)), 4, 1e-5, "silu", True)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.array(out, np.float32)).all()
