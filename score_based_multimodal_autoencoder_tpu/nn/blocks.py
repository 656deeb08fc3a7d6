"""Building blocks for the score networks (flax.linen, NHWC, bf16-ready).

TPU-native re-design of the UNet blocks the reference uses
(/root/reference/unet_model.py:21-187): channels-last layout so convs map
directly onto XLA's TPU conv lowering, explicit ``dtype``/``param_dtype``
split for bfloat16 compute with float32 params, and norm statistics computed
in float32 for stability.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class SinusoidalTimeEmbedding(nn.Module):
    """Sinusoidal embeddings of diffusion time (unet_model.py:35-47).

    Takes t of shape (B,) (continuous in [0, T]), returns (B, dim):
    [sin(t * w_0..w_{h-1}), cos(...)] with w_k = exp(-k log(1e4)/(h-1)).
    """

    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        freq = jnp.exp(
            jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
        )
        ang = t.astype(jnp.float32)[:, None] * freq[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimeMLP(nn.Module):
    """dim -> 4*dim GELU MLP over the sinusoidal embedding
    (unet_model.py:220-227)."""

    dim: int
    time_dim: int
    dtype: jnp.dtype = jnp.float32
    approx_gelu: bool = False

    @nn.compact
    def __call__(self, t):
        emb = SinusoidalTimeEmbedding(self.dim)(t)
        emb = nn.Dense(self.time_dim, dtype=self.dtype, name="fc1")(emb.astype(self.dtype))
        emb = nn.gelu(emb, approximate=self.approx_gelu)
        emb = nn.Dense(self.time_dim, dtype=self.dtype, name="fc2")(emb)
        return emb


class FusedGroupNormAct(nn.Module):
    """GroupNorm (+ optional activation) through the fused Pallas kernel
    (ops/group_norm.py): one VMEM pass instead of the reduce+normalize HBM
    round-trips of an unfused GN. Param layout (scale/bias under the module
    name) matches ``nn.GroupNorm`` so checkpoints are interchangeable with
    the unfused path; eps matches the torch reference (1e-5)."""

    groups: int
    act: str = "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops import fused_group_norm_act

        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,))
        beta = self.param("bias", nn.initializers.zeros, (C,))
        interpret = jax.default_backend() != "tpu"
        return fused_group_norm_act(
            x, gamma.astype(self.dtype), beta.astype(self.dtype),
            self.groups, 1e-5, self.act, interpret)


def _gn_act(x, groups, name, dtype, act="none", fused=False):
    """GroupNorm followed by an activation, fused on TPU when requested.
    eps = 1e-5 matches torch nn.GroupNorm (the reference's norms) rather
    than the flax default 1e-6, for checkpoint-level numeric parity."""
    if fused:
        return FusedGroupNormAct(groups=groups, act=act, dtype=dtype,
                                 name=name)(x)
    h = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=dtype,
                     name=name)(x)
    if act == "silu":
        return nn.silu(h)
    if act == "gelu":
        return nn.gelu(h, approximate=False)
    return h


class DepthwiseConvMXU(nn.Module):
    """Depthwise KxK conv executed as a per-channel (HW x HW) matmul.

    TPU's conv emitters lower depthwise convolutions onto the VPU
    (EmitDepthwiseInputBatchInSublanes), which at the latent grids' tiny
    spatial extents runs ~10-20x below the chip's matmul throughput (the
    single most expensive op family in the sampled HLO profile). For small
    grids (H*W <= ``max_positions``) the identical linear map is a batched
    ``(B, HW) x (HW, HW)`` contraction per channel - MXU work. The weights
    are scattered into the (HW, HW) band matrix at trace time from the SAME
    (K, K, 1, C) kernel parameter ``nn.Conv(feature_group_count=C)`` uses,
    so param trees and math (up to float reassociation) are unchanged, and
    larger grids fall back to the regular conv path.
    """

    # TPU-measured: at 8x8 the matmul path is uniformly faster; at 16x16 it
    # wins 1.4-5x (and avoids a pathological 16 ms emitter case at batch
    # 1024 x 256ch) with one mild 0.8x shape - net on by default up to
    # 16x16 (256 positions). Larger grids fall back to the conv emitter.
    features: int
    kernel_size: int = 7
    max_positions: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        K = self.kernel_size
        pad = K // 2
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (K, K, 1, C))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if H * W > self.max_positions:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
            return y + bias.astype(self.dtype)
        N = H * W
        # (N*N, K*K) one-hot tap matrix: row (q*N + p) selects kernel tap
        # (qy-py+pad, qx-px+pad) when that offset is in range. The band is
        # then a MATMUL of the tap matrix with the flat kernel - so its VJP
        # is another matmul (a gather-based construction would backpropagate
        # through a TPU-hostile scatter in training). Built from on-device
        # iota ops - NOT a trace-time numpy literal: at 16x16 the literal is
        # ~13 MB per block, which bloats the serialized HLO enough to break
        # the remote-compile transport; XLA constant-folds the iota form to
        # the same matrix server-side.
        q = jnp.arange(N)
        py, px = q // W, q % W
        dy = py[:, None] - py[None, :] + pad
        dx = px[:, None] - px[None, :] + pad
        valid = (0 <= dy) & (dy < K) & (0 <= dx) & (dx < K)
        taps = jnp.where(valid, dy * K + dx, 0)  # (N, N)
        onehot = ((taps[:, :, None] == jnp.arange(K * K)[None, None, :])
                  & valid[:, :, None]).astype(self.dtype)  # (N, N, K*K)
        kf = kernel.reshape(K * K, C).astype(self.dtype)
        # band[q, p] holds kernel[qy-py+pad, qx-px+pad]: axis 0 = input
        # position q, axis 1 = output position p.
        band = jnp.einsum("qpt,tc->qpc", onehot, kf)
        y = jnp.einsum("bqc,qpc->bpc", x.reshape(B, N, C).astype(self.dtype),
                       band)
        return y.reshape(B, H, W, C) + bias.astype(self.dtype)


class ConvBlock(nn.Module):
    """conv3x3 -> GroupNorm -> (scale,shift) -> SiLU (unet_model.py:49-65)."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    fused_norms: bool = False

    @nn.compact
    def __call__(self, x, scale_shift: Optional[tuple] = None):
        x = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype, name="proj")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = _gn_act(x, self.groups, "norm", self.dtype,
                        act="none", fused=self.fused_norms)
            x = x * (scale + 1.0) + shift
            return nn.silu(x)
        return _gn_act(x, self.groups, "norm", self.dtype,
                       act="silu", fused=self.fused_norms)


class ResnetBlock(nn.Module):
    """Two ConvBlocks with additive time embedding + residual
    (unet_model.py:67-90)."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    fused_norms: bool = False

    @nn.compact
    def __call__(self, x, time_emb=None):
        h = ConvBlock(self.dim_out, self.groups, self.dtype,
                      self.fused_norms, name="block1")(x)
        if time_emb is not None:
            emb = nn.Dense(self.dim_out, dtype=self.dtype, name="time_proj")(
                nn.silu(time_emb)
            )
            h = h + emb[:, None, None, :]
        h = ConvBlock(self.dim_out, self.groups, self.dtype,
                      self.fused_norms, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        return h + x


class ConvNeXtBlock(nn.Module):
    """ConvNeXt-style block: depthwise 7x7 -> LN -> pointwise MLP + residual
    (unet_model.py:92-124). The default block of the latent score UNet."""

    dim: int
    dim_out: int
    mult: int = 2
    norm: bool = True
    dtype: jnp.dtype = jnp.float32
    fused_norms: bool = False
    # Run the depthwise 7x7 as a per-channel HWxHW matmul on the MXU for
    # small grids (identical math + param tree; see DepthwiseConvMXU).
    mxu_depthwise: bool = False
    # Position cutoff for the MXU path: grids with H*W above this fall back
    # to the conv emitter. 64 excludes the one measured losing shape
    # (16x16 x 256ch at batch 256, 0.8x - BASELINE.md) while keeping the
    # 8x8-and-below wins; 256 enables it everywhere the band fits.
    mxu_max_positions: int = 256
    # tanh-approximated GELU: ~1.3x faster whole-model sampling on TPU
    # (erf's polynomial dominates the VPU at these widths). Default False
    # = exact erf, matching torch nn.GELU for checkpoint-level parity;
    # the *_tpu presets enable it (max abs act diff ~1e-3).
    approx_gelu: bool = False

    @nn.compact
    def __call__(self, x, time_emb=None):
        if self.mxu_depthwise:
            h = DepthwiseConvMXU(self.dim, 7, dtype=self.dtype,
                                 max_positions=self.mxu_max_positions,
                                 name="ds_conv")(x)
        else:
            h = nn.Conv(
                self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                dtype=self.dtype, name="ds_conv",
            )(x)
        if time_emb is not None:
            emb = nn.Dense(self.dim, dtype=self.dtype, name="time_proj")(
                nn.gelu(time_emb, approximate=self.approx_gelu)
            )
            h = h + emb[:, None, None, :]
        if self.norm:
            # GroupNorm(1) == LayerNorm over (H, W, C) stats per the torch
            # semantics of nn.GroupNorm(1, dim).
            h = _gn_act(h, 1, "norm1", self.dtype, fused=self.fused_norms)
        h = nn.Conv(self.dim_out * self.mult, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.gelu(h, approximate=self.approx_gelu)
        h = _gn_act(h, 1, "norm2", self.dtype, fused=self.fused_norms)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        return h + x


class Attention(nn.Module):
    """Full softmax self-attention over spatial positions
    (unet_model.py:126-149). Operates on at most 16x16=256 positions in the
    shipped configs, so a plain fused einsum is already MXU-optimal."""

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        # Channel-contiguous split == reshape(B,N,3,h,d) + index on axis 2,
        # but avoids the interleaved-transpose copy XLA emits for the latter.
        q, k, v = [part.reshape(B, H * W, self.heads, self.dim_head)
                   for part in jnp.split(qkv, 3, axis=-1)]  # (B, N, h, d)
        q = q * (self.dim_head**-0.5)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k)
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        attn = nn.softmax(sim.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v)
        out = out.reshape(B, H, W, hidden)
        return nn.Conv(C, (1, 1), dtype=self.dtype, name="to_out")(out)


class _ConvParams(nn.Module):
    """Declare a 1x1 ``nn.Conv``'s params WITHOUT running the conv.

    Same param names ("kernel"/"bias"), shapes ((1, 1, in, out) / (out,))
    and initializers (lecun_normal / zeros) as ``nn.Conv`` - so a module
    that consumes the weights inside a fused Pallas kernel keeps a
    checkpoint-identical param tree (give this child the conv's name)."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class _GNParams(nn.Module):
    """Declare ``nn.GroupNorm``'s scale/bias params without running it
    (same names/shapes/initializers; see _ConvParams)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class LinearAttention(nn.Module):
    """Linear attention (unet_model.py:151-177): softmax(q over d),
    softmax(k over n), context = k v^T, out = context^T q.

    ``pallas_attn`` routes the attention body (both softmaxes + both
    contractions) through the fused Pallas kernel
    (ops/linear_attention.py) - identical values, no relayout copies;
    forward-only unless ``pallas_vjp`` - by itself a sampling-time knob.
    With ``pallas_block``
    also True (the default), ``PreNormResidual`` upgrades the gated sites
    to the WHOLE-block kernel (pre-GN + to_qkv + attention + to_out +
    out_norm + residual in one VMEM pass, ops/linear_attention.py
    ``fused_attention_block``) by passing its pre-norm params via the
    ``pre_gn`` argument; the param tree is unchanged (param-only children
    reuse the conv/norm names)."""

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32
    fused_norms: bool = False
    pallas_attn: bool = False
    pallas_min_positions: int = 16
    pallas_block: bool = True
    # Differentiable Pallas attention (ops/linear_attention.py
    # fused_linear_attention_vjp: hand-derived custom VJP, backward is a
    # second fused kernel). The TRAINING-side knob: a round-4 xplane trace
    # showed attention-shaped ops at 22.8% of DSM train-step device time
    # (mostly relayout copies). Excludes whole-block fusion (that kernel
    # is forward-only).
    pallas_vjp: bool = False
    # SPMD escape hatch: XLA's partitioner cannot shard a pallas_call, so
    # under a >1-device mesh an unwrapped kernel forces all-gathers around
    # every attention site. When a Mesh is declared here, every kernel
    # call is wrapped in ``jax.shard_map`` over the mesh's 'data' axis -
    # each device runs the kernel on its LOCAL batch shard and the +17%
    # train / +19% sampling kernel wins survive data parallelism (VERDICT
    # r4 next #3; set via parallel.mesh.adapt_pallas_for_mesh). Sites
    # whose batch the mesh does not divide fall back to the XLA
    # composition (identical math).
    pallas_spmd_mesh: Any = None

    @nn.nowrap
    def _spmd_axis(self):
        mesh = self.pallas_spmd_mesh
        return "data" if "data" in mesh.shape else mesh.axis_names[0]

    @nn.nowrap
    def _spmd_ok(self, batch: int) -> bool:
        """Kernel admissible under the declared SPMD mesh (vacuously true
        without one): the 'data' axis must divide the batch so shard_map
        can hand each device an equal local tile."""
        mesh = self.pallas_spmd_mesh
        if mesh is None or getattr(mesh, "size", 1) <= 1:
            return True
        return batch % mesh.shape[self._spmd_axis()] == 0

    @nn.nowrap
    def _kernel_call(self, fn, batch_args, rep_args=()):
        """Run pallas-kernel ``fn(*batch_args, *rep_args)``; under a
        declared SPMD mesh, shard_map it over the data axis (batch args
        sharded on axis 0, weight operands replicated). ``check_vma=False``:
        a pallas_call body cannot be varying-axis checked."""
        mesh = self.pallas_spmd_mesh
        if mesh is None or getattr(mesh, "size", 1) <= 1:
            return fn(*batch_args, *rep_args)
        from jax.sharding import PartitionSpec as P

        axis = self._spmd_axis()
        in_specs = (tuple(P(axis) for _ in batch_args)
                    + tuple(P() for _ in rep_args))
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=P(axis),
            check_vma=False)(*batch_args, *rep_args)

    @nn.nowrap
    def wants_block_fusion(self, x_shape) -> bool:
        """Static (config + shape) gate for whole-block kernel fusion."""
        B, H, W, C = x_shape
        return (self.pallas_attn and self.pallas_block
                and not self.fused_norms and not self.pallas_vjp
                and H * W >= self.pallas_min_positions
                and self._spmd_ok(B))

    @nn.compact
    def __call__(self, x, pre_gn=None):
        """``pre_gn``: the owning ``PreNormResidual``'s (scale, bias) -
        when given (and :meth:`wants_block_fusion` holds) the WHOLE block
        x + GN1(to_out(attn(to_qkv(GN1(x))))) runs as one Pallas kernel
        and the return value already includes the residual."""
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        if pre_gn is not None:
            assert self.wants_block_fusion(x.shape)
            from ..ops.linear_attention import fused_attention_block

            w_qkv, _ = _ConvParams(hidden * 3, C, use_bias=False,
                                   name="to_qkv")()
            w_out, b_out = _ConvParams(C, hidden, name="to_out")()
            out_scale, out_bias = _GNParams(C, name="out_norm")()

            def block_kernel(xf, ps, pb, wq, wo, bo, osc, obi):
                return fused_attention_block(
                    xf, ps, pb, wq, wo, bo, osc, obi, heads=self.heads,
                    dim_head=self.dim_head,
                    interpret=jax.default_backend() != "tpu")

            out = self._kernel_call(
                block_kernel, (x.reshape(B, H * W, C),),
                (pre_gn[0], pre_gn[1], w_qkv.reshape(C, 3 * hidden),
                 w_out.reshape(hidden, C), b_out, out_scale, out_bias))
            return out.reshape(B, H, W, C)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        # Kernel only where there are enough spatial positions to fill VPU
        # sublanes: at the deepest levels (N <= 4, down to 1x1 grids) a
        # pallas_call is pure per-program overhead and breaks XLA's fusion
        # of the tiny ops, which measured 4x slower whole-model when fully
        # ungated. A round-3 flagship trace showed the N=16 (4x4) sites
        # paying ~7% of sampling time in layout copies around the XLA
        # einsums; admitting them measured an in-model WIN (2,158 vs 2,118
        # samples/s interleaved same-run, BASELINE.md), so the default
        # threshold is 16.
        if (self.pallas_attn and H * W >= self.pallas_min_positions
                and self._spmd_ok(B)):
            from ..ops.linear_attention import (
                fused_linear_attention,
                fused_linear_attention_vjp,
            )

            interpret = jax.default_backend() != "tpu"
            if self.pallas_vjp:
                out = self._kernel_call(
                    lambda t: fused_linear_attention_vjp(
                        t, self.heads, self.dim_head, None, interpret),
                    (qkv.reshape(B, H * W, 3 * hidden),))
            else:
                out = self._kernel_call(
                    lambda t: fused_linear_attention(
                        t, self.heads, self.dim_head, interpret=interpret),
                    (qkv.reshape(B, H * W, 3 * hidden),))
        else:
            # Channel-contiguous split (see Attention) - identical values,
            # layout-friendlier than reshape(B,N,3,h,d) + index.
            q, k, v = [part.reshape(B, H * W, self.heads, self.dim_head)
                       for part in jnp.split(qkv, 3, axis=-1)]  # (B, N, h, d)
            q = nn.softmax(q.astype(jnp.float32), axis=-1).astype(self.dtype)
            k = nn.softmax(k.astype(jnp.float32), axis=1).astype(self.dtype)
            q = q * (self.dim_head**-0.5)
            context = jnp.einsum("bnhd,bnhe->bhde", k, v)
            out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, H, W, hidden).astype(self.dtype)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, name="to_out")(out)
        return _gn_act(out, 1, "out_norm", self.dtype, fused=self.fused_norms)


class PreNormResidual(nn.Module):
    """x + fn(GroupNorm(1)(x)) (unet_model.py:21-27, 179-187).

    When ``fn`` is a gated-in Pallas ``LinearAttention``, the whole block
    (this pre-norm included) runs as one fused kernel: the "norm" params
    are declared here (checkpoint-identical tree) and handed to the child,
    whose return value then already includes the residual."""

    fn: nn.Module
    fused_norms: bool = False

    @nn.compact
    def __call__(self, x):
        if (isinstance(self.fn, LinearAttention)
                and self.fn.wants_block_fusion(x.shape)):
            scale, bias = _GNParams(x.shape[-1], name="norm")()
            return self.fn(x, pre_gn=(scale, bias))
        return x + self.fn(
            _gn_act(x, 1, "norm", x.dtype, fused=self.fused_norms))


def downsample(dim, dtype=jnp.float32, name=None):
    """Strided 4x4 conv halving spatial dims (unet_model.py:32-33)."""
    return nn.Conv(dim, (4, 4), strides=(2, 2), padding=1, dtype=dtype, name=name)


def upsample(dim, dtype=jnp.float32, name=None):
    """Transposed 4x4 conv doubling spatial dims (unet_model.py:29-30)."""
    # flax ConvTranspose 'SAME' reproduces torch ConvTranspose2d(k=4, s=2,
    # p=1)'s out = 2*in shape law (explicit (1,1) padding would not).
    return nn.ConvTranspose(
        dim, (4, 4), strides=(2, 2), padding="SAME", dtype=dtype, name=name
    )
