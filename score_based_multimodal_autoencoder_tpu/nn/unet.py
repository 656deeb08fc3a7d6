"""Latent score UNet (TPU-native counterpart of /root/reference/unet_model.py:189-323).

The primary stage-2 score network: a small UNet over the (B, H, W, n_mod)
latent grid (one modality per channel). Shipped reference configs this must
reproduce:

- PolyMNIST: ``dim=128, channels=10, dim_mults=(1, 2, 2, 2)`` on 8x8 grids
  (/root/reference/train_poly_unet_cont.py:567-572).
- CelebAMask-HQ: ``dim=256, channels=3, dim_mults=(1, 2, 2, 2, 2)`` on 16x16
  grids (/root/reference/train_lat_celebhq_unet_cont2.py:470-472).

Design notes (TPU-first):
- channels-last (NHWC); static shapes; the non-power-of-2 pad/crop of the
  reference (unet_model.py:276-283) is resolved at TRACE time from the
  static spatial dims, so it costs nothing when the input is already 2^k
  (the shipped 8x8 / 16x16 cases).
- Down levels past the spatial floor: with an 8x8 input and 4 resolutions,
  the grid bottoms out at 1x1; strided 4x4 convs with padding 1 keep
  operating on 1x1 maps exactly like the torch ops do.
- bf16 compute / f32 params via ``dtype``/``param_dtype``.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    Attention,
    ConvNeXtBlock,
    LinearAttention,
    PreNormResidual,
    ResnetBlock,
    TimeMLP,
    downsample,
    upsample,
)


def _pad_to_pow2(x):
    """Symmetrically zero-pad H and W up to the next power of two.

    Static-shape equivalent of unet_model.py:276-283; returns the padded
    array and the (pad_h, pad_w) amounts for cropping the output back.
    """
    H, W = x.shape[1], x.shape[2]

    def pad_amount(n):
        target = 2 ** math.ceil(math.log2(n))
        return int((target - n) // 2)

    ph, pw = pad_amount(H), pad_amount(W)
    if pw:
        x = jnp.pad(x, ((0, 0), (0, 0), (pw, pw), (0, 0)))
    if ph:
        x = jnp.pad(x, ((0, 0), (ph, ph), (0, 0), (0, 0)))
    return x, (ph, pw)


class LatentUNet(nn.Module):
    """Time-conditioned UNet over multimodal latent grids.

    Args mirror the reference constructor (unet_model.py:189-273):
      dim: base width; per-level widths are ``dim * dim_mults[i]``.
      channels: number of latent channels (= modalities).
      dim_mults: per-resolution width multipliers.
      use_convnext: ConvNeXt blocks (reference default) vs ResNet blocks.
      with_time_emb: disable to get an unconditional (NCSN-style) net.
    """

    dim: int
    channels: int = 3
    init_dim: int | None = None
    out_dim: int | None = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    with_time_emb: bool = True
    resnet_block_groups: int = 8
    use_convnext: bool = True
    convnext_mult: int = 2
    dtype: jnp.dtype = jnp.float32
    # Route every GroupNorm through the fused Pallas GN+act kernel
    # (ops/group_norm.py); param trees are identical either way, so
    # checkpoints from the unfused path load unchanged.
    fused_norms: bool = False
    # Run ConvNeXt depthwise 7x7 convs as per-channel HWxHW matmuls on the
    # MXU (identical math + param tree; nn/blocks.py DepthwiseConvMXU).
    mxu_depthwise: bool = False
    # Position cutoff for the MXU depthwise path (levels with H*W above it
    # use the conv emitter). 64 = hybrid: conv at 16x16, MXU at <=8x8.
    mxu_max_positions: int = 256
    # Route linear attention through the fused Pallas kernel
    # (ops/linear_attention.py). Alone it is forward-only (sampling-time
    # knob); pair with pallas_attn_vjp for the differentiable variant.
    pallas_linear_attn: bool = False
    # Smallest H*W the Pallas attention kernel is admitted at (the N <= 4
    # sites are always better off in XLA; N = 16 measured an in-model win -
    # see nn/blocks.py and BASELINE.md).
    pallas_min_positions: int = 16
    # Fuse the WHOLE PreNormResidual(LinearAttention) block (pre-GN + qkv
    # matmul + attention + out matmul + out-GN + residual) into one Pallas
    # kernel at the gated sites (nn/blocks.py, ops/linear_attention.py
    # fused_attention_block). Only active with pallas_linear_attn.
    pallas_block_fusion: bool = True
    # Differentiable Pallas attention (custom VJP; backward is a second
    # fused kernel) - makes pallas_linear_attn usable in TRAINING.
    # Disables whole-block fusion at the gated sites (forward-only kernel).
    pallas_attn_vjp: bool = False
    # SPMD mesh for the Pallas sites: when a >1-device Mesh is declared,
    # every kernel call shard_maps over its 'data' axis (each device runs
    # the kernel on its local batch shard) instead of forcing XLA to
    # all-gather around the unpartitionable custom-call. Set by
    # parallel.mesh.adapt_pallas_for_mesh; see nn/blocks.py
    # LinearAttention.pallas_spmd_mesh.
    pallas_spmd_mesh: Any = None
    # tanh-approximated GELU instead of exact erf: ~1.3x faster sampling on
    # TPU (see nn/blocks.py ConvNeXtBlock). Default False = torch parity.
    approx_gelu: bool = False
    # Optional global-z conditioning injected at the bottleneck (UnetZ,
    # unet_model.py:1005-1135): z -> Dense(mid)/GELU/Dense(mid), added to
    # the feature map after mid_block1 AND after mid_block2.
    z_dim: int | None = None

    def _block(self, dim_in, dim_out, name):
        if self.use_convnext:
            return ConvNeXtBlock(
                dim=dim_in, dim_out=dim_out, mult=self.convnext_mult,
                dtype=self.dtype, fused_norms=self.fused_norms,
                mxu_depthwise=self.mxu_depthwise,
                mxu_max_positions=self.mxu_max_positions,
                approx_gelu=self.approx_gelu, name=name,
            )
        return ResnetBlock(
            dim_out=dim_out, groups=self.resnet_block_groups,
            dtype=self.dtype, fused_norms=self.fused_norms, name=name,
        )

    @nn.compact
    def __call__(self, x, time=None, z=None):
        x, (ph, pw) = _pad_to_pow2(x)
        orig_dtype = x.dtype
        x = x.astype(self.dtype)

        init_dim = self.init_dim if self.init_dim is not None else self.dim // 3 * 2
        x = nn.Conv(init_dim, (7, 7), padding=3, dtype=self.dtype, name="init_conv")(x)

        t = None
        if self.with_time_emb:
            t = TimeMLP(self.dim, self.dim * 4, dtype=self.dtype,
                        approx_gelu=self.approx_gelu, name="time_mlp")(time)

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        n_res = len(self.dim_mults)

        skips = []
        for i in range(n_res):
            dim_in, dim_out = dims[i], dims[i + 1]
            x = self._block(dim_in, dim_out, f"down{i}_block1")(x, t)
            x = self._block(dim_out, dim_out, f"down{i}_block2")(x, t)
            x = PreNormResidual(
                LinearAttention(dtype=self.dtype, fused_norms=self.fused_norms,
                                pallas_attn=self.pallas_linear_attn,
                                pallas_min_positions=self.pallas_min_positions,
                                pallas_block=self.pallas_block_fusion,
                                pallas_vjp=self.pallas_attn_vjp,
                                pallas_spmd_mesh=self.pallas_spmd_mesh),
                fused_norms=self.fused_norms, name=f"down{i}_attn",
            )(x)
            skips.append(x)
            if i < n_res - 1:
                x = downsample(dim_out, self.dtype, name=f"down{i}_down")(x)

        mid_dim = dims[-1]
        zb = None
        if self.z_dim is not None and z is not None:
            zb = nn.Dense(mid_dim, dtype=self.dtype, name="z_fc1")(
                z.astype(self.dtype))
            zb = nn.Dense(mid_dim, dtype=self.dtype, name="z_fc2")(
                nn.gelu(zb, approximate=self.approx_gelu))
            zb = zb[:, None, None, :]
        x = self._block(mid_dim, mid_dim, "mid_block1")(x, t)
        if zb is not None:
            x = x + zb
        x = PreNormResidual(Attention(dtype=self.dtype),
                            fused_norms=self.fused_norms, name="mid_attn")(x)
        x = self._block(mid_dim, mid_dim, "mid_block2")(x, t)
        if zb is not None:
            x = x + zb

        for j in range(n_res - 1):
            # Mirrors reversed(in_out[1:]) of the reference
            # (unet_model.py:256-268): every up stage concats the matching
            # skip and upsamples, so n_res-1 up stages undo the n_res-1
            # downsamples; the finest level's skip is never consumed
            # (a reference quirk kept for parity).
            dim_in, dim_out = dims[n_res - 1 - j], dims[n_res - j]
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = self._block(dim_out * 2, dim_in, f"up{j}_block1")(x, t)
            x = self._block(dim_in, dim_in, f"up{j}_block2")(x, t)
            x = PreNormResidual(
                LinearAttention(dtype=self.dtype, fused_norms=self.fused_norms,
                                pallas_attn=self.pallas_linear_attn,
                                pallas_min_positions=self.pallas_min_positions,
                                pallas_block=self.pallas_block_fusion,
                                pallas_vjp=self.pallas_attn_vjp,
                                pallas_spmd_mesh=self.pallas_spmd_mesh),
                fused_norms=self.fused_norms, name=f"up{j}_attn",
            )(x)
            x = upsample(dim_in, self.dtype, name=f"up{j}_up")(x)

        out_dim = self.out_dim if self.out_dim is not None else self.channels
        x = self._block(x.shape[-1], self.dim, "final_block")(x)
        x = nn.Conv(out_dim, (1, 1), dtype=self.dtype, name="final_conv")(x)

        x = x.astype(orig_dtype)
        if pw:
            x = x[:, :, pw:-pw, :]
        if ph:
            x = x[:, ph:-ph, :, :]
        return x
