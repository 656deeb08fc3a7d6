"""ADM UNet (the OpenAI/DiffuseVAE architecture), flax NHWC port.

Counterpart of /root/reference/unet_openai.py:361-593. Used as (a) the
z-conditioned CelebA score network (``use_z=True``, z added to the time
embedding, unet_openai.py:427-433 + 553-559; instantiated at
/root/reference/train_lat_celebhq_unet_cont2_cond.py:651-653) and (b) the
DiffuseVAE pixel refiner (in_channels=6, out_channels=3, channel_mult
(1,2,2,3,4), /root/reference/eval_lat_celeba_hq_all.py:448).

TPU-first notes: NHWC layout; attention as fused einsum over (N, HW, h, d);
GroupNorm(32) stats in f32; gradient checkpointing via ``nn.remat`` when
``use_checkpoint`` (the reference's CheckpointFunction, unet_openai.py:86-131)
to trade FLOPs for HBM exactly where the reference does.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def adm_timestep_embedding(timesteps, dim, max_period=10000):
    """Sinusoidal embeddings, ADM convention (unet_openai.py:66-84)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _n_groups(channels):
    # ADM's GroupNorm32; capped at the channel count so small smoke configs
    # (channels < 32) remain valid - shipped configs use >= 128 channels.
    groups = min(32, channels)
    while channels % groups:
        groups -= 1
    return groups


def _group_norm(x, name, dtype):
    # eps = 1e-5 matches torch nn.GroupNorm (GroupNorm32, unet_openai.py:10)
    # rather than the flax default 1e-6, for checkpoint-level parity.
    return nn.GroupNorm(num_groups=_n_groups(x.shape[-1]), epsilon=1e-5,
                        dtype=dtype, name=name)(x)


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm+SiLU through the Pallas kernel (ops/group_norm.py); the
    kernel runs natively on TPU and interpreted elsewhere. Param layout
    matches nn.GroupNorm (scale/bias) for checkpoint compatibility."""

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
            _n_groups(C), 1e-5, "silu", interpret)


def _group_norm_silu(x, name, dtype, fused):
    if fused:
        return FusedGroupNormSiLU(dtype=dtype, name=name)(x)
    return nn.silu(_group_norm(x, name, dtype))


_zero_init = nn.initializers.zeros


class ADMResBlock(nn.Module):
    """GN-SiLU-conv / time-emb injection / GN-SiLU-drop-zeroconv + skip
    (unet_openai.py:216-306)."""

    out_channels: int
    emb_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    use_conv_skip: bool = False
    fused_norms: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = _group_norm_silu(x, "in_norm", self.dtype, self.fused_norms)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(h)
        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _group_norm(h, "out_norm", self.dtype)
            h = h * (1 + scale[:, None, None, :]) + shift[:, None, None, :]
            h = nn.silu(h)
        else:
            h = h + emb_out[:, None, None, :]
            h = _group_norm_silu(h, "out_norm", self.dtype, self.fused_norms)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_zero_init, bias_init=_zero_init,
                    name="out_conv")(h)
        if x.shape[-1] != self.out_channels:
            kernel = (3, 3) if self.use_conv_skip else (1, 1)
            pad = 1 if self.use_conv_skip else 0
            x = nn.Conv(self.out_channels, kernel, padding=pad,
                        dtype=self.dtype, name="skip")(x)
        return x + h


class ADMAttentionBlock(nn.Module):
    """Spatial self-attention with zero-initialized output projection
    (unet_openai.py:308-359)."""

    num_heads: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _group_norm(x, "norm", self.dtype)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(
            h.reshape(B, H * W, C))
        d = C // self.num_heads
        # Channel-contiguous split == reshape(B,N,3,h,d) + index on axis 2,
        # but avoids the interleaved-transpose copy XLA emits for the latter.
        q, k, v = [part.reshape(B, H * W, self.num_heads, d)
                   for part in jnp.split(qkv, 3, axis=-1)]
        scale = 1.0 / math.sqrt(math.sqrt(d))  # ADM's sqrt-sqrt scaling
        logits = jnp.einsum("bihd,bjhd->bhij", q * scale, k * scale)
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, H * W, C)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=_zero_init,
                       bias_init=_zero_init, name="proj_out")(out)
        return x + out.reshape(B, H, W, C)


class ADMUNet(nn.Module):
    """The full ADM UNet (unet_openai.py:361-577)."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = (16, 8)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    use_z: bool = False
    z_dim: Optional[int] = None
    use_checkpoint: bool = False
    fused_norms: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, z=None, y=None, deterministic=True):
        heads_up = (self.num_heads if self.num_heads_upsample == -1
                    else self.num_heads_upsample)
        time_dim = self.model_channels * 4
        emb = adm_timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_fc1")(
            emb.astype(self.dtype))
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_fc2")(nn.silu(emb))

        if z is not None:
            assert self.use_z, "pass use_z=True for z-conditioning"
            zp = nn.Dense(time_dim, dtype=self.dtype, name="z_fc1")(z)
            zp = nn.Dense(time_dim, dtype=self.dtype, name="z_fc2")(nn.silu(zp))
            emb = emb + zp
        if self.num_classes is not None:
            assert y is not None
            emb = emb + nn.Embed(self.num_classes, time_dim, dtype=self.dtype,
                                 name="label_emb")(y)

        res_block = ADMResBlock
        if self.use_checkpoint:
            res_block = nn.remat(ADMResBlock, static_argnums=(3,))

        orig_dtype = x.dtype
        h = x.astype(self.dtype)
        h = nn.Conv(self.model_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(h)
        hs = [h]
        ch = self.model_channels
        ds = 1
        # Down path.
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = mult * self.model_channels
                h = res_block(
                    out_channels=ch, emb_channels=time_dim,
                    dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                      fused_norms=self.fused_norms,
                    dtype=self.dtype, name=f"down{level}_{i}_res",
                )(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = ADMAttentionBlock(
                        self.num_heads, self.dtype,
                        name=f"down{level}_{i}_attn")(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.conv_resample:
                    h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                                dtype=self.dtype, name=f"down{level}_ds")(h)
                else:
                    h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                hs.append(h)
                ds *= 2

        # Middle.
        h = res_block(out_channels=ch, emb_channels=time_dim,
                      dropout=self.dropout,
                      use_scale_shift_norm=self.use_scale_shift_norm,
                      fused_norms=self.fused_norms,
                      dtype=self.dtype, name="mid_res1")(h, emb, deterministic)
        h = ADMAttentionBlock(self.num_heads, self.dtype, name="mid_attn")(h)
        h = res_block(out_channels=ch, emb_channels=time_dim,
                      dropout=self.dropout,
                      use_scale_shift_norm=self.use_scale_shift_norm,
                      fused_norms=self.fused_norms,
                      dtype=self.dtype, name="mid_res2")(h, emb, deterministic)

        # Up path.
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = mult * self.model_channels
                h = res_block(
                    out_channels=ch, emb_channels=time_dim,
                    dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                      fused_norms=self.fused_norms,
                    dtype=self.dtype, name=f"up{level}_{i}_res",
                )(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = ADMAttentionBlock(
                        heads_up, self.dtype, name=f"up{level}_{i}_attn")(h)
                if level and i == self.num_res_blocks:
                    B, H, W, C = h.shape
                    h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                    if self.conv_resample:
                        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                                    name=f"up{level}_us")(h)
                    ds //= 2

        h = _group_norm(h, "out_norm", self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_zero_init, bias_init=_zero_init,
                    name="out_conv")(h)
        return h.astype(orig_dtype)


class ADMSuperResUNet(ADMUNet):
    """SuperResModel (unet_openai.py:578-593): conditions on a nearest-
    upsampled low-res image by channel concat. Construct with the HIGH-res
    in_channels; the doubling happens internally."""

    @nn.compact
    def __call__(self, x, timesteps, low_res=None, z=None, y=None,
                 deterministic=True):
        if low_res is not None:
            B, H, W, C = x.shape
            up = jax.image.resize(
                low_res, (low_res.shape[0], H, W, low_res.shape[-1]), "nearest")
            x = jnp.concatenate([x, up], axis=-1)
        return super().__call__(x, timesteps, z=z, y=y,
                                deterministic=deterministic)
