"""Cross-attention score-network hybrids (the reference's experimental
CAUNET family).

Counterpart of /root/reference/unet_model.py:468-1278: latents are treated
as ``n_mod`` tokens of dim size_z, passed through masked multi-head
cross-attention where the mask 1 - I forces each modality to attend only to
the OTHERS (unet_model.py:757, 909), reshaped back to the (hw, hw, n_mod)
grid and refined by the latent UNet. Also covers:

- ``NorUnet``: sigma-normalized UNet score (unet_model.py:697-728) - the
  NCSN-style net the annealed-Langevin AE track consumes.
- ``UnetZ`` (unet_model.py:1005-1135): global-z injection at the UNet
  bottleneck - ``LatentUNet(z_dim=...)`` (see nn/unet.py).
- ``UnetEnergy`` (unet_model.py:325-467): UNet score + scalar energy head
  -> ``EnergyUNet``.
- ``UnetNodown`` (unet_model.py:468-603): constant-resolution UNet (all
  down/upsample ops removed) -> ``NoDownUNet``.
- ``CAUNET2`` + ``Lincat`` (unet_model.py:856-922): a stack of pre-LN
  masked-cross-attention transformer blocks with sinusoidal-time injection
  feeding the UNet -> ``DeepCrossAttentionUNet`` / ``TokenCrossBlock``.
- ``CAUNET3``/``CAUNET4`` (unet_model.py:924-1004, byte-identical twins):
  single linear + masked cross-attention residual before the UNet - the
  ``CrossAttentionUNet`` below.
- ``UnetVAE`` (unet_model.py:1137-1256): denoiser conditioned on the VAE
  reconstruction by channel-concat -> ``ReconCondUNet``.
- ``CRA`` (unet_model.py:807-853): dual-stream (q from one projection,
  k/v from another) unmasked cross-attention feeding the UNet ->
  ``DualStreamCrossAttentionUNet``.
- ``SM3simple`` (unet_model.py:1257-1278) is ``FlatScoreMLP(x) / sigma``
  (nn/mlp_scores.py) - not duplicated.

These are experimental variants in the reference (imported by the main
scripts but not instantiated in shipped configs, SURVEY.md §2.3); they are
implemented for capability parity and research use. ``CrossAttentionUNet``
deliberately unifies the reference's near-identical CAUNET/CAUNET3/CAUNET4:
it keeps CAUNET's residual-MLP ``init_lin`` (CAUNET3/4 use a plain Linear
there, unet_model.py:947 vs :755) and decouples the UNet width from the
grid side (the reference passes the grid side as the UNet ``dim``,
unet_model.py:950-956) - structural faithfulness, not bit parity, for
these unshipped research variants.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .unet import LatentUNet


class MaskedTokenAttention(nn.Module):
    """Multi-head attention over modality tokens with an attention mask
    (MultiheadAttention, unet_model.py:654-694)."""

    embed_dim: int
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        B, S, _ = x.shape
        d = self.embed_dim // self.num_heads
        qkv = nn.Dense(3 * self.embed_dim, dtype=self.dtype, name="qkv_proj")(x)
        qkv = qkv.reshape(B, S, self.num_heads, 3 * d)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        logits = jnp.einsum("bshd,bthd->bhst", q, k) / math.sqrt(d)
        if mask is not None:
            logits = jnp.where(mask[None, None] == 0, -9e15, logits)
        attn = nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhst,bthd->bshd", attn, v).reshape(B, S, self.embed_dim)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="o_proj")(out)


class ResidualLin(nn.Module):
    """x + MLP(x) over the flat concat (Lin, unet_model.py:636-651)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        h = nn.relu(nn.Dense(D * 2, dtype=self.dtype, name="fc1")(x))
        h = nn.relu(nn.Dense(D * 2, dtype=self.dtype, name="fc2")(h))
        return x + nn.Dense(D, dtype=self.dtype, name="fc3")(h)


class CrossAttentionUNet(nn.Module):
    """CAUNET (unet_model.py:729-830) and its CAUNET3/CAUNET4 twins
    (:924-1004): residual MLP over the flat concat, masked cross-attention
    over modality tokens (mask = 1 - I), reshape to the latent grid, then
    the time-conditioned latent UNet."""

    n_mod: int
    size_z: int
    dim: int
    dim_mults: Sequence[int] = (1, 2, 2, 2)
    with_time_emb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time=None):
        # x: (B, hw, hw, n_mod) latent grid.
        B, hw, _, n_mod = x.shape
        assert n_mod == self.n_mod and hw * hw == self.size_z
        tokens = jnp.moveaxis(x.reshape(B, self.size_z, n_mod), -1, 1)  # (B,S,z)
        flat = tokens.reshape(B, n_mod * self.size_z)
        flat = ResidualLin(dtype=self.dtype, name="init_lin")(flat)
        tokens = flat.reshape(B, n_mod, self.size_z)
        mask = 1.0 - jnp.eye(n_mod)  # attend only to OTHER modalities
        tokens = tokens + MaskedTokenAttention(
            self.size_z, dtype=self.dtype, name="cross_att")(tokens, mask)
        tokens = nn.Dense(self.size_z, dtype=self.dtype, name="lin2conv")(tokens)
        grid = jnp.moveaxis(tokens, 1, -1).reshape(B, hw, hw, n_mod)
        return LatentUNet(
            dim=self.dim, channels=n_mod, dim_mults=tuple(self.dim_mults),
            with_time_emb=self.with_time_emb, dtype=self.dtype, name="unet",
        )(grid, time)


class TokenCrossBlock(nn.Module):
    """Pre-LN transformer block over modality tokens with masked
    cross-attention, residual MLP and additive sinusoidal-time conditioning
    (Lincat, unet_model.py:856-882)."""

    z_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time, mask):
        from .blocks import SinusoidalTimeEmbedding

        h = MaskedTokenAttention(self.z_dim, dtype=self.dtype,
                                 name="cross_att")(x, mask)
        x = nn.LayerNorm(dtype=self.dtype, name="n1")(x + h)
        m = nn.relu(nn.Dense(self.z_dim * 2, dtype=self.dtype, name="fc1")(x))
        m = nn.Dense(self.z_dim, dtype=self.dtype, name="fc2")(m)
        x = nn.LayerNorm(dtype=self.dtype, name="n2")(x + m)
        t = SinusoidalTimeEmbedding(self.z_dim)(time).astype(self.dtype)
        t = nn.Dense(self.z_dim, dtype=self.dtype, name="time_fc1")(t)
        t = nn.Dense(self.z_dim, dtype=self.dtype, name="time_fc2")(
            nn.gelu(t, approximate=False))
        return x + t[:, None, :]


class DeepCrossAttentionUNet(nn.Module):
    """CAUNET2 (unet_model.py:883-922): ``n_block`` TokenCrossBlocks over
    the modality tokens, then the time-conditioned latent UNet over the
    reassembled grid. ``cross=False`` lets every modality attend to itself
    too (all-ones mask), matching the reference flag."""

    n_mod: int
    size_z: int
    dim: int
    dim_mults: Sequence[int] = (1, 2, 2, 2)
    n_block: int = 3
    cross: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time):
        B, hw, _, n_mod = x.shape
        assert n_mod == self.n_mod and hw * hw == self.size_z
        tokens = jnp.moveaxis(x.reshape(B, self.size_z, n_mod), -1, 1)
        mask = (1.0 - jnp.eye(n_mod)) if self.cross else jnp.ones((n_mod, n_mod))
        for i in range(self.n_block):
            tokens = TokenCrossBlock(self.size_z, dtype=self.dtype,
                                     name=f"c_att{i}")(tokens, time, mask)
        grid = jnp.moveaxis(tokens, 1, -1).reshape(B, hw, hw, n_mod)
        return LatentUNet(
            dim=self.dim, channels=n_mod, dim_mults=tuple(self.dim_mults),
            dtype=self.dtype, name="unet",
        )(grid, time)


class EnergyUNet(nn.Module):
    """UnetEnergy (unet_model.py:325-467): the latent UNet plus a scalar
    energy head ``Linear(softplus(score).flatten()) -> (B, 1)``; returns
    ``(score, energy)``."""

    dim: int
    channels: int
    size_z: int
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time=None):
        out = LatentUNet(
            dim=self.dim, channels=self.channels, dim_mults=tuple(self.dim_mults),
            dtype=self.dtype, name="unet",
        )(x, time)
        flat = nn.softplus(out).reshape(out.shape[0], -1)
        energy = nn.Dense(1, dtype=self.dtype, name="e_out")(flat)
        return out, energy


class NoDownUNet(nn.Module):
    """UnetNodown (unet_model.py:468-603): the latent UNet topology with
    every Down/Upsample removed - all levels run at the input resolution,
    skips concat at full resolution. Useful for tiny (<=8x8) grids where
    downsampling collapses the map to 1x1."""

    dim: int
    channels: int
    init_dim: int | None = None
    out_dim: int | None = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    convnext_mult: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time=None):
        from .blocks import Attention as FullAttention
        from .blocks import (
            ConvNeXtBlock,
            LinearAttention as LinAttn,
            PreNormResidual,
            TimeMLP,
        )

        orig_dtype = x.dtype
        x = x.astype(self.dtype)
        init_dim = self.init_dim if self.init_dim is not None else self.dim // 3 * 2
        x = nn.Conv(init_dim, (7, 7), padding=3, dtype=self.dtype,
                    name="init_conv")(x)
        t = TimeMLP(self.dim, self.dim * 4, dtype=self.dtype,
                    name="time_mlp")(time) if time is not None else None

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        n_res = len(self.dim_mults)

        def block(dim_in, dim_out, name):
            return ConvNeXtBlock(dim=dim_in, dim_out=dim_out,
                                 mult=self.convnext_mult, dtype=self.dtype,
                                 name=name)

        skips = []
        for i in range(n_res):
            x = block(dims[i], dims[i + 1], f"down{i}_block1")(x, t)
            x = block(dims[i + 1], dims[i + 1], f"down{i}_block2")(x, t)
            x = PreNormResidual(LinAttn(dtype=self.dtype),
                                name=f"down{i}_attn")(x)
            skips.append(x)

        mid = dims[-1]
        x = block(mid, mid, "mid_block1")(x, t)
        x = PreNormResidual(FullAttention(dtype=self.dtype), name="mid_attn")(x)
        x = block(mid, mid, "mid_block2")(x, t)

        for j in range(n_res - 1):
            dim_in, dim_out = dims[n_res - 1 - j], dims[n_res - j]
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = block(dim_out * 2, dim_in, f"up{j}_block1")(x, t)
            x = block(dim_in, dim_in, f"up{j}_block2")(x, t)
            x = PreNormResidual(LinAttn(dtype=self.dtype),
                                name=f"up{j}_attn")(x)

        out_dim = self.out_dim if self.out_dim is not None else self.channels
        x = block(x.shape[-1], self.dim, "final_block")(x)
        x = nn.Conv(out_dim, (1, 1), dtype=self.dtype, name="final_conv")(x)
        return x.astype(orig_dtype)


class ReconCondUNet(nn.Module):
    """UnetVAE (unet_model.py:1137-1256): denoising UNet conditioned on the
    VAE reconstruction x_hat by channel concatenation at the stem."""

    dim: int
    channels: int
    dim_mults: Sequence[int] = (1, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_hat, time=None):
        h = jnp.concatenate([x, x_hat], axis=-1)
        return LatentUNet(
            dim=self.dim, channels=2 * self.channels, out_dim=self.channels,
            dim_mults=tuple(self.dim_mults), dtype=self.dtype, name="unet",
        )(h, time)


class SigmaNormalizedUNet(nn.Module):
    """NorUnet (unet_model.py:697-728): an unconditional UNet whose output
    is divided by sigma - the NCSN parameterization the annealed-Langevin
    sampler consumes via its ``score_fn(x, level, sigma)`` contract."""

    dim: int
    channels: int
    dim_mults: Sequence[int] = (1, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sigma):
        out = LatentUNet(
            dim=self.dim, channels=self.channels, dim_mults=tuple(self.dim_mults),
            with_time_emb=False, dtype=self.dtype, name="unet",
        )(x, None)
        return out / sigma.reshape(-1, *([1] * (x.ndim - 1)))


class DualStreamCrossAttentionUNet(nn.Module):
    """CRA (unet_model.py:807-853): the modality tokens are projected by two
    independent residual MLPs (Lin3 ``clin1``/``clin2``); QUERIES come from
    stream 1 and KEYS/VALUES from stream 2 (unmasked - the reference builds
    a 1-I mask but never applies it in forward), the attended tokens are
    o-projected, reshaped to a (grid_h, grid_w) map with one channel per
    modality, and refined by the time-conditioned latent UNet. Returns
    (B, n_mod, z_dim) tokens like the reference.

    Reference quirk kept: the UNet width reuses ``grid_h`` (CRA passes its
    ``dim`` both to ``Unet(dim, ...)`` and to the ``values.view(...,
    self.dim, self.dim2)`` reshape); override ``unet_dim`` to decouple.
    """

    n_mod: int
    z_dim: int
    grid_h: int
    grid_w: int
    unet_dim: int | None = None
    dim_mults: Sequence[int] = (1, 2, 2, 2)
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time=None):
        # x: (B, n_mod, z_dim) tokens.
        B, S, Z = x.shape
        assert S == self.n_mod and Z == self.z_dim
        assert self.grid_h * self.grid_w == self.z_dim
        x1 = ResidualLin(dtype=self.dtype, name="clin1")(x)
        x2 = ResidualLin(dtype=self.dtype, name="clin2")(x)
        d = Z // self.num_heads
        q = nn.Dense(3 * Z, dtype=self.dtype, name="qkv1")(x1)
        kv = nn.Dense(3 * Z, dtype=self.dtype, name="qkv2")(x2)
        q = jnp.split(q.reshape(B, S, self.num_heads, 3 * d), 3, axis=-1)[0]
        _, k, v = jnp.split(kv.reshape(B, S, self.num_heads, 3 * d), 3, axis=-1)
        logits = jnp.einsum("bshd,bthd->bhst", q, k) / math.sqrt(d)
        attn = nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhst,bthd->bshd", attn, v).reshape(B, S, Z)
        out = nn.Dense(Z, dtype=self.dtype, name="o_proj")(out)
        grid = jnp.moveaxis(out.reshape(B, S, self.grid_h, self.grid_w), 1, -1)
        grid = LatentUNet(
            dim=self.unet_dim if self.unet_dim is not None else self.grid_h,
            channels=self.n_mod, dim_mults=tuple(self.dim_mults),
            dtype=self.dtype, name="unet",
        )(grid, time)
        return jnp.moveaxis(grid, -1, 1).reshape(B, S, Z)
