"""Cross-attention score-network hybrids (the reference's experimental
CAUNET family).

Counterpart of /root/reference/unet_model.py:468-1278: latents are treated
as ``n_mod`` tokens of dim size_z, passed through masked multi-head
cross-attention where the mask 1 - I forces each modality to attend only to
the OTHERS (unet_model.py:757, 909), reshaped back to the (hw, hw, n_mod)
grid and refined by the latent UNet. Also covers:

- ``NorUnet``: sigma-normalized UNet score (unet_model.py:697-728) - the
  NCSN-style net the annealed-Langevin AE track consumes.
- ``UnetZ``-style global-z injection is provided by LatentUNet composition.

These are experimental variants in the reference (imported by the main
scripts but not instantiated in shipped configs, SURVEY.md §2.3); they are
implemented for capability parity and research use.
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
    """CAUNET (unet_model.py:729-830): residual MLP over the flat concat,
    masked cross-attention over modality tokens (mask = 1 - I), reshape to
    the latent grid, then the time-conditioned latent UNet."""

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
