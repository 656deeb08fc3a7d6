"""Contrastive representation encoders for the z-conditioned score model.

Counterpart of /root/reference/h_vae_model.py:964-1103: per-modality
encoders with residual projection heads produce a 512-d conditioning
vector; at sampling time the vectors of the observed subset are AVERAGED
and fed to the ADM UNet's z pathway (get_conds,
/root/reference/train_lat_celebhq_unet_cont2_cond.py:452-460).

The reference repo ships only checkpoints for these encoders - the training
script is missing (SURVEY.md §2.2) - so ``info_nce_loss`` provides the
standard symmetric InfoNCE objective to train them in-framework.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.vae import ResEncoder, _MLPStack


class ProjectionHead(nn.Module):
    """Linear -> GELU -> Linear -> Dropout -> +skip -> LayerNorm
    (h_vae_model.py:964-985)."""

    projection_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        projected = nn.Dense(self.projection_dim, dtype=self.dtype,
                             name="projection")(x)
        h = nn.gelu(projected, approximate=False)
        h = nn.Dense(self.projection_dim, dtype=self.dtype, name="fc")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = h + projected
        # epsilon matches torch nn.LayerNorm's 1e-5 (h_vae_model.py:976).
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="layer_norm")(h)


class ImageRepEncoder(nn.Module):
    """CelImgRep / CelMaskRep (h_vae_model.py:1040-1070): conv encoder +
    projection head -> (B, size_z) representation."""

    channel_list: Sequence[Tuple[int, int, int, int]]
    size_in: int = 128
    size_z: int = 512
    img_ch: int = 3
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        mu, _ = ResEncoder(
            self.channel_list, self.size_in, self.size_z, act="gelu",
            stem_act="leaky_relu_0.1", dtype=self.dtype, name="enc")(x, train)
        return ProjectionHead(self.size_z, self.dropout, self.dtype,
                              name="proj")(mu, deterministic)


class AttrRepEncoder(nn.Module):
    """CelAttrRep (h_vae_model.py:987-998): MLP encoder + projection head."""

    att_size: int = 18
    size_z: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        h = _MLPStack((128, 256, 512, 512, 512), self.dtype, name="enc")(x, train)
        h = nn.Dense(self.size_z, dtype=self.dtype, name="mu")(h)
        return ProjectionHead(self.size_z, dtype=self.dtype, name="proj")(
            h, deterministic)


def celeb_image_rep(size_z: int = 512) -> ImageRepEncoder:
    return ImageRepEncoder(
        ((64, 128, 128, 2), (128, 256, 256, 2), (256, 512, 512, 2)),
        size_in=128, size_z=size_z, img_ch=3)


def celeb_mask_rep(size_z: int = 512) -> ImageRepEncoder:
    return ImageRepEncoder(
        ((64, 128, 128, 4), (128, 256, 256, 4)),
        size_in=128, size_z=size_z, img_ch=1, dropout=0.2)


def info_nce_loss(z1, z2, temperature: float = 0.1):
    """Symmetric InfoNCE between two modality representations."""
    z1 = z1 / jnp.linalg.norm(z1, axis=-1, keepdims=True)
    z2 = z2 / jnp.linalg.norm(z2, axis=-1, keepdims=True)
    logits = z1 @ z2.T / temperature
    labels = jnp.arange(z1.shape[0])
    l12 = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
    l21 = -jnp.mean(jax.nn.log_softmax(logits, axis=0)[labels, labels])
    return 0.5 * (l12 + l21)


def average_condition(reps, present_mask):
    """Average the observed modalities' representations into the z-cond
    vector (get_conds, train_lat_celebhq_unet_cont2_cond.py:452-460).

    reps: (n_mod, B, D); present_mask: (n_mod,) bool.
    """
    mask = jnp.asarray(present_mask, reps.dtype)[:, None, None]
    return (reps * mask).sum(0) / jnp.maximum(mask.sum(), 1.0)
