"""Hierarchical VDVAE-style VAE (the reference's experimental HVAE family).

Counterpart of /root/reference/h_vae_model.py:7-331: a top-down hierarchical
VAE where each decoder level carries its own prior/posterior conv heads
(``TBlock``), the posterior conditions on the matching encoder skip, and the
ELBO sums a per-level Gaussian-vs-Gaussian KL on top of the top-level KL.

Differences from the reference: explicit PRNG keys; channels-last; KL terms
returned as a stacked array. The decoder's TBlock latent draws are per-level
keys split from one caller key. One deliberate deviation: at eval
(train=False) the TOP-level latent is the posterior mean (the reference
still samples it, h_vae_model.py:325-330, while its eval scripts elsewhere
use means); decoder levels sample from their priors as in the reference.

Numeric parity with the reference (train path) is tested end to end via
``models.convert.load_torch_hvae`` (tests/test_torch_parity.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .vae import reparametrize


class HRBlock(nn.Module):
    """1x1-ReLU-3x3-ReLU-3x3-ReLU-1x1 residual block with optional avg-pool
    down / bilinear up (h_vae_model.py:7-39)."""

    mid: int
    out: int
    down_rate: Optional[int] = None
    up_rate: Optional[int] = None
    residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.mid, (1, 1), dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.mid, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.mid, (3, 3), padding=1, dtype=self.dtype, name="conv3")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out, (1, 1), dtype=self.dtype, name="conv4")(h)
        if self.residual:
            if x.shape[-1] != self.out:
                x = nn.Conv(self.out, (1, 1), dtype=self.dtype, name="size_conv")(x)
            h = x + h
        if self.down_rate is not None:
            h = nn.avg_pool(h, (self.down_rate,) * 2, strides=(self.down_rate,) * 2)
        if self.up_rate is not None:
            B, H, W, C = h.shape
            h = jax.image.resize(
                h, (B, H * self.up_rate, W * self.up_rate, C), "linear")
        return h


def gaussian_kl(mu_q, logvar_q, mu_p, logvar_p):
    """KL(q || p) summed over features / batch (TBlock.kl2,
    h_vae_model.py:75-76)."""
    kl = (-0.5 + logvar_p / 2 - logvar_q / 2
          + 0.5 * (jnp.exp(logvar_q) + (mu_q - mu_p) ** 2) / jnp.exp(logvar_p))
    return kl.sum() / mu_q.shape[0]


class TBlock(nn.Module):
    """Top-down level: prior head, posterior head (optionally conditioned on
    the encoder skip), latent injection, residual block
    (h_vae_model.py:42-97)."""

    mid: int
    out: int
    up_rate: Optional[int] = None
    add_enc: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key=None, res_inp=None, train: bool = True):
        def head(h, widths, name):
            h = nn.Conv(self.mid, (1, 1), dtype=self.dtype, name=f"{name}1")(h)
            h = nn.relu(h)
            h = nn.Conv(self.mid, (3, 3), padding=1, dtype=self.dtype, name=f"{name}2")(h)
            h = nn.relu(h)
            h = nn.Conv(self.mid, (3, 3), padding=1, dtype=self.dtype, name=f"{name}3")(h)
            h = nn.relu(h)
            return nn.Conv(widths, (1, 1), dtype=self.dtype, name=f"{name}4")(h)

        pr = head(x, self.mid * 3, "pr")
        pm, pv, pr_out = jnp.split(pr, 3, axis=-1)
        x = x + pr_out
        kl = None
        if train:
            q_in = jnp.concatenate([x, res_inp], -1) if res_inp is not None else x
            q = head(q_in, self.mid * 2, "q")
            qm, qv = jnp.split(q, 2, axis=-1)
            kl = gaussian_kl(qm, qv, pm, pv)
            z = reparametrize(key, qm, qv)
        else:
            z = reparametrize(key, pm, pv)
        z = nn.Conv(self.mid, (1, 1), dtype=self.dtype, name="conv_z")(z)
        x = x + z
        x = HRBlock(self.mid, self.out, up_rate=self.up_rate,
                    dtype=self.dtype, name="r_block")(x)
        return x, kl


class HVAE(nn.Module):
    """Full hierarchical VAE (h_vae_model.py:279-331).

    enc/dec channel lists are (in, mid, out, rate) tuples; ``res_inp_list``
    names the encoder levels whose skips condition decoder posteriors.
    """

    enc_channel_list: Sequence[Tuple[int, int, int, int]]
    dec_channel_list: Sequence[Tuple[int, int, int, int]]
    res_inp_list: Sequence[int]
    size_in: int = 32
    size_z: int = 64
    img_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    def _init_size(self):
        s = self.size_in
        for _, _, _, rate in self.enc_channel_list:
            s //= rate
        return s

    @nn.compact
    def __call__(self, x, key, train: bool = True):
        n_levels = len(self.dec_channel_list)
        keys = jax.random.split(key, n_levels + 1)

        # Encoder with per-level skips (h_vae_model.py:217-245).
        h = nn.Conv(self.enc_channel_list[0][0], (3, 3), padding=1,
                    dtype=self.dtype, name="in_conv")(x)
        skips: List = []
        for i, (cin, mid, out, rate) in enumerate(self.enc_channel_list):
            h = HRBlock(mid, out, down_rate=rate, dtype=self.dtype,
                        name=f"enc{i}")(h)
            skips.append(h)
        mu_half, lv_half = jnp.split(h, 2, axis=-1)
        mu = nn.Dense(self.size_z, dtype=self.dtype, name="mu_lin")(
            mu_half.reshape(x.shape[0], -1))
        logvar = nn.Dense(self.size_z, dtype=self.dtype, name="logvar_lin")(
            lv_half.reshape(x.shape[0], -1))
        z = reparametrize(keys[0], mu, logvar) if train else mu

        # z projection with the learnable global feature vector
        # (h_vae_model.py:292, 312-313).
        feat = self.param("learnable_feat", nn.initializers.zeros,
                          (self.size_z,))
        init_size = self._init_size()
        init_ch = self.enc_channel_list[-1][2]
        zin = jnp.concatenate(
            [z, jnp.broadcast_to(feat, z.shape)], axis=-1)
        h = nn.Dense(init_ch * init_size * init_size, dtype=self.dtype,
                     name="z_lin")(zin)
        h = h.reshape(z.shape[0], init_size, init_size, init_ch)

        # Top-down decoder (h_vae_model.py:247-276).
        kls = []
        for i, (cin, mid, out, rate) in enumerate(self.dec_channel_list):
            level = n_levels - 1 - i
            use_skip = train and (level in self.res_inp_list)
            h, kl = TBlock(
                mid, out, up_rate=rate, add_enc=(level in self.res_inp_list),
                dtype=self.dtype, name=f"dec{i}",
            )(h, key=keys[1 + i],
              res_inp=skips[level] if use_skip else None, train=train)
            if train:
                kls.append(kl)
        out = nn.sigmoid(
            nn.Conv(self.img_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="out_conv")(h))
        if train:
            return out, mu, logvar, jnp.stack(kls)
        return out, mu, logvar
