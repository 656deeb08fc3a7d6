"""MMVAE+ baseline: factorized private/shared Laplace latents.

TPU-native re-design of /root/reference/mmplus_model.py:28-385 (itself from
github.com/epalu/mmvaeplus): each modality encodes u = (w private, z
shared) with Laplace posteriors; cross-modal generation decodes
(fresh w ~ p(w), z from the source modality). The K-sample IWAE and DReG
estimators live in ``mmplus_losses``.

Key reference semantics kept:
- Encoder scales: softmax over the raw logvar half * dim + 1e-6, separately
  for the w and z parts (mmplus_model.py:216-218).
- Decoder likelihood: Laplace(dec(u), 0.75) (mmplus_model.py:245).
- Priors pu/pw: Laplace(0, softmax(param)*dim); the w-prior's scale param
  is optionally learnable (learn_prior_w, mmplus_model.py:264-270).
- Cross-modal matrix: row e = latents from modality e, column d = decoder
  d; off-diagonals resample w from the DESTINATION modality's w-prior, one
  fresh draw per cell (mmvaeplus variant, mmplus_model.py:59-72; the
  reference keeps one trainable pw per modality, :272-275).

All n_mod encoders/decoders are nn.vmap-stacked; the full n_mod x n_mod
cross matrix is computed as one stacked decode.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..vae import ResDecoder, ResEncoder

# ---- Laplace distribution helpers (explicit-key, batched) ----------------


def laplace_rsample(key, loc, scale, sample_shape=()):
    u = jax.random.uniform(
        key, sample_shape + loc.shape, loc.dtype, minval=-0.5 + 1e-7,
        maxval=0.5 - 1e-7)
    return loc - scale * jnp.sign(u) * jnp.log1p(-2 * jnp.abs(u))


def laplace_log_prob(x, loc, scale):
    return -jnp.abs(x - loc) / scale - jnp.log(2 * scale)


def _softmax_scale(raw):
    """softmax(raw) * dim + 1e-6 (mmplus_model.py:216-218)."""
    return jax.nn.softmax(raw, axis=-1) * raw.shape[-1] + 1e-6


class MMVAEPlus(nn.Module):
    """PolyMNIST_10modalities equivalent (mmplus_model.py:323-385)."""

    n_mod: int
    latent_dim_w: int = 32
    latent_dim_z: int = 32
    enc_channel_list: Sequence[Tuple[int, int, int, int]] = (
        (64, 64, 64, 2), (64, 128, 128, 2), (128, 256, 256, 2))
    dec_channel_list: Sequence[Tuple[int, int, int, int]] = (
        (256, 128, 128, 2), (128, 128, 64, 2), (64, 64, 64, 2))
    size_in: int = 32
    img_ch: int = 3
    dec_scale: float = 0.75
    learn_prior_w: bool = True
    # 'res' = the house ResVAE nets (functional parity); 'mmplus' = the
    # reference's MMVAE+-specific dual-branch ResnetBlock nets
    # (h_vae_model_copy.py:826-1084, see mmplus_nets.py).
    arch: str = "res"
    nf: int = 64
    nf_max: int = 1024
    dtype: jnp.dtype = jnp.float32

    @property
    def dim_u(self):
        return self.latent_dim_w + self.latent_dim_z

    def setup(self):
        if self.arch == "mmplus":
            from .mmplus_nets import MMPlusDecoder, MMPlusEncoder

            VEnc = nn.vmap(
                MMPlusEncoder, in_axes=(0, None), out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True}, axis_size=self.n_mod)
            VDec = nn.vmap(
                MMPlusDecoder, in_axes=(0, None), out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True}, axis_size=self.n_mod)
            s0 = max(1, self.size_in // 4)
            self.encs = VEnc(self.size_in, self.dim_u,
                             ndim_w=self.latent_dim_w, s0=s0, nf=self.nf,
                             nf_max=self.nf_max, dtype=self.dtype)
            self.decs = VDec(self.size_in, self.dim_u, self.img_ch, s0=s0,
                             nf=self.nf, nf_max=self.nf_max,
                             dtype=self.dtype)
        else:
            VEnc = nn.vmap(
                ResEncoder, in_axes=(0, None), out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True}, axis_size=self.n_mod)
            VDec = nn.vmap(
                ResDecoder, in_axes=(0, None), out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True}, axis_size=self.n_mod)
            self.encs = VEnc(self.enc_channel_list, self.size_in, self.dim_u,
                             dtype=self.dtype)
            self.decs = VDec(self.dec_channel_list, self.size_in, self.dim_u,
                             self.img_ch, dtype=self.dtype)
        # Prior scale raw params: pu fixed zeros, pw optionally learnable.
        # The reference keeps one trainable pw per modality VAE
        # (mmplus_model.py:272-275) and samples the cross matrix's fresh w
        # from the DESTINATION modality's prior (mmplus_model.py:64) - so
        # pw_raw is per-modality here too, row m = modality m's raw scale.
        self._pw_raw = self.param(
            "pw_raw", nn.initializers.zeros,
            (self.n_mod, self.latent_dim_w))

    # -- distribution params ----------------------------------------------
    def pu_params(self):
        loc = jnp.zeros((1, self.dim_u), self.dtype)
        return loc, jnp.ones((1, self.dim_u), self.dtype)  # softmax(0)*d = 1

    def pw_params(self):
        """(loc, scale) each (n_mod, latent_dim_w): modality m's w-prior."""
        raw = self._pw_raw if self.learn_prior_w else jax.lax.stop_gradient(
            self._pw_raw)
        return (jnp.zeros((self.n_mod, self.latent_dim_w), self.dtype),
                _softmax_scale(raw))

    # -- encode/decode -----------------------------------------------------
    def encode(self, x, train: bool = False):
        """(n_mod, B, H, W, C) -> (loc, scale) each (n_mod, B, dim_u)."""
        loc, raw = self.encs(x, train)
        raw_w, raw_z = jnp.split(raw, [self.latent_dim_w], axis=-1)
        scale = jnp.concatenate(
            [_softmax_scale(raw_w), _softmax_scale(raw_z)], axis=-1)
        return loc, scale

    def decode_all(self, us, train: bool = False):
        """(n_mod, N, dim_u) -> (n_mod, N, H, W, C) via each modality's own
        decoder (row-aligned)."""
        return self.decs(us, train)

    # -- forward -----------------------------------------------------------
    def encode_and_sample(self, x, key, K: int = 1, train: bool = False):
        """Posterior params + K samples + fresh prior-w draws.

        Returns (q_loc, q_scale, us (n_mod, K, B, u), fresh_w
        (src, dst, K, B, w)) - one fresh w per cross-matrix CELL, drawn
        from the DESTINATION modality's w-prior, exactly as the reference
        does per off-diagonal (mmplus_model.py:59-72; diagonal cells'
        draws are never read). Split from ``decode_matrix`` so the DReG
        hook can scale the latent cotangents on EVERY downstream path.
        """
        s_key, w_key = jax.random.split(key)
        q_loc, q_scale = self.encode(x, train)
        us = laplace_rsample(s_key, q_loc, q_scale, (K,))  # (K, n_mod, B, u)
        us = jnp.moveaxis(us, 0, 1)  # (n_mod, K, B, u)
        n, _, B, _ = us.shape
        pw_loc, pw_scale = self.pw_params()  # (n_mod, w)
        shape = (n, n, K, B, self.latent_dim_w)
        fresh_w = laplace_rsample(
            w_key, jnp.broadcast_to(pw_loc[None, :, None, None], shape),
            jnp.broadcast_to(pw_scale[None, :, None, None], shape))
        return q_loc, q_scale, us, fresh_w

    def decode_matrix(self, us, fresh_w, train: bool = False):
        """Cross-modal matrix decode: (src, dst, K, B, H, W, C) means.

        Diagonal (e == d) decodes us[e]; off-diagonal decodes
        (fresh w from dst's prior, z_e) with decoder d
        (mmplus_model.py:51-72).
        """
        n, K, B, _ = us.shape
        z_e = us[..., self.latent_dim_w:]
        cross_us = jnp.concatenate(
            [fresh_w, jnp.broadcast_to(z_e[:, None], fresh_w.shape[:-1]
                                       + (z_e.shape[-1],))], axis=-1)
        src_major = jnp.broadcast_to(us[:, None], (n, n) + us.shape[1:])
        sel = jnp.eye(n, dtype=bool)[:, :, None, None, None]
        dec_in = jnp.where(sel, src_major, cross_us)  # (src, dst, K, B, u)
        dec_in_dst = jnp.moveaxis(dec_in, 1, 0).reshape(n, n * K * B, self.dim_u)
        locs = self.decs(dec_in_dst, train)  # (dst, src*K*B, H, W, C)
        locs = locs.reshape(n, n, K, B, *locs.shape[2:])
        return jnp.moveaxis(locs, 0, 1)  # (src, dst, K, B, ...)

    def __call__(self, x, key, K: int = 1, train: bool = True):
        """Full forward: the cross-modal matrix structure for the K-sample
        bounds (reference MMVAE.forward, mmplus_model.py:48-77)."""
        q_loc, q_scale, us, fresh_w = self.encode_and_sample(x, key, K, train)
        recon_locs = self.decode_matrix(us, fresh_w, train)
        return {
            "q_loc": q_loc, "q_scale": q_scale, "us": us, "fresh_w": fresh_w,
            "recon_locs": recon_locs, "dec_scale": self.dec_scale,
        }

    # -- generation --------------------------------------------------------
    def generate(self, key, N: int, train: bool = False):
        """Unconditional: u ~ pu -> every decoder's mean (mmplus_model.py:80-89)."""
        pu_loc, pu_scale = self.pu_params()
        u = laplace_rsample(
            key, jnp.broadcast_to(pu_loc[0], (N, self.dim_u)),
            jnp.broadcast_to(pu_scale[0], (N, self.dim_u)))
        us = jnp.broadcast_to(u, (self.n_mod,) + u.shape)
        return self.decode_all(us, train)

    def cross_reconstruct(self, x, key, train: bool = False):
        """Eval-path cross matrix: (src, dst, B, H, W, C) means.

        Matches ``reconstruct_and_cross_reconstruct_forw``
        (mmplus_model.py:103-124), which differs from the TRAINING forward
        in two ways: the off-diagonal fresh w comes from the FIXED prior pu
        (its w-part), not the possibly-learned pw, and ONE draw per source
        row is shared across all destination decoders (training draws
        per cell)."""
        s_key, w_key = jax.random.split(key)
        q_loc, q_scale = self.encode(x, train)
        us = laplace_rsample(s_key, q_loc, q_scale)  # (n_mod, B, u)
        n, B, _ = us.shape
        pu_loc, pu_scale = self.pu_params()
        u_new = laplace_rsample(
            w_key, jnp.broadcast_to(pu_loc[0], (n, B, self.dim_u)),
            jnp.broadcast_to(pu_scale[0], (n, B, self.dim_u)))
        cross = jnp.concatenate(
            [u_new[..., :self.latent_dim_w], us[..., self.latent_dim_w:]],
            axis=-1)
        src_major = jnp.broadcast_to(us[:, None], (n, n, B, self.dim_u))
        cross_major = jnp.broadcast_to(cross[:, None], (n, n, B, self.dim_u))
        sel = jnp.eye(n, dtype=bool)[:, :, None, None]
        dec_in = jnp.where(sel, src_major, cross_major)  # (src, dst, B, u)
        dec_in_dst = jnp.moveaxis(dec_in, 1, 0).reshape(n, n * B, self.dim_u)
        locs = self.decs(dec_in_dst, train)  # (dst, src*B, H, W, C)
        locs = locs.reshape(n, n, B, *locs.shape[2:])
        return jnp.moveaxis(locs, 0, 1)  # (src, dst, B, ...)

    def cond_gen(self, x, present_mods, key, train: bool = False):
        """Pick a random present source row of the cross matrix
        (mmplus_model.py:91-101) -> (n_mod, B, H, W, C)."""
        sel_key, rec_key = jax.random.split(key)
        recons = self.cross_reconstruct(x, rec_key, train)
        present = jnp.asarray(present_mods, jnp.int32)
        idx = present[jax.random.randint(sel_key, (), 0, present.shape[0])]
        return recons[idx]
