"""MMVAE+-specific encoder/decoder nets (the reference's ResnetBlock VAEs).

TPU-native counterpart of /root/reference/h_vae_model_copy.py:790-1084
(``ResnetBlock``/``Enc``/``Enc2``/``Dec``/``EncN``/``DecN``, wrapped as
``ResVAEMMPLUS``/``ResVAEMMPLUSN``/``ResVAEMMPLUS2`` at :1086-1186): the
architecture MMVAE+ uses upstream instead of the house ResVAE —
pre-activation (leaky 0.2) residual blocks with a 0.1-scaled residual
branch and learned 1x1 shortcuts, dual independent w/z encoder branches
(private/shared factorization), avg-pool 3x3/s2 downsampling, and a
nearest-upsample decoder mirror. No normalization layers anywhere, so the
modules are pure functions of params (TPU-friendly: no mutable state).

The module contract matches ``models/baselines/mmplus.MMVAEPlus``'s
vmapped encoder/decoder slots: ``enc(x, train) -> (loc, raw_scale)`` over
``dim_u = ndim_w + ndim_z`` and ``dec(u, train) -> image``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


def _actvn(x):
    """leaky_relu(0.2) (h_vae_model_copy.py:786-788)."""
    return nn.leaky_relu(x, 0.2)


class ScaledResnetBlock(nn.Module):
    """Pre-act residual block, ``out = shortcut(x) + 0.1 * dx``
    (ResnetBlock, h_vae_model_copy.py:790-823)."""

    fin: int
    fout: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fhidden = min(self.fin, self.fout)
        dx = nn.Conv(fhidden, (3, 3), padding=1, dtype=self.dtype,
                     name="conv_0")(_actvn(x))
        dx = nn.Conv(self.fout, (3, 3), padding=1, dtype=self.dtype,
                     name="conv_1")(_actvn(dx))
        if self.fin != self.fout:
            x = nn.Conv(self.fout, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_s")(x)
        return x + 0.1 * dx


def _avg_pool_3s2(x):
    """AvgPool2d(3, stride=2, padding=1) with torch's count_include_pad."""
    y = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    count_include_pad=True)
    return y


class _Branch(nn.Module):
    """conv stem + [avgpool, ResnetBlock] pyramid + mu/lv heads
    (one of Enc's w/z branches, h_vae_model_copy.py:838-858)."""

    ndim: int
    nlayers: int
    nf: int
    nf_max: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_img")(x)
        h = ScaledResnetBlock(self.nf, self.nf, self.dtype, name="block0")(h)
        for i in range(self.nlayers):
            nf0 = min(self.nf * 2 ** i, self.nf_max)
            nf1 = min(self.nf * 2 ** (i + 1), self.nf_max)
            h = _avg_pool_3s2(h)
            h = ScaledResnetBlock(nf0, nf1, self.dtype,
                                  name=f"block{i + 1}")(h)
        h = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.ndim, dtype=self.dtype, name="fc_mu")(h)
        lv = nn.Dense(self.ndim, dtype=self.dtype, name="fc_lv")(h)
        return mu, lv


class MMPlusEncoder(nn.Module):
    """Dual-branch (private w / shared z) encoder (Enc/EncN,
    h_vae_model_copy.py:826-883, 981-1038). Returns the concatenated
    ``(mu_w || mu_z, lv_w || lv_z)`` — scale normalization (softmax * dim)
    happens in the MMVAE+ model, as upstream."""

    size_in: int
    size_z: int  # = dim_u = ndim_w + ndim_z
    # Private-w branch width. None = even split (the shipped w=z configs);
    # MUST equal the model's latent_dim_w - the reference Enc takes ndim_w
    # and ndim_z separately (h_vae_model_copy.py:829), and a mismatch
    # silently misaligns the private/shared factorization downstream.
    ndim_w: int = None
    s0: int = 8
    nf: int = 64
    nf_max: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nlayers = int(math.log2(self.size_in / self.s0))
        ndim_w = self.size_z // 2 if self.ndim_w is None else self.ndim_w
        ndim_z = self.size_z - ndim_w
        mu_w, lv_w = _Branch(ndim_w, nlayers, self.nf, self.nf_max,
                             self.dtype, name="branch_w")(x)
        mu_z, lv_z = _Branch(ndim_z, nlayers, self.nf, self.nf_max,
                             self.dtype, name="branch_z")(x)
        return (jnp.concatenate([mu_w, mu_z], axis=-1),
                jnp.concatenate([lv_w, lv_z], axis=-1))


class MMPlusDecoder(nn.Module):
    """fc -> (s0, s0) grid -> [ResnetBlock, 2x nearest upsample] pyramid ->
    pre-act 3x3 conv to ``img_ch`` (Dec/DecN, h_vae_model_copy.py:939-1084).
    DecN caps nf_max at 512 — pass ``nf_max=512`` for the CelebA flavor."""

    size_in: int
    size_z: int  # dim_u
    img_ch: int = 3
    s0: int = 8
    nf: int = 64
    nf_max: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, u, train: bool = False):
        nlayers = int(math.log2(self.size_in / self.s0))
        nf0 = min(self.nf_max, self.nf * 2 ** nlayers)
        h = nn.Dense(nf0 * self.s0 * self.s0, dtype=self.dtype, name="fc")(u)
        h = h.reshape(u.shape[0], self.s0, self.s0, nf0)
        for i in range(nlayers):
            a = min(self.nf * 2 ** (nlayers - i), self.nf_max)
            b = min(self.nf * 2 ** (nlayers - i - 1), self.nf_max)
            h = ScaledResnetBlock(a, b, self.dtype, name=f"block{i}")(h)
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        h = ScaledResnetBlock(self.nf, self.nf, self.dtype,
                              name=f"block{nlayers}")(h)
        return nn.Conv(self.img_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_img")(_actvn(h))
