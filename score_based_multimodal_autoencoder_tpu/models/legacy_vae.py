"""Plain conv-stack VAE family (the reference's legacy/experimental zoo).

One configurable TPU-native module covering the superseded conv VAEs the
reference carries (~1400 LoC of near-duplicates, SURVEY.md §2.2):

- ``PMVAE`` (/root/reference/polymnist_model.py:20-74): 3-conv stack +
  hidden Dense(512), size_z=512 -> ``PRESETS['pmvae']``.
- ``PMVAE2``/``PMVAE3`` (:76-190): 4-conv stack, size_z=64 ->
  ``PRESETS['pmvae2']``.
- ``PMAE64`` (:191-238): deterministic AE -> ``deterministic=True``.
- ``SigPMVAE``/``SigVAE`` (:240-371): sigmoid output -> ``sigmoid_out``.
- ``ConvPoly``/``ConvPoly2`` (:673-798): wider 4-conv stack ->
  ``PRESETS['convpoly']``.
- ``ConvCelebA``/``SigConvCelebA`` (/root/reference/h_vae_model.py:341-505):
  5-conv 128x128 stack with global average pooling -> ``global_pool=True``,
  ``PRESETS['conv_celeba']``.
- ``ResCelebA``/``SigResCelebA`` (h_vae_model.py:508-600) are residual
  variants of the same shape - covered by the ResVAE family
  (``models/vae.py``) with the celeb channel lists.
- ``EncoderImg``/``DecoderImg`` (polymnist_model.py:488-535, the official
  MoPoE-code nets) share the ``pmvae2`` geometry; ``P2MOPOE``'s naive PoE
  forward (:424-478) is subsumed by ``models/baselines/mixture.py``;
  ``InfMoPoE``/``InfExp`` (:536-672) are inference shims for official-code
  torch checkpoints (no such checkpoints in the mirror - out of scope).

TPU-first: channels-last, static shapes, explicit PRNG keys; the
stride/kernel/output_padding games of the torch originals (which exist only
to hit exact intermediate sizes) are normalized to stride-2 SAME convs -
the latent/IO contract (size_in, size_z, img_ch) is what stage 2 consumes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .vae import reparametrize


class _ConvEncoder(nn.Module):
    channels: Sequence[int]
    strides: Sequence[int]
    size_z: int
    hidden: int | None = None
    global_pool: bool = False
    deterministic: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (ch, s) in enumerate(zip(self.channels, self.strides)):
            x = nn.Conv(ch, (3, 3), strides=(s, s), padding=1,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        if self.global_pool:
            x = jnp.mean(x, axis=(1, 2))
        else:
            x = x.reshape(x.shape[0], -1)
        if self.hidden is not None:
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 name="hidden")(x))
        if self.deterministic:
            return nn.Dense(self.size_z, dtype=self.dtype, name="z_lin")(x)
        mu = nn.Dense(self.size_z, dtype=self.dtype, name="mu_lin")(x)
        logvar = nn.Dense(self.size_z, dtype=self.dtype, name="logvar_lin")(x)
        return mu, logvar


class _ConvDecoder(nn.Module):
    channels: Sequence[int]  # reversed encoder widths
    strides: Sequence[int]
    size_in: int
    img_ch: int
    sigmoid_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        n_down = 1
        for s in self.strides:
            n_down *= s
        hw = self.size_in // n_down
        c0 = self.channels[0]
        x = nn.Dense(hw * hw * c0, dtype=self.dtype, name="z_lin")(z)
        x = nn.relu(x.reshape(z.shape[0], hw, hw, c0))
        for i, (ch, s) in enumerate(zip(self.channels[1:], self.strides[:-1])):
            x = nn.ConvTranspose(ch, (4, 4), strides=(s, s), padding="SAME",
                                 dtype=self.dtype, name=f"deconv{i}")(x)
            x = nn.relu(x)
        s = self.strides[-1]
        x = nn.ConvTranspose(self.img_ch, (4, 4), strides=(s, s),
                             padding="SAME", dtype=self.dtype, name="out")(x)
        return nn.sigmoid(x) if self.sigmoid_out else x


class ConvVAE(nn.Module):
    """Configurable plain conv VAE/AE (the legacy-zoo generalization).

    ``encoder(x) -> (mu, logvar)`` (or ``z`` when deterministic),
    ``decoder(z) -> x_hat``, ``__call__(x, key) -> (x_hat, mu, logvar)``
    (or ``(x_hat, z)``), matching the repo's ResVAE conventions.
    """

    channels: Sequence[int] = (32, 64, 128)
    strides: Sequence[int] | None = None
    size_z: int = 64
    size_in: int = 32
    img_ch: int = 3
    hidden: int | None = None
    sigmoid_out: bool = False
    deterministic: bool = False
    global_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        strides = (tuple(self.strides) if self.strides is not None
                   else (2,) * len(self.channels))
        self.enc = _ConvEncoder(
            self.channels, strides, self.size_z, self.hidden,
            self.global_pool, self.deterministic, self.dtype, name="enc")
        self.dec = _ConvDecoder(
            tuple(reversed(self.channels)), tuple(reversed(strides)),
            self.size_in, self.img_ch, self.sigmoid_out, self.dtype,
            name="dec")

    def encoder(self, x):
        return self.enc(x)

    def decoder(self, z):
        return self.dec(z)

    def sample(self, key, amount: int):
        z = jax.random.normal(key, (amount, self.size_z))
        return self.dec(z)

    def __call__(self, x, key=None):
        if self.deterministic:
            z = self.enc(x)
            return self.dec(z), z
        mu, logvar = self.enc(x)
        z = reparametrize(key, mu, logvar) if key is not None else mu
        return self.dec(z), mu, logvar


PRESETS = {
    # polymnist_model.py:20-74 (3-conv, hidden 512, z=512)
    "pmvae": dict(channels=(32, 64, 128), hidden=512, size_z=512,
                  size_in=32),
    # polymnist_model.py:76-190 (4-conv, z=64)
    "pmvae2": dict(channels=(32, 64, 128, 256), size_z=64, size_in=32),
    # polymnist_model.py:191-238 (deterministic, z=64)
    "pmae64": dict(channels=(32, 64, 128, 256), size_z=64, size_in=32,
                   deterministic=True),
    # polymnist_model.py:240-371 (sigmoid output)
    "sigpmvae": dict(channels=(32, 64, 128, 256), size_z=64, size_in=32,
                     sigmoid_out=True),
    # polymnist_model.py:673-798 (wider stack)
    "convpoly": dict(channels=(64, 128, 128, 256), size_z=64, size_in=32),
    # h_vae_model.py:341-470 (128x128 CelebA, global pool, sigmoid)
    "conv_celeba": dict(channels=(64, 128, 256, 512, 1024), size_z=64,
                        size_in=128, global_pool=True, sigmoid_out=True),
}


def make_legacy_vae(preset: str, dtype=jnp.float32, **overrides) -> ConvVAE:
    kw = {**PRESETS[preset], **overrides}
    return ConvVAE(dtype=dtype, **kw)
