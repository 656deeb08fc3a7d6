"""Per-modality autoencoders: the ResVAE/ResAE family + attribute MLP VAEs.

TPU-native re-design of the reference's modality autoencoders:

- ``ResVAE``/``ResAE`` generalize the reference's two conv families into one
  configurable module: activation + upsample mode select between the
  PolyMNIST flavor (LeakyReLU(0.2), nearest upsample; /root/reference/
  h_vae_model_copy.py:9-174) and the CelebA "N" flavor (GELU, bilinear
  upsample, sigmoid output; h_vae_model_copy.py:347-591).
- ``AttributeVAE`` is the 18-attribute MLP VAE (CelebAAttrNewBN,
  /root/reference/h_vae_model.py:712-779) and ``AttributeAE`` its
  deterministic variant (h_vae_model.py:839-899).

Layout is NHWC throughout; all stochastic ops take explicit PRNG keys
(the reference draws CPU noise inside forward - a host sync per call,
h_vae_model_copy.py:118-121). BatchNorm uses flax's ``batch_stats``
collection; under data-parallel pjit the batch axis is global, which makes
batch statistics effectively synced across replicas.

Shipped channel configurations are exported as constants so every script
config in the reference maps to a one-liner here (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# (in_ch, mid_ch, out_ch, resize_rate) per block, as in the reference configs.
POLYMNIST_ENC_CHANNELS = ((64, 64, 64, 2), (64, 128, 128, 2), (128, 256, 256, 2))
POLYMNIST_DEC_CHANNELS = ((256, 128, 128, 2), (128, 128, 64, 2), (64, 64, 64, 2))
# train_polyupd.py:196-200

CELEBA_IMG_ENC_CHANNELS = ((64, 128, 128, 2), (128, 256, 256, 2), (256, 512, 512, 2))
CELEBA_IMG_DEC_CHANNELS = ((512, 512, 256, 2), (256, 256, 128, 2), (128, 128, 64, 2))
# train_celeba_res_hq.py:132-133

CELEBA_MASK_ENC_CHANNELS = ((64, 128, 128, 4), (128, 256, 256, 4))
CELEBA_MASK_DEC_CHANNELS = ((256, 256, 128, 4), (128, 128, 64, 4))
# train_celeba_mask_hq.py:130-131


def _activation(name: str):
    if name == "leaky_relu_0.2":
        return lambda x: nn.leaky_relu(x, 0.2)
    if name == "leaky_relu_0.1":
        return lambda x: nn.leaky_relu(x, 0.1)
    if name == "gelu":
        # torch nn.GELU() is exact erf (the reference default), not tanh.
        return lambda x: nn.gelu(x, approximate=False)
    if name == "relu":
        return nn.relu
    raise ValueError(name)


def _avg_pool(x, rate):
    return nn.avg_pool(x, (rate, rate), strides=(rate, rate))


def _upsample(x, rate, mode):
    B, H, W, C = x.shape
    if mode == "nearest":
        return jax.image.resize(x, (B, H * rate, W * rate, C), method="nearest")
    if mode == "bilinear":
        # torch Upsample(mode='bilinear', align_corners=False) ==
        # jax.image.resize 'linear' (half-pixel centers).
        return jax.image.resize(x, (B, H * rate, W * rate, C), method="linear")
    raise ValueError(mode)


class ResBlock(nn.Module):
    """conv-BN-act-conv-BN residual block with optional avg-pool down or
    upsample (RBlock / RBlockN, h_vae_model_copy.py:9-39 / 347-377).
    ``dropout > 0`` gives the RBlockND family (h_vae_model_copy.py:593-640)."""

    mid: int
    out: int
    down_rate: Optional[int] = None
    up_rate: Optional[int] = None
    act: str = "leaky_relu_0.2"
    upsample_mode: str = "nearest"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _activation(self.act)
        h = nn.Conv(self.mid, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h)
        h = act(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train,
                           rng_collection="dropout")(h)
        h = nn.Conv(self.out, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(h)
        if x.shape[-1] != self.out:
            x = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype, name="size_conv")(x)
        h = act(x + h)
        if self.down_rate is not None:
            h = _avg_pool(h, self.down_rate)
        if self.up_rate is not None:
            h = _upsample(h, self.up_rate, self.upsample_mode)
        return h


class ResEncoder(nn.Module):
    """5x5 stem conv + AvgPool + ResBlock stack -> (mu, logvar)
    (ResEncoder/ResEncoderN, h_vae_model_copy.py:41-71 / 379-409).

    The final feature map is split channel-wise into mu/logvar halves, each
    flattened through its own Dense head.
    """

    channel_list: Sequence[Tuple[int, int, int, int]]
    size_in: int = 64
    size_z: int = 64
    act: str = "leaky_relu_0.2"
    stem_act: str = "leaky_relu_0.2"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem_act = _activation(self.stem_act)
        x = nn.Conv(self.channel_list[0][0], (5, 5), padding=2, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="stem_bn")(x)
        x = stem_act(x)
        x = _avg_pool(x, 2)
        for i, (cin, mid, out, rate) in enumerate(self.channel_list):
            x = ResBlock(mid, out, down_rate=rate, act=self.act, dtype=self.dtype, name=f"block{i}")(x, train)
        # Channel-wise mu/logvar split (h_vae_model_copy.py:68-70). NHWC
        # flatten order differs from torch NCHW, which only permutes the
        # Dense head's input basis - an equivalent parameterization.
        mu_half, logvar_half = jnp.split(x, 2, axis=-1)
        mu = nn.Dense(self.size_z, dtype=self.dtype, name="mu_lin")(mu_half.reshape(x.shape[0], -1))
        logvar = nn.Dense(self.size_z, dtype=self.dtype, name="logvar_lin")(
            logvar_half.reshape(x.shape[0], -1)
        )
        return mu, logvar


class ResDecoder(nn.Module):
    """Dense z-projection + upsampling ResBlock stack + 5x5 head
    (ResDecoder/ResDecoderN + the z_lin in ResVAE,
    h_vae_model_copy.py:73-89, 104-126 / 411-428)."""

    channel_list: Sequence[Tuple[int, int, int, int]]
    size_in: int = 64
    size_z: int = 64
    img_ch: int = 3
    act: str = "leaky_relu_0.2"
    upsample_mode: str = "nearest"
    sigmoid_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        init_ch = self.channel_list[0][0]
        init_size = self.size_in
        for _, _, _, rate in self.channel_list:
            init_size //= rate
        x = nn.Dense(init_ch * init_size * init_size, dtype=self.dtype, name="z_lin")(z)
        x = nn.relu(x)
        x = x.reshape(z.shape[0], init_size, init_size, init_ch)
        for i, (cin, mid, out, rate) in enumerate(self.channel_list):
            x = ResBlock(
                mid, out, up_rate=rate, act=self.act,
                upsample_mode=self.upsample_mode, dtype=self.dtype, name=f"block{i}",
            )(x, train)
        last = self.channel_list[-1][2]
        # Reference quirk kept: even the celeb ("N") decoder's head block is
        # a plain RBlock - LeakyReLU(0.2), NOT GELU (ResDecoderN.ch_dec,
        # h_vae_model_copy.py:419-424). It has no resize, so the upsample
        # mode is moot.
        x = ResBlock(last, last, act="leaky_relu_0.2",
                     dtype=self.dtype, name="head_block")(x, train)
        x = nn.Conv(self.img_ch, (5, 5), padding=2, dtype=self.dtype, name="head_conv")(x)
        if self.sigmoid_out:
            x = nn.sigmoid(x)
        return x


def reparametrize(key, mu, logvar):
    """z = mu + exp(logvar/2) * eps with an explicit key
    (h_vae_model_copy.py:118-121)."""
    return mu + jnp.exp(logvar / 2) * jax.random.normal(key, mu.shape, mu.dtype)


class ResVAE(nn.Module):
    """Residual conv VAE (ResVAE / ResVAEN, h_vae_model_copy.py:91-137 /
    457-547). ``variant='poly'`` = LeakyReLU/nearest (PolyMNIST),
    ``variant='celeb'`` = GELU/bilinear/sigmoid (CelebA image & mask)."""

    enc_channel_list: Sequence[Tuple[int, int, int, int]]
    dec_channel_list: Sequence[Tuple[int, int, int, int]]
    size_in: int = 64
    size_z: int = 64
    img_ch: int = 3
    variant: str = "poly"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.variant == "poly":
            act, stem_act, up_mode, sig = "leaky_relu_0.2", "leaky_relu_0.2", "nearest", False
        elif self.variant == "celeb":
            act, stem_act, up_mode, sig = "gelu", "leaky_relu_0.1", "bilinear", True
        elif self.variant == "soft":
            # ResVAESoft (h_vae_model_copy.py:506-546): poly-style LeakyReLU
            # blocks + nearest upsample with a Sigmoid output head
            # (ResDecoderSoft :430-455). Legacy variant, unreachable in the
            # shipped reference configs.
            act, stem_act, up_mode, sig = "leaky_relu_0.2", "leaky_relu_0.2", "nearest", True
        else:
            raise ValueError(self.variant)
        self.enc = ResEncoder(
            self.enc_channel_list, self.size_in, self.size_z, act=act,
            stem_act=stem_act, dtype=self.dtype,
        )
        self.dec = ResDecoder(
            self.dec_channel_list, self.size_in, self.size_z, self.img_ch,
            act=act, upsample_mode=up_mode, sigmoid_out=sig, dtype=self.dtype,
        )

    def encoder(self, x, train: bool = False):
        return self.enc(x, train)

    def decoder(self, z, train: bool = False):
        return self.dec(z, train)

    def sample(self, key, amount, train: bool = False):
        z = jax.random.normal(key, (amount, self.size_z))
        return self.dec(z, train)

    def __call__(self, x, key=None, train: bool = False):
        mu, logvar = self.enc(x, train)
        if key is None:
            z = mu
        else:
            z = reparametrize(key, mu, logvar)
        out = self.dec(z, train)
        return out, mu, logvar


class ResAE(nn.Module):
    """Deterministic AE twin: same nets, mean-only latent
    (h_vae_model_copy.py:139-174 / 549-591)."""

    enc_channel_list: Sequence[Tuple[int, int, int, int]]
    dec_channel_list: Sequence[Tuple[int, int, int, int]]
    size_in: int = 64
    size_z: int = 64
    img_ch: int = 3
    variant: str = "poly"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vae = ResVAE(
            self.enc_channel_list, self.dec_channel_list, self.size_in,
            self.size_z, self.img_ch, self.variant, self.dtype,
        )

    def encoder(self, x, train: bool = False):
        return self.vae.encoder(x, train)[0]

    def decoder(self, z, train: bool = False):
        return self.vae.decoder(z, train)

    def __call__(self, x, train: bool = False):
        return self.vae.decoder(self.vae.encoder(x, train)[0], train)


class _MLPStack(nn.Module):
    widths: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class AttributeVAE(nn.Module):
    """MLP VAE over the binary attribute vector (CelebAAttrNewBN,
    h_vae_model.py:712-779). Decoder emits logits; apply sigmoid downstream."""

    size_z: int = 256
    att_size: int = 18
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.enc_net = _MLPStack((128, 256, 512, 512, 512), self.dtype)
        self.mu_lin = nn.Dense(self.size_z, dtype=self.dtype)
        self.logvar_lin = nn.Dense(self.size_z, dtype=self.dtype)
        self.dec_net = _MLPStack((512, 512, 512, 256, 128), self.dtype)
        self.out_lin = nn.Dense(self.att_size, dtype=self.dtype)

    def encoder(self, x, train: bool = False):
        h = self.enc_net(x, train)
        return self.mu_lin(h), self.logvar_lin(h)

    def decoder(self, z, train: bool = False):
        return self.out_lin(self.dec_net(z, train))

    def __call__(self, x, key=None, train: bool = False):
        mu, logvar = self.encoder(x, train)
        z = mu if key is None else reparametrize(key, mu, logvar)
        return self.decoder(z, train), mu, logvar


class AttributeAE(nn.Module):
    """Deterministic attribute AE (CelebAAttrNewBNAE, h_vae_model.py:839-899)."""

    size_z: int = 256
    att_size: int = 18
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vae = AttributeVAE(self.size_z, self.att_size, self.dtype)

    def encoder(self, x, train: bool = False):
        return self.vae.encoder(x, train)[0]

    def decoder(self, z, train: bool = False):
        return self.vae.decoder(z, train)

    def __call__(self, x, train: bool = False):
        return self.vae.decoder(self.vae.encoder(x, train)[0], train)


def ae_reg_loss(x, x_hat, z, beta: float = 1.0):
    """Regularized-AE loss: sum-MSE/B + beta * mean ||z||^2
    (/root/reference/train_polyupdAE.py:31-35). Returns (recon, reg)."""
    recon = jnp.sum((x_hat - x) ** 2) / x.shape[0]
    z_norm = jnp.mean(jnp.sum(z**2, axis=-1))
    return recon, beta * z_norm


def vae_loss(x, x_hat, mu, logvar, beta: float = 1.0):
    """Sum-MSE / batch + beta * KL / batch (train_polyupd.py:25-29).

    Returns (recon, kl) so callers can log them separately.
    """
    B = x.shape[0]
    recon = jnp.sum((x_hat - x) ** 2) / B
    kl = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar)) / B
    return recon, beta * kl


def polymnist_vae(size_z: int = 64, dtype=jnp.float32) -> ResVAE:
    """The PolyMNIST workhorse config (train_polyupd.py:196-200)."""
    return ResVAE(POLYMNIST_ENC_CHANNELS, POLYMNIST_DEC_CHANNELS,
                  size_in=32, size_z=size_z, img_ch=3, variant="poly", dtype=dtype)


def celeba_image_vae(size_z: int = 256, dtype=jnp.float32,
                     size_in: int = 128) -> ResVAE:
    """CelebA-HQ 128x128 face VAE (train_celeba_res_hq.py:132-137).

    ``size_in != 128`` builds a proportionally-scaled smoke config (same
    topology, smaller widths) for CPU tests / synthetic CLI drives; the
    reference channel lists are kept verbatim at 128.
    """
    if size_in == 128:
        return ResVAE(CELEBA_IMG_ENC_CHANNELS, CELEBA_IMG_DEC_CHANNELS,
                      size_in=128, size_z=size_z, img_ch=3, variant="celeb",
                      dtype=dtype)
    return ResVAE(((8, 16, 16, 2), (16, 32, 32, 2)),
                  ((32, 16, 16, 2), (16, 16, 16, 2)),
                  size_in=size_in, size_z=size_z, img_ch=3, variant="celeb",
                  dtype=dtype)


def celeba_mask_vae(size_z: int = 256, dtype=jnp.float32,
                    size_in: int = 128) -> ResVAE:
    """CelebA-HQ 128x128 binary mask VAE (train_celeba_mask_hq.py:131-136).

    ``size_in != 128``: smoke-scaled variant (see celeba_image_vae).
    """
    if size_in == 128:
        return ResVAE(CELEBA_MASK_ENC_CHANNELS, CELEBA_MASK_DEC_CHANNELS,
                      size_in=128, size_z=size_z, img_ch=1, variant="celeb",
                      dtype=dtype)
    return ResVAE(((8, 16, 16, 2), (16, 32, 32, 2)),
                  ((32, 16, 16, 2), (16, 16, 16, 2)),
                  size_in=size_in, size_z=size_z, img_ch=1, variant="celeb",
                  dtype=dtype)
