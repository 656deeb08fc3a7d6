"""Evaluation classifiers: PolyMNIST digit CLF + CelebA attribute CLF.

- ``PolyMNISTClassifier``: the 3-conv digit classifier used for coherence
  scoring (PMCLF, /root/reference/polymnist_model.py:372-392). It consumes
  28x28 center crops of the 32x32 tensors
  (/root/reference/train_poly_unet_cont.py:475). The reference ships only a
  missing checkpoint binary; here the classifier is trained in-framework
  (see ``train.classifier_trainer``).
- ``ResClassifier``: conv attribute classifier used for CelebA F1 and the
  FGSM adversarial eval (ResCLF, /root/reference/h_vae_model_copy.py:208-235).
- ``MoPoEImageClassifier``: the MoPoE-paper CelebA attribute classifier
  (ClfImg + FeatureExtractorImg, h_vae_model_copy.py:254-342) - weighted
  pre-activation residual blocks (a*residual + b*out), channel dropout,
  64x64 inputs -> 18 logits. ``Res50Classifier`` lives in
  ``models/resnet50.py``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .vae import ResBlock


class PolyMNISTClassifier(nn.Module):
    """conv(3->32,s2) conv(32->64,s2) conv(64->128,s2) -> MLP(2048,512,10).

    ``dropout > 0`` + ``batch_norm=True`` gives the PTRCLF variant
    (polymnist_model.py:394-422): conv -> channel dropout -> BN -> ReLU per
    stage and an extra dropout before fc1's ReLU."""

    num_classes: int = 10
    dropout: float = 0.0
    batch_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate((32, 64, 128)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                        name=f"conv{i}")(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train,
                               broadcast_dims=(1, 2),
                               rng_collection="dropout")(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train,
                           rng_collection="dropout")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


def center_crop_28(x):
    """32x32 -> 28x28 center crop the classifier expects
    (train_poly_unet_cont.py:475: ``[:, :, 2:30, 2:30]`` in NCHW)."""
    if x.shape[1] == 28:
        return x
    return x[:, 2:30, 2:30, :]


class WeightedResBlock(nn.Module):
    """Pre-activation residual block with weighted skip ``a*res + b*out``
    and channel (2d) dropout (ResidualBlock2dConv,
    h_vae_model_copy.py:254-296). ``padding`` is the torch conv2 padding;
    the 1x1/k-conv pair is bias-free like the original."""

    out_ch: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    a: float = 2.0
    b: float = 0.3
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        h = nn.Conv(cin, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(nn.relu(h))
        h = nn.Dropout(self.dropout, deterministic=not train,
                       broadcast_dims=(1, 2), rng_collection="dropout")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(h)
        h = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=self.padding,
                    use_bias=False, dtype=self.dtype, name="conv2")(nn.relu(h))
        h = nn.Dropout(self.dropout, deterministic=not train,
                       broadcast_dims=(1, 2), rng_collection="dropout")(h)
        res = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                      strides=(self.stride, self.stride),
                      padding=self.padding, dtype=self.dtype,
                      name="down_conv")(x)
        res = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="down_bn")(res)
        return self.a * res + self.b * h


class MoPoEImageClassifier(nn.Module):
    """ClfImg (h_vae_model_copy.py:327-342): FeatureExtractorImg (stem conv
    + 4 weighted residual blocks, widths 128..640) -> dropout ->
    Linear(5*128, 18). Geometry matches the original on 64x64 inputs
    (stem p=2, blocks k4 s2 p(1,1,1,0) -> 1x1 map)."""

    size_out: int = 18
    width: int = 128
    a: float = 2.0
    b: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        x = nn.Conv(w, (3, 3), strides=(2, 2), padding=2, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        for i, pad in enumerate((1, 1, 1, 0)):
            x = WeightedResBlock(
                (i + 2) * w, padding=pad, a=self.a, b=self.b,
                dtype=self.dtype, name=f"resblock{i + 1}")(x, train)
        x = nn.Dropout(0.5, deterministic=not train,
                       rng_collection="dropout")(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.size_out, dtype=self.dtype, name="linear")(x)


class ResClassifier(nn.Module):
    """Residual conv classifier over images -> ``size_out`` logits
    (ResCLF, h_vae_model_copy.py:208-235; ReLU blocks per RBlock2)."""

    channel_list: Sequence[Tuple[int, int, int, int]]
    size_out: int = 18
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.channel_list[0][0], (5, 5), padding=2, dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for i, (cin, mid, out, rate) in enumerate(self.channel_list):
            x = ResBlock(mid, out, down_rate=rate, act="relu", dtype=self.dtype,
                         name=f"block{i}")(x, train)
        return nn.Dense(self.size_out, dtype=self.dtype, name="clf_lin")(
            x.reshape(x.shape[0], -1)
        )
