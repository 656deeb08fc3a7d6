"""Flax ResNet-50 backbone + frozen attribute classifier (Res50CLF).

TPU-native counterpart of /root/reference/h_vae_model_copy.py:237-251: the
reference wraps a frozen ImageNet-pretrained ``torchvision.models.resnet50``
(children minus the fc layer, permanently in eval mode) and trains only a
``Linear(2048, size_out)`` head. torchvision is not available in this
environment, so the backbone is implemented architecture-exactly here
(standard He et al. v1 ResNet-50: 7x7 stem, (3, 4, 6, 3) bottleneck stacks,
expansion 4) with a ``load_torch_resnet50`` converter that accepts any
torchvision-format ``state_dict`` for weight parity.

TPU notes: channels-last NHWC; the backbone's BatchNorm always uses running
statistics (the reference keeps it in eval mode even while the head trains,
h_vae_model_copy.py:244-246), so the whole network is a pure function of
(params, batch_stats) - no mutable state in the training step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_STAGES = ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))
_EXPANSION = 4


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 reduce -> 3x3 (stride) -> 1x1 expand,
    BN after each, residual add (+1x1 downsample when shape changes)."""

    width: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.width * _EXPANSION
        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.width, (3, 3), strides=(self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn3")(h)
        if x.shape[-1] != out_ch or self.strides != 1:
            x = nn.Conv(out_ch, (1, 1), strides=(self.strides, self.strides),
                        use_bias=False, dtype=self.dtype, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name="down_bn")(x)
        return nn.relu(h + x)


class ResNet50Features(nn.Module):
    """ResNet-50 up to the global average pool: (B, H, W, 3) -> (B, 2048)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for s, (width, blocks, stride) in enumerate(_STAGES, start=1):
            for b in range(blocks):
                x = Bottleneck(width, stride if b == 0 else 1,
                               dtype=self.dtype, name=f"layer{s}_{b}")(x)
        return jnp.mean(x, axis=(1, 2))


class Res50Classifier(nn.Module):
    """Res50CLF (h_vae_model_copy.py:237-251): frozen ResNet-50 features ->
    ``Linear(2048, size_out)``. Freeze by taking gradients only w.r.t.
    ``params['clf_net']`` (the reference sets requires_grad=False on the
    backbone)."""

    size_out: int = 18
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = ResNet50Features(dtype=self.dtype, name="res50")(x)
        return nn.Dense(self.size_out, dtype=self.dtype, name="clf_net")(feats)


def load_torch_resnet50(variables, state_dict, head_key: str | None = None):
    """Convert a torchvision ``resnet50().state_dict()`` into the variables
    of ``Res50Classifier`` (or ``ResNet50Features`` when it has no
    ``clf_net`` param).

    ``head_key``: optional torch prefix for the classifier head weights
    (e.g. ``'clf_net'`` for a saved reference Res50CLF checkpoint); the
    torchvision ``fc.*`` ImageNet head is ignored.
    """
    import numpy as np

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    params = jax.tree_util.tree_map(lambda v: v, variables["params"])
    stats = jax.tree_util.tree_map(lambda v: v, variables["batch_stats"])
    has_head = "clf_net" in params
    backbone = params["res50"] if has_head else params
    bstats = stats["res50"] if has_head else stats

    def set_conv(node, torch_name):
        node["kernel"] = jnp.asarray(
            to_np(state_dict[f"{torch_name}.weight"]).transpose(2, 3, 1, 0))

    def set_bn(pnode, snode, torch_name):
        pnode["scale"] = jnp.asarray(to_np(state_dict[f"{torch_name}.weight"]))
        pnode["bias"] = jnp.asarray(to_np(state_dict[f"{torch_name}.bias"]))
        snode["mean"] = jnp.asarray(
            to_np(state_dict[f"{torch_name}.running_mean"]))
        snode["var"] = jnp.asarray(
            to_np(state_dict[f"{torch_name}.running_var"]))

    set_conv(backbone["conv1"], "conv1")
    set_bn(backbone["bn1"], bstats["bn1"], "bn1")
    for s, (_, blocks, _) in enumerate(_STAGES, start=1):
        for b in range(blocks):
            fname, tname = f"layer{s}_{b}", f"layer{s}.{b}"
            blk, sblk = backbone[fname], bstats[fname]
            for i in (1, 2, 3):
                set_conv(blk[f"conv{i}"], f"{tname}.conv{i}")
                set_bn(blk[f"bn{i}"], sblk[f"bn{i}"], f"{tname}.bn{i}")
            if "down_conv" in blk:
                set_conv(blk["down_conv"], f"{tname}.downsample.0")
                set_bn(blk["down_bn"], sblk["down_bn"], f"{tname}.downsample.1")

    if has_head and head_key is not None:
        params["clf_net"]["kernel"] = jnp.asarray(
            to_np(state_dict[f"{head_key}.weight"]).T)
        params["clf_net"]["bias"] = jnp.asarray(
            to_np(state_dict[f"{head_key}.bias"]))
    return {"params": params, "batch_stats": stats}
