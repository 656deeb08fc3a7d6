"""FID InceptionV3 feature extractor, flax NHWC port.

Architecture-exact port of the vendored pytorch_fid InceptionV3
(/root/reference/pytorch_fid/inception.py:16-340): torchvision's
inception_v3 with the FID patches (TF-style avg-pool with
count_include_pad=False in the A/C/E blocks; max-pool in the final E
block's pool branch) producing the 2048-d pool3 features.

The canonical FID weights (pt_inception-2015-12-05-6726825d.pth) are not
bundled (no network egress in this environment); ``load_torch_weights``
converts that file's state_dict into this module's params when the user
provides it. Without weights the module still serves as a deterministic
feature extractor for relative comparisons.

Runs inference-only: BatchNorm uses stored running statistics.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicConv(nn.Module):
    """Conv(bias=False) + BatchNorm(eps=1e-3) + ReLU (torchvision BasicConv2d)."""

    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: object = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, tuple(self.kernel), strides=tuple(self.strides),
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _avg_pool_tf(x):
    """3x3 stride-1 avg pool, zero-pad excluded from the divisor
    (the FID patch: count_include_pad=False)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


def _max_pool(x, window=3, stride=2, pad=0):
    padding = ((pad, pad), (pad, pad))
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=padding)


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, dtype=self.dtype, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_tf(x)
        bp = BasicConv(self.pool_features, (1, 1), dtype=self.dtype,
                       name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7dbl_5")(bd)
        bp = _avg_pool_tf(x)
        bp = BasicConv(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # 'avg' (Mixed_7b / FIDInceptionE_1) or 'max' (7c / E_2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                      name="branch3x3_2a")(b3),
            BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                      name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, dtype=self.dtype,
                       name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                      name="branch3x3dbl_3a")(bd),
            BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                      name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool_tf(x)
        else:
            bp = _max_pool(x, window=3, stride=1, pad=1)
        bp = BasicConv(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Images (B, H, W, 3) in [0, 1] -> (B, 2048) pool3 features."""

    resize_input: bool = True
    normalize_input: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            B = x.shape[0]
            x = jax.image.resize(x, (B, 299, 299, x.shape[-1]), "bilinear")
        if self.normalize_input:
            x = 2 * x - 1
        x = x.astype(self.dtype)

        # Block 0 (inception.py:86-92).
        x = BasicConv(32, (3, 3), strides=(2, 2), dtype=self.dtype,
                      name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, dtype=self.dtype,
                      name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        # Block 1 (inception.py:95-101).
        x = BasicConv(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        # Block 2 (inception.py:103-113).
        x = InceptionA(32, self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, self.dtype, name="Mixed_5d")(x)
        x = InceptionB(self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, self.dtype, name="Mixed_6e")(x)
        # Block 3 (inception.py:116-124).
        x = InceptionD(self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg", self.dtype, name="Mixed_7b")(x)
        x = InceptionE("max", self.dtype, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to (1, 1)


def load_torch_weights(variables, state_dict):
    """Convert a pytorch_fid/torchvision inception state_dict into this
    module's variables.

    Args:
      variables: the dict returned by ``FIDInceptionV3().init(...)``.
      state_dict: torch ``state_dict()`` (e.g.
        ``torch.load('pt_inception-2015-12-05-6726825d.pth')``) with tensors
        or numpy arrays.

    Returns a new variables dict with params/batch_stats replaced.
    """
    import numpy as np

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    stats = jax.tree_util.tree_map(lambda x: x, variables["batch_stats"])

    def walk(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    # Collect every BasicConv path from the flax tree.
    def basicconv_paths(tree, prefix=()):
        out = []
        for k, v in tree.items():
            if isinstance(v, dict):
                if "conv" in v and "bn" in v:
                    out.append(prefix + (k,))
                else:
                    out.extend(basicconv_paths(v, prefix + (k,)))
        return out

    for path in basicconv_paths(params):
        torch_name = ".".join(path)
        w = to_np(state_dict[f"{torch_name}.conv.weight"])  # OIHW
        node = walk(params, path)
        node["conv"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))  # HWIO
        node["bn"]["scale"] = jnp.asarray(to_np(state_dict[f"{torch_name}.bn.weight"]))
        node["bn"]["bias"] = jnp.asarray(to_np(state_dict[f"{torch_name}.bn.bias"]))
        snode = walk(stats, path)
        snode["bn"]["mean"] = jnp.asarray(
            to_np(state_dict[f"{torch_name}.bn.running_mean"]))
        snode["bn"]["var"] = jnp.asarray(
            to_np(state_dict[f"{torch_name}.bn.running_var"]))

    return {"params": params, "batch_stats": stats}


def make_inception_feature_fn(weights_path: Optional[str] = None,
                              resize_input: bool = True):
    """Build a jittable ``(B, H, W, 3) -> (B, 2048)`` feature_fn for eval.fid.

    With ``weights_path`` pointing at the canonical FID .pth, features match
    pytorch_fid; without it the network is randomly initialized (still a
    valid fixed extractor for relative FIDs, but NOT comparable to published
    numbers - a warning is printed).
    """
    model = FIDInceptionV3(resize_input=resize_input)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    if weights_path is not None:
        import torch

        state_dict = torch.load(weights_path, map_location="cpu")
        variables = load_torch_weights(variables, state_dict)
    else:
        import sys

        print("[fid] WARNING: no Inception weights file; using random "
              "features (relative comparisons only)", file=sys.stderr)

    from .fid import ParamFeatureFn

    # Split params-vs-apply so eval.fid jits with the weights as arguments
    # (closures bake ~95 MB of Inception weights into the HLO as constants).
    return ParamFeatureFn(
        lambda variables, images: model.apply(variables, images), variables)
