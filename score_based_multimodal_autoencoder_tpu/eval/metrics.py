"""Mask/attribute metrics: samples-averaged F1 and binary accuracy.

Reproduces sklearn's ``f1_score(average='samples')`` as used on rounded
masks and 0.5-thresholded attributes
(/root/reference/train_lat_celebhq_unet_cont2.py:361-371,
/root/reference/eval_lat_celeba_hq_all.py:331-341), but jitted on device.
"""

from __future__ import annotations

import jax.numpy as jnp


def samples_f1(pred, target, threshold: float = 0.5) -> jnp.ndarray:
    """Per-sample F1 averaged over the batch.

    pred/target: (B, ...) arrays; pred is thresholded, target rounded.
    sklearn convention: a sample with no true and no predicted positives
    gets F1 = 0 (with a zero-division warning) - matched here.
    """
    B = pred.shape[0]
    p = (pred.reshape(B, -1) >= threshold).astype(jnp.float32)
    t = (target.reshape(B, -1) >= 0.5).astype(jnp.float32)
    tp = (p * t).sum(axis=1)
    pred_pos = p.sum(axis=1)
    true_pos = t.sum(axis=1)
    denom = pred_pos + true_pos
    f1 = jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1e-12), 0.0)
    return f1.mean()


def binary_accuracy(pred, target, threshold: float = 0.5) -> jnp.ndarray:
    p = (pred >= threshold).astype(jnp.float32)
    t = (target >= 0.5).astype(jnp.float32)
    return (p == t).astype(jnp.float32).mean()
