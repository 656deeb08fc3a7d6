"""Cross-modal coherence metrics for PolyMNIST.

- Conditional coherence: fraction of generated images whose digit (per the
  frozen classifier) matches the true label
  (/root/reference/train_poly_unet_cont.py:475-491,
  /root/reference/fid_upd10.py:293-300).
- Unconditional coherence: for prior samples, the fraction of sample rows
  where at least k of the n_mod decoded digits agree
  (/root/reference/fid_upd10.py:352-357).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.classifiers import center_crop_28


def coherence_accuracy(clf_apply, images, labels) -> jnp.ndarray:
    """Fraction of images classified as ``labels``. images: (B,32,32,3)."""
    logits = clf_apply(center_crop_28(images))
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == labels).astype(jnp.float32))


def unconditional_coherence(clf_apply, images_per_mod, min_agree: int) -> jnp.ndarray:
    """images_per_mod: (n_mod, B, 32, 32, 3). Returns fraction of rows where
    the modal (most common) digit appears in >= min_agree modalities."""
    n_mod = images_per_mod.shape[0]
    preds = []
    for m in range(n_mod):
        logits = clf_apply(center_crop_28(images_per_mod[m]))
        preds.append(jnp.argmax(logits, axis=-1))
    preds = jnp.stack(preds, axis=0)  # (n_mod, B)
    counts = jnp.stack([(preds == d).sum(axis=0) for d in range(10)], axis=0)
    max_agree = counts.max(axis=0)  # (B,)
    return jnp.mean((max_agree >= min_agree).astype(jnp.float32))
