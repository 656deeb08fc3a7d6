"""CelebAMask-HQ evaluation: the 7-given-set cross-modal protocol.

Reproduces ``calc_perf`` (/root/reference/train_lat_celebhq_unet_cont2.py:
240-373) and the eval sweep over given-sets ['', '0', '1', '2', '01', '02',
'12'] (/root/reference/eval_lat_celeba_hq_all.py:498-528): for each
given-set, generate the missing modalities and report image FID (when the
image is generated), samples-averaged mask F1 + accuracy, and attribute
F1 + accuracy at the 0.5 threshold. Modality channel order: 0=image,
1=mask, 2=attributes.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .fid import compute_features, fid_from_features
from .metrics import binary_accuracy, samples_f1

GIVEN_SETS = ("", "0", "1", "2", "01", "02", "12")


def evaluate_given_set(
    pipeline,
    key,
    images,
    masks,
    attrs,
    given: str,
    feature_fn: Optional[Callable] = None,
    att_threshold: float = 0.5,
    batch_size: int = 64,
) -> Dict[str, float]:
    """One given-set: generate missing modalities, score each against truth."""
    inputs = [jnp.asarray(images), jnp.asarray(masks), jnp.asarray(attrs)]
    observed = [str(i) in given for i in range(3)]
    if given:
        outs = pipeline.sample_conditional(key, inputs, observed)
    else:
        outs = pipeline.sample_unconditional(key, images.shape[0])

    res: Dict[str, float] = {"given": given}
    # Attribute metrics (sigmoid logits -> threshold; calc_perf:325-333).
    attr_probs = jax.nn.sigmoid(outs[2])
    res["attr_f1"] = float(samples_f1(attr_probs, inputs[2], att_threshold))
    res["attr_acc"] = float(binary_accuracy(attr_probs, inputs[2], att_threshold))
    # Mask metrics (round both; calc_perf:335-343).
    res["mask_f1"] = float(samples_f1(outs[1], inputs[1], 0.5))
    res["mask_acc"] = float(binary_accuracy(outs[1], inputs[1], 0.5))
    # Image FID only when the image modality was generated (calc_perf:345-359).
    if "0" not in given and feature_fn is not None:
        real = compute_features(feature_fn, np.asarray(images), batch_size)
        gen = compute_features(feature_fn, np.asarray(outs[0]), batch_size)
        res["image_fid"] = fid_from_features(real, gen)
    return res


def celeba_protocol(
    pipeline,
    key,
    images,
    masks,
    attrs,
    given_sets: Sequence[str] = GIVEN_SETS,
    feature_fn: Optional[Callable] = None,
    att_threshold: float = 0.5,
    batch_size: int = 64,
) -> List[Dict[str, float]]:
    results = []
    for given in given_sets:
        key, sub = jax.random.split(key)
        results.append(
            evaluate_given_set(
                pipeline, sub, images, masks, attrs, given,
                feature_fn=feature_fn, att_threshold=att_threshold,
                batch_size=batch_size))
    return results


def fgsm_attack_f1(
    clf_apply,
    params,
    images,
    attrs,
    epsilon: float = 0.02,
    att_threshold: float = 0.5,
):
    """Adversarial attribute robustness: FGSM on the input image against a
    frozen attribute classifier (/root/reference/
    train_lat_celebhq_unet_cont2_cond.py:61-78): x' = clip(x + eps *
    sign(dL/dx)) with BCE loss, then F1 of predictions on x'.
    """
    x = jnp.asarray(images)
    y = jnp.asarray(attrs)

    def loss_fn(x):
        logits = clf_apply(params, x)
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    grad = jax.grad(loss_fn)(x)
    x_adv = jnp.clip(x + epsilon * jnp.sign(grad), 0.0, 1.0)
    probs = jax.nn.sigmoid(clf_apply(params, x_adv))
    return {
        "f1": float(samples_f1(probs, y, att_threshold)),
        "acc": float(binary_accuracy(probs, y, att_threshold)),
    }
