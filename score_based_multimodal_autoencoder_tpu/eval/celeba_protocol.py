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
    refine_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """One given-set: generate missing modalities, score each against truth.

    ``refine_fn(key, images01) -> images01``: optional DiffuseVAE refiner
    applied to the GENERATED image modality before a second FID, the
    reference's headline image protocol (eval_lat_celeba_hq_all.py:72-122,
    refiner built at :448); reported as ``image_fid_refined`` alongside the
    raw ``image_fid``.
    """
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
        if refine_fn is not None:
            key, rkey = jax.random.split(key)
            refined = refine_fn(rkey, jnp.clip(outs[0], 0.0, 1.0))
            ref_feats = compute_features(feature_fn, np.asarray(refined),
                                         batch_size)
            res["image_fid_refined"] = fid_from_features(real, ref_feats)
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
    refine_fn: Optional[Callable] = None,
    n_repeats: int = 1,
) -> List[Dict[str, float]]:
    """The full given-set sweep; ``n_repeats > 1`` regenerates each cell
    with fresh keys and reports the mean plus ``*_std`` spreads - the
    reference's FID-variance protocol (fid_n_times, fid_upd10.py:556-587:
    inputs written once, outputs regenerated per repetition)."""
    results = []
    for given in given_sets:
        reps = []
        for _ in range(n_repeats):
            key, sub = jax.random.split(key)
            reps.append(evaluate_given_set(
                pipeline, sub, images, masks, attrs, given,
                feature_fn=feature_fn, att_threshold=att_threshold,
                batch_size=batch_size, refine_fn=refine_fn))
        if n_repeats == 1:
            results.append(reps[0])
            continue
        agg: Dict[str, float] = {"given": given, "n_repeats": n_repeats}
        for k in reps[0]:
            if k == "given":
                continue
            vals = [r[k] for r in reps]
            agg[k] = float(np.mean(vals))
            agg[f"{k}_std"] = float(np.std(vals))
        results.append(agg)
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
