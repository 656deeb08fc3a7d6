"""Evaluation protocols of the reference, device-resident end to end.

Reproduces the three PolyMNIST protocols of /root/reference/fid_upd10.py:

- conditional (``predicted_mods`` given): per-target FID + coherence,
  repeated ``n_repeats`` times with inputs written once and outputs
  regenerated per repetition (the reference's FID-variance protocol,
  fid_upd10.py:563-587),
- unconditional: per-modality FID from prior samples + >=k-agreement
  coherence (fid_upd10.py:592-617),
- incremental: FID/coherence of modality 9 as the given set grows m0,
  m0m1, ... (fid_upd10.py:510-558).

FID feature extraction is pluggable (see eval.fid); generated images never
touch the filesystem.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .coherence import coherence_accuracy, unconditional_coherence
from .fid import compute_features, fid_from_features


def conditional_protocol(
    pipeline,
    key,
    pixels,
    labels,
    predicted_mods: Sequence[int],
    clf_apply: Optional[Callable] = None,
    feature_fn: Optional[Callable] = None,
    n_repeats: int = 1,
    batch_size: int = 256,
    score_transform: Optional[Callable] = None,
) -> Dict[str, Dict[int, float]]:
    """FID + coherence per predicted modality, given all others.

    ``score_transform`` enables EBM/classifier guidance inside the sampler
    (the reference's cl_g/cl_s path, train_poly_unet_cont.py:404-498).
    """
    pred = sorted(int(i) for i in predicted_mods)
    n_mod = pixels.shape[0]
    bad = [m for m in pred if not 0 <= m < n_mod]
    if bad:
        # jnp indexing would silently clamp out-of-range modalities and
        # produce a meaningless FID; fail loudly instead.
        raise ValueError(f"predicted modalities {bad} out of range for "
                         f"n_mod={n_mod}")
    real_feats = {}
    if feature_fn is not None:
        for m in pred:
            real_feats[m] = compute_features(feature_fn, np.asarray(pixels[m]),
                                             batch_size)
    fids: Dict[int, List[float]] = {m: [] for m in pred}
    cohs: Dict[int, List[float]] = {m: [] for m in pred}
    for r in range(n_repeats):
        key, sub = jax.random.split(key)
        out = pipeline.sample_conditional(sub, pixels, pred,
                                          score_transform=score_transform)
        for m in pred:
            if clf_apply is not None and labels is not None:
                cohs[m].append(float(coherence_accuracy(clf_apply, out[m], labels)))
            if feature_fn is not None:
                gen = compute_features(feature_fn, np.asarray(out[m]), batch_size)
                fids[m].append(fid_from_features(real_feats[m], gen))
    return {
        "fid": {m: float(np.mean(v)) for m, v in fids.items() if v},
        "coherence": {m: float(np.mean(v)) for m, v in cohs.items() if v},
    }


def unconditional_protocol(
    pipeline,
    key,
    pixels,
    clf_apply: Optional[Callable] = None,
    feature_fn: Optional[Callable] = None,
    min_agree: Optional[int] = None,
    n_repeats: int = 1,
    batch_size: int = 256,
) -> Dict[str, object]:
    n_mod = pipeline.fleet.n_mod
    amount = pixels.shape[1]
    if min_agree is None:
        min_agree = n_mod  # all modalities agree
    real_feats = {}
    if feature_fn is not None:
        for m in range(n_mod):
            real_feats[m] = compute_features(feature_fn, np.asarray(pixels[m]),
                                             batch_size)
    fids: Dict[int, List[float]] = {m: [] for m in range(n_mod)}
    cohs: List[float] = []
    for r in range(n_repeats):
        key, sub = jax.random.split(key)
        out = pipeline.sample_unconditional(sub, amount)
        if clf_apply is not None:
            cohs.append(float(unconditional_coherence(clf_apply, out, min_agree)))
        if feature_fn is not None:
            for m in range(n_mod):
                gen = compute_features(feature_fn, np.asarray(out[m]), batch_size)
                fids[m].append(fid_from_features(real_feats[m], gen))
    return {
        "fid": {m: float(np.mean(v)) for m, v in fids.items() if v},
        "coherence": float(np.mean(cohs)) if cohs else None,
    }


def incremental_protocol(
    pipeline,
    key,
    pixels,
    labels,
    target_mod: int,
    clf_apply: Optional[Callable] = None,
    feature_fn: Optional[Callable] = None,
    n_repeats: int = 1,
    batch_size: int = 256,
) -> List[Dict[str, float]]:
    """FID/coherence of ``target_mod`` as the given set grows 1..n_mod-1."""
    n_mod = pipeline.fleet.n_mod
    results = []
    for g in range(1, n_mod):
        predicted = [m for m in range(g, n_mod)]
        if target_mod not in predicted:
            break
        key, sub = jax.random.split(key)
        res = conditional_protocol(
            pipeline, sub, pixels, labels, predicted, clf_apply=clf_apply,
            feature_fn=feature_fn, n_repeats=n_repeats, batch_size=batch_size)
        results.append({
            "given": g,
            "fid": res["fid"].get(target_mod),
            "coherence": res["coherence"].get(target_mod),
        })
    return results
