"""PolyMNIST dataset construction: composite digits over style backgrounds.

The reference ships the 9 background JPGs (/root/reference/poly_background/)
but not the compositing code that built `data/Upd10MMNIST` (the MMNIST
recipe from thomassutter/MoPoE: per modality, crop a random background
patch and XOR-ish blend the digit ink into it). This tool rebuilds a
PolyMNIST-layout dataset from any grayscale digit array (e.g. decoded MNIST)
plus per-modality background images, and writes the reference's directory
layout `<out>/<split>/m{i}/<idx>.<label>.png` so data.polymnist.load_polymnist
and every eval script consume it directly.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def composite_digit(digit: np.ndarray, background: np.ndarray,
                    rng: np.random.Generator) -> np.ndarray:
    """One 28x28 digit (float [0,1], grayscale) over a random background
    crop -> (28, 28, 3) uint8. Ink inverts the background (the MMNIST look)."""
    H, W = background.shape[:2]
    top = int(rng.integers(0, max(H - 28, 1)))
    left = int(rng.integers(0, max(W - 28, 1)))
    patch = background[top:top + 28, left:left + 28].astype(np.float32) / 255.0
    if patch.ndim == 2:
        patch = np.repeat(patch[..., None], 3, -1)
    ink = digit.astype(np.float32)[..., None]
    out = patch * (1 - ink) + (1.0 - patch) * ink
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def build_polymnist(
    digits: np.ndarray,  # (N, 28, 28) float [0,1] or uint8
    labels: np.ndarray,  # (N,)
    backgrounds: Sequence[np.ndarray],  # one image per modality
    out_dir: str,
    split: str = "train",
    seed: int = 0,
    limit: Optional[int] = None,
):
    """Write `<out>/<split>/m{i}/{idx}.{label}.png` for every modality."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    if digits.dtype == np.uint8:
        digits = digits.astype(np.float32) / 255.0
    n = len(digits) if limit is None else min(limit, len(digits))
    for m, bg in enumerate(backgrounds):
        mod_dir = os.path.join(out_dir, split, f"m{m}")
        os.makedirs(mod_dir, exist_ok=True)
        for i in range(n):
            img = composite_digit(digits[i], np.asarray(bg), rng)
            Image.fromarray(img).save(
                os.path.join(mod_dir, f"{i}.{int(labels[i])}.png"))
