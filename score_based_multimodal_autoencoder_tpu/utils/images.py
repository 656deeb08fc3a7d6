"""Image export utilities.

The framework keeps eval tensors device-resident (no PNG round trip for
FID), but users still need artifacts: sample grids and the one-PNG-per-
sample export format of the reference (save_batch_image,
/root/reference/utils.py:67-69) for interop with external FID tooling.
"""

from __future__ import annotations

import os

import numpy as np


def to_uint8(x) -> np.ndarray:
    return (np.clip(np.asarray(x), 0.0, 1.0) * 255).astype(np.uint8)


def save_batch_images(batch, prefix: str):
    """One PNG per sample: ``<prefix><i>.png`` (utils.py:67-69 format).

    batch: (B, H, W, C) float [0,1]; C=1 saved as grayscale.
    """
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(prefix)) or ".", exist_ok=True)
    arr = to_uint8(batch)
    for i in range(arr.shape[0]):
        img = arr[i, ..., 0] if arr.shape[-1] == 1 else arr[i]
        Image.fromarray(img).save(f"{prefix}{i}.png")


def save_modality_grid(images_per_mod, path: str):
    """(n_mod, B, H, W, C) -> grid PNG: rows = modalities, cols = samples
    (the qualitative-figure layout of train_poly_unet_cont.py:300-312)."""
    from PIL import Image

    arr = to_uint8(images_per_mod)
    n_mod, B, H, W, C = arr.shape
    if C == 1:
        arr = np.repeat(arr, 3, axis=-1)
    grid = arr.transpose(0, 2, 1, 3, 4).reshape(n_mod * H, B * W, 3)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)
