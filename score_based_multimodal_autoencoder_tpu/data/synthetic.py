"""Synthetic multimodal fixtures: PolyMNIST-like and CelebA-like data.

The real datasets (PolyMNIST composites, CelebAMask-HQ) are not bundled
with either repo; these generators produce structurally identical paired
data - a shared semantic variable (digit class / attribute vector) rendered
through per-modality styles - so the full two-stage pipeline, conditional
coherence, and eval protocols are exercisable on CI and in benchmarks
without the original archives. Loaders for the real layouts live in
data/polymnist.py and data/celeba_hq.py.
"""

from __future__ import annotations

import numpy as np

from .polymnist import PolyMNISTData
from .celeba_hq import CelebAHQMaskData

# 5x7 bitmap digit font (rows top->bottom, 1 = ink).
_DIGIT_FONT = {
    0: ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    1: ["00100", "01100", "00100", "00100", "00100", "00100", "01110"],
    2: ["01110", "10001", "00001", "00010", "00100", "01000", "11111"],
    3: ["11110", "00001", "00001", "01110", "00001", "00001", "11110"],
    4: ["00010", "00110", "01010", "10010", "11111", "00010", "00010"],
    5: ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    6: ["00110", "01000", "10000", "11110", "10001", "10001", "01110"],
    7: ["11111", "00001", "00010", "00100", "01000", "01000", "01000"],
    8: ["01110", "10001", "10001", "01110", "10001", "10001", "01110"],
    9: ["01110", "10001", "10001", "01111", "00001", "00010", "01100"],
}


def _digit_stamp(d: int, scale: int = 3) -> np.ndarray:
    """(7*scale, 5*scale) binary glyph."""
    rows = _DIGIT_FONT[d]
    bitmap = np.array([[int(c) for c in row] for row in rows], np.uint8)
    return np.kron(bitmap, np.ones((scale, scale), np.uint8))


def synthetic_polymnist(
    n: int = 256, n_mod: int = 10, size: int = 32, seed: int = 0
) -> PolyMNISTData:
    """Paired digits rendered over modality-specific textured backgrounds."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, size=n).astype(np.int32)
    images = np.zeros((n_mod, n, size, size, 3), np.uint8)

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for m in range(n_mod):
        mod_rng = np.random.default_rng(1000 + m)
        color = mod_rng.uniform(0.3, 1.0, size=3)
        freq = mod_rng.uniform(2, 6, size=2)
        phase = mod_rng.uniform(0, np.pi, size=2)
        bg = 0.5 + 0.35 * np.sin(freq[0] * np.pi * xx + phase[0]) * np.cos(
            freq[1] * np.pi * yy + phase[1]
        )
        bg3 = bg[..., None] * color[None, None, :]
        ink = mod_rng.uniform(0.7, 1.0, size=3)
        # Glyph scale adapts to the canvas (7-row font + jitter margin).
        scale = max(1, (size - 6) // 7)
        for i in range(n):
            img = bg3 + rng.normal(0, 0.03, size=(size, size, 3))
            stamp = _digit_stamp(int(labels[i]), scale=min(scale, 3))
            h, w = stamp.shape
            oy = (size - h) // 2 + int(rng.integers(-2, 3))
            ox = (size - w) // 2 + int(rng.integers(-2, 3))
            region = img[oy : oy + h, ox : ox + w]
            region[stamp > 0] = ink
            images[m, i] = np.clip(img * 255, 0, 255).astype(np.uint8)
    return PolyMNISTData(images, labels)


def synthetic_celeba(n: int = 64, size: int = 128, seed: int = 0) -> CelebAHQMaskData:
    """Attribute-driven blob "faces" + consistent masks + 40-dim attrs."""
    rng = np.random.default_rng(seed)
    attrs = (rng.uniform(size=(n, 40)) < 0.3).astype(np.int8)
    images = np.zeros((n, size, size, 3), np.uint8)
    masks = np.zeros((n, size, size, 1), np.uint8)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for i in range(n):
        cy, cx = rng.uniform(0.35, 0.65, size=2)
        r = rng.uniform(0.2, 0.35)
        blob = ((yy - cy) ** 2 + 1.4 * (xx - cx) ** 2) < r**2
        tone = 0.4 + 0.4 * attrs[i, :3].mean()
        img = np.stack([0.2 + 0.1 * xx, 0.2 + 0.1 * yy, 0.25 + 0.0 * xx], -1)
        img[blob] = [tone, tone * 0.85, tone * 0.7]
        img += rng.normal(0, 0.02, img.shape)
        images[i] = np.clip(img * 255, 0, 255).astype(np.uint8)
        masks[i, ..., 0] = (blob * 255).astype(np.uint8)
    return CelebAHQMaskData(images, masks, attrs)
