"""Offline CelebAMask-HQ mask preprocessing.

Counterpart of /root/reference/create_celeba_mask.py:21-88 (via the
CelebAMask-HQ repo): merges the per-part annotation PNGs
(``CelebAMask-HQ-mask-anno/<k//2000>/{k:05d}_<part>.png``) into one mask
per image. PIL/numpy only (the reference needs cv2, which is not assumed
here).

- 'gray': binary union of the 17 part labels EXCLUDING skin
  (create_celeba_mask.py:28 - the shipped binary-mask dataset).
- 'index': per-pixel part index 1..18 over the 18-label list including skin
  (the commented intermediate step, create_celeba_mask.py:55-67).
- 'color': maps an index mask through the 19-color palette
  (create_celeba_mask.py:22-26, 70-88).
"""

from __future__ import annotations

import os

import numpy as np

PART_LABELS = (
    "nose", "eye_g", "l_eye", "r_eye", "l_brow", "r_brow", "l_ear", "r_ear",
    "mouth", "u_lip", "l_lip", "hair", "hat", "ear_r", "neck_l", "neck",
    "cloth",
)
PART_LABELS_WITH_SKIN = ("skin",) + PART_LABELS

COLOR_PALETTE = (
    (0, 0, 0), (204, 0, 0), (76, 153, 0), (204, 204, 0), (51, 51, 255),
    (204, 0, 204), (0, 255, 255), (255, 204, 204), (102, 51, 0), (255, 0, 0),
    (102, 204, 0), (255, 255, 0), (0, 0, 153), (0, 0, 204), (255, 51, 153),
    (0, 204, 204), (0, 51, 0), (255, 153, 51), (0, 204, 0),
)


def _anno_path(anno_root: str, k: int, label: str) -> str:
    return os.path.join(anno_root, str(k // 2000), f"{k:05d}_{label}.png")


def merge_mask(anno_root: str, k: int, mode: str = "gray") -> np.ndarray:
    """Merge image k's part annotations into a (512, 512) mask array."""
    from PIL import Image

    if mode == "gray":
        labels = PART_LABELS
        base = np.zeros((512, 512), np.uint8)
        for label in labels:
            fn = _anno_path(anno_root, k, label)
            if os.path.exists(fn):
                part = np.asarray(Image.open(fn).convert("L"))
                base[part != 0] = 255
        return base
    if mode == "index":
        base = np.zeros((512, 512), np.uint8)
        for idx, label in enumerate(PART_LABELS_WITH_SKIN):
            fn = _anno_path(anno_root, k, label)
            if os.path.exists(fn):
                part = np.asarray(Image.open(fn).convert("L"))
                base[part != 0] = idx + 1
        return base
    raise ValueError(mode)


def colorize_index_mask(index_mask: np.ndarray) -> np.ndarray:
    """(H, W) index mask -> (H, W, 3) via the reference palette."""
    out = np.zeros(index_mask.shape + (3,), np.uint8)
    for idx, color in enumerate(COLOR_PALETTE):
        out[index_mask == idx] = color
    return out


def create_masks(anno_root: str, out_dir: str, mode: str = "gray",
                 img_num: int = 30000):
    """Batch tool matching create_mask() (create_celeba_mask.py:21-88)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    for k in range(img_num):
        if mode == "color":
            mask = colorize_index_mask(merge_mask(anno_root, k, "index"))
        else:
            mask = merge_mask(anno_root, k, mode)
        Image.fromarray(mask).save(os.path.join(out_dir, f"{k}.png"))
