"""CelebAMask-HQ three-modality dataset: face image / binary mask / attributes.

Directory layout matches the reference
(/root/reference/celeba_hq_mask_dataset.py:13-64):
``<root>/{train,val,test}_img/*.jpg``, ``<root>/{train,val,test}_mask/*.png``
(aligned by sorted filename stem) and ``CelebAMask-HQ-attribute-anno.txt``
whose line ``idx+2`` carries the 40 -1/1 attributes of image ``idx``.

The 18 "visible" attributes used throughout training/eval are selected by
ATTR_VISIBLE (/root/reference/train_lat_celebhq_unet_cont2.py:380; names in
/root/reference/configs.py:1-18).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

ATTR_VISIBLE = (4, 5, 8, 9, 11, 12, 15, 17, 18, 20, 21, 22, 26, 28, 31, 32, 33, 35)

ATTR_NAMES_18 = (
    "Bald", "Bangs", "Black_Hair", "Blond_Hair", "Brown_Hair", "Bushy_Eyebrows",
    "Eyeglasses", "Gray_Hair", "Heavy_Makeup", "Male", "Mouth_Slightly_Open",
    "Mustache", "Pale_Skin", "Receding_Hairline", "Smiling", "Straight_Hair",
    "Wavy_Hair", "Wearing_Hat",
)  # configs.py:1-18


@dataclass
class CelebAHQMaskData:
    """images: (N,S,S,3) uint8; masks: (N,S,S,1) uint8; attrs: (N,40) int8."""

    images: np.ndarray
    masks: np.ndarray
    attrs: np.ndarray

    def __len__(self) -> int:
        return self.images.shape[0]

    def visible_attrs(self) -> np.ndarray:
        """(N, 18) float32 subset used by the shipped pipeline."""
        return self.attrs[:, list(ATTR_VISIBLE)].astype(np.float32)


def load_celeba_hq(
    root: str, split: str = "train", size: int = 128,
    limit: Optional[int] = None,
) -> CelebAHQMaskData:
    from ..ops.native import decode_images

    img_files = sorted(glob.glob(os.path.join(root, f"{split}_img", "*.jpg")))
    mask_files = sorted(glob.glob(os.path.join(root, f"{split}_mask", "*.png")))
    assert len(img_files) == len(mask_files), "image/mask count mismatch"
    if limit is not None:
        img_files, mask_files = img_files[:limit], mask_files[:limit]

    with open(os.path.join(root, "CelebAMask-HQ-attribute-anno.txt")) as f:
        attr_lines = f.readlines()
    names = attr_lines[1].strip().split(" ")
    assert len(names) == 40, "expected 40 attribute names"

    n = len(img_files)
    attrs = np.zeros((n, 40), np.int8)
    for i, (imf, mkf) in enumerate(zip(img_files, mask_files)):
        stem_i = os.path.basename(imf)[:-4]
        stem_m = os.path.basename(mkf)[:-4]
        assert stem_i == stem_m, f"misaligned pair: {imf} vs {mkf}"
        idx = int(stem_i)
        row = attr_lines[idx + 2].strip().split(" ")
        assert idx == int(row[0][:-4]), "attribute row misaligned"
        attrs[i] = [1 if a == "1" else 0 for a in row[2:]]
    # Threaded native decode + PIL-BILINEAR resample (image_decode.cpp);
    # the reference's serial PIL loop (celeba_hq_mask_dataset.py:36-64) is
    # its startup bottleneck at 30k 1024x1024 JPG/PNG pairs.
    images = decode_images(img_files, size, size, 3)
    masks = decode_images(mask_files, size, size, 1)
    return CelebAHQMaskData(images, masks, attrs)
