"""PolyMNIST: 10 style-modalities of paired MNIST digits.

Directory layout matches the reference exactly
(/root/reference/polymnist_dataset.py:169-273):
``<root>/<split>/m{i}/*.{label}.png`` with split in {train, val, test} and
the digit label embedded as the second-to-last dot-field of the filename
(polymnist_dataset.py:35). Images are 28x28 RGB; the 32x32 variant
zero-pads 2 px on every side (PM32Dataset, polymnist_dataset.py:60-69).

Storage is modality-major uint8 (NHWC); normalization to [0,1] float32
happens per batch on the way to the device.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np


@dataclass
class PolyMNISTData:
    """images: (n_mod, N, H, W, 3) uint8; labels: (N,) int32."""

    images: np.ndarray
    labels: np.ndarray

    @property
    def n_mod(self) -> int:
        return self.images.shape[0]

    def __len__(self) -> int:
        return self.images.shape[1]

    def pad_to_32(self) -> "PolyMNISTData":
        """28x28 -> 32x32 via 2px zero pad (PM32Dataset parity)."""
        if self.images.shape[2] == 32:
            return self
        padded = np.pad(self.images, ((0, 0), (0, 0), (2, 2), (2, 2), (0, 0)))
        return PolyMNISTData(padded, self.labels)

    def modality_dict(self) -> Dict[str, np.ndarray]:
        """Reference-style {'m0': ..., 'm9': ...} view."""
        return {f"m{i}": self.images[i] for i in range(self.n_mod)}


def _label_from_path(path: str) -> int:
    return int(path.split(".")[-2])


def load_polymnist(
    root: str,
    split: str = "train",
    modalities: Optional[List[str]] = None,
    size: int = 32,
) -> PolyMNISTData:
    """Eager-load a PolyMNIST split from the reference's PNG layout.

    Decoding runs through the threaded native PNG decoder
    (ops/native/image_decode.cpp) when available - the reference's serial
    PIL loop over 10 x 60k files (polymnist_dataset.py:60-89) is the
    slowest part of its startup.
    """
    from ..ops.native import decode_images

    if modalities is None:
        modalities = [f"m{i}" for i in range(10)]
    per_mod_files = []
    for m in modalities:
        files = sorted(glob.glob(os.path.join(root, split, m, "*.png")))
        if not files:
            raise FileNotFoundError(f"no PNGs under {root}/{split}/{m}")
        per_mod_files.append(files)
    n = len(per_mod_files[0])
    # Equal-count sanity check (polymnist_dataset.py:26-28).
    assert all(len(f) == n for f in per_mod_files), "modalities differ in size"

    images = np.zeros((len(modalities), n, 28, 28, 3), np.uint8)
    labels = np.zeros((n,), np.int32)
    for mi, files in enumerate(per_mod_files):
        images[mi] = decode_images(files, 28, 28, 3)
        if mi == 0:
            labels[:] = [_label_from_path(f) for f in files]
    ds = PolyMNISTData(images, labels)
    return ds.pad_to_32() if size == 32 else ds
