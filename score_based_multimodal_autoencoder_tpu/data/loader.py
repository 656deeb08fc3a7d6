"""Minimal device-feeding batch iterator.

The reference pipes eager full-RAM tensors through torch DataLoader worker
processes (/root/reference/polymnist_dataset.py:29-35,
train_polyupd.py:18-23). On TPU the arrays are small enough to keep in host
RAM as uint8 and slice/normalize per batch; ``BatchIterator`` shuffles with
an explicit PRNG key, drops remainders (static shapes for jit), and
device_puts one batch ahead (double buffering) so host->HBM transfer
overlaps the previous step.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np


class BatchIterator:
    """Iterate aligned numpy arrays in shuffled, device-resident batches."""

    def __init__(
        self,
        arrays,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        transform: Optional[Callable] = None,
        sharding=None,
    ):
        self.arrays = arrays
        leaves = jax.tree_util.tree_leaves(arrays)
        self.n = leaves[0].shape[0]
        assert all(l.shape[0] == self.n for l in leaves)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.transform = transform
        self.sharding = sharding
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return self.n // self.batch_size

    def epoch(self):
        order = (
            self._rng.permutation(self.n) if self.shuffle else np.arange(self.n)
        )
        nb = len(self)

        def make(i):
            idx = order[i * self.batch_size : (i + 1) * self.batch_size]
            batch = jax.tree_util.tree_map(lambda a: a[idx], self.arrays)
            if self.transform is not None:
                batch = self.transform(batch)
            if self.sharding is not None:
                batch = jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, self.sharding), batch
                )
            return batch

        if nb == 0:
            return
        nxt = make(0)
        for i in range(nb):
            cur, nxt = nxt, (make(i + 1) if i + 1 < nb else None)
            yield cur


def to_float01(x: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [0,1] (torchvision ToTensor semantics)."""
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 255.0
    return x.astype(np.float32)


def gather_batch_01(arr: np.ndarray, idx, modality_major: bool = True) -> np.ndarray:
    """Fused shuffled-batch assembly: ``arr[... idx ...].astype(f32)/255``.

    Uses the native multithreaded kernel (ops/native) when available; NumPy
    otherwise. ``modality_major=True`` gathers axis 1 of a
    (n_mod, N, ...) array; False gathers axis 0.
    """
    from ..ops.native import gather_normalize_u8

    idx = np.asarray(idx)
    if arr.dtype != np.uint8:
        taken = arr[:, idx] if modality_major else arr[idx]
        return taken.astype(np.float32)
    if modality_major:
        return np.stack([gather_normalize_u8(arr[m], idx)
                         for m in range(arr.shape[0])])
    return gather_normalize_u8(arr, idx)
