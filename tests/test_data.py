"""Data layer tests: synthetic generators, loaders, batch iterator."""

import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.data import (
    BatchIterator,
    synthetic_celeba,
    synthetic_polymnist,
)
from score_based_multimodal_autoencoder_tpu.data.loader import to_float01


def test_synthetic_polymnist_shapes_and_pairing():
    ds = synthetic_polymnist(n=32, n_mod=4, size=32, seed=0)
    assert ds.images.shape == (4, 32, 32, 32, 3)
    assert ds.images.dtype == np.uint8
    assert ds.labels.shape == (32,)
    assert set(np.unique(ds.labels)) <= set(range(10))
    # Same label across modalities by construction; different styles.
    assert np.abs(
        ds.images[0].astype(int) - ds.images[1].astype(int)
    ).mean() > 5


def test_synthetic_polymnist_label_signal():
    """Same-digit images within a modality are more alike than cross-digit."""
    ds = synthetic_polymnist(n=64, n_mod=1, size=32, seed=1)
    imgs = to_float01(ds.images[0])
    d0 = imgs[ds.labels == ds.labels[0]]
    if len(d0) >= 2:
        same = np.abs(d0[0] - d0[1]).mean()
        other = imgs[ds.labels != ds.labels[0]][0]
        cross = np.abs(d0[0] - other).mean()
        assert same < cross


def test_pad_to_32():
    ds = synthetic_polymnist(n=4, n_mod=2, size=32)
    assert ds.pad_to_32() is ds  # already 32
    d = ds.modality_dict()
    assert set(d) == {"m0", "m1"}


def test_synthetic_celeba():
    ds = synthetic_celeba(n=8, size=64)
    assert ds.images.shape == (8, 64, 64, 3)
    assert ds.masks.shape == (8, 64, 64, 1)
    assert ds.attrs.shape == (8, 40)
    assert ds.visible_attrs().shape == (8, 18)


def test_batch_iterator_shapes_and_determinism():
    x = np.arange(100, dtype=np.float32).reshape(100, 1)
    it = BatchIterator({"x": x}, batch_size=16, seed=7)
    batches = list(it.epoch())
    assert len(batches) == 6  # drop remainder
    assert all(np.asarray(b["x"]).shape == (16, 1) for b in batches)
    seen = np.concatenate([np.asarray(b["x"]).ravel() for b in batches])
    assert len(np.unique(seen)) == 96  # no repeats within epoch

    it2 = BatchIterator({"x": x}, batch_size=16, seed=7)
    b2 = next(iter(it2.epoch()))
    # Different instance, same seed -> same first batch.
    np.testing.assert_array_equal(np.asarray(b2["x"]), np.asarray(batches[0]["x"]))


def test_batch_iterator_transform():
    x = np.full((8, 2), 255, np.uint8)
    it = BatchIterator(
        {"x": x}, batch_size=4,
        transform=lambda b: {"x": to_float01(b["x"])},
    )
    b = next(iter(it.epoch()))
    np.testing.assert_allclose(np.asarray(b["x"]), 1.0)
