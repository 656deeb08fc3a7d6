"""Compositing tool: builds the reference directory layout end to end."""

import numpy as np

from score_based_multimodal_autoencoder_tpu.data import load_polymnist
from score_based_multimodal_autoencoder_tpu.data.compositing import (
    build_polymnist,
    composite_digit,
)


def test_composite_digit_inverts_ink():
    rng = np.random.default_rng(0)
    digit = np.zeros((28, 28), np.float32)
    digit[10:18, 10:18] = 1.0
    bg = np.full((64, 64, 3), 200, np.uint8)
    out = composite_digit(digit, bg, rng)
    assert out.shape == (28, 28, 3)
    # Ink region inverted relative to the bright background.
    assert out[14, 14].mean() < 100 < out[0, 0].mean()


def test_build_polymnist_roundtrips_through_loader(tmp_path):
    rng = np.random.default_rng(1)
    digits = (rng.uniform(size=(6, 28, 28)) > 0.8).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 4, 5])
    bgs = [rng.integers(0, 255, (40, 40, 3)).astype(np.uint8) for _ in range(2)]
    build_polymnist(digits, labels, bgs, str(tmp_path), split="test", seed=0)
    ds = load_polymnist(str(tmp_path), "test", modalities=["m0", "m1"])
    assert ds.images.shape == (2, 6, 32, 32, 3)  # padded to 32
    np.testing.assert_array_equal(np.sort(ds.labels), labels)
