"""Native host-side gather+normalize kernel tests (ctypes C++)."""

import numpy as np

from score_based_multimodal_autoencoder_tpu.data.loader import gather_batch_01
from score_based_multimodal_autoencoder_tpu.ops.native import (
    gather_normalize_u8,
    native_available,
)


def test_native_matches_numpy():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (100, 7, 5, 3)).astype(np.uint8)
    idx = rng.permutation(100)[:17]
    out = gather_normalize_u8(arr, idx)
    ref = arr[idx].astype(np.float32) / 255.0
    np.testing.assert_allclose(out, ref, atol=1e-7)
    assert out.dtype == np.float32


def test_gather_batch_01_modality_major():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (3, 50, 4, 4, 1)).astype(np.uint8)
    idx = np.array([5, 1, 49])
    out = gather_batch_01(arr, idx, modality_major=True)
    assert out.shape == (3, 3, 4, 4, 1)
    np.testing.assert_allclose(
        out, arr[:, idx].astype(np.float32) / 255.0, atol=1e-7)


def test_float_input_fallback():
    arr = np.ones((2, 10, 2, 2, 1), np.float32) * 0.5
    out = gather_batch_01(arr, np.array([0, 9]))
    assert out.shape == (2, 2, 2, 2, 1)
    np.testing.assert_allclose(out, 0.5)


def test_native_build_status_is_boolean():
    # Either outcome is valid (toolchain optional); the call must not raise.
    assert native_available() in (True, False)
