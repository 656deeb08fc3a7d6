"""Native host-side gather+normalize kernel tests (ctypes C++)."""

import numpy as np
import pytest

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


class TestDecodeImages:
    """Native PNG/JPEG batch decoder vs PIL (ops/native/image_decode.cpp)."""

    @pytest.fixture(scope="class")
    def image_files(self, tmp_path_factory):
        PIL = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(0)
        d = tmp_path_factory.mktemp("imgs")
        a = rng.integers(0, 256, (28, 28, 3), np.uint8)
        b = rng.integers(0, 256, (64, 48, 3), np.uint8)
        pa, pb, pj = str(d / "a.png"), str(d / "b.png"), str(d / "c.jpg")
        PIL.fromarray(a).save(pa)
        PIL.fromarray(b).save(pb)
        PIL.fromarray(b).save(pj, quality=95)
        return {"a": (pa, a), "b": (pb, b), "j": (pj, b)}

    def test_png_exact_no_resize(self, image_files):
        from score_based_multimodal_autoencoder_tpu.ops.native import (
            decode_images,
        )

        pa, a = image_files["a"]
        out = decode_images([pa, pa], 28, 28, 3)
        assert out.shape == (2, 28, 28, 3)
        np.testing.assert_array_equal(out[0], a)
        np.testing.assert_array_equal(out[1], a)

    def test_resize_matches_pil_bilinear(self, image_files):
        from PIL import Image

        from score_based_multimodal_autoencoder_tpu.ops.native import (
            decode_images,
        )

        pb, _ = image_files["b"]
        out = decode_images([pb], 16, 16, 3)[0]
        ref = np.asarray(Image.open(pb).resize((16, 16), Image.BILINEAR))
        # PIL uses fixed-point weights; allow off-by-rounding.
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2

    def test_grayscale_matches_pil_l(self, image_files):
        from PIL import Image

        from score_based_multimodal_autoencoder_tpu.ops.native import (
            decode_images,
        )

        pa, _ = image_files["a"]
        out = decode_images([pa], 28, 28, 1)[0, :, :, 0]
        ref = np.asarray(Image.open(pa).convert("L"))
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

    def test_jpeg_decode(self, image_files):
        from PIL import Image

        from score_based_multimodal_autoencoder_tpu.ops.native import (
            decode_images,
        )

        pj, _ = image_files["j"]
        out = decode_images([pj], 64, 48, 3)[0]
        ref = np.asarray(Image.open(pj).convert("RGB"))
        # Same libjpeg underneath; tolerate IDCT implementation wiggle.
        assert np.abs(out.astype(int) - ref.astype(int)).mean() < 2.0

    def test_missing_file_raises(self, image_files, tmp_path):
        from score_based_multimodal_autoencoder_tpu.ops.native import (
            decode_images,
            native_available,
        )

        if not native_available():
            pytest.skip("no native build")
        with pytest.raises(IOError):
            decode_images([str(tmp_path / "nope.png")], 8, 8, 3)
