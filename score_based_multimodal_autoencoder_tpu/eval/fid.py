"""FID pipeline: batched on-device feature extraction -> Frechet distance.

The reference computes FID by writing 10,000 PNGs to disk, re-reading them
through DataLoader worker processes and batching through InceptionV3
(/root/reference/pytorch_fid/fid_score.py:258-307, utils.py:67-69). Here
generated images stay device-resident: a jitted feature function maps
(B, H, W, C) float [0,1] images to (B, D) features, moments accumulate on
device, and only the tiny (D,)/(D,D) stats cross to host for the sqrtm.

``feature_fn`` is pluggable: the FID-weights InceptionV3 port
(eval.inception) when the reference weights file is available, or any
jittable extractor (tests use a random-projection extractor; FID's math is
feature-agnostic).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .frechet import frechet_distance, gaussian_stats


class ParamFeatureFn:
    """A feature extractor split into ``apply_fn(params, images)`` + params.

    Keeping the two separate lets :func:`compute_features` jit with the
    parameters as ARGUMENTS; a plain closure would bake them into the HLO
    as constants (the InceptionV3 port is ~24M params -> ~95 MB of
    serialized program, which multiplies compile time - see the
    pipeline_celeba parameter-plumbing note). Instances are also plain
    callables, so code that invokes ``feature_fn(images)`` eagerly works
    unchanged.
    """

    def __init__(self, apply_fn: Callable, params):
        self.apply_fn = apply_fn
        self.params = params

    def __call__(self, images):
        return self.apply_fn(self.params, images)


def proxy_feature_fn(x):
    """Cheap pixel-moment features for smoke-test FID (per-image mean/var +
    a 64-ish pixel stride sample) - shared by cli.train_score's in-training
    eval fallback and evaluate_celeba --fid proxy. Relative comparisons
    only; NOT Inception-comparable."""
    f = x.reshape(x.shape[0], -1)
    return jnp.concatenate(
        [f.mean(-1, keepdims=True), f.var(-1, keepdims=True),
         f[:, ::max(1, f.shape[1] // 64)]], -1)


@functools.lru_cache(maxsize=8)
def _jitted(feature_fn: Callable, n_shards: int):
    # jit's own cache is keyed by function identity; hoisting here keeps
    # repeated protocol calls with the same extractor from retracing.
    # n_shards > 1 shards the image batch over a 1-D device mesh (DP over
    # ICI for FID feature extraction, SURVEY.md §2.8): XLA partitions the
    # inception/extractor forward per chip, features gather back.
    split = isinstance(feature_fn, ParamFeatureFn)
    if n_shards > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("data",))
        sh = NamedSharding(mesh, P("data"))
        if split:
            rep = NamedSharding(mesh, P())
            jfn = jax.jit(feature_fn.apply_fn, in_shardings=(rep, sh),
                          out_shardings=sh)
            return lambda images: jfn(feature_fn.params, images)
        return jax.jit(feature_fn, in_shardings=sh, out_shardings=sh)
    if split:
        jfn = jax.jit(feature_fn.apply_fn)
        return lambda images: jfn(feature_fn.params, images)
    return jax.jit(feature_fn)


def compute_features(feature_fn: Callable, images, batch_size: int = 256) -> np.ndarray:
    """Map images (N, H, W, C) float [0,1] -> features (N, D) on device.

    The tail partial batch is padded to full size (static shapes, one
    compiled program) and trimmed after. With multiple visible devices the
    batch is sharded over all of them (pure data parallel).
    """
    n = images.shape[0]
    feats = []
    n_dev = len(jax.devices())
    fn = _jitted(feature_fn, n_dev if batch_size % n_dev == 0 else 1)
    for i in range(0, n, batch_size):
        chunk = images[i : i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([jnp.asarray(chunk), jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        out = fn(jnp.asarray(chunk))
        feats.append(np.asarray(out[: batch_size - pad if pad else batch_size]))
    return np.concatenate(feats, axis=0)


def fid_from_features(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    mu1, s1 = gaussian_stats(feats_a)
    mu2, s2 = gaussian_stats(feats_b)
    return frechet_distance(mu1, s1, mu2, s2)


def fid_from_images(
    feature_fn: Callable, images_a, images_b, batch_size: int = 256
) -> float:
    """End-to-end FID between two image sets (device-resident throughout)."""
    fa = compute_features(feature_fn, images_a, batch_size)
    fb = compute_features(feature_fn, images_b, batch_size)
    return fid_from_features(fa, fb)


def save_stats(path: str, features: np.ndarray):
    """Persist (mu, sigma) as .npz - interchangeable with pytorch_fid's
    precomputed-statistics format (fid_score.py uses keys mu/sigma)."""
    mu, sigma = gaussian_stats(features)
    np.savez(path, mu=mu, sigma=sigma)


def load_stats(path: str):
    with np.load(path) as f:
        return f["mu"], f["sigma"]


def load_image_dir(path: str, limit=None) -> np.ndarray:
    """Read a directory of images into (N, H, W, 3) float32 [0, 1] - the
    reference's PNG-directory FID interchange format
    (/root/reference/pytorch_fid/fid_score.py:258-270)."""
    import glob
    import os

    from PIL import Image

    exts = ("png", "jpg", "jpeg", "bmp")
    files = sorted(
        f for e in exts for f in glob.glob(os.path.join(path, f"*.{e}")))
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    if limit:
        files = files[:limit]
    imgs = np.stack(
        [np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
         for f in files])
    return imgs


def main():
    """CLI: FID between two image directories (or .npz stats files), the
    ``python -m pytorch_fid`` surface (/root/reference/pytorch_fid/__main__.py).

        python -m score_based_multimodal_autoencoder_tpu.eval.fid A/ B/ \
            [--inception-weights pt_inception.pth] [--batch-size 256]
    """
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("paths", nargs=2,
                   help="two image dirs or .npz statistics files")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--save-stats", default=None,
                   help="write the FIRST path's stats to this .npz and exit")
    args = p.parse_args()

    from .inception import make_inception_feature_fn
    from ..utils.cache import enable_compilation_cache

    # Same persistent-executable cache as every cli.* command (this entry
    # lives outside cli/, so the package-level hook doesn't fire): repeat
    # directory-FID runs skip the ~24M-param Inception forward compile.
    enable_compilation_cache()
    feature_fn = make_inception_feature_fn(args.inception_weights)

    def stats_for(path):
        if path.endswith(".npz"):
            return load_stats(path)
        feats = compute_features(feature_fn, load_image_dir(path),
                                 args.batch_size)
        return gaussian_stats(feats)

    if args.save_stats:
        feats = compute_features(feature_fn, load_image_dir(args.paths[0]),
                                 args.batch_size)
        save_stats(args.save_stats, feats)
        print(f"wrote {args.save_stats}")
        return
    mu1, s1 = stats_for(args.paths[0])
    mu2, s2 = stats_for(args.paths[1])
    print(f"FID: {frechet_distance(mu1, s1, mu2, s2)}")


if __name__ == "__main__":
    main()
