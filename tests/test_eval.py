"""Eval tests: Frechet distance vs analytic values, F1 vs sklearn, coherence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.eval import (
    binary_accuracy,
    coherence_accuracy,
    compute_features,
    fid_from_features,
    frechet_distance,
    gaussian_stats,
    samples_f1,
    unconditional_coherence,
)


def test_frechet_identity_is_zero():
    mu = np.zeros(4)
    s = np.eye(4)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-10


def test_frechet_mean_shift_analytic():
    """Equal covariances: d^2 = |mu1 - mu2|^2."""
    s = np.eye(3) * 2.0
    d = frechet_distance(np.zeros(3), s, np.ones(3) * 2, s)
    np.testing.assert_allclose(d, 12.0, rtol=1e-8)


def test_frechet_diagonal_analytic():
    """Diagonal covariances: Tr(s1+s2-2*sqrt(s1 s2)) = sum (sqrt(a)-sqrt(b))^2."""
    a, b = np.diag([1.0, 4.0]), np.diag([9.0, 16.0])
    d = frechet_distance(np.zeros(2), a, np.zeros(2), b)
    np.testing.assert_allclose(d, (1 - 3) ** 2 + (2 - 4) ** 2, rtol=1e-8)


def test_frechet_matches_sklearn_style_estimate():
    rng = np.random.default_rng(0)
    fa = rng.normal(size=(5000, 8))
    fb = rng.normal(loc=0.5, size=(5000, 8))
    mu1, s1 = gaussian_stats(fa)
    mu2, s2 = gaussian_stats(fb)
    d = frechet_distance(mu1, s1, mu2, s2)
    assert 8 * 0.2 < d < 8 * 0.3  # ~ |0.5|^2 * 8 = 2.0 plus sampling noise


def test_fid_from_features_sensitivity():
    rng = np.random.default_rng(1)
    real = rng.normal(size=(2000, 16))
    same = rng.normal(size=(2000, 16))
    shifted = rng.normal(loc=1.0, size=(2000, 16))
    assert fid_from_features(real, same) < fid_from_features(real, shifted)


def test_compute_features_padding_tail():
    def feature_fn(x):
        return x.reshape(x.shape[0], -1)[:, :4]

    imgs = jnp.arange(10 * 2 * 2 * 1, dtype=jnp.float32).reshape(10, 2, 2, 1)
    f = compute_features(feature_fn, imgs, batch_size=4)
    assert f.shape == (10, 4)
    np.testing.assert_allclose(f[-1], np.asarray(imgs[-1]).ravel()[:4])


def test_compute_features_sharded_equals_unsharded():
    """DP over the device mesh for FID feature extraction (SURVEY.md §2.8):
    a batch size divisible by the 8 virtual devices shards automatically and
    must give bit-identical features to the unsharded path (batch size
    coprime with the device count)."""
    import jax

    assert len(jax.devices()) == 8  # conftest virtual mesh

    def feature_fn(x):
        return jnp.stack([x.mean(axis=(1, 2, 3)), x.max(axis=(1, 2, 3))],
                         axis=-1)

    imgs = jnp.linspace(0.0, 1.0, 20 * 2 * 2 * 3).reshape(20, 2, 2, 3)
    sharded = compute_features(feature_fn, imgs, batch_size=8)
    unsharded = compute_features(feature_fn, imgs, batch_size=7)
    np.testing.assert_allclose(sharded, unsharded, rtol=0, atol=0)


def test_samples_f1_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(2)
    target = (rng.uniform(size=(16, 18)) < 0.4).astype(np.float32)
    pred = np.clip(target + rng.normal(0, 0.5, target.shape), 0, 1)
    ours = float(samples_f1(jnp.asarray(pred), jnp.asarray(target)))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = sklearn.f1_score(
            target.astype(int), (pred >= 0.5).astype(int), average="samples",
            zero_division=0,
        )
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_binary_accuracy():
    pred = jnp.array([[0.9, 0.1], [0.4, 0.8]])
    target = jnp.array([[1.0, 0.0], [1.0, 1.0]])
    np.testing.assert_allclose(float(binary_accuracy(pred, target)), 0.75)


def test_coherence_with_oracle_classifier():
    """An oracle classifier reading the label from the image -> coherence 1."""

    def clf_apply(imgs):
        # Encode 'label' as the mean intensity bucket for the test.
        mean = imgs.mean(axis=(1, 2, 3)) * 10
        return jax.nn.one_hot(jnp.clip(mean.astype(jnp.int32), 0, 9), 10) * 100

    labels = jnp.array([3, 7])
    imgs = jnp.stack([jnp.full((32, 32, 3), 0.35), jnp.full((32, 32, 3), 0.75)])
    acc = coherence_accuracy(clf_apply, imgs, labels)
    np.testing.assert_allclose(float(acc), 1.0)

    per_mod = jnp.stack([imgs, imgs])  # 2 modalities, same digits
    unc = unconditional_coherence(clf_apply, per_mod, min_agree=2)
    np.testing.assert_allclose(float(unc), 1.0)


def test_param_feature_fn_matches_closure():
    """ParamFeatureFn (params as jit arguments - the anti-HLO-bloat path)
    produces identical features to a plain closure, sharded and not."""
    import jax
    import jax.numpy as jnp

    from score_based_multimodal_autoencoder_tpu.eval.fid import ParamFeatureFn

    w = jax.random.normal(jax.random.key(0), (27, 16))

    def apply_fn(params, x):
        return x.reshape(x.shape[0], -1) @ params

    # Tolerances: the closure bakes w into the HLO as a constant, and XLA
    # specializes (fuses/reassociates) constant-operand programs differently
    # from argument-operand ones - bit-identity is NOT expected (observed
    # rel diff up to ~6e-6 on this matmul).
    split = ParamFeatureFn(apply_fn, w)
    imgs = jax.random.uniform(jax.random.key(1), (9, 3, 3, 3))
    ref = compute_features(lambda x: apply_fn(w, x), imgs, batch_size=4)
    np.testing.assert_allclose(
        ref, compute_features(split, imgs, batch_size=4),
        rtol=1e-4, atol=1e-5)
    # eager call-through works too (protocol code paths that don't jit)
    np.testing.assert_allclose(
        np.asarray(split(imgs)), np.asarray(apply_fn(w, imgs)),
        rtol=1e-4, atol=1e-5)
    # sharded over the 8-device CPU mesh (batch divisible by n_dev)
    imgs8 = jax.random.uniform(jax.random.key(2), (16, 3, 3, 3))
    np.testing.assert_allclose(
        compute_features(lambda x: apply_fn(w, x), imgs8, batch_size=8),
        compute_features(split, imgs8, batch_size=8),
        rtol=1e-4, atol=1e-5)
