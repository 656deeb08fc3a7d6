"""Persistent-compilation-cache helper (utils/cache.py)."""

import os


def test_enable_compilation_cache_sets_config(tmp_path, monkeypatch):
    import jax

    from score_based_multimodal_autoencoder_tpu.utils import (
        enable_compilation_cache,
    )

    monkeypatch.delenv("SBMAE_NO_COMPILATION_CACHE", raising=False)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    target = str(tmp_path / "cache")
    try:
        # platform override: the test env forces CPU (conftest), where the
        # cache is refused; pretend to be the tunneled TPU to exercise the
        # enabling path. The cache dir config is platform-agnostic, so the
        # CPU-executed jit below still writes entries into it.
        assert enable_compilation_cache(target, platform="axon") == target
        assert jax.config.jax_compilation_cache_dir == target
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
        # cache entries actually land on disk for a fresh compile
        jax.jit(lambda x: x * 2 + 1)(jax.numpy.arange(7)).block_until_ready()
        assert os.path.isdir(target) and os.listdir(target)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)


def test_enable_compilation_cache_opt_out(monkeypatch):
    from score_based_multimodal_autoencoder_tpu.utils import (
        enable_compilation_cache,
    )

    monkeypatch.setenv("SBMAE_NO_COMPILATION_CACHE", "1")
    assert enable_compilation_cache("/tmp/ignored") is None


def test_enable_compilation_cache_refuses_cpu(tmp_path, monkeypatch):
    """CPU executables are machine-specific: a cache entry AOT-compiled on
    one host can SIGILL on another, so the helper must no-op when the
    configured platform is CPU (the driver's dryrun/test environment)."""
    import jax

    from score_based_multimodal_autoencoder_tpu.utils import (
        enable_compilation_cache,
    )

    monkeypatch.delenv("SBMAE_NO_COMPILATION_CACHE", raising=False)
    prev_dir = jax.config.jax_compilation_cache_dir
    try:
        # conftest pins jax_platforms='cpu'; autodetection must refuse.
        assert enable_compilation_cache(str(tmp_path / "c")) is None
        assert enable_compilation_cache(str(tmp_path / "c"),
                                        platform="cpu") is None
        # Nothing configured at all -> fall back to the real backend (CPU
        # here), not fail open onto caching.
        assert enable_compilation_cache(str(tmp_path / "c"),
                                        platform="") is None
        assert jax.config.jax_compilation_cache_dir == prev_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
