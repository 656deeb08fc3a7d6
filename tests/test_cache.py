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
        assert enable_compilation_cache(target) == target
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
