"""Persistent XLA compilation cache.

TPU compiles of the whole-trajectory sampling scans are expensive - over a
tunneled device link they can take minutes per program (the reference has
no analogue: torch eager mode recompiles nothing, it pays per-step dispatch
instead, SURVEY.md §2.8). JAX's persistent compilation cache stores the
serialized executable on disk keyed by the optimized HLO + compile options,
so every CLI / bench / eval process after the first reuses the binary
(measured over the tunnel: 50.6 s -> 11.1 s process total for a small UNet
forward; the saving scales with program size).

Enabled by the benchmark harness, the driver entry points, and every CLI
``main`` via :func:`enable_compilation_cache`. Opt out with
``SBMAE_NO_COMPILATION_CACHE=1`` (e.g. to measure cold-compile latency).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(
    path: str | None = None, platform: str | None = None
) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (default: the
    repo-local ``.jax_cache``). Idempotent; returns the cache dir or None
    when disabled via ``SBMAE_NO_COMPILATION_CACHE`` or on CPU."""
    if os.environ.get("SBMAE_NO_COMPILATION_CACHE"):
        return None
    import jax

    # Never cache CPU executables: XLA:CPU AOT-compiles against the build
    # host's exact instruction-set features, and a cache entry written on
    # one machine can SIGILL when loaded on another (the loader warns
    # "Machine type used for XLA:CPU compilation doesn't match"). CPU
    # compiles are cheap; the cache exists for the tunneled-TPU programs.
    if platform is None:
        platform = (jax.config.jax_platforms
                    or os.environ.get("JAX_PLATFORMS", "")).split(",")[0]
    if not platform.strip():
        # Nothing configured (plain host, no axon plugin): ask the actual
        # backend rather than failing open onto JAX's default (CPU).
        try:
            platform = jax.default_backend()
        except Exception:
            return None
    if platform.strip().lower() == "cpu":
        return None

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every program: even sub-second compiles add up across the CLI
    # surface, and the big sampler scans are the ones we must never redo.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
