"""Explicit PRNG-key threading utilities.

The reference draws from global torch RNG state inside model forwards
(/root/reference/h_vae_model_copy.py:118-121, a host sync per call). Here
every stochastic function takes an explicit key; ``RngStream`` is a small
convenience for imperative (non-jitted) code such as training loops.
"""

import jax


class RngStream:
    """Imperative split-on-demand wrapper around a ``jax.random`` key."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def next_n(self, n):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
