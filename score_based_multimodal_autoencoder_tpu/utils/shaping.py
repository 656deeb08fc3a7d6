"""Shape/broadcast helpers shared across the framework."""

import jax.numpy as jnp


def batch_mul(scale, x):
    """Multiply a per-example scalar ``scale`` of shape (B,) into ``x``.

    ``x`` has shape (B, ...); the scale is reshaped to (B, 1, ..., 1) so the
    product broadcasts over all trailing axes. This replaces the reference's
    pervasive ``a[:, None, None, None] * x`` pattern
    (e.g. /root/reference/sde_helper2.py:170) in a rank-agnostic way.
    """
    scale = jnp.asarray(scale)
    if scale.ndim == 0:
        return scale * x
    return scale.reshape(scale.shape + (1,) * (x.ndim - scale.ndim)) * x


def flatten_batch(x):
    """Reshape (B, ...) -> (B, prod(...))."""
    return x.reshape(x.shape[0], -1)
