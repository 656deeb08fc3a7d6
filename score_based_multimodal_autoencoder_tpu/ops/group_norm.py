"""Fused GroupNorm + activation Pallas TPU kernel.

Every block of both score UNets ends in GroupNorm followed by SiLU/GELU
(nn/blocks.py, nn/unet_adm.py; reference torch equivalents
/root/reference/unet_model.py:49-65, /root/reference/unet_openai.py:216-306).
Unfused, that is two extra HBM round-trips per block; this kernel computes
the group statistics, the normalization, the affine transform and the
activation in one VMEM pass per batch element.

TPU-first details:
- one grid step per batch element; the (H, W, C) slab lives in VMEM
  (<= ~1 MB for every shipped config);
- group statistics via (1, C) row-vector reductions and a (G, C/G)
  reshape - no sublane-hostile 1-D iota anywhere;
- statistics in float32 regardless of input dtype.

The public entry ``fused_group_norm_act`` has a custom VJP whose backward
uses the standard analytic GN gradient in plain XLA (itself fully fused);
``interpret=True`` (or non-TPU backends) runs the same kernel through the
Pallas interpreter, so CPU tests exercise identical code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU-only at import time on some builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _act(name, x):
    if name == "silu":
        return x * jax.nn.sigmoid(x)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "none":
        return x
    raise ValueError(name)


def _gn_act_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, groups, eps, act):
    """One grid step normalizes a (Bt, H, W, C) batch TILE.

    Layout-friendly by construction: the tile stays 4-D (no lane-dim
    reshapes, which Mosaic rejects or lowers to relayouts); statistics are
    plain axis reductions. For groups > 1 the per-channel sums (Bt, C) are
    mapped to per-group sums by a one-hot channel->group matmul (and back
    with its transpose) - the tiny matmul rides the MXU for free."""
    Bt, H, W, C = x_ref.shape
    cg = C // groups
    xf = x_ref[...].astype(jnp.float32)  # (Bt, H, W, C)
    sum_c = jnp.sum(xf, axis=(1, 2))  # (Bt, C)
    sumsq_c = jnp.sum(xf * xf, axis=(1, 2))
    n = H * W * cg
    if groups == 1:
        mean = jnp.sum(sum_c, axis=1, keepdims=True) / n  # (Bt, 1)
        var = jnp.sum(sumsq_c, axis=1, keepdims=True) / n - mean * mean
        rstd = jax.lax.rsqrt(var + eps)
        mean_c = mean[:, None, None, :]  # (Bt, 1, 1, 1)
        rstd_c = rstd[:, None, None, :]
    else:
        # One-hot (C, G) grouping matrix: M[c, g] = 1 iff c // cg == g.
        row_g = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0) // cg
        col_g = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
        M = (row_g == col_g).astype(jnp.float32)
        mean_g = (sum_c @ M) / n  # (Bt, G)
        var_g = (sumsq_c @ M) / n - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        mean_c = (mean_g @ M.T)[:, None, None, :]  # (Bt, 1, 1, C)
        rstd_c = (rstd_g @ M.T)[:, None, None, :]
    y = (xf - mean_c) * rstd_c
    y = (y * gamma_ref[...].astype(jnp.float32)[None, None]
         + beta_ref[...].astype(jnp.float32)[None, None])
    y = _act(act, y)
    o_ref[...] = y.astype(o_ref.dtype)


def _batch_tile(B, H, W, C, itemsize, budget_bytes=256 << 10):
    """Largest divisor of B whose (Bt, H, W, C) slab fits the VMEM budget.

    Small (~256 KB) input tiles are deliberate: the kernel materializes
    ~4x the tile in f32 intermediates on the Mosaic stack (16 MB scoped
    limit), and many small grid steps pipeline the HBM reads/writes far
    better than a few big serial ones."""
    per_sample = H * W * C * itemsize
    cap = max(1, budget_bytes // max(1, per_sample))
    bt = 1
    for d in range(1, B + 1):
        if B % d == 0 and d <= cap:
            bt = d
    return bt


def _gn_act_pallas(x, gamma, beta, groups, eps, act, interpret):
    B, H, W, C = x.shape
    Bt = _batch_tile(B, H, W, C, x.dtype.itemsize)
    kernel = functools.partial(_gn_act_kernel, groups=groups, eps=eps, act=act)
    return pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[
            pl.BlockSpec((Bt, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bt, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, gamma.reshape(1, C), beta.reshape(1, C))


def _gn_reference(x, gamma, beta, groups, eps):
    """Plain-XLA GN returning (y_prenorm_normalized, mean, rstd)."""
    B, H, W, C = x.shape
    cg = C // groups
    xf = x.astype(jnp.float32).reshape(B, H * W, groups, cg)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = ((xf - mean) * rstd).reshape(B, H, W, C)
    return xhat, mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm_act(x, gamma, beta, groups: int, eps: float = 1e-5,
                         act: str = "silu", interpret: bool = False):
    """GroupNorm(groups) -> affine(gamma, beta) -> activation, fused.

    x: (B, H, W, C); gamma/beta: (C,). Channels are grouped contiguously
    (torch GroupNorm convention).
    """
    if _HAS_PALLAS:
        try:
            return _gn_act_pallas(x, gamma, beta, groups, eps, act, interpret)
        except Exception:
            pass
    xhat, _, _ = _gn_reference(x, gamma, beta, groups, eps)
    return _act(act, xhat * gamma + beta).astype(x.dtype)


def _fwd(x, gamma, beta, groups, eps, act, interpret):
    y = fused_group_norm_act(x, gamma, beta, groups, eps, act, interpret)
    return y, (x, gamma, beta)


def _bwd(groups, eps, act, interpret, res, g):
    x, gamma, beta = res
    B, H, W, C = x.shape
    cg = C // groups
    xhat, mean, rstd = _gn_reference(x, gamma, beta, groups, eps)
    z = xhat * gamma + beta
    if act == "silu":
        s = jax.nn.sigmoid(z.astype(jnp.float32))
        dact = s * (1 + z.astype(jnp.float32) * (1 - s))
    elif act == "gelu":
        dact = jax.grad(lambda v: jnp.sum(jax.nn.gelu(v, approximate=False)))(
            z.astype(jnp.float32))
    else:
        dact = jnp.ones_like(z, jnp.float32)
    gz = g.astype(jnp.float32) * dact  # dL/dz

    dgamma = (gz * xhat).sum(axis=(0, 1, 2)).astype(gamma.dtype)
    dbeta = gz.sum(axis=(0, 1, 2)).astype(beta.dtype)

    # Standard GN input gradient.
    gxhat = gz * gamma  # dL/dxhat
    gx4 = gxhat.reshape(B, H * W, groups, cg)
    xhat4 = xhat.reshape(B, H * W, groups, cg)
    n = H * W * cg
    m1 = gx4.mean(axis=(1, 3), keepdims=True)
    m2 = (gx4 * xhat4).mean(axis=(1, 3), keepdims=True)
    dx = (gx4 - m1 - xhat4 * m2) * rstd
    return dx.reshape(B, H, W, C).astype(x.dtype), dgamma, dbeta


fused_group_norm_act.defvjp(_fwd, _bwd)
