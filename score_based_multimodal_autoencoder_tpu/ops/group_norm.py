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
        return jax.nn.gelu(x)
    if name == "none":
        return x
    raise ValueError(name)


def _gn_act_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, groups, eps, act):
    """One grid step normalizes a (Bt, H, W, C) batch TILE: per-sample
    per-group statistics via 2-D/3-D reductions only (per-channel sums ->
    per-group sums), then normalize + affine + activation in one pass."""
    Bt, H, W, C = x_ref.shape
    cg = C // groups
    x = x_ref[...].astype(jnp.float32).reshape(Bt, H * W, C)
    # Per-sample per-channel sums -> per-sample per-group stats.
    sum_c = jnp.sum(x, axis=1)  # (Bt, C)
    sumsq_c = jnp.sum(x * x, axis=1)
    n = H * W * cg
    g_sum = sum_c.reshape(Bt, groups, cg).sum(axis=2)  # (Bt, G)
    g_sumsq = sumsq_c.reshape(Bt, groups, cg).sum(axis=2)
    mean_g = g_sum / n
    var_g = g_sumsq / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cg, axis=1).reshape(Bt, 1, C)
    rstd_c = jnp.repeat(rstd_g, cg, axis=1).reshape(Bt, 1, C)
    y = (x - mean_c) * rstd_c
    y = y * gamma_ref[...].astype(jnp.float32) + beta_ref[...].astype(jnp.float32)
    y = _act(act, y)
    o_ref[...] = y.reshape(Bt, H, W, C).astype(o_ref.dtype)


def _batch_tile(B, H, W, C, itemsize, budget_bytes=2 << 20):
    """Largest divisor of B whose (Bt, H, W, C) slab fits the VMEM budget
    (~2 MB leaves room for double buffering in ~16 MB VMEM)."""
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
        dact = jax.grad(lambda v: jnp.sum(jax.nn.gelu(v)))(z.astype(jnp.float32))
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
