"""Fused linear-attention Pallas TPU kernel (forward path).

The round-2 TPU profile of the PolyMNIST sampler showed ~105 ms / 100 steps
(of 486 total) in LAYOUT COPIES around the linear-attention einsums: XLA
relays the (B, N, heads, d) operands between the two contractions and the
softmaxes (BASELINE.md; an explicit-transpose probe LOST, so the copies
cannot be removed at the XLA level). This kernel computes the whole
attention body - per-head q/k softmaxes, the (d x e) context contraction
and the output contraction (/root/reference/unet_model.py:151-177) - in one
VMEM pass per batch tile, with NO intermediate HBM round trips or
relayouts: heads are walked as 128-lane-aligned column slices of the
channel-contiguous qkv tensor.

Forward-only by design: the samplers (the hot path) never differentiate
through attention. Training keeps the plain-XLA composition, so the flag
lives next to ``mxu_depthwise`` as a sampling-time knob
(``LatentUNet(pallas_linear_attn=True)``).

Shapes (shipped configs): N = H*W <= 256 positions, heads = 4, d = 32,
so a (N, 3*heads*d) = (256, 384) tile is ~400 KB in VMEM at f32.

Measured (TPU v5e, B=1024, N=64): standalone the kernel beats the XLA
composition 7x (1.12 ms vs 8.21 ms; batch_tile=32 is the sweep winner,
>=128 overflows VMEM/compile). In-model it must be gated: at the deepest
UNet levels (N <= 4, down to 1x1 grids) the pallas_call boundary is pure
overhead and fully ungated it measured 4x slower whole-model. The N = 16
(4x4) sites DO win - a round-3 flagship trace showed them paying ~7% of
sampling time in layout copies around the XLA einsums, and admitting them
measured 2,158 vs 2,118 samples/s interleaved same-run - so the module
gate defaults to N >= 16 (nn/blocks.py ``pallas_min_positions``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU-only at import time on some builds
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _linear_attn_kernel(qkv_ref, o_ref, *, heads, dim_head, scale):
    """One grid step: a (Bt, N, 3*heads*dim_head) tile -> (Bt, N, hidden).

    Per head h the channel-contiguous layout gives q/k/v as static
    128-lane-friendly column slices; the two contractions are (d x e) and
    (N x d) dot_generals batched over the tile's batch axis.
    """
    Bt, N, _ = qkv_ref.shape
    hidden = heads * dim_head
    qkv = qkv_ref[...].astype(jnp.float32)

    for h in range(heads):
        q = qkv[:, :, h * dim_head:(h + 1) * dim_head]
        k = qkv[:, :, hidden + h * dim_head:hidden + (h + 1) * dim_head]
        v = qkv[:, :, 2 * hidden + h * dim_head:2 * hidden + (h + 1) * dim_head]
        # softmax(q) over d (lanes), softmax(k) over N (sublanes).
        q = q - jnp.max(q, axis=2, keepdims=True)
        q = jnp.exp(q)
        q = q / jnp.sum(q, axis=2, keepdims=True)
        k = k - jnp.max(k, axis=1, keepdims=True)
        k = jnp.exp(k)
        k = k / jnp.sum(k, axis=1, keepdims=True)
        q = q * scale
        # context[d, e] = sum_n k[n, d] v[n, e]; out[n, e] = sum_d q[n, d] c[d, e]
        context = jax.lax.dot_general(
            k, v, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (Bt, d, e)
        out = jax.lax.dot_general(
            q, context, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (Bt, N, e)
        o_ref[:, :, h * dim_head:(h + 1) * dim_head] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "dim_head",
                                             "batch_tile", "interpret"))
def fused_linear_attention(qkv, heads=4, dim_head=32, batch_tile=None,
                           interpret=False):
    """(B, N, 3*heads*dim_head) channel-contiguous qkv -> (B, N, hidden).

    Matches the values of the XLA composition in ``nn.blocks.LinearAttention``
    for f32 modules (same split convention, f32 softmaxes, q scaled by
    d^-0.5). For bf16 modules the XLA path downcasts the softmaxed q/k to
    the module dtype before its einsums while this kernel contracts in f32
    throughout, so outputs differ by bf16 rounding (~1e-2 rel) - this
    kernel is the HIGHER-precision side of that gap.

    ``batch_tile=None`` sizes the tile so bt*N ~ 2048 rows: the N=64 sweep
    winner was bt=32 (2048 rows; >=128 overflowed VMEM/compile), and the
    f32 working set must stay inside scoped VMEM at every N - a fixed
    bt=32 at N=256 requested 41 MB against the 16 MB scoped limit
    (measured on the celebhq level).
    """
    if not _HAS_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    B, N, C = qkv.shape
    hidden = heads * dim_head
    assert C == 3 * hidden, (C, hidden)
    bt = batch_tile if batch_tile is not None else max(1, 2048 // N)
    bt = min(bt, B)
    # Largest divisor of B <= the target: repeated halving degenerates to
    # near-1 tiles when B shares few factors with the ~2048-row target
    # (e.g. B=1024, N=100 -> target 20 would halve to 2), re-entering the
    # tiny-program-overhead regime the module gate exists to avoid.
    while B % bt:
        bt -= 1
    kernel = functools.partial(_linear_attn_kernel, heads=heads,
                               dim_head=dim_head, scale=dim_head ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((bt, N, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bt, N, hidden), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, hidden), qkv.dtype),
        interpret=interpret,
    )(qkv)
