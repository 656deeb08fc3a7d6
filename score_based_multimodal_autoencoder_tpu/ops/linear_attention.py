"""Fused linear-attention Pallas TPU kernel (forward path).

The round-2 TPU profile of the PolyMNIST sampler showed ~105 ms / 100 steps
(of 486 total) in LAYOUT COPIES around the linear-attention einsums: XLA
relays the (B, N, heads, d) operands between the two contractions and the
softmaxes (BASELINE.md; an explicit-transpose probe LOST, so the copies
cannot be removed at the XLA level). This kernel computes the whole
attention body - q/k softmaxes, the (d x e) context contraction and the
output contraction (/root/reference/unet_model.py:151-177) - in one VMEM
pass per batch tile, with NO intermediate HBM round trips or relayouts;
all heads are processed jointly at full lane width (see
``_linear_attn_kernel``).

The plain kernels are forward-only (the samplers never differentiate
through attention); :func:`fused_linear_attention_vjp` adds a hand-derived
custom VJP whose backward pass is a second fused kernel that RECOMPUTES
the softmaxes from the saved qkv (no stored residuals, no relayouts) -
a round-4 train-step xplane trace showed attention-shaped ops costing
22.8% of DSM train-step device time, almost all (B, N, heads, d) layout
copies around the XLA einsum forward+backward (BASELINE.md round 4).

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


def _seg_softmax(q, segf, dim_head):
    """Per-head softmax over each head's ``dim_head`` lanes with BOTH
    segment reductions (shift and denominator) riding the block-diagonal
    ones matmul - no VPU concat/broadcast chains.

    The shift is the per-head MEAN (uniform across a head's lanes, so the
    softmax value is exactly the max-shifted softmax up to rounding); the
    +60 top-clamp bounds exp() against pathological per-head spreads (see
    _attn_body's docstring). Shared by the forward segmm body and the
    backward kernel's recompute so fwd/bwd stay consistent (ADVICE r4).
    """
    m = jax.lax.dot_general(
        q, segf, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (1.0 / dim_head)
    e = jnp.exp(jnp.minimum(q - m, 60.0))
    denom = jax.lax.dot_general(
        e, segf, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return e / denom


def _attn_body(q, k, v, *, heads, dim_head, scale, segmm=False,
               mm_dtype=None):
    """Joint-head linear-attention body on f32 (Bt, N, hidden) tensors.

    All heads are processed JOINTLY in the channel-contiguous layout:
    the transcendentals (exp, divide) run once over the full
    ``heads*dim_head``-lane tensors (a head-looped kernel leaves 3/4 of
    the VPU lanes idle at dim_head=32), and the two contractions run as
    single full-width dot_generals with the cross-head context blocks
    masked to zero - mathematically identical to the per-head pair (the
    extra products are exact zeros). In-model this joint-head body measures
    2,333 vs 2,167 samples/s (+7.7%) on the PolyMNIST flagship sampler
    (BASELINE.md round 3).

    Softmax structure: k's softmax is over N (sublanes, columnwise), so
    the joint tensor computes it identically for free; q's softmax is over
    each head's own dim_head lanes. Two equivalent formulations:

    - ``segmm=False``: per-head max/sum reduces broadcast back via
      concatenate (the proven round-3 body).
    - ``segmm=True``: a PER-HEAD MEAN shift computed AND broadcast by the
      same block-diagonal ones dot_general as the denominator, one exp,
      then the matmul denominator - ALL the per-head segment work rides
      the MXU, with zero VPU concat/broadcast chains (see
      ``_seg_softmax``). Softmax is invariant to any per-head-uniform
      shift, so values are exactly the per-head-max softmax up to float
      rounding. Numerics: an earlier row-GLOBAL max shift underflowed a
      head sitting ~90+ below the row max (zero denominator -> NaN,
      ADVICE r4); the mean shift tracks each head's own level, so
      cross-head offsets are harmless and the exp range is bounded by a
      head's INTERNAL spread, with a +60 top-clamp guarding the
      pathological spread>60 case against overflow (the clamp only
      flattens lanes that are all >60 above their head's mean - where
      the true softmax is a near-one-hot anyway).
    """
    Bt, N, hidden = q.shape
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 0)
    e_idx = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 1)
    seg = d_idx // dim_head == e_idx // dim_head

    def _per_head(x, reduce_fn):
        return jnp.concatenate(
            [jnp.broadcast_to(
                reduce_fn(x[:, :, h * dim_head:(h + 1) * dim_head],
                          axis=2, keepdims=True),
                (Bt, N, dim_head))
             for h in range(heads)], axis=2)

    if segmm:
        q = _seg_softmax(q, seg.astype(jnp.float32), dim_head) * scale
    else:
        q = jnp.exp(q - _per_head(q, jnp.max))
        q = q / _per_head(q, jnp.sum) * scale
    # softmax(k) over N (sublanes) is columnwise: joint == per-head.
    k = jnp.exp(k - jnp.max(k, axis=1, keepdims=True))
    k = k / jnp.sum(k, axis=1, keepdims=True)

    # context[d, e] = sum_n k[n, d] v[n, e], valid only within a head's
    # diagonal (d, e) block; the block-diagonal mask zeroes the cross-head
    # blocks so the output contraction sums exact zeros for them.
    # ``mm_dtype=bf16``: contraction OPERANDS in bf16 (f32 accumulate) -
    # full-rate MXU, and the same downcast the XLA bf16 composition
    # applies to the softmaxed q/k before its einsums.
    md = mm_dtype or jnp.float32
    context = jax.lax.dot_general(
        k.astype(md), v.astype(md), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (Bt, hidden, hidden)
    context = context * seg
    return jax.lax.dot_general(
        q.astype(md), context.astype(md), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (Bt, N, hidden)


def _linear_attn_kernel(qkv_ref, o_ref, *, heads, dim_head, scale,
                        segmm=False):
    """One grid step: a (Bt, N, 3*heads*dim_head) tile -> (Bt, N, hidden).
    Attention body: :func:`_attn_body`."""
    hidden = heads * dim_head
    qkv = qkv_ref[...].astype(jnp.float32)
    out = _attn_body(qkv[:, :, :hidden], qkv[:, :, hidden:2 * hidden],
                     qkv[:, :, 2 * hidden:], heads=heads,
                     dim_head=dim_head, scale=scale, segmm=segmm)
    o_ref[...] = out.astype(o_ref.dtype)


def _attn_block_kernel(x_ref, pre_scale_ref, pre_bias_ref, w_qkv_ref,
                       w_out_ref, b_out_ref, out_scale_ref, out_bias_ref,
                       o_ref, *, heads, dim_head, scale, eps, segmm=False,
                       lowp=False):
    """One grid step of the WHOLE PreNormResidual(LinearAttention) block:

        out = x + GN1(to_out(linear_attn(to_qkv(GN1(x)))))

    (unet_model.py:21-27, 151-187) for a (Bt, N, C) batch tile, entirely in
    VMEM. Compared to ``_linear_attn_kernel`` this also absorbs the two
    1x1-conv matmuls, both GroupNorm(1)s and the residual add, eliminating
    the pallas_call boundary relayouts the round-3 xplane trace still
    charged ~8.7% of device time to. GroupNorm(1) reduces over (N, C) per
    sample - the tile holds the full position axis, so the statistics are
    exact. All math f32; the attention body is ``_linear_attn_kernel``'s
    joint-head formulation.
    """
    Bt, N, C = x_ref.shape
    hidden = heads * dim_head
    x = x_ref[...].astype(jnp.float32)

    def _gn1(h, s, b):
        # Chained single-axis reductions: a direct multi-axis reduce
        # (axis=(1, 2)) to (Bt, 1, 1) SIGABRTs Mosaic on real TPUs
        # ("Check failed: arr.size() >= layout_rank(implicit_dim)
        # (1 vs. 2)", the BENCH_r03 crash) while per-axis reduces lower
        # fine - bisected live on a v5e (round 4).
        def _mean11(t):
            return jnp.mean(jnp.mean(t, axis=2, keepdims=True),
                            axis=1, keepdims=True)

        mu = _mean11(h)
        var = _mean11(jnp.square(h)) - mu * mu
        return (h - mu) * jax.lax.rsqrt(var + eps) * s + b

    # ``lowp``: run the four matmuls with bf16 OPERANDS (f32 accumulate) -
    # full-rate MXU; GN statistics, softmaxes and the residual stay f32.
    md = jnp.bfloat16 if lowp else jnp.float32
    y = _gn1(x, pre_scale_ref[...].astype(jnp.float32),
             pre_bias_ref[...].astype(jnp.float32))
    qkv = jax.lax.dot_general(
        y.astype(md), w_qkv_ref[...].astype(md), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Bt, N, 3*hidden)
    att = _attn_body(qkv[:, :, :hidden], qkv[:, :, hidden:2 * hidden],
                     qkv[:, :, 2 * hidden:], heads=heads,
                     dim_head=dim_head, scale=scale, segmm=segmm,
                     mm_dtype=md if lowp else None)

    o = jax.lax.dot_general(
        att.astype(md), w_out_ref[...].astype(md),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_out_ref[...].astype(
            jnp.float32)  # (Bt, N, C)
    o = _gn1(o, out_scale_ref[...].astype(jnp.float32),
             out_bias_ref[...].astype(jnp.float32))
    o_ref[...] = (x + o).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "dim_head", "eps",
                                             "batch_tile", "interpret",
                                             "segmm", "lowp"))
def fused_attention_block(x, pre_scale, pre_bias, w_qkv, w_out, b_out,
                          out_scale, out_bias, heads=4, dim_head=32,
                          eps=1e-5, batch_tile=None, interpret=False,
                          segmm=None, lowp=False):
    """Whole PreNormResidual(LinearAttention) block as ONE pallas_call.

    ``x``: (B, N, C) positions-flattened activations; weight operands are
    the flax param arrays reshaped 2-D: ``w_qkv`` (C, 3*heads*dim_head),
    ``w_out`` (heads*dim_head, C), GroupNorm scales/biases (C,). Same
    VMEM-driven batch-tile rule as ``fused_linear_attention``; weights ride
    whole (grid-invariant blocks). f32 math throughout - for bf16 modules
    this is the higher-precision side of the XLA composition (~1e-2 rel).

    The five (C,) vector params ride as (1, C) blocks: Mosaic rejects
    rank-1 BlockSpec layouts on real TPU hardware
    ("Check failed: arr.size() >= layout_rank(implicit_dim) (1 vs. 2)",
    the BENCH_r03 SIGABRT) - same convention as ops/group_norm.py.
    """
    if not _HAS_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    B, N, C = x.shape
    hidden = heads * dim_head
    assert w_qkv.shape == (C, 3 * hidden), (w_qkv.shape, C, hidden)
    assert w_out.shape == (hidden, C), (w_out.shape, hidden, C)
    bt = _attn_tile(B, N, hidden, batch_tile)
    if segmm is None:
        # v5e sweep (BASELINE.md round 4): segmm wins ~14% at N>=64 but
        # loses ~19% at N=16 in THIS kernel (the small-N tile runs more
        # grid steps, and the extra hidden x hidden denominator matmul is
        # a larger fraction of each), so auto-select by position count.
        segmm = N >= 32
    kernel = functools.partial(_attn_block_kernel, heads=heads,
                               dim_head=dim_head, scale=dim_head ** -0.5,
                               eps=eps, segmm=segmm, lowp=lowp)
    vec_spec = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, N, C), lambda i: (i, 0, 0)),
            vec_spec(C), vec_spec(C),
            pl.BlockSpec((C, 3 * hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, C), lambda i: (0, 0)),
            vec_spec(C), vec_spec(C), vec_spec(C),
        ],
        out_specs=pl.BlockSpec((bt, N, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=interpret,
    )(x, pre_scale.reshape(1, C), pre_bias.reshape(1, C), w_qkv, w_out,
      b_out.reshape(1, C), out_scale.reshape(1, C), out_bias.reshape(1, C))


@functools.partial(jax.jit, static_argnames=("heads", "dim_head",
                                             "batch_tile", "interpret",
                                             "segmm"))
def fused_linear_attention(qkv, heads=4, dim_head=32, batch_tile=None,
                           interpret=False, segmm=None):
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
    bt = _attn_tile(B, N, hidden, batch_tile)
    if segmm is None:
        segmm = True  # wins at every swept shape in this kernel (BASELINE)
    kernel = functools.partial(_linear_attn_kernel, heads=heads,
                               dim_head=dim_head, scale=dim_head ** -0.5,
                               segmm=segmm)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((bt, N, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bt, N, hidden), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, hidden), qkv.dtype),
        interpret=interpret,
    )(qkv)


def _linear_attn_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, heads, dim_head,
                            scale):
    """Backward of the joint-head linear-attention body, one batch tile.

    Recomputes the two softmaxes from the raw qkv tile (cheaper than
    storing them: the forward saves NOTHING but its input), then runs the
    hand-derived VJP as four full-width MXU contractions plus the two
    softmax backprops - per-head segment sums ride the block-diagonal
    ones matmul exactly like the forward's segmm body. With
    s = softmax_d(q^), ks = softmax_N(k^), ctx = ks^T v (head-block
    masked), out = (s*scale) ctx:

        d(s*scale) = g ctx^T          dctx = (s*scale)^T g  (masked)
        dks        = v dctx^T         dv   = ks dctx
        dq^ = s * (scale*d(s*scale) - rowsum_head(scale*d(s*scale) * s))
        dk^ = ks * (dks - colsum_N(dks * ks))
    """
    hidden = heads * dim_head
    qkv = qkv_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    qh = qkv[:, :, :hidden]
    kh = qkv[:, :, hidden:2 * hidden]
    v = qkv[:, :, 2 * hidden:]

    d_idx = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 0)
    e_idx = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 1)
    seg = d_idx // dim_head == e_idx // dim_head
    segf = seg.astype(jnp.float32)

    def _seg_bcast(t):  # per-head rowsum, broadcast back across the head
        return jax.lax.dot_general(t, segf, (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # Recompute softmax(q) with the forward's segment-matmul mean-shift
    # formulation (_seg_softmax) - bit-identical to the forward, and no
    # concat/broadcast buffers (a row-global shift NaN'd far-below-row
    # heads, ADVICE r4; a concat per-head max overflowed the 16 MB scoped
    # VMEM at the forward's tile and cost the VJP's +17% win, round 5).
    s = _seg_softmax(qh, segf, dim_head)         # softmax, pre-scale
    # recompute softmax(k) over N
    mk = jnp.max(kh, axis=1, keepdims=True)
    ek = jnp.exp(kh - mk)
    ks = ek / jnp.sum(ek, axis=1, keepdims=True)

    ctx = jax.lax.dot_general(
        ks, v, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * segf   # (Bt, d, e)

    # dL/d(s*scale) and dL/dctx
    dqs = jax.lax.dot_general(
        g, ctx, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (Bt, N, d)
    dctx = jax.lax.dot_general(
        s * scale, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * segf   # (Bt, d, e)
    dks = jax.lax.dot_general(
        v, dctx, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (Bt, N, d)
    dv = jax.lax.dot_general(
        ks, dctx, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (Bt, N, e)

    gs = dqs * scale                                 # dL/ds
    dqh = s * (gs - _seg_bcast(gs * s))
    dkh = ks * (dks - jnp.sum(dks * ks, axis=1, keepdims=True))
    dqkv_ref[...] = jnp.concatenate([dqh, dkh, dv],
                                    axis=2).astype(dqkv_ref.dtype)


def _attn_tile(B, N, hidden, batch_tile, live_factor: int = 1):
    """THE batch-tile rule, shared by every kernel in this file (a VJP
    whose forward and backward tile differently BY ACCIDENT would drift
    in perf and VMEM-cap behavior - ADVICE r4; the backward deliberately
    halves via ``live_factor``, see below).

    ``batch_tile=None`` sizes the tile so bt*N ~ 2048 rows: the N=64 sweep
    winner was bt=32 (2048 rows; >=128 overflowed VMEM/compile). The
    joint-head kernels then materialize a (bt, hidden, hidden) f32 context
    per tile, so bt is capped to keep it ~4 MB of the ~16 MB scoped VMEM
    (a fixed bt=32 at N=256 requested 41 MB, measured on the celebhq
    level). Finally bt drops to the largest DIVISOR of B <= the target:
    repeated halving degenerates to near-1 tiles when B shares few factors
    with the ~2048-row target (e.g. B=1024, N=100 -> target 20 would
    halve to 2), re-entering the tiny-program-overhead regime the module
    gate exists to avoid.

    ``live_factor``: ratio of a kernel's live working set to the forward
    kernel's. The BACKWARD passes 2: it keeps ~2x the tensors alive
    (recomputed softmaxes + two context-sized grads + the dq/dk/dv
    tiles), and at the forward's bt=32/N=64 tile the round-5 per-head-max
    recompute measured a 19.17 MB Mosaic stack against the 16 MB
    scoped-vmem limit on a real v5e (AOT compile error) - halving the
    tile keeps the backward inside scoped VMEM at every shipped shape."""
    bt = (batch_tile if batch_tile is not None
          else max(1, 2048 // N // live_factor))
    bt = min(bt, max(1, (1 << 20) // (hidden * hidden * live_factor)))
    bt = min(bt, B)
    while B % bt:
        bt -= 1
    return bt


def _fused_linear_attention_bwd_call(qkv, g, heads, dim_head, batch_tile,
                                     interpret):
    B, N, C = qkv.shape
    hidden = heads * dim_head
    bt = _attn_tile(B, N, hidden, batch_tile, live_factor=2)
    kernel = functools.partial(_linear_attn_bwd_kernel, heads=heads,
                               dim_head=dim_head, scale=dim_head ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((bt, N, C), lambda i: (i, 0, 0)),
                  pl.BlockSpec((bt, N, hidden), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bt, N, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        interpret=interpret,
    )(qkv, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def fused_linear_attention_vjp(qkv, heads=4, dim_head=32, batch_tile=None,
                               interpret=False):
    """Differentiable fused linear attention (forward = the segmm kernel,
    backward = :func:`_linear_attn_bwd_kernel`). The residual saved
    between passes is just the INPUT qkv - the backward recomputes the
    softmaxes in-kernel, so the trainers' memory profile matches the XLA
    composition while eliminating its (B, N, heads, d) relayout copies
    (22.8% of DSM train-step device time, round-4 trace)."""
    return fused_linear_attention(qkv, heads, dim_head,
                                  batch_tile=batch_tile,
                                  interpret=interpret)


def _flav_fwd(qkv, heads, dim_head, batch_tile, interpret):
    out = fused_linear_attention(qkv, heads, dim_head,
                                 batch_tile=batch_tile, interpret=interpret)
    return out, qkv


def _flav_bwd(heads, dim_head, batch_tile, interpret, qkv, g):
    return (_fused_linear_attention_bwd_call(
        qkv, g, heads, dim_head, batch_tile, interpret),)


fused_linear_attention_vjp.defvjp(_flav_fwd, _flav_bwd)
