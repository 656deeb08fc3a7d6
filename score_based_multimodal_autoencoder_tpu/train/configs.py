"""Configuration tree with named presets for every shipped reference config.

The reference scatters ~60 argparse flags per script with architecture
channel lists as in-code literals (SURVEY.md §5). Here each pipeline stage
is a dataclass; presets reproduce the exact shipped defaults with file:line
citations.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass
class VAEConfig:
    preset: str = "polymnist"
    size_z: int = 64
    beta: float = 0.5
    lr: float = 1e-3
    batch_size: int = 256
    epochs: int = 200
    # Input resolution for the CelebA conv VAEs; 128 = the reference config,
    # anything else builds the smoke-scaled variant (CPU tests / synthetic).
    size_in: int = 128

    @classmethod
    def polymnist(cls, size_z=64, beta=0.5):
        # train_polyupd.py:249-266 defaults; train_poly.sh uses beta=0.5.
        return cls("polymnist", size_z, beta, lr=1e-3, batch_size=256, epochs=200)

    @classmethod
    def celeba_image(cls, size_z=256, beta=1.0, size_in=128):
        # train_celeba_res_hq.py flags (size 128, z 256).
        return cls("celeba_image", size_z, beta, lr=1e-3, batch_size=64,
                   epochs=300, size_in=size_in)

    @classmethod
    def celeba_mask(cls, size_z=256, beta=1.0, size_in=128):
        return cls("celeba_mask", size_z, beta, lr=1e-3, batch_size=64,
                   epochs=300, size_in=size_in)

    @classmethod
    def celeba_attr(cls, size_z=256, beta=1.0, size_in=128):
        # train_celeba_attr_hq.py (18 visible attrs, MLP VAE).
        return cls("celeba_attr", size_z, beta, lr=1e-3, batch_size=256,
                   epochs=300, size_in=size_in)

    def build_model(self, dtype=None):
        import jax.numpy as jnp

        from ..models.vae import (
            AttributeVAE,
            celeba_image_vae,
            celeba_mask_vae,
            polymnist_vae,
        )

        dtype = dtype or jnp.float32
        if self.preset == "polymnist":
            return polymnist_vae(self.size_z, dtype)
        if self.preset == "celeba_image":
            return celeba_image_vae(self.size_z, dtype, self.size_in)
        if self.preset == "celeba_mask":
            return celeba_mask_vae(self.size_z, dtype, self.size_in)
        if self.preset == "celeba_attr":
            return AttributeVAE(size_z=self.size_z, att_size=18, dtype=dtype)
        raise ValueError(self.preset)


@dataclass
class ScoreConfig:
    preset: str = "polymnist"
    dim: int = 128
    channels: int = 10
    dim_mults: Tuple[int, ...] = (1, 2, 2, 2)
    latent_hw: int = 8
    sde_type: str = "vpsde"
    beta_0: float = 0.1
    beta_1: float = 20.0
    n_steps: int = 1000
    sample_n: int = 100
    likelihood_weighting: bool = True
    importance_sampling: bool = False
    noise_obs: bool = False
    pc: bool = False
    corrector_steps: int = 1
    target_snr: float = 0.16
    lr: float = 1e-4
    batch_size: int = 256
    epochs: int = 3000
    # TPU tuning knobs (not in the reference): MXU-aligned stem width
    # (None = reference's dim//3*2), the fused Pallas GroupNorm path, and
    # depthwise-7x7-as-MXU-matmul (identical math, nn/blocks.py).
    init_dim: Optional[int] = None
    fused_norms: bool = False
    mxu_depthwise: bool = False
    # MXU-depthwise position cutoff: levels with H*W above it use the conv
    # emitter (64 = hybrid for 16x16 flagships; see nn/blocks.py).
    mxu_max_positions: int = 256
    # tanh-approx GELU (vs torch-exact erf): ~1.3x faster sampling on TPU.
    approx_gelu: bool = False
    # Fused Pallas linear attention (ops/linear_attention.py) on the >=16
    # position levels. Applied when build_model(sample=True); trainers get
    # it only with pallas_train_attn (the differentiable custom-VJP
    # variant) - otherwise they keep the XLA path.
    pallas_linear_attn: bool = False
    # Whole-block fusion at the gated sites (PreNormResidual + both 1x1
    # matmuls + both GN1s + residual in ONE pallas_call,
    # ops/linear_attention.py fused_attention_block). Config-level
    # off-switch for kernel/runtime regressions; only active with
    # pallas_linear_attn in the sampling flavor.
    pallas_block_fusion: bool = True
    # Differentiable Pallas attention in the TRAIN flavor (custom VJP,
    # ops/linear_attention.py fused_linear_attention_vjp): eliminates the
    # (B, N, heads, d) relayout copies around the XLA attention einsums in
    # forward AND backward (22.8% of DSM train-step device time in the
    # round-4 trace). Requires pallas_linear_attn.
    pallas_train_attn: bool = False

    @classmethod
    def polymnist(cls, **kw):
        # Unet(dim=128, channels=10, (1,2,2,2)) on 8x8 latents
        # (train_poly_unet_cont.py:567-572); N=100 sampling steps.
        defaults = dict(preset="polymnist", dim=128, channels=10,
                        dim_mults=(1, 2, 2, 2), latent_hw=8, sample_n=100)
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def polymnist_tpu(cls, **kw):
        """PolyMNIST flagship tuned for TPU: same topology as ``polymnist``
        but the stem width is raised from the reference's dim//3*2 = 85 to
        128 (the MXU lane count - 85 channels pad to 128 lanes anyway, so
        the extra width is free) and the depthwise 7x7 convs - the hottest
        op family in the sampled HLO profile - run as per-channel HWxHW
        matmuls on the MXU (identical math). GELUs use the tanh
        approximation (erf's polynomial dominates the VPU: 1625 -> 2084
        samples/s in the sampling bench; max abs act diff ~1e-3)."""
        defaults = dict(preset="polymnist", dim=128, channels=10,
                        dim_mults=(1, 2, 2, 2), latent_hw=8, sample_n=100,
                        init_dim=128, mxu_depthwise=True, approx_gelu=True,
                        pallas_linear_attn=True,
                        # Differentiable Pallas attention in the TRAIN
                        # flavor: 51.5k -> 60-61k samples/s DSM scan-step
                        # throughput (+17%, interleaved A/B, BASELINE.md
                        # round 4). celebhq_tpu leaves it off (measured a
                        # wash at dim=256 - attention is a tiny fraction
                        # there).
                        pallas_train_attn=True)
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def celebhq(cls, **kw):
        # Unet(dim=256, channels=3, (1,2,2,2,2)) on 16x16 latents
        # (train_lat_celebhq_unet_cont2.py:470-472); N=1000 sampling steps.
        defaults = dict(preset="celebhq", dim=256, channels=3,
                        dim_mults=(1, 2, 2, 2, 2), latent_hw=16, sample_n=1000)
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def celebhq_tpu(cls, **kw):
        """CelebA flagship tuned for TPU (stem 170 -> 256, MXU depthwise
        on the <=16x16 levels, tanh-approx GELU, Pallas linear attention
        in the sampling flavor). The original head-looped kernel LOST here
        (16.8 vs 17.1 samples/s at b256: attention is a smaller fraction
        at dim=256 and it paid extra VMEM bandwidth at N=256); the
        joint-head rewrite wins at both scales (17.2 vs 17.1 at b256,
        70.0 % vs 69.5 % MFU - BASELINE.md round 3), so the preset now
        enables it like ``polymnist_tpu``."""
        defaults = dict(preset="celebhq", dim=256, channels=3,
                        dim_mults=(1, 2, 2, 2, 2), latent_hw=16,
                        sample_n=1000, init_dim=256, mxu_depthwise=True,
                        approx_gelu=True, pallas_linear_attn=True)
        defaults.update(kw)
        return cls(**defaults)

    def build_model(self, dtype=None, sample: bool = False):
        """``sample=True`` builds the SAMPLING flavor: identical params and
        math, plus sampling-only perf paths (whole-block fusion is
        forward-only; trainers use the Pallas attention only via the
        differentiable pallas_train_attn variant)."""
        import jax.numpy as jnp

        from ..nn.unet import LatentUNet

        return LatentUNet(dim=self.dim, channels=self.channels,
                          dim_mults=tuple(self.dim_mults),
                          init_dim=self.init_dim,
                          fused_norms=self.fused_norms,
                          mxu_depthwise=self.mxu_depthwise,
                          mxu_max_positions=self.mxu_max_positions,
                          approx_gelu=self.approx_gelu,
                          pallas_linear_attn=self.pallas_linear_attn and (
                              sample or self.pallas_train_attn),
                          pallas_block_fusion=self.pallas_block_fusion,
                          pallas_attn_vjp=(self.pallas_train_attn
                                           and not sample),
                          dtype=dtype or jnp.float32)

    def build_sde(self, sample: bool = False):
        from ..diffusion.sde import get_sde

        n = self.sample_n if sample else self.n_steps
        return get_sde(self.sde_type, self.beta_0, self.beta_1, n)
