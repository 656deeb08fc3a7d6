"""TPU-native Score-Based Multimodal Autoencoder (SBMAE) framework.

A from-scratch JAX / Flax / Pallas re-design of the capabilities of the
reference PyTorch implementation of "Score-Based Multimodal Autoencoders"
(reference layout surveyed in SURVEY.md). The compute path is pure
JAX/XLA with Pallas TPU kernels for hot ops; parallelism is expressed as
`jax.sharding` over device meshes rather than per-process CUDA devices.

Subpackages
-----------
- ``diffusion``: continuous VP/subVP/VE SDEs, denoising score matching
  losses, whole-trajectory ``lax.scan`` samplers (unconditional,
  channel-clamped conditional, annealed Langevin, DDPM refiner).
- ``nn``: score networks (latent UNet, ADM UNet), blocks, classifiers.
- ``models``: per-modality VAE/AE families and multimodal VAE baselines.
- ``ebm``: time-conditioned pairwise coherence EBMs + NCE training.
- ``eval``: FID (Frechet distance + feature pipelines), coherence, F1.
- ``train``: unified trainer, EMA, orbax checkpointing, configs.
- ``parallel``: mesh construction, data-parallel sharding, vmapped
  per-modality VAE fleets.
- ``data``: PolyMNIST / CelebAMask-HQ pipelines and synthetic fixtures.
- ``ops``: Pallas TPU kernels.
"""

__version__ = "0.1.0"
