"""MLP score / energy networks over flat concatenated latents.

Counterpart of /root/reference/lat_sm2_model.py (a ~30-variant zoo; the
variants the shipped pipelines actually load are generalized into four
configurable families):

- ``FlatScoreMLP``: softplus MLP vector-field score over (B, n_mod*size_z)
  - covers LSMPoly64_sm (lat_sm2_model.py:348-371, loaded by
  fid_upd10.py:403 for annealed-Langevin eval) and Poly_sm/Poly_sm2
  (:248-296, the finetune script's score net) via the ``hidden_mults``
  schedule.
- ``TimeScoreMLP``: per-layer additive time conditioning - covers
  LSMPoly64_dsm2 (:457-493) and the USM2 label-conditioned pattern
  (:711-737, ``label`` is just another scalar conditioner).
- ``FlatEnergyMLP``: scalar energy net - covers CelebAEnergy (:740-762) and
  the LSMPoly2_64-style pairwise energies.
- ``PairwiseEnergySum``: sum of pairwise energies over all modality pairs -
  covers EM3/EM3_train/EM5 (:560-604) for any n_mod.
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import SinusoidalTimeEmbedding


class FlatScoreMLP(nn.Module):
    """Softplus MLP: (B, D) -> (B, D) score. ``hidden_mults`` are widths as
    multiples of D (LSMPoly64_sm uses (2, 6, 6, 4, 2, 1))."""

    hidden_mults: Sequence[float] = (2, 6, 6, 4, 2, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        h = x
        for i, m in enumerate(self.hidden_mults):
            h = nn.softplus(nn.Dense(int(D * m), dtype=self.dtype,
                                     name=f"fc{i}")(h))
        return nn.Dense(D, dtype=self.dtype, name="out")(h)


class TimeScoreMLP(nn.Module):
    """Score MLP with per-layer additive conditioning on t (and optionally a
    label), the LSMPoly64_dsm2 / USM2 house pattern."""

    hidden_mults: Sequence[float] = (4, 4, 3, 2, 2, 3)
    time_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        D = x.shape[-1]
        temb = SinusoidalTimeEmbedding(self.time_dim)(t).astype(self.dtype)
        h = x
        for i, m in enumerate(self.hidden_mults):
            w = int(D * m)
            h = nn.Dense(w, dtype=self.dtype, name=f"fc{i}")(h)
            h = h + nn.Dense(w, dtype=self.dtype, name=f"time{i}")(temb)
            h = nn.relu(h)
        return nn.Dense(D, dtype=self.dtype, name="out")(h)


class FlatEnergyMLP(nn.Module):
    """Softplus MLP: (B, D) -> (B, 1) scalar energy (CelebAEnergy widths)."""

    hidden_mults: Sequence[float] = (1, 2, 2, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        h = x
        for i, m in enumerate(self.hidden_mults):
            h = nn.softplus(nn.Dense(int(D * m), dtype=self.dtype,
                                     name=f"fc{i}")(h))
        return nn.Dense(1, dtype=self.dtype, name="out")(h)


class PairwiseEnergySum(nn.Module):
    """E(z) = sum over pairs (i, j) of E_ij(z_i || z_j) with one energy MLP
    per pair (EM3_train / EM5 generalized to any n_mod)."""

    n_mod: int
    size_z: int
    hidden_mults: Sequence[float] = (1, 2, 2, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        parts = jnp.split(z, self.n_mod, axis=-1)
        total = 0.0
        for i, j in combinations(range(self.n_mod), 2):
            pair = jnp.concatenate([parts[i], parts[j]], axis=-1)
            total = total + FlatEnergyMLP(
                self.hidden_mults, self.dtype, name=f"e{i}{j}")(pair)
        return total
