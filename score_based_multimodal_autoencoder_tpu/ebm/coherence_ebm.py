"""Time-conditioned pairwise coherence EBM.

Reconstruction of the reference's ``ClwithTime2/ClwithTime3`` classes,
which are imported by five scripts but MISSING from the mirror (SURVEY.md
§7.3). The surviving call-site contract
(/root/reference/train_poly_clwithtime_ebm_IND.py:135-145,
/root/reference/train_poly_unet_cont.py:83, n_mod=2 / n_class=1 at
/root/reference/train_poly_unet_cont.py:587):

    cl(z_pair_flat (B, 2*size_z), t (B,), mod1_idx, mod2_idx) -> (B, n_class)

Low energy = coherent (matched) latent pair; the NCE losses in ebm.nce push
matched pairs negative and shuffled/noise pairs positive. Architecture
follows the reference's MLP house style (per-layer additive time
conditioning, /root/reference/lat_sm2_model.py:457-493) with learned
modality-pair embeddings standing in for the mod1/mod2 integer args.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import SinusoidalTimeEmbedding


class PairwiseCoherenceEBM(nn.Module):
    """E(z_i || z_j, t | i, j) -> (B, n_class) energy/logit."""

    size_z: int = 64
    n_mod: int = 10
    n_class: int = 1
    widths: Sequence[int] = (512, 512, 512, 256)
    time_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_pair, t, mod1, mod2):
        B = z_pair.shape[0]
        temb = SinusoidalTimeEmbedding(self.time_dim)(t).astype(self.dtype)
        # Per-SLOT embeddings: the conditioning must be order-SENSITIVE -
        # z_pair's first block holds mod1's latent and the second mod2's,
        # and training draws unordered pairs (cli/train_ebm.py random
        # permutation, matching the reference's unsorted randperm), so a
        # shared summed embedding would force (0,1)-layout [z0|z1] and
        # (1,0)-layout [z1|z0] onto the same conditioning vector. The
        # reference ClwithTime call sites pass ordered mod1/mod2 ints.
        slot1 = nn.Embed(self.n_mod, self.time_dim, dtype=self.dtype,
                         name="mod_embed")
        slot2 = nn.Embed(self.n_mod, self.time_dim, dtype=self.dtype,
                         name="mod_embed2")
        pair_emb = slot1(jnp.asarray(mod1)) + slot2(jnp.asarray(mod2))
        h = jnp.concatenate(
            [z_pair.reshape(B, -1).astype(self.dtype),
             jnp.broadcast_to(pair_emb, (B, self.time_dim))], axis=-1)
        for i, w in enumerate(self.widths):
            h = nn.Dense(w, dtype=self.dtype, name=f"fc{i}")(h)
            h = h + nn.Dense(w, dtype=self.dtype, name=f"time{i}")(temb)
            h = nn.softplus(h)
        return nn.Dense(self.n_class, dtype=self.dtype, name="out")(h)
