"""Mixture-family multimodal VAE baselines: MoPoE / MMVAE / MVAE / MVTCAE.

TPU-native re-design of /root/reference/mopoe_model.py:310-726. One flax
module holds all per-modality ResVAEs as a single ``nn.vmap``-stacked
submodule (one set of stacked params, one optimizer), and the subset
algebra runs as masked matmuls over stacked latents instead of Python
loops over the 1023-element powerset:

- PoE over any subset family: with T = 1/var (n_mod, B, z) and a subset
  mask M (S, n_mod), the product-expert precisions/means of ALL subsets are
  ``einsum('sm,mbz->sbz', M, T)`` - one MXU contraction.
- The reference's stratified "pick one subset-z per batch block" selection
  (mopoe_model.py:398-456) becomes a gather with a block-index map.

Faithfulness notes:
- PoE adds a N(0,1) prior expert only for the FULL modality set in MoPoE
  (mopoe_model.py:336-338), ALWAYS in MVAE (mopoe_model.py:573-575), and
  never in MVTCAE (mopoe_model.py:664-667).
- Singleton subsets bypass PoE entirely (no 1e-8 variance fudge),
  matching mopoe_model.py:386-389.
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..vae import ResVAE, reparametrize


def powerset_masks(n_mod: int) -> np.ndarray:
    """(S, n_mod) 0/1 mask of all non-empty subsets, in the reference's
    combinations-by-size order (mopoe_model.py:325-331)."""
    rows = []
    for size in range(1, n_mod + 1):
        for combo in combinations(range(n_mod), size):
            row = np.zeros((n_mod,), np.float32)
            row[list(combo)] = 1.0
            rows.append(row)
    return np.stack(rows)


def poe(mus, logvars, mask, *, add_prior: str = "full"):
    """Masked product-of-experts over subset families.

    Args:
      mus/logvars: (n_mod, B, z) stacked unimodal posteriors.
      mask: (S, n_mod) subset membership.
      add_prior: 'full' = prior expert only for the complete subset (MoPoE),
        'always' = every subset (MVAE), 'never' (MVTCAE).

    Returns (poe_mu, poe_logvar): (S, B, z). Singleton subsets return the
    raw unimodal posterior (reference parity).
    """
    mask = jnp.asarray(mask)
    var = jnp.exp(logvars) + 1e-8
    T = 1.0 / var
    T_sum = jnp.einsum("sm,mbz->sbz", mask, T)
    muT_sum = jnp.einsum("sm,mbz->sbz", mask, mus * T)

    n_mod = mus.shape[0]
    subset_size = mask.sum(axis=1)  # (S,)
    if add_prior == "always":
        prior = jnp.ones_like(subset_size)
    elif add_prior == "full":
        prior = (subset_size == n_mod).astype(T_sum.dtype)
    elif add_prior == "never":
        prior = jnp.zeros_like(subset_size)
    else:
        raise ValueError(add_prior)
    T_sum = T_sum + prior[:, None, None]  # prior expert: mu=0, var=1

    poe_mu = muT_sum / T_sum
    poe_var = 1.0 / T_sum
    poe_logvar = jnp.log(poe_var + 1e-8)

    # Singletons bypass PoE when no prior expert joins them.
    singleton = (subset_size == 1) & (prior == 0)
    raw_mu = jnp.einsum("sm,mbz->sbz", mask, mus)
    raw_logvar = jnp.einsum("sm,mbz->sbz", mask, logvars)
    poe_mu = jnp.where(singleton[:, None, None], raw_mu, poe_mu)
    poe_logvar = jnp.where(singleton[:, None, None], raw_logvar, poe_logvar)
    return poe_mu, poe_logvar


def stratified_select(key, zs, batch_size: int, sample_len: int):
    """Reference's block-stratified mixture draw (mopoe_model.py:441-456):
    split the batch into ``sample_len`` contiguous blocks; block i takes its
    rows from a uniformly drawn subset-z (without replacement).

    zs: (S, B, z) -> (B, z).
    """
    S = zs.shape[0]
    sample_len = min(sample_len, S, batch_size)
    div = batch_size // sample_len
    choice = jax.random.permutation(key, S)[:sample_len]  # (sample_len,)
    block = jnp.minimum(jnp.arange(batch_size) // div, sample_len - 1)
    owner = choice[block]  # (B,)
    return jnp.take_along_axis(zs, owner[None, :, None], axis=0)[0]


def mopoe_cond_select(rep_key, sel_key, mus, logvars, present, batch_size,
                      sample_len):
    """MoPoE conditional z draw: powerset of the PRESENT subset, PoE per
    subset, block-stratified selection (mopoe_model.py:364-418; same logic
    in the CelebA variant, mopoe_model.py:791-828)."""
    n_mod = mus.shape[0]
    mask = jnp.asarray(powerset_masks(n_mod))
    within = (mask * (1 - present)[None]).sum(axis=1) == 0
    poe_mu, poe_logvar = poe(mus, logvars, mask, add_prior="full")
    zs = reparametrize(rep_key, poe_mu, poe_logvar)
    S = mask.shape[0]
    logits = jnp.where(within, 0.0, -jnp.inf)
    n_within = within.sum()
    sample_len_eff = jnp.minimum(jnp.minimum(sample_len, n_within), batch_size)
    # WITHOUT replacement, like the reference's randperm over the
    # within-subsets (mopoe_model.py:404-410) and stratified_select above:
    # Gumbel-top-k over the uniform within-logits yields min(sample_len, S)
    # DISTINCT subsets (k is static; entries past n_within carry -inf
    # logits and are never reachable through the clamped block index).
    k = min(sample_len, S)
    gumbel = jax.random.gumbel(sel_key, (S,))
    _, choice = jax.lax.top_k(logits + gumbel, k)  # (k,) distinct
    div = jnp.maximum(batch_size // jnp.maximum(sample_len_eff, 1), 1)
    block_owner = choice[jnp.minimum(
        jnp.arange(batch_size) // div, jnp.maximum(sample_len_eff - 1, 0))]
    return jnp.take_along_axis(zs, block_owner[None, :, None], axis=0)[0]


class MixtureMultimodalVAE(nn.Module):
    """MoPoE / MMVAE / MVAE / MVTCAE over stacked per-modality ResVAEs.

    ``mix_type`` selects the forward semantics, mirroring the reference
    trainer dispatch (/root/reference/train_psm_upd_mopoe_an.py:112-145).
    """

    n_mod: int
    enc_channel_list: Sequence[Tuple[int, int, int, int]]
    dec_channel_list: Sequence[Tuple[int, int, int, int]]
    size_in: int = 32
    size_z: int = 64
    img_ch: int = 3
    variant: str = "poly"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        VmappedVAE = nn.vmap(
            ResVAE,
            in_axes=(0, None), out_axes=0,  # (stacked batch, shared `train`)
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            methods=["encoder", "decoder"],
            axis_size=self.n_mod,
        )
        self.vaes = VmappedVAE(
            self.enc_channel_list, self.dec_channel_list, self.size_in,
            self.size_z, self.img_ch, self.variant, self.dtype,
        )

    # -- primitives --------------------------------------------------------
    def encode_all(self, inputs, train: bool = False):
        """(n_mod, B, H, W, C) -> mus, logvars (n_mod, B, z)."""
        return self.vaes.encoder(inputs, train)

    def decode_all_same_z(self, z, train: bool = False):
        """Decode ONE z with every decoder -> (n_mod, B, H, W, C)."""
        z_stack = jnp.broadcast_to(z, (self.n_mod,) + z.shape)
        return self.vaes.decoder(z_stack, train)

    def sample(self, key, amount: int, train: bool = False):
        """Prior z -> all decoders (unconditional generation)."""
        z = jax.random.normal(key, (amount, self.size_z))
        return self.decode_all_same_z(z, train)

    # -- forwards ----------------------------------------------------------
    def __call__(self, inputs, key, mix_type: str = "mopoe",
                 sample_len: int = 32, train: bool = True):
        if mix_type == "mopoe":
            return self.forward_mopoe(inputs, key, sample_len, train)
        if mix_type == "mmvae":
            return self.forward_mmvae(inputs, key, train)
        if mix_type == "mvae":
            return self.forward_mvae(inputs, key, train)
        if mix_type == "mvt":
            return self.forward_mvt(inputs, key, train)
        raise ValueError(mix_type)

    def forward_mopoe(self, inputs, key, sample_len: int = 32,
                      train: bool = True):
        """Powerset PoE + stratified mixture (mopoe_model.py:423-467).
        Returns (outs, all_mus, all_logvars) with subset-major stacking."""
        rep_key, sel_key = jax.random.split(key)
        mus, logvars = self.encode_all(inputs, train)
        mask = powerset_masks(self.n_mod)
        poe_mu, poe_logvar = poe(mus, logvars, mask, add_prior="full")
        zs = reparametrize(rep_key, poe_mu, poe_logvar)
        z = stratified_select(sel_key, zs, inputs.shape[1], sample_len)
        outs = self.decode_all_same_z(z, train)
        return outs, poe_mu, poe_logvar

    def forward_mmvae(self, inputs, key, train: bool = True):
        """Mixture-of-experts: batch partitioned across unimodal posteriors
        (mopoe_model.py:529-544)."""
        rep_key, _ = jax.random.split(key)
        mus, logvars = self.encode_all(inputs, train)
        zs = reparametrize(rep_key, mus, logvars)  # (n_mod, B, z)
        B = inputs.shape[1]
        div = B // self.n_mod
        block = jnp.minimum(jnp.arange(B) // max(div, 1), self.n_mod - 1)
        z = jnp.take_along_axis(zs, block[None, :, None], axis=0)[0]
        outs = self.decode_all_same_z(z, train)
        return outs, mus, logvars

    def forward_mvae(self, inputs, key, train: bool = True):
        """Sub-sampled ELBO terms: individual + joint + random-k subset
        (mopoe_model.py:610-642). Returns the elbo_terms structure the
        mvae_loss consumes."""
        k_key, rep_key, joint_key, sub_key = jax.random.split(key, 4)
        mus, logvars = self.encode_all(inputs, train)

        # Individual ELBOs.
        z_ind = reparametrize(rep_key, mus, logvars)
        outs_ind = self.vaes.decoder(z_ind, train)

        # Joint (always-prior PoE over all modalities).
        full_mask = np.ones((1, self.n_mod), np.float32)
        full_mu, full_logvar = poe(mus, logvars, full_mask, add_prior="always")
        full_z = reparametrize(joint_key, full_mu[0], full_logvar[0])
        full_outs = self.decode_all_same_z(full_z, train)

        # Random-k subset (2 <= k < n_mod); static powerset row drawn on
        # device via categorical over eligible subsets.
        mask = powerset_masks(self.n_mod)
        sizes = mask.sum(axis=1)
        eligible = (sizes >= 2) & (sizes < max(self.n_mod, 3))
        logits = jnp.where(jnp.asarray(eligible), 0.0, -jnp.inf)
        row = jax.random.categorical(k_key, logits)
        k_mask = jnp.asarray(mask)[row][None]  # (1, n_mod)
        k_mu, k_logvar = poe(mus, logvars, k_mask, add_prior="always")
        k_z = reparametrize(sub_key, k_mu[0], k_logvar[0])
        k_outs = self.decode_all_same_z(k_z, train)

        return {
            "individual": (mus, logvars, outs_ind),
            "joint": (full_mu[0], full_logvar[0], full_outs),
            "subset": (k_mu[0], k_logvar[0], k_mask[0], k_outs),
        }

    def forward_mvt(self, inputs, key, train: bool = True):
        """MVTCAE: joint no-prior PoE recon + unimodal posteriors for the
        CVIB cross-KL terms (mopoe_model.py:700-726)."""
        mus, logvars = self.encode_all(inputs, train)
        full_mask = np.ones((1, self.n_mod), np.float32)
        full_mu, full_logvar = poe(mus, logvars, full_mask, add_prior="never")
        z = reparametrize(key, full_mu[0], full_logvar[0])
        outs = self.decode_all_same_z(z, train)
        return {
            "individual": (mus, logvars),
            "joint": (full_mu[0], full_logvar[0], outs),
        }

    # -- conditional generation -------------------------------------------
    def cond_gen(self, inputs, present_mask, key, mix_type: str = "mopoe",
                 sample_len: int = 32, train: bool = False):
        """Generate ALL modalities given the subset flagged in
        ``present_mask`` (n_mod,) bool (mopoe_model.py:364-418).
        """
        present = jnp.asarray(present_mask, jnp.float32)
        mus, logvars = self.encode_all(inputs, train)
        rep_key, sel_key = jax.random.split(key)

        if mix_type in ("mvae", "mvt"):
            # PoE over the present subset.
            add = "always" if mix_type == "mvae" else "never"
            mu, logvar = poe(mus, logvars, present[None], add_prior=add)
            z = reparametrize(rep_key, mu[0], logvar[0])
        elif mix_type == "mmvae":
            zs = reparametrize(rep_key, mus, logvars)
            B = inputs.shape[1]
            idx = jnp.nonzero(present, size=self.n_mod, fill_value=0)[0]
            n_present = present.sum().astype(jnp.int32)
            div = jnp.maximum(B // jnp.maximum(n_present, 1), 1)
            block = jnp.minimum(jnp.arange(B) // div, n_present - 1)
            owner = idx[block]
            z = jnp.take_along_axis(zs, owner[None, :, None], axis=0)[0]
        elif mix_type == "mopoe":
            z = mopoe_cond_select(
                rep_key, sel_key, mus, logvars, present, inputs.shape[1],
                sample_len)
        else:
            raise ValueError(mix_type)
        return self.decode_all_same_z(z, train)
