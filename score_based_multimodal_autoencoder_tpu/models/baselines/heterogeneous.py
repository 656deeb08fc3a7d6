"""Heterogeneous-modality mixture baselines: the CelebA variants.

Counterpart of the reference's MOPOECeleb / MOPOECeleb2mod / MVTCeleb
(/root/reference/mopoe_model.py:733-1124): same subset algebra as the
PolyMNIST versions but over three DIFFERENT autoencoders (conv image VAE,
conv mask VAE, MLP attribute VAE) sharing one latent size. The PoE /
mixture / stratified-selection math is reused from baselines.mixture; only
encoding/decoding dispatch differs (a Python loop over the static modality
list - n_mod is 2-3 here, so per-modality XLA programs are fine and each
decoder keeps its own architecture).

Works with any modules exposing ``encoder(x, train) -> (mu, logvar)`` and
``decoder(z, train)`` (models.vae.ResVAE / AttributeVAE).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..vae import reparametrize
from .mixture import mopoe_cond_select, poe, powerset_masks, stratified_select


class HeterogeneousMixtureVAE(nn.Module):
    """MoPoE/MMVAE/MVAE/MVTCAE over a static list of modality AE configs.

    ``modality_modules`` is a tuple of pre-built flax modules (one per
    modality), each with encoder/decoder methods and a shared size_z.
    """

    modality_modules: Sequence[Any]
    size_z: int

    @property
    def n_mod(self):
        return len(self.modality_modules)

    def setup(self):
        self.vaes = self.modality_modules

    # -- primitives --------------------------------------------------------
    def encode_all(self, inputs, train: bool = False):
        mus, logvars = [], []
        for vae, x in zip(self.vaes, inputs):
            mu, lv = vae.encoder(x, train)
            mus.append(mu)
            logvars.append(lv)
        return jnp.stack(mus), jnp.stack(logvars)

    def decode_all_same_z(self, z, train: bool = False):
        return tuple(vae.decoder(z, train) for vae in self.vaes)

    def sample(self, key, amount: int, train: bool = False):
        z = jax.random.normal(key, (amount, self.size_z))
        return self.decode_all_same_z(z, train)

    # -- forwards (mirroring baselines.mixture) ----------------------------
    def __call__(self, inputs, key, mix_type: str = "mopoe",
                 sample_len: int = 32, train: bool = True):
        if mix_type == "mopoe":
            rep_key, sel_key = jax.random.split(key)
            mus, logvars = self.encode_all(inputs, train)
            mask = powerset_masks(self.n_mod)
            poe_mu, poe_logvar = poe(mus, logvars, mask, add_prior="full")
            zs = reparametrize(rep_key, poe_mu, poe_logvar)
            z = stratified_select(sel_key, zs, inputs[0].shape[0], sample_len)
            return self.decode_all_same_z(z, train), poe_mu, poe_logvar
        if mix_type == "mvt":
            mus, logvars = self.encode_all(inputs, train)
            full_mask = np.ones((1, self.n_mod), np.float32)
            j_mu, j_lv = poe(mus, logvars, full_mask, add_prior="never")
            z = reparametrize(key, j_mu[0], j_lv[0])
            outs = self.decode_all_same_z(z, train)
            return {"individual": (mus, logvars), "joint": (j_mu[0], j_lv[0], outs)}
        raise ValueError(f"{mix_type}: CelebA reference ships mopoe/mvt/mmplus "
                         "(train_cel_upd_mopoe_an.py); use the MMVAEPlus class "
                         "for mmplus")

    def cond_gen(self, inputs, present_mask, key, mix_type: str = "mopoe",
                 sample_len: int = 32, train: bool = False):
        """Conditional generation: MoPoE uses the powerset-of-present
        stratified draw (mopoe_model.py:791-828); MVT/MVAE the subset PoE."""
        present = jnp.asarray(present_mask, jnp.float32)
        mus, logvars = self.encode_all(inputs, train)
        rep_key, sel_key = jax.random.split(key)
        if mix_type == "mopoe":
            z = mopoe_cond_select(rep_key, sel_key, mus, logvars, present,
                                  inputs[0].shape[0], sample_len)
        else:
            add = {"mvt": "never", "mvae": "always"}[mix_type]
            mu, lv = poe(mus, logvars, present[None], add_prior=add)
            z = reparametrize(rep_key, mu[0], lv[0])
        return self.decode_all_same_z(z, train)
