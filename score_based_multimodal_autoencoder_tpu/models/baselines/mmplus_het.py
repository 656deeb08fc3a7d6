"""Heterogeneous MMVAE+ : the CelebA image/mask/attribute variant.

Counterpart of /root/reference/mmplus_model_cel.py:197-519 (MMPLUSCeleba /
PolyCeleb with CelebEnc{Img,Mask,Att} / CelebDec{...}): same factorized
Laplace (w private, z shared) machinery as baselines.mmplus, but each
modality gets its OWN encoder/decoder architecture, so the cross-modal
matrix is built with static Python loops over the modality list (n_mod=3)
instead of a vmapped stack, and reconstructions have per-modality shapes.

The K-sample losses are re-derived here over the nested reconstruction
structure (same math as mmplus_losses._log_weights). Likelihoods follow
the reference per modality: Laplace(mean, 0.75) for image/mask, BERNOULLI
for the attribute vector (PolyCeleb 'att' branch passes dist.Bernoulli,
mmplus_model_cel.py:407-411).

As in the reference, each off-diagonal cell's fresh w is drawn from the
DESTINATION modality's own trainable w-prior (one pw per modality VAE,
mmplus_model_cel.py:422; one pw.rsample per (src, dst) pair,
mmplus_model.py:59-72).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .mmplus import _softmax_scale, laplace_log_prob, laplace_rsample
from .mmplus_losses import _log_mean_exp, _scale_grad


class HeterogeneousMMVAEPlus(nn.Module):
    """MMVAE+ over a static list of per-modality AE modules.

    Each module must expose ``encoder(x, train) -> (mu, raw_logvar)`` and
    ``decoder(u, train)`` with latent size ``latent_dim_w + latent_dim_z``
    (models.vae.ResVAE / AttributeVAE satisfy this).
    """

    modality_modules: Sequence[Any]
    latent_dim_w: int = 128
    latent_dim_z: int = 128
    dec_scale: float = 0.75
    learn_prior_w: bool = True

    @property
    def n_mod(self):
        return len(self.modality_modules)

    @property
    def dim_u(self):
        return self.latent_dim_w + self.latent_dim_z

    def setup(self):
        self.vaes = self.modality_modules
        # One trainable w-prior raw scale PER MODALITY (the reference keeps
        # a pw on each modality VAE, mmplus_model_cel.py:422).
        self._pw_raw = self.param(
            "pw_raw", nn.initializers.zeros,
            (self.n_mod, self.latent_dim_w))

    def pw_params(self):
        """(loc, scale) each (n_mod, latent_dim_w)."""
        raw = self._pw_raw if self.learn_prior_w else jax.lax.stop_gradient(
            self._pw_raw)
        return (jnp.zeros((self.n_mod, self.latent_dim_w)),
                _softmax_scale(raw))

    def encode(self, inputs, train: bool = False):
        """Per-modality posteriors: lists of (B, dim_u) loc/scale."""
        locs, scales = [], []
        for vae, x in zip(self.vaes, inputs):
            loc, raw = vae.encoder(x, train)
            rw, rz = jnp.split(raw, [self.latent_dim_w], axis=-1)
            scale = jnp.concatenate([_softmax_scale(rw), _softmax_scale(rz)], -1)
            locs.append(loc)
            scales.append(scale)
        return jnp.stack(locs), jnp.stack(scales)  # (n_mod, B, u)

    def encode_and_sample(self, inputs, key, K: int = 1, train: bool = False):
        """fresh_w: (src, dst, K, B, w) - one draw per cross-matrix cell,
        from the DESTINATION modality's w-prior (diagonal draws unused)."""
        s_key, w_key = jax.random.split(key)
        q_loc, q_scale = self.encode(inputs, train)
        us = jnp.moveaxis(laplace_rsample(s_key, q_loc, q_scale, (K,)), 0, 1)
        n, _, B, _ = us.shape
        pw_loc, pw_scale = self.pw_params()  # (n_mod, w)
        shape = (n, n, K, B, self.latent_dim_w)
        fresh_w = laplace_rsample(
            w_key, jnp.broadcast_to(pw_loc[None, :, None, None], shape),
            jnp.broadcast_to(pw_scale[None, :, None, None], shape))
        return q_loc, q_scale, us, fresh_w

    def decode_matrix(self, us, fresh_w, train: bool = False):
        """Nested [src][dst] list of decoder means (per-dst shapes differ)."""
        n, K, B, _ = us.shape
        z_e = us[..., self.latent_dim_w:]
        rows: List[List] = []
        for e in range(n):
            row = []
            for d, vae in enumerate(self.vaes):
                u = (us[e] if e == d
                     else jnp.concatenate([fresh_w[e, d], z_e[e]], axis=-1))
                out = vae.decoder(u.reshape(K * B, self.dim_u), train)
                row.append(out.reshape(K, B, *out.shape[1:]))
            rows.append(row)
        return rows

    def __call__(self, inputs, key, K: int = 1, train: bool = True):
        q_loc, q_scale, us, fresh_w = self.encode_and_sample(
            inputs, key, K, train)
        recon = self.decode_matrix(us, fresh_w, train)
        return {"q_loc": q_loc, "q_scale": q_scale, "us": us,
                "fresh_w": fresh_w, "recon": recon,
                "dec_scale": self.dec_scale}

    def generate(self, key, N: int, train: bool = False):
        u = laplace_rsample(key, jnp.zeros((N, self.dim_u)),
                            jnp.ones((N, self.dim_u)))
        return tuple(vae.decoder(u, train) for vae in self.vaes)

    def cross_reconstruct(self, inputs, key, train: bool = False):
        """Eval-path cross matrix: nested [src][dst] list of (B, ...) means.

        Matches ``reconstruct_and_cross_reconstruct_forw``
        (mmplus_model.py:103-124, inherited by MMPLUSCeleba): off-diagonal
        fresh w comes from the FIXED prior pu's w-part (not the learned
        pw), and ONE draw per source row is shared across destinations -
        both unlike the training forward."""
        s_key, w_key = jax.random.split(key)
        q_loc, q_scale = self.encode(inputs, train)
        us = laplace_rsample(s_key, q_loc, q_scale)  # (n_mod, B, u)
        n, B, _ = us.shape
        u_new = laplace_rsample(
            w_key, jnp.zeros((n, B, self.dim_u)), jnp.ones((n, B, self.dim_u)))
        cross = jnp.concatenate(
            [u_new[..., :self.latent_dim_w], us[..., self.latent_dim_w:]],
            axis=-1)
        rows: List[List] = []
        for e in range(n):
            rows.append([vae.decoder(us[e] if e == d else cross[e], train)
                         for d, vae in enumerate(self.vaes)])
        return rows

    def cond_gen(self, inputs, present_mods, key, train: bool = False):
        """Random present source row of the eval cross matrix
        (mmplus_model_cel.py cond_gen via MMVAE.cond_gen ->
        reconstruct_and_cross_reconstruct, mmplus_model.py:91-101).

        ``present_mods`` may be a traced index array (works under jit: the
        source row is gathered, never converted to a Python int)."""
        sel_key, rec_key = jax.random.split(key)
        recon = self.cross_reconstruct(inputs, rec_key, train)
        present = jnp.asarray(present_mods, jnp.int32)
        choice = jax.random.randint(sel_key, (), 0, present.shape[0])
        idx = present[choice]
        outs = []
        for d in range(self.n_mod):
            stacked = jnp.stack([recon[e][d] for e in range(self.n_mod)])
            outs.append(stacked[idx])
        return tuple(outs)


def m_iwae_het(model_out, inputs, *, beta: float = 1.0, latent_dim_w: int = 128,
               pu_scale: float = 1.0, stop_q_params: bool = False,
               likelihoods=None, _return_lw: bool = False):
    """IWAE bound over the heterogeneous cross matrix (same math as
    mmplus_losses._log_weights with nested recon).

    ``likelihoods``: per-modality 'laplace' | 'bernoulli' (the reference
    passes dist.Laplace for image/mask and dist.Bernoulli for the attr
    vector, mmplus_model_cel.py:389-411). Default None infers by recon
    rank: rank<=3 (a (K, B, D) vector modality) -> Bernoulli-from-logits;
    image-shaped -> Laplace(mean, dec_scale)."""
    q_loc, q_scale = model_out["q_loc"], model_out["q_scale"]
    if stop_q_params:
        q_loc = jax.lax.stop_gradient(q_loc)
        q_scale = jax.lax.stop_gradient(q_scale)
    us = model_out["us"]
    recon = model_out["recon"]
    dec_scale = model_out["dec_scale"]
    n_mod, K, B, _ = us.shape

    lpu = laplace_log_prob(us, 0.0, pu_scale).sum(-1)
    ws = us[..., :latent_dim_w]
    zs = us[..., latent_dim_w:]
    qw_loc, qz_loc = q_loc[..., :latent_dim_w], q_loc[..., latent_dim_w:]
    qw_s, qz_s = q_scale[..., :latent_dim_w], q_scale[..., latent_dim_w:]
    lqw = laplace_log_prob(ws, qw_loc[:, None], qw_s[:, None]).sum(-1)
    lqz_all = laplace_log_prob(
        zs[:, None], qz_loc[None, :, None], qz_s[None, :, None]).sum(-1)
    lqz = _log_mean_exp(lqz_all, axis=1)

    if likelihoods is None:
        likelihoods = ["bernoulli" if recon[0][d].ndim <= 3 else "laplace"
                       for d in range(n_mod)]
    rows = []
    for e in range(n_mod):
        row = 0.0
        for d in range(n_mod):
            r = recon[e][d]
            x_d = jnp.asarray(inputs[d])[None]
            if likelihoods[d] == "bernoulli":
                # The attr modality's likelihood is BERNOULLI in the
                # reference (PolyCeleb 'att' branch,
                # mmplus_model_cel.py:407-411, "was laplace"); our
                # AttributeVAE decoder emits logits, so
                # log p = x*logit - softplus(logit).
                ll = x_d * r - jax.nn.softplus(r)
            else:
                ll = laplace_log_prob(r, x_d, dec_scale)
            row = row + ll.reshape(K, B, -1).sum(-1)
        rows.append(row)
    lpx = jnp.stack(rows)  # (n_mod, K, B)

    lw = lpx + beta * (lpu - lqz - lqw)
    if _return_lw:
        return lw
    return _log_mean_exp(lw, axis=1).mean(0).sum()


def m_dreg_het(model, variables, model_out, inputs, *, beta: float = 1.0,
               latent_dim_w: int = 128, train: bool = True,
               likelihoods=None):
    """DReG with the latent-cotangent hook over the heterogeneous matrix."""
    us = model_out["us"]
    lw_ng = jax.lax.stop_gradient(
        m_iwae_het(model_out, inputs, beta=beta, latent_dim_w=latent_dim_w,
                   stop_q_params=True, likelihoods=likelihoods,
                   _return_lw=True))
    w_bar = jnp.exp(lw_ng - jax.nn.logsumexp(lw_ng, axis=1, keepdims=True))
    hooked_us = _scale_grad(us, w_bar)
    recon, _ = model.apply(
        variables, hooked_us, model_out["fresh_w"], train,
        method=model.decode_matrix, mutable=["batch_stats"])
    hooked = dict(model_out)
    hooked["us"] = hooked_us
    hooked["recon"] = recon
    lw = m_iwae_het(hooked, inputs, beta=beta, latent_dim_w=latent_dim_w,
                    stop_q_params=True, likelihoods=likelihoods,
                    _return_lw=True)
    return (w_bar * lw).mean(0).sum()
