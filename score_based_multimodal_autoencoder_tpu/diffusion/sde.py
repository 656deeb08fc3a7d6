"""Continuous-time forward SDEs (VP / sub-VP / VE) for latent diffusion.

TPU-first re-design of the SDE family the reference defines in
/root/reference/sde_helper2.py:191-473 (itself derived from Yang Song's
score_sde). Differences from the reference, by design:

- SDEs are immutable ``flax.struct`` dataclasses whose hyperparameters are
  static pytree leaves, so they can be closed over / passed through ``jit``
  without retracing games. All methods are pure functions of ``(x, t)``.
- No cached discrete beta/alpha tables: DDPM/SMLD discretizations and the
  Langevin-corrector ``alpha(t)`` are computed in closed form on device,
  matching the reference's table lookups exactly at the table's grid points
  (the tables are themselves closed-form linspaces/geomspaces).
- ``prior_sampling`` takes an explicit PRNG key.
- Broadcasting is rank-agnostic via ``batch_mul`` (the reference hardcodes
  4-D ``[:, None, None, None]``).

Faithfulness notes (SURVEY.md §7.4): ``SubVPSDE.marginal_prob`` returns
``std = 1 - exp(2*log_mean_coeff)`` **without** a square root — this matches
the sub-VP variance in the reference (/root/reference/sde_helper2.py:409-413)
and must not be "corrected".
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from ..utils.shaping import batch_mul, flatten_batch


class SDE:
    """Interface shared by the concrete SDEs.

    Every concrete SDE provides, for a mini-batch ``x`` of shape (B, ...)
    and times ``t`` of shape (B,):

    - ``sde(x, t) -> (drift, diffusion)``: forward drift (same shape as x)
      and scalar-per-example diffusion coefficient (shape (B,)).
    - ``marginal_prob(x, t) -> (mean, std)``: parameters of p_t(x(t) | x(0)).
    - ``prior_sampling(key, shape)``: one sample from p_T.
    - ``prior_logp(z)``: log-density of the prior, shape (B,).
    - ``discretize(x, t) -> (f, G)``: one-step transition of the associated
      ancestral (DDPM/SMLD) chain.
    """

    T: float = 1.0

    def reverse_drift_diffusion(self, x, t, score, probability_flow=False):
        """Drift/diffusion of the reverse-time SDE given a score estimate.

        Mirrors the reverse-SDE construction at
        /root/reference/sde_helper2.py:277-317 (sans the EBM-guidance hooks,
        which live in ``diffusion.guidance`` as composable score transforms).
        """
        drift, diffusion = self.sde(x, t)
        factor = 0.5 if probability_flow else 1.0
        rev_drift = drift - factor * batch_mul(diffusion**2, score)
        rev_diffusion = jnp.zeros_like(diffusion) if probability_flow else diffusion
        return rev_drift, rev_diffusion

    def corrector_alpha(self, t):
        """DDPM ``alpha`` used by the Langevin corrector's step-size rule.

        VE-type SDEs use 1 (/root/reference/sde_helper2.py:56-60).
        """
        return jnp.ones_like(t)


@struct.dataclass
class VPSDE(SDE):
    """Variance-preserving SDE with linear beta(t) (sde_helper2.py:329-381)."""

    beta_0: float = struct.field(pytree_node=False, default=0.1)
    beta_1: float = struct.field(pytree_node=False, default=20.0)
    N: int = struct.field(pytree_node=False, default=1000)

    def beta(self, t):
        return self.beta_0 + t * (self.beta_1 - self.beta_0)

    def sde(self, x, t):
        beta_t = self.beta(t)
        drift = batch_mul(-0.5 * beta_t, x)
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def _log_mean_coeff(self, t):
        return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0

    def marginal_prob(self, x, t):
        log_mean_coeff = self._log_mean_coeff(t)
        mean = batch_mul(jnp.exp(log_mean_coeff), x)
        # -expm1 instead of 1-exp: keeps full precision for t -> 0, where
        # the reference's float32 formula collapses to sqrt(eps) noise.
        std = jnp.sqrt(-jnp.expm1(2.0 * log_mean_coeff))
        return mean, std

    def prior_sampling(self, key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)

    def prior_logp(self, z):
        d = math.prod(z.shape[1:])
        return -d / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(flatten_batch(z) ** 2, -1) / 2.0

    def _discrete_beta_alpha(self, t):
        # Closed form of the reference's cached tables
        # (linspace(beta_0/N, beta_1/N, N) indexed at (t*(N-1)/T).long() -
        # torch TRUNCATION, i.e. floor for positive t; do not "fix" this to
        # round() or the table lookups diverge from sde_helper2.py for all
        # off-grid t).
        timestep = jnp.floor(t * (self.N - 1) / self.T).astype(jnp.int32)
        frac = timestep.astype(t.dtype) / (self.N - 1)
        beta = (self.beta_0 + frac * (self.beta_1 - self.beta_0)) / self.N
        return beta, 1.0 - beta

    def discretize(self, x, t):
        """DDPM discretization (sde_helper2.py:373-381)."""
        beta, alpha = self._discrete_beta_alpha(t)
        f = batch_mul(jnp.sqrt(alpha), x) - x
        G = jnp.sqrt(beta)
        return f, G

    def corrector_alpha(self, t):
        return self._discrete_beta_alpha(t)[1]


@struct.dataclass
class SubVPSDE(SDE):
    """Sub-VP SDE (sde_helper2.py:384-421). Note the un-rooted marginal std."""

    beta_0: float = struct.field(pytree_node=False, default=0.1)
    beta_1: float = struct.field(pytree_node=False, default=20.0)
    N: int = struct.field(pytree_node=False, default=1000)

    def beta(self, t):
        return self.beta_0 + t * (self.beta_1 - self.beta_0)

    def sde(self, x, t):
        beta_t = self.beta(t)
        drift = batch_mul(-0.5 * beta_t, x)
        discount = -jnp.expm1(-2 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t**2)
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def marginal_prob(self, x, t):
        log_mean_coeff = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        mean = batch_mul(jnp.exp(log_mean_coeff), x)
        # Faithful to the reference: variance-like std WITHOUT sqrt
        # (/root/reference/sde_helper2.py:412, see SURVEY.md §7.4).
        # expm1 form for precision at small t.
        std = -jnp.expm1(2.0 * log_mean_coeff)
        return mean, std

    def prior_sampling(self, key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)

    def prior_logp(self, z):
        d = math.prod(z.shape[1:])
        return -d / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(flatten_batch(z) ** 2, -1) / 2.0

    def discretize(self, x, t):
        # Inherit Euler-Maruyama form (sde_helper2.py:236-253 default).
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * math.sqrt(dt)

    def corrector_alpha(self, t):
        timestep = jnp.floor(t * (self.N - 1) / self.T).astype(jnp.int32)
        frac = timestep.astype(t.dtype) / (self.N - 1)
        beta = (self.beta_0 + frac * (self.beta_1 - self.beta_0)) / self.N
        return 1.0 - beta


@struct.dataclass
class VESDE(SDE):
    """Variance-exploding SDE with geometric sigma(t) (sde_helper2.py:424-473)."""

    sigma_min: float = struct.field(pytree_node=False, default=0.01)
    sigma_max: float = struct.field(pytree_node=False, default=50.0)
    N: int = struct.field(pytree_node=False, default=1000)

    # The reference VESDE aliases beta_0/beta_1 to the sigma range
    # (sde_helper2.py sets self.beta_0 = sigma_min, self.beta_1 =
    # sigma_max) so VP-style importance-sampling code paths run unchanged
    # (losses.dsm_loss importance branch, ebm.nce.perturb_vp).
    @property
    def beta_0(self):
        return self.sigma_min

    @property
    def beta_1(self):
        return self.sigma_max

    def sigma(self, t):
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    def sde(self, x, t):
        sigma = self.sigma(t)
        drift = jnp.zeros_like(x)
        diffusion = sigma * jnp.sqrt(
            2 * (jnp.log(self.sigma_max) - jnp.log(self.sigma_min))
        ).astype(t.dtype)
        return drift, diffusion

    def marginal_prob(self, x, t):
        return x, self.sigma(t)

    def prior_sampling(self, key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * self.sigma_max

    def prior_logp(self, z):
        d = math.prod(z.shape[1:])
        return -d / 2.0 * jnp.log(2 * jnp.pi * self.sigma_max**2) - jnp.sum(
            flatten_batch(z) ** 2, -1
        ) / (2 * self.sigma_max**2)

    def discretize(self, x, t):
        """SMLD (NCSN) discretization (sde_helper2.py:465-473)."""
        timestep = jnp.floor(t * (self.N - 1) / self.T).astype(jnp.int32)
        log_smin, log_smax = jnp.log(self.sigma_min), jnp.log(self.sigma_max)

        def sigma_at(i):
            frac = i.astype(t.dtype) / (self.N - 1)
            return jnp.exp(log_smin + frac * (log_smax - log_smin))

        sigma = sigma_at(timestep)
        adjacent = jnp.where(timestep == 0, jnp.zeros_like(t), sigma_at(timestep - 1))
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma**2 - adjacent**2)
        return f, G


def get_sde(name: str, beta_0: float = 0.1, beta_1: float = 20.0, N: int = 1000) -> SDE:
    """Flag-style SDE factory matching ``--sde-type``
    (/root/reference/train_lat_celebhq_unet_cont2.py:495-503). For 'vesde',
    beta_0/beta_1 play the roles of sigma_min/sigma_max as in the reference.
    """
    name = name.lower()
    if name in ("vpsde", "vp"):
        return VPSDE(beta_0=beta_0, beta_1=beta_1, N=N)
    if name in ("subvpsde", "subvp", "sub-vp"):
        return SubVPSDE(beta_0=beta_0, beta_1=beta_1, N=N)
    if name in ("vesde", "ve"):
        return VESDE(sigma_min=beta_0, sigma_max=beta_1, N=N)
    raise ValueError(f"unknown sde type: {name}")
