"""Heterogeneous-modality pipeline: CelebAMask-HQ image / mask / attributes.

Unlike the PolyMNIST fleet (10 identical VAEs -> parallel.fleet), CelebA's
three modalities use three DIFFERENT autoencoders (conv image VAE, conv
mask VAE, MLP attribute VAE; /root/reference/train_lat_celebhq_unet_cont2.py:
426-465). This pipeline stacks their size-z latents into the (B, hw, hw, 3)
grid (channel order: 0=image, 1=mask, 2=attributes, matching ``mods='012'``
at train_lat_celebhq_unet_cont2.py:263) and drives the same channel-clamped
conditional sampler.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion.samplers import conditional_sampler, unconditional_sampler
from .pipeline import _with_pallas_fallback


@dataclass
class Modality:
    name: str
    model: Any
    variables: Any

    def encode(self, x):
        mu, _ = self.model.apply(self.variables, x, method=self.model.encoder)
        return mu

    def decode(self, z):
        return self.model.apply(self.variables, z, method=self.model.decoder)


def _drop_cond_only(sampler_kwargs, overrides):
    """noise_obs / noise_obs_mode only exist on the conditional sampler;
    strip them for unconditional programs."""
    kw = {**sampler_kwargs, **overrides}
    kw.pop("noise_obs", None)
    kw.pop("noise_obs_mode", None)
    return kw


@dataclass
class HeterogeneousPipeline:
    modalities: List[Modality]
    score_model: Any
    score_params: Any
    sde: Any
    latent_hw: int
    sampler_kwargs: Dict[str, Any] = field(default_factory=dict)
    mesh: Any = None  # optional jax.sharding.Mesh: DP-shard generation

    def __post_init__(self):
        self._jit_cache: Dict[Any, Any] = {}
        from .parallel.mesh import adapt_pallas_for_mesh

        # See SBMAEPipeline.__post_init__: Pallas custom-calls don't SPMD-
        # partition alone; shard_map them over the data axis (kernels stay
        # active; knob-less models demote to the XLA path).
        self.score_model = adapt_pallas_for_mesh(
            self.score_model, self.mesh, "mesh-sharded sampling")

    @property
    def n_mod(self):
        return len(self.modalities)

    def _jit(self, fn, batch_arg_idx=(), batch_size=None):
        """jit with optional data-parallel shardings over ``mesh``.

        The heterogeneous analogue of SBMAEPipeline._jit: here per-modality
        inputs/outputs are tuples of arrays whose FIRST axis is the batch,
        so ``batch_arg_idx`` args shard P('data') on axis 0; params/keys
        replicate. ``batch_size``: static output batch for programs with no
        batch arg (unconditional sampling). Without a mesh this is plain
        single-device jit; when the mesh's device count does not divide the
        batch, calls fall back to the unsharded program instead of crashing
        (matching parallel.mesh.put_batch's trainer-side behavior).
        """
        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = self.mesh.shape["data"]
        rep = NamedSharding(self.mesh, P())
        dat = NamedSharding(self.mesh, P("data"))
        jitted = jax.jit(fn, out_shardings=dat)
        plain = jax.jit(fn)

        def wrapper(*args):
            sizes = [jax.tree_util.tree_leaves(args[i])[0].shape[0]
                     for i in batch_arg_idx]
            if batch_size is not None:
                sizes.append(batch_size)
            if any(s % n_data for s in sizes):
                return plain(*args)
            args = tuple(
                jax.device_put(a, dat if i in batch_arg_idx else rep)
                for i, a in enumerate(args))
            return jitted(*args)

        return wrapper

    # Parameter plumbing rule: every jitted program below takes the score
    # params and the per-modality VAE variables as ARGUMENTS. Closing over
    # them would bake the trees into the HLO as constants - at the celebhq
    # flagship's size that is hundreds of MB of serialized program, which
    # multiplies TPU compile time and overwhelms a tunneled remote-compile
    # transport (round-3 finding; as arguments the same HLO is <1 MB).
    @property
    def _mod_vars(self):
        return tuple(m.variables for m in self.modalities)

    def _encode_grid(self, variables, inputs: Sequence):
        chans = []
        for mod, v, x in zip(self.modalities, variables, inputs):
            mu, _ = mod.model.apply(v, x, method=mod.model.encoder)
            chans.append(mu.reshape(mu.shape[0], self.latent_hw, self.latent_hw))
        return jnp.stack(chans, axis=-1)

    def _decode_grid(self, variables, grid):
        B = grid.shape[0]
        return [
            mod.model.apply(v, grid[..., i].reshape(B, -1),
                            method=mod.model.decoder)
            for i, (mod, v) in enumerate(zip(self.modalities, variables))
        ]

    def encode_grid(self, inputs: Sequence):
        """Per-modality inputs -> (B, hw, hw, n_mod) latent grid."""
        return self._encode_grid(self._mod_vars, inputs)

    def decode_grid(self, grid):
        return self._decode_grid(self._mod_vars, grid)

    @_with_pallas_fallback
    def sample_conditional(self, key, inputs, observed_mask, **overrides):
        """Channel-clamped conditional generation over heterogeneous
        modalities (calc_perf, train_lat_celebhq_unet_cont2.py:240-320).

        Returns the per-modality decoded outputs (observed modalities are
        decoded reconstructions of their clean latents, like the reference's
        ``outs[mod] = decoder(z[mod])``).
        """
        kw = {**self.sampler_kwargs, **overrides}
        mask = tuple(bool(b) for b in observed_mask)
        cache_key = ("cond", mask, tuple(sorted(kw.items())))
        if cache_key not in self._jit_cache:
            mask_arr = jnp.array(mask)

            def run(key, inputs, score_params, mod_vars):
                grid = self._encode_grid(mod_vars, inputs)

                def score_fn(x, t):
                    return self.score_model.apply(
                        {"params": score_params}, x, t)

                z = conditional_sampler(
                    key, score_fn, self.sde, grid, mask_arr, **kw)
                return tuple(self._decode_grid(mod_vars, z))

            self._jit_cache[cache_key] = self._jit(run, batch_arg_idx=(1,))
        return list(self._jit_cache[cache_key](
            key, tuple(inputs), self.score_params, self._mod_vars))

    def refine_images(self, key, images, refiner_model, refiner_params,
                      schedule):
        """DiffuseVAE sharpening of generated/reconstructed images
        (/root/reference/eval_lat_celeba_hq_all.py:72-122,
        plt_celebhq_all.py:222-343): run the DDPM refiner conditioned on the
        [-1,1]-rescaled VAE output, return refined images in [0, 1]."""
        from .diffusion.ddpm import ddpm_refiner_sample

        images = jnp.asarray(images)
        cache_key = ("refine", id(refiner_model), id(schedule), images.shape)
        if cache_key not in self._jit_cache:

            def run(key, images, refiner_params):
                cond = 2.0 * images - 1.0

                def denoise_fn(x_and_cond, t):
                    return refiner_model.apply({"params": refiner_params},
                                               x_and_cond, t)

                out = ddpm_refiner_sample(key, denoise_fn, schedule, cond,
                                          cond.shape)
                return jnp.clip((out + 1.0) / 2.0, 0.0, 1.0)

            self._jit_cache[cache_key] = self._jit(run, batch_arg_idx=(1,))
        return self._jit_cache[cache_key](key, images, refiner_params)

    @_with_pallas_fallback
    def sample_unconditional(self, key, amount: int, **overrides):
        kw = _drop_cond_only(self.sampler_kwargs, overrides)
        cache_key = ("uncond", amount, tuple(sorted(kw.items())))
        if cache_key not in self._jit_cache:

            def run(key, score_params, mod_vars):
                def score_fn(x, t):
                    return self.score_model.apply(
                        {"params": score_params}, x, t)

                shape = (amount, self.latent_hw, self.latent_hw, self.n_mod)
                z = unconditional_sampler(key, score_fn, self.sde, shape, **kw)
                return tuple(self._decode_grid(mod_vars, z))

            self._jit_cache[cache_key] = self._jit(run, batch_size=amount)
        return list(self._jit_cache[cache_key](
            key, self.score_params, self._mod_vars))


# Tuned per-given-set-size (er, c) grids from the reference's annealed
# CelebA eval (eval_lat_celeba_hq_all.py:498-513), keyed by number of
# observed modalities; values are per-modality (image, mask, attr).
_ANNEALED_GRIDS = {
    "vae": {
        0: ((0.01, 0.01, 0.01), (0.8, 0.8, 0.8)),
        1: ((0.016, 0.015, 0.015), (0.8, 0.5, 0.5)),
        2: ((0.018, 0.015, 0.015), (0.8, 0.5, 0.0)),
    },
    "ae": {
        0: ((0.01, 0.01, 0.01), (0.8, 0.8, 0.8)),
        1: ((0.016, 0.015, 0.015), (0.8, 0.5, 0.5)),
        2: ((0.02, 0.015, 0.015), (0.8, 0.5, 0.5)),
    },
}


@dataclass
class AnnealedHeterogeneousPipeline(HeterogeneousPipeline):
    """CelebA AE/VAE-track generation via sigma-annealed Langevin
    (/root/reference/eval_lat_celeba_hq_all.py:211-343): sigma grid
    linspace(5, 0.1, 500), n_comp=2 inner steps (:459-460), per-modality
    tuned (er, c) by given-set size (:498-513). ``sde`` is unused.

    ``track`` selects the reference's VAE- vs AE-track hyperparameter grid;
    the stage-1 checkpoints passed in ``modalities`` decide the actual
    encoders (mean-encoders in both cases).
    """

    sigma_max: float = 5.0
    sigma_min: float = 0.1
    n_levels: int = 500
    iter_num: int = 2
    track: str = "vae"

    def _grid(self, n_observed):
        er, c = _ANNEALED_GRIDS[self.track][min(n_observed, 2)]
        return jnp.asarray(er), jnp.asarray(c)

    @_with_pallas_fallback
    def sample_conditional(self, key, inputs, observed_mask, **overrides):
        from .diffusion.annealed import annealed_langevin_sampler

        mask = tuple(bool(b) for b in observed_mask)
        er, c = self._grid(sum(mask))
        # dict.update, NOT dict(key=..., **overrides): four of the six
        # whitelisted keys are also explicit kwargs and would raise
        # "got multiple values" as a literal-splat collision.
        kw = dict(er=er, c=c, sigma_max=self.sigma_max,
                  sigma_min=self.sigma_min, n_levels=self.n_levels,
                  iter_num=self.iter_num)
        kw.update({k: v for k, v in overrides.items()
                   if k in ("er", "c", "iter_num", "sigma_max",
                            "sigma_min", "n_levels")})
        cache_key = ("ann_cond", mask, self.track, tuple(
            (k, tuple(np.ravel(v).tolist()) if hasattr(v, "shape")
             else v) for k, v in sorted(kw.items())))
        if cache_key not in self._jit_cache:
            predicted = jnp.array([not m for m in mask])

            def run(key, inputs, score_params, mod_vars):
                def score_fn(x, idx, sig):
                    return self.score_model.apply(
                        {"params": score_params}, x, idx.astype(x.dtype))

                prior_key, lkey = jax.random.split(key)
                grid = self._encode_grid(mod_vars, inputs)
                noise = jax.random.normal(prior_key, grid.shape)
                grid = jnp.where(predicted, noise, grid)
                z = annealed_langevin_sampler(lkey, score_fn, grid,
                                              predicted, **kw)
                return tuple(self._decode_grid(mod_vars, z))

            self._jit_cache[cache_key] = self._jit(run, batch_arg_idx=(1,))
        return list(self._jit_cache[cache_key](
            key, tuple(inputs), self.score_params, self._mod_vars))

    @_with_pallas_fallback
    def sample_unconditional(self, key, amount: int, **overrides):
        from .diffusion.annealed import annealed_langevin_sampler

        er, c = self._grid(0)
        kw = dict(er=er, c=c, sigma_max=self.sigma_max,
                  sigma_min=self.sigma_min, n_levels=self.n_levels,
                  iter_num=self.iter_num)
        # Same override whitelist as sample_conditional (previously
        # **overrides was accepted but silently ignored here).
        kw.update({k: v for k, v in overrides.items()
                   if k in ("er", "c", "iter_num", "sigma_max",
                            "sigma_min", "n_levels")})
        cache_key = ("ann_uncond", amount, self.track, tuple(
            (k, tuple(np.ravel(v).tolist()) if hasattr(v, "shape")
             else v) for k, v in sorted(kw.items())))
        if cache_key not in self._jit_cache:

            def run(key, score_params, mod_vars):
                def score_fn(x, idx, sig):
                    return self.score_model.apply(
                        {"params": score_params}, x, idx.astype(x.dtype))

                prior_key, lkey = jax.random.split(key)
                shape = (amount, self.latent_hw, self.latent_hw, self.n_mod)
                x0 = jax.random.normal(prior_key, shape)
                z = annealed_langevin_sampler(
                    lkey, score_fn, x0, jnp.ones((self.n_mod,), bool), **kw)
                return tuple(self._decode_grid(mod_vars, z))

            self._jit_cache[cache_key] = self._jit(run, batch_size=amount)
        return list(self._jit_cache[cache_key](
            key, self.score_params, self._mod_vars))


@dataclass
class ConditionalHeterogeneousPipeline(HeterogeneousPipeline):
    """z-conditioned variant: the score UNet additionally receives the
    averaged contrastive representation of the OBSERVED modalities
    (get_conds, /root/reference/train_lat_celebhq_unet_cont2_cond.py:452-460;
    gen_z :273-320). With nothing observed the condition is the zero vector.
    """

    rep_models: Sequence = ()
    rep_variables: Sequence = ()

    def _z_cond(self, rep_vars, inputs, observed_mask):
        from .nn.contrastive import average_condition

        reps = jnp.stack([
            m.apply(v, x)
            for m, v, x in zip(self.rep_models, rep_vars, inputs)])
        return average_condition(reps, jnp.asarray(observed_mask))

    @_with_pallas_fallback
    def sample_conditional(self, key, inputs, observed_mask, **overrides):
        kw = {**self.sampler_kwargs, **overrides}
        mask = tuple(bool(b) for b in observed_mask)
        cache_key = ("zcond", mask, tuple(sorted(kw.items())))
        if cache_key not in self._jit_cache:
            mask_arr = jnp.array(mask)

            def run(key, inputs, score_params, mod_vars, rep_vars):
                grid = self._encode_grid(mod_vars, inputs)
                z_cond = self._z_cond(rep_vars, inputs, mask_arr)

                def score_fn(x, t):
                    return self.score_model.apply(
                        {"params": score_params}, x, t, z_cond)

                z = conditional_sampler(
                    key, score_fn, self.sde, grid, mask_arr, **kw)
                return tuple(self._decode_grid(mod_vars, z))

            self._jit_cache[cache_key] = self._jit(run, batch_arg_idx=(1,))
        return list(self._jit_cache[cache_key](
            key, tuple(inputs), self.score_params, self._mod_vars,
            tuple(self.rep_variables)))

    @_with_pallas_fallback
    def sample_unconditional(self, key, amount: int, **overrides):
        kw = _drop_cond_only(self.sampler_kwargs, overrides)
        cache_key = ("zuncond", amount, tuple(sorted(kw.items())))
        if cache_key not in self._jit_cache:

            def run(key, score_params, mod_vars):
                z_dim = self.score_model.z_dim or 512
                z_cond = jnp.zeros((amount, z_dim))

                def score_fn(x, t):
                    return self.score_model.apply(
                        {"params": score_params}, x, t, z_cond)

                shape = (amount, self.latent_hw, self.latent_hw, self.n_mod)
                z = unconditional_sampler(key, score_fn, self.sde, shape, **kw)
                return tuple(self._decode_grid(mod_vars, z))

            self._jit_cache[cache_key] = self._jit(run, batch_size=amount)
        return list(self._jit_cache[cache_key](
            key, self.score_params, self._mod_vars))
