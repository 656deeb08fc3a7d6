"""End-to-end SBMAE pipeline: frozen VAE fleet + latent score model.

Ties stage 1 (per-modality autoencoders, parallel.fleet) to stage 2 (joint
latent score network, nn.unet + diffusion) behind the generation surface of
the reference scripts:

- ``sample_unconditional``: prior -> reverse SDE -> per-modality decode
  (/root/reference/train_poly_unet_cont.py:300-312).
- ``sample_conditional``: encode observed modalities, channel-clamped
  reverse SDE for the rest, decode predicted channels
  (/root/reference/train_poly_unet_cont.py:404-498).

Every sampler call is one jitted XLA program per (predicted-set, sampler
config); programs are cached by static config.
"""

from __future__ import annotations

import functools
import warnings
from dataclasses import dataclass, field
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from .diffusion.samplers import conditional_sampler, unconditional_sampler
from .parallel.fleet import VAEFleet


# Substrings marking an exception as Pallas/Mosaic-shaped: the kernel
# compile failure surfaces client-side as a JaxRuntimeError whose message
# names the Mosaic compile helper (CLAUDE.md), and interpret-mode/lowering
# failures name pallas/mosaic modules in the message or traceback.
_PALLAS_ERROR_TOKENS = ("pallas", "mosaic", "tpu_compile_helper")


def _looks_pallas_shaped(exc) -> bool:
    text = f"{type(exc).__module__}.{type(exc).__name__} {exc}".lower()
    return any(tok in text for tok in _PALLAS_ERROR_TOKENS)


def _maybe_disable_pallas(pipe, exc) -> bool:
    """Product-level escape hatch for a Pallas kernel regression.

    A pallas_call that fails to compile or run on the current runtime
    (plugin/Mosaic update, e.g. the BENCH_r03 ``tpu_compile_helper
    subprocess exit signal SIGABRT``) must degrade generation to the XLA
    attention path - identical math - instead of killing the CLI with an
    opaque remote-compile error. Returns True if the pipeline's score
    model was rebuilt (pallas off, jit caches cleared) and the call
    should be retried; False to re-raise. One-shot by construction: the
    rebuilt model has ``pallas_linear_attn=False``, so a second failure
    propagates.

    Only Pallas/Mosaic-shaped failures trigger the demotion: a genuine
    non-Pallas error (bad input shape, OOM in the decoder) on a
    Pallas-enabled pipeline must propagate as itself, not silently
    demote every subsequent valid call to the ~12%-slower XLA path
    behind a misleading warning (ADVICE r4).
    """
    if not getattr(pipe.score_model, "pallas_linear_attn", False):
        return False
    if not _looks_pallas_shaped(exc):
        return False
    warnings.warn(
        "Pallas sampling path failed on this runtime "
        f"({type(exc).__name__}: {str(exc)[:200]}); retrying with the "
        "XLA attention path (identical math, ~12% slower on the "
        "PolyMNIST flagship - see BASELINE.md)")
    pipe.score_model = pipe.score_model.clone(pallas_linear_attn=False)
    pipe._jit_cache.clear()
    return True


def _with_pallas_fallback(fn):
    """Wrap a pipeline sampling method: on failure with a Pallas-enabled
    score model, rebuild with the XLA path and retry ONCE (VERDICT r3
    next #4; bench.py models the same chain)."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        try:
            return fn(self, *args, **kwargs)
        except Exception as e:  # noqa: BLE001 - deliberate catch-all
            if not _maybe_disable_pallas(self, e):
                raise
            return fn(self, *args, **kwargs)

    return wrapper


@dataclass
class SBMAEPipeline:
    fleet: VAEFleet
    fleet_state: Any
    score_model: Any
    score_params: Any
    sde: Any
    latent_hw: int
    sampler_kwargs: Dict[str, Any] = field(default_factory=dict)
    mesh: Any = None  # optional jax.sharding.Mesh: DP-shard generation
    # Close over the (frozen) fleet/score params instead of passing them as
    # jit arguments: XLA folds the weight layouts at compile time, a
    # measured ~10% sampling-throughput win for the PolyMNIST flagship
    # (0.494 vs 0.544 s/batch at b1024, TPU v5e). The trade: the params are
    # embedded in the HLO as constants, so the serialized program grows by
    # the param bytes and compiles are slower - keep False for very large
    # models (the celebhq-size tree overwhelms remote-compile transports)
    # or when params change between calls (baked programs never see
    # updates).
    bake_params: bool = False

    def __post_init__(self):
        self._jit_cache: Dict[Tuple, Any] = {}
        from .parallel.mesh import adapt_pallas_for_mesh

        # A >1-device mesh cannot SPMD-partition the Pallas custom-calls
        # alone (it would all-gather the batch around every attention
        # site); shard_map them over the data axis so the kernels stay
        # active (parallel/mesh.py; knob-less models demote to XLA).
        self.score_model = adapt_pallas_for_mesh(
            self.score_model, self.mesh, "mesh-sharded sampling")

    def _jit(self, fn, batch_arg_idx=(), batch_size=None):
        """jit with optional data-parallel shardings over the mesh.

        ``batch_arg_idx``: indices of args whose SECOND axis is the batch
        (the (n_mod, B, ...) pixel stacks) - sharded over 'data'; everything
        else replicated. Outputs shard their modality-major batch axis.
        ``batch_size``: static output batch for programs with no batch arg
        (unconditional sampling) - used for the divisibility check below.
        Without a mesh this is plain single-device jit; when the device
        count does not divide the batch, calls fall back to the unsharded
        program instead of crashing (matching parallel.mesh.put_batch's
        trainer-side behavior).
        """
        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = self.mesh.shape["data"]
        rep = NamedSharding(self.mesh, P())
        dat = NamedSharding(self.mesh, P(None, "data"))
        jitted = jax.jit(fn, out_shardings=dat)
        plain = jax.jit(fn)

        def wrapper(*args):
            sizes = [jax.tree_util.tree_leaves(args[i])[0].shape[1]
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

    # -- scoring -----------------------------------------------------------
    def score_fn(self, x, t):
        return self.score_model.apply({"params": self.score_params}, x, t)

    # -- generation --------------------------------------------------------
    @_with_pallas_fallback
    def sample_unconditional(self, key, amount: int, **overrides):
        """Returns (n_mod, amount, H, W, C) decoded images in [0, 1]."""
        kw = {**self.sampler_kwargs, **overrides}
        # noise_obs / noise_obs_mode only exist on the conditional sampler.
        kw.pop("noise_obs", None)
        kw.pop("noise_obs_mode", None)
        cache_key = ("uncond", amount, tuple(sorted(kw.items())))
        if cache_key not in self._jit_cache:

            def run(key, fleet_state, score_params):
                def score_fn(x, t):
                    return self.score_model.apply({"params": score_params}, x, t)

                shape = (amount, self.latent_hw, self.latent_hw, self.fleet.n_mod)
                z = unconditional_sampler(key, score_fn, self.sde, shape, **kw)
                return jnp.clip(self.fleet.decode(fleet_state, z), 0.0, 1.0)

            if self.bake_params:
                fs, sp = self.fleet_state, self.score_params
                baked = self._jit(lambda key: run(key, fs, sp),
                                  batch_size=amount)
                self._jit_cache[cache_key] = lambda key, _fs, _sp: baked(key)
            else:
                self._jit_cache[cache_key] = self._jit(run, batch_size=amount)
        return self._jit_cache[cache_key](key, self.fleet_state, self.score_params)

    @_with_pallas_fallback
    def sample_conditional(
        self, key, pixels, predicted_mods: Sequence[int],
        score_transform=None, **overrides,
    ):
        """Any-subset conditional generation.

        Args:
          pixels: (n_mod, B, H, W, C) batch; only observed modalities are
            read (predicted entries may be zeros).
          predicted_mods: channel indices to generate.

        Returns (n_mod, B, H, W, C) where predicted modalities are generated
        and observed ones are the originals.
        """
        kw = {**self.sampler_kwargs, **overrides}
        pred = tuple(sorted(int(i) for i in predicted_mods))
        # Keyed by transform identity: different guidance closures (e.g. a
        # cl_s sweep) must not share a compiled program.
        cache_key = ("cond", pred, tuple(sorted(kw.items())),
                     id(score_transform) if score_transform else None)
        observed_mask = jnp.array(
            [i not in pred for i in range(self.fleet.n_mod)])
        if cache_key not in self._jit_cache:

            def run(key, fleet_state, score_params, pixels):
                def score_fn(x, t):
                    return self.score_model.apply({"params": score_params}, x, t)

                grid = self.fleet.encode(fleet_state, pixels, self.latent_hw)
                z = conditional_sampler(
                    key, score_fn, self.sde, grid, observed_mask,
                    score_transform=score_transform, **kw)
                out = jnp.clip(self.fleet.decode(fleet_state, z), 0.0, 1.0)
                keep = observed_mask.reshape(-1, 1, 1, 1, 1)
                return jnp.where(keep, pixels, out)

            if self.bake_params:
                fs, sp = self.fleet_state, self.score_params
                baked = self._jit(lambda key, pixels: run(key, fs, sp, pixels),
                                  batch_arg_idx=(1,))
                self._jit_cache[cache_key] = (
                    lambda key, _fs, _sp, pixels: baked(key, pixels))
            else:
                self._jit_cache[cache_key] = self._jit(run, batch_arg_idx=(3,))
        return self._jit_cache[cache_key](
            key, self.fleet_state, self.score_params, pixels)


@dataclass
class AnnealedSBMAEPipeline(SBMAEPipeline):
    """AE-track pipeline: sigma-annealed Langevin instead of the reverse SDE.

    Drives the regularized-AE stage-1 fleet (or VAE mean-encoders) with a
    sigma-INDEX-conditioned score net through ``annealed_langevin_sampler``,
    exactly the reference's gen_ae path (/root/reference/fid_upd10.py:56-110)
    with its tuned hyperparameter rule: 10 predicted modalities ->
    (er, c, iter) = (0.01, 0.7, 2), otherwise (2e-3, 0.5, 20)
    (fid_upd10.py:64-71). ``sde`` is unused (pass None).

    The same eval protocols run unchanged: ``sample_conditional`` /
    ``sample_unconditional`` keep the SBMAEPipeline signatures.
    """

    sigma_max: float = 5.0
    sigma_min: float = 0.1
    n_levels: int = 200

    def _annealed_kwargs(self, n_predicted, overrides):
        if n_predicted >= self.fleet.n_mod:
            kw = {"er": 0.01, "c": 0.7, "iter_num": 2}
        else:
            kw = {"er": 2e-3, "c": 0.5, "iter_num": 20}
        kw.update(sigma_max=self.sigma_max, sigma_min=self.sigma_min,
                  n_levels=self.n_levels)
        kw.update({k: v for k, v in {**self.sampler_kwargs,
                                     **overrides}.items()
                   if k in ("er", "c", "iter_num", "sigma_max", "sigma_min",
                            "n_levels")})
        return kw

    @_with_pallas_fallback
    def sample_unconditional(self, key, amount: int, **overrides):
        from .diffusion.annealed import annealed_langevin_sampler

        kw = self._annealed_kwargs(self.fleet.n_mod, overrides)
        cache_key = ("ann_uncond", amount, tuple(sorted(kw.items())))
        if cache_key not in self._jit_cache:

            def run(key, fleet_state, score_params):
                def score_fn(x, idx, sig):
                    return self.score_model.apply(
                        {"params": score_params}, x, idx.astype(x.dtype))

                prior_key, lkey = jax.random.split(key)
                shape = (amount, self.latent_hw, self.latent_hw,
                         self.fleet.n_mod)
                x0 = jax.random.normal(prior_key, shape)
                z = annealed_langevin_sampler(
                    lkey, score_fn, x0,
                    jnp.ones((self.fleet.n_mod,), bool), **kw)
                return jnp.clip(self.fleet.decode(fleet_state, z), 0.0, 1.0)

            if self.bake_params:
                fs, sp = self.fleet_state, self.score_params
                baked = self._jit(lambda key: run(key, fs, sp),
                                  batch_size=amount)
                self._jit_cache[cache_key] = lambda key, _fs, _sp: baked(key)
            else:
                self._jit_cache[cache_key] = self._jit(run, batch_size=amount)
        return self._jit_cache[cache_key](key, self.fleet_state,
                                          self.score_params)

    @_with_pallas_fallback
    def sample_conditional(self, key, pixels, predicted_mods, **overrides):
        from .diffusion.annealed import annealed_langevin_sampler

        overrides.pop("score_transform", None)  # SDE-guidance only
        pred = tuple(sorted(int(i) for i in predicted_mods))
        kw = self._annealed_kwargs(len(pred), overrides)
        cache_key = ("ann_cond", pred, tuple(sorted(kw.items())))
        predicted_mask = jnp.array(
            [i in pred for i in range(self.fleet.n_mod)])
        if cache_key not in self._jit_cache:

            def run(key, fleet_state, score_params, pixels):
                def score_fn(x, idx, sig):
                    return self.score_model.apply(
                        {"params": score_params}, x, idx.astype(x.dtype))

                prior_key, lkey = jax.random.split(key)
                grid = self.fleet.encode(fleet_state, pixels, self.latent_hw)
                # Predicted channels start from the N(0,1) prior
                # (gen_ae, fid_upd10.py:77-81).
                noise = jax.random.normal(prior_key, grid.shape)
                grid = jnp.where(predicted_mask, noise, grid)
                z = annealed_langevin_sampler(
                    lkey, score_fn, grid, predicted_mask, **kw)
                out = jnp.clip(self.fleet.decode(fleet_state, z), 0.0, 1.0)
                keep = (~predicted_mask).reshape(-1, 1, 1, 1, 1)
                return jnp.where(keep, pixels, out)

            if self.bake_params:
                fs, sp = self.fleet_state, self.score_params
                baked = self._jit(lambda key, pixels: run(key, fs, sp, pixels),
                                  batch_arg_idx=(1,))
                self._jit_cache[cache_key] = (
                    lambda key, _fs, _sp, pixels: baked(key, pixels))
            else:
                self._jit_cache[cache_key] = self._jit(run, batch_arg_idx=(3,))
        return self._jit_cache[cache_key](
            key, self.fleet_state, self.score_params, pixels)
