"""Protocol adapter: evaluate the multimodal-VAE baselines with the same
FID/coherence protocols as the score model.

The reference's benchmark scripts load SBMAE and all baselines side by side
and push them through identical protocols (/root/reference/fid_upd10.py:
375-463, /root/reference/poly_calc_perf_an.py). ``BaselineSampler`` gives
MixtureMultimodalVAE / HeterogeneousMixtureVAE / MMVAE+ the same
``sample_conditional`` / ``sample_unconditional`` surface as SBMAEPipeline,
so eval.protocols and eval.celeba_protocol run unchanged over any of them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp


@dataclass
class BaselineSampler:
    """Wraps a mixture-family baseline (or MMVAE+) for the eval protocols.

    Args:
      model / variables: the trained baseline.
      mix_type: 'mopoe' | 'mmvae' | 'mvae' | 'mvt' | 'mmplus'.
      n_mod: modality count.
    """

    model: Any
    variables: Any
    mix_type: str
    n_mod: int

    def __post_init__(self):
        self._jit_cache: Dict[Any, Any] = {}

    class _Fleet:  # duck-type pipeline.fleet.n_mod for the protocols
        def __init__(self, n):
            self.n_mod = n

    @property
    def fleet(self):
        return self._Fleet(self.n_mod)

    def sample_unconditional(self, key, amount: int, **_):
        cache_key = ("uncond", amount)
        if cache_key not in self._jit_cache:

            # Variables are a jit ARGUMENT (not closed over): closure trees
            # are baked into the HLO as constants, bloating compiles
            # (see pipeline_celeba parameter-plumbing note).
            @jax.jit
            def run(key, variables):
                if self.mix_type == "mmplus":
                    outs = self.model.apply(variables, key, amount,
                                            method=self.model.generate)
                else:
                    outs = self.model.apply(variables, key, amount,
                                            method=self.model.sample)
                return jnp.clip(jnp.stack(list(outs)) if isinstance(
                    outs, (tuple, list)) else outs, 0.0, 1.0)

            self._jit_cache[cache_key] = run
        return self._jit_cache[cache_key](key, self.variables)

    def sample_conditional(self, key, pixels, predicted_mods: Sequence[int],
                           score_transform=None, **_):
        del score_transform  # baselines have no guidance hook
        pred = tuple(sorted(int(i) for i in predicted_mods))
        cache_key = ("cond", pred)
        present = jnp.array([i not in pred for i in range(self.n_mod)])
        if cache_key not in self._jit_cache:

            @jax.jit
            def run(key, pixels, variables):
                if self.mix_type == "mmplus":
                    present_idx = jnp.array(
                        [i for i in range(self.n_mod) if i not in pred])
                    outs = self.model.apply(
                        variables, pixels, present_idx, key,
                        method=self.model.cond_gen)
                else:
                    outs = self.model.apply(
                        variables, pixels, present, key, self.mix_type,
                        method=self.model.cond_gen)
                outs = jnp.stack(list(outs)) if isinstance(
                    outs, (tuple, list)) else outs
                outs = jnp.clip(outs, 0.0, 1.0)
                keep = present.reshape(-1, 1, 1, 1, 1)
                return jnp.where(keep, pixels, outs)

            self._jit_cache[cache_key] = run
        return self._jit_cache[cache_key](key, pixels, self.variables)


def _clip_pixels(outs):
    """Clip image-shaped (4-D) outputs to [0, 1]; leave attribute LOGITS
    (2-D) untouched - the protocols apply sigmoid downstream
    (calc_perf attr handling, train_lat_celebhq_unet_cont2.py:325-333)."""
    return tuple(jnp.clip(o, 0.0, 1.0) if o.ndim == 4 else o for o in outs)


@dataclass
class HetBaselineSampler:
    """CelebA-style heterogeneous baseline adapter.

    Gives HeterogeneousMixtureVAE (mopoe/mvt/...) and HeterogeneousMMVAEPlus
    the same ``sample_conditional(key, inputs, observed)`` /
    ``sample_unconditional(key, N)`` surface as pipeline_celeba.
    HeterogeneousPipeline, so eval.celeba_protocol sweeps score model and
    baselines through identical code (the reference's side-by-side loop,
    /root/reference/eval_lat_celeba_hq_all.py:498-528).
    """

    model: Any
    variables: Any
    mix_type: str  # 'mopoe' | 'mvt' | 'mvae' | 'mmvae' | 'mmplus'
    n_mod: int = 3

    def __post_init__(self):
        self._jit_cache: Dict[Any, Any] = {}

    def sample_unconditional(self, key, amount: int, **_):
        cache_key = ("uncond", amount)
        if cache_key not in self._jit_cache:

            @jax.jit
            def run(key, variables):
                if self.mix_type == "mmplus":
                    outs = self.model.apply(variables, key, amount,
                                            method=self.model.generate)
                else:
                    outs = self.model.apply(variables, key, amount,
                                            method=self.model.sample)
                return _clip_pixels(outs)

            self._jit_cache[cache_key] = run
        return list(self._jit_cache[cache_key](key, self.variables))

    def sample_conditional(self, key, inputs, observed_mask, **_):
        mask = tuple(bool(b) for b in observed_mask)
        cache_key = ("cond", mask)
        if cache_key not in self._jit_cache:
            present = jnp.array(mask)

            @jax.jit
            def run(key, inputs, variables):
                if self.mix_type == "mmplus":
                    present_idx = jnp.array(
                        [i for i, m in enumerate(mask) if m])
                    outs = self.model.apply(
                        variables, inputs, present_idx, key,
                        method=self.model.cond_gen)
                else:
                    outs = self.model.apply(
                        variables, inputs, present, key, self.mix_type,
                        method=self.model.cond_gen)
                return _clip_pixels(outs)

            self._jit_cache[cache_key] = run
        return list(self._jit_cache[cache_key](
            key, tuple(inputs), self.variables))
