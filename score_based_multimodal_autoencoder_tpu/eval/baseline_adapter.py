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

            @jax.jit
            def run(key):
                if self.mix_type == "mmplus":
                    outs = self.model.apply(self.variables, key, amount,
                                            method=self.model.generate)
                else:
                    outs = self.model.apply(self.variables, key, amount,
                                            method=self.model.sample)
                return jnp.clip(jnp.stack(list(outs)) if isinstance(
                    outs, (tuple, list)) else outs, 0.0, 1.0)

            self._jit_cache[cache_key] = run
        return self._jit_cache[cache_key](key)

    def sample_conditional(self, key, pixels, predicted_mods: Sequence[int],
                           score_transform=None, **_):
        del score_transform  # baselines have no guidance hook
        pred = tuple(sorted(int(i) for i in predicted_mods))
        cache_key = ("cond", pred)
        present = jnp.array([i not in pred for i in range(self.n_mod)])
        if cache_key not in self._jit_cache:

            @jax.jit
            def run(key, pixels):
                if self.mix_type == "mmplus":
                    present_idx = jnp.array(
                        [i for i in range(self.n_mod) if i not in pred])
                    outs = self.model.apply(
                        self.variables, pixels, present_idx, key,
                        method=self.model.cond_gen)
                else:
                    outs = self.model.apply(
                        self.variables, pixels, present, key, self.mix_type,
                        method=self.model.cond_gen)
                outs = jnp.stack(list(outs)) if isinstance(
                    outs, (tuple, list)) else outs
                outs = jnp.clip(outs, 0.0, 1.0)
                keep = present.reshape(-1, 1, 1, 1, 1)
                return jnp.where(keep, pixels, outs)

            self._jit_cache[cache_key] = run
        return self._jit_cache[cache_key](key, pixels)
