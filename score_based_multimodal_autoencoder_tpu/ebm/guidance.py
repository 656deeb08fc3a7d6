"""EBM guidance as composable score transforms for the reverse-SDE samplers.

The reference wires ``torch.enable_grad`` islands into its predictor,
corrector and reverse-SDE (/root/reference/sde_helper2.py:283-313,
/root/reference/train_poly_unet_cont.py:73-89): for modality pairs with one
observed and one predicted channel, it subtracts ``cl_s * dE/dx`` of the
pairwise coherence EBM from the score on those channels. In JAX this is a
plain ``jax.grad`` inside the scan body - fused into the same XLA program
as the score network.

Two modes, matching the two reference variants:
- ``mode='all_pairs'``: every registered (i, j) pair with exactly one
  observed endpoint contributes; both channels get the correction
  (sde_helper2.py:287-312 behavior).
- ``mode='predicted_only'``: only the predicted channel is corrected
  (train_poly_unet_cont.py:88-89 behavior; that script samples a random
  pair per step - here all eligible pairs contribute, which is the
  deterministic-limit of the same correction).
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def make_pairwise_guidance(
    energy_fns: Dict[Tuple[int, int], Callable],
    observed_mask: Sequence[bool],
    cl_scale: float,
    mode: str = "all_pairs",
):
    """Build a ``score_transform(score, x, t, key)`` for the samplers.

    Args:
      energy_fns: {(i, j): fn(z_pair_flat, t, i, j) -> (B, 1)} with params
        closed over; channel indices refer to the latent grid's last axis.
      observed_mask: per-channel observed flags (the ``given`` set).
      cl_scale: the ``cl_s`` guidance strength.
    """
    observed = list(bool(b) for b in observed_mask)

    # Pairs with exactly one observed endpoint, resolved at trace time.
    active = [
        (i, j) for (i, j) in sorted(energy_fns) if observed[i] != observed[j]
    ]

    def transform(score, x, t, key):
        del key
        B, C = x.shape[0], x.shape[-1]

        def _add_channel(score, ch, update):
            # One-hot masked add instead of score.at[..., ch].add(...):
            # pure elementwise, so XLA fuses it into the scan body. The
            # scatter form compiled fine standalone but made the TPU
            # compiler SIGILL inside the guided whole-trajectory sampling
            # scan (observed on a v5e, round 5); values are identical
            # (ch is a trace-time constant).
            onehot = (jnp.arange(C) == ch).astype(score.dtype)
            return score + update[..., None] * onehot

        for (i, j) in active:
            fn = energy_fns[(i, j)]

            def mean_energy(pair, fn=fn, i=i, j=j):
                # Block order [z_i | z_j], matching NCE training's
                # cat([z1, z2], dim=1) layout (ebm/nce.py).
                flat = jnp.concatenate(
                    [pair[..., 0].reshape(B, -1), pair[..., 1].reshape(B, -1)],
                    axis=-1,
                )
                return fn(flat, t, i, j).mean()

            pair = jnp.stack([x[..., i], x[..., j]], axis=-1)
            g = jax.grad(mean_energy)(pair)
            if mode == "all_pairs":
                score = _add_channel(score, i, -cl_scale * g[..., 0])
                score = _add_channel(score, j, -cl_scale * g[..., 1])
            elif mode == "predicted_only":
                if not observed[i]:
                    score = _add_channel(score, i, -cl_scale * g[..., 0])
                if not observed[j]:
                    score = _add_channel(score, j, -cl_scale * g[..., 1])
            else:
                raise ValueError(mode)
        return score

    return transform
