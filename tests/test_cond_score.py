"""z-conditioned score training + MLP score zoo tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from score_based_multimodal_autoencoder_tpu.diffusion import VPSDE
from score_based_multimodal_autoencoder_tpu.nn.mlp_scores import (
    FlatEnergyMLP,
    FlatScoreMLP,
    PairwiseEnergySum,
    TimeScoreMLP,
)
from score_based_multimodal_autoencoder_tpu.nn.unet_adm import ADMUNet
from score_based_multimodal_autoencoder_tpu.train.conditional_score import (
    make_cond_score_fn,
    make_cond_score_train_step,
    subset_masks,
)


def test_subset_masks():
    m = subset_masks(3)
    assert m.shape == (7, 3)
    assert int(m.sum()) == 1 * 3 + 2 * 3 + 3


def test_mlp_score_zoo_shapes():
    x = jnp.zeros((4, 320))  # n_mod=5, size_z=64 concat
    s = FlatScoreMLP()
    p = s.init(jax.random.key(0), x)
    assert s.apply(p, x).shape == (4, 320)

    ts = TimeScoreMLP()
    pt = ts.init(jax.random.key(1), x, jnp.full((4,), 0.3))
    assert ts.apply(pt, x, jnp.full((4,), 0.3)).shape == (4, 320)

    e = FlatEnergyMLP()
    pe = e.init(jax.random.key(2), x)
    assert e.apply(pe, x).shape == (4, 1)

    pair = PairwiseEnergySum(n_mod=5, size_z=64, hidden_mults=(1,))
    pp = pair.init(jax.random.key(3), x)
    assert pair.apply(pp, x).shape == (4, 1)
    # 10 pairwise energy subnets for n_mod=5 (EM5 parity).
    assert len(pp["params"]) == 10


def test_cond_score_step_and_sampling():
    n_mod, hw, D = 3, 4, 16
    model = ADMUNet(in_channels=n_mod, model_channels=16, out_channels=n_mod,
                    num_res_blocks=1, attention_resolutions=(),
                    channel_mult=(1, 2), use_z=True, z_dim=D)
    sde = VPSDE(N=10)
    B = 4

    def encoder(inputs):
        return inputs["grid"]

    def rep_encoder(inputs):
        return inputs["reps"]

    grid0 = jnp.zeros((B, hw, hw, n_mod))
    params = model.init(jax.random.key(0), grid0, jnp.full((B,), 0.5),
                        jnp.zeros((B, D)))["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = jax.jit(make_cond_score_train_step(
        model, sde, encoder, rep_encoder, tx, n_mod=n_mod,
        likelihood_weighting=False))

    inputs = {
        "grid": jax.random.normal(jax.random.key(1), (B, hw, hw, n_mod)),
        "reps": jax.random.normal(jax.random.key(2), (n_mod, B, D)),
    }
    ema = params
    first = None
    key = jax.random.key(3)
    for i in range(10):
        key, sub = jax.random.split(key)
        params, opt_state, ema, loss = step(params, opt_state, ema, inputs, sub)
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss))
    # EMA must track but lag params.
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               ema, params)
    assert max(jax.tree_util.tree_leaves(d)) > 0

    # Conditional sampling with the closed-over z.
    from score_based_multimodal_autoencoder_tpu.diffusion import (
        conditional_sampler,
    )

    z_cond = inputs["reps"].mean(0)
    score_fn = make_cond_score_fn(model, params, z_cond)
    out = conditional_sampler(
        jax.random.key(4), score_fn, sde, inputs["grid"],
        jnp.array([True, False, False]))
    assert out.shape == (B, hw, hw, n_mod)
    assert np.isfinite(np.array(out)).all()


def test_cond_score_trainer_steps_per_dispatch_equivalent():
    """The cond-score trainer's --steps-per-dispatch path (list-of-arrays
    input pytrees stacked leaf-wise, the same wiring the het trainer uses)
    matches the per-step path's trajectory to float32 fusion-reassociation
    tolerance (train/trainer.py _make_multi_step)."""
    from score_based_multimodal_autoencoder_tpu.train.conditional_score import (
        train_cond_score_model,
    )

    n_mod, hw, D, n = 2, 4, 8, 20

    class _Mod:
        def encode(self, x):
            return x[:, : hw * hw]

    class _Rep:
        def apply(self, variables, x):
            return x[:, :D]

    rng = np.random.default_rng(0)
    data = [rng.normal(size=(n, hw * hw + 3)).astype(np.float32)
            for _ in range(n_mod)]

    def gather(idx):
        return [d[idx] for d in data]

    sde = VPSDE(N=10)

    def run(k):
        model = ADMUNet(in_channels=n_mod, model_channels=8,
                        out_channels=n_mod, num_res_blocks=1,
                        attention_resolutions=(), channel_mult=(1, 2),
                        use_z=True, z_dim=D)
        # n=20, batch 8 -> two full batches (one stack of 2 at k=2) plus a
        # 4-sample tail through the per-step program.
        return train_cond_score_model(
            model, sde, [_Mod() for _ in range(n_mod)],
            [_Rep() for _ in range(n_mod)], [None] * n_mod, gather, n, hw,
            lr=1e-3, batch_size=8, epochs=2, likelihood_weighting=False,
            seed=5, steps_per_dispatch=k)

    ref, fused = run(1), run(2)
    # atol 5e-5: the ADM UNet's zero-init projections stay at ~1e-6..1e-5
    # magnitude after 2 tiny epochs, where XLA fusion-reassociation noise
    # between the scanned and standalone step programs is the whole value;
    # epoch losses match to 5 decimals (printed) so the trajectory agrees.
    for name in ("params", "ema"):
        for a, b in zip(jax.tree_util.tree_leaves(ref[name]),
                        jax.tree_util.tree_leaves(fused[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=5e-5)
