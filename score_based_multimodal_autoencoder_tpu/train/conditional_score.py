"""z-conditioned CelebA score training: the ``_cond`` pipeline.

Capability of /root/reference/train_lat_celebhq_unet_cont2_cond.py: the ADM
UNet score network receives a 512-d conditioning vector z computed by
AVERAGING frozen contrastive encoders over a random observed subset
(get_conds, :452-460); DSM loss and samplers thread z through the score
closure; an EMA copy of the params is maintained (:672-674).

Note the reference's ``sde_helper2.loss_fn/em_predictor`` do not accept the
``z_cond`` argument this script passes (SURVEY.md §7.3 - the plumbing was
missing from the mirror). Here no plumbing is needed at all: conditioning
enters by closing the score function over z, so every sampler in
``diffusion.samplers`` works unchanged.
"""

from __future__ import annotations

from itertools import combinations
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..diffusion.losses import dsm_loss
from ..nn.contrastive import average_condition
from .ema import ema_update

ALL_GIVEN_SUBSETS = ("0", "1", "2", "01", "02", "12", "012")


def subset_masks(n_mod: int = 3):
    """All non-empty given-subsets as a (S, n_mod) bool array (the
    reference's all_g list of strings, generalized)."""
    rows = []
    for size in range(1, n_mod + 1):
        for combo in combinations(range(n_mod), size):
            row = [i in combo for i in range(n_mod)]
            rows.append(row)
    return jnp.array(rows)


def make_cond_score_train_step(
    score_model,
    sde,
    encoder: Callable,
    rep_encoder: Callable,
    tx: optax.GradientTransformation,
    *,
    n_mod: int = 3,
    likelihood_weighting: bool = True,
    importance_sampling: bool = False,
    ema_decay: float = 0.999,
):
    """Build the jitted conditional-score step.

    Args:
      encoder: frozen ``inputs -> (B, hw, hw, n_mod)`` latent-grid encoder.
      rep_encoder: frozen ``inputs -> (n_mod, B, D)`` contrastive
        representations (one row per modality).

    Step signature: ``(params, opt_state, ema, inputs, key) ->
    (params, opt_state, ema, loss)``; a random given-subset is drawn per
    step (train_lat_celebhq_unet_cont2_cond.py:118-120).
    """
    masks = subset_masks(n_mod)

    def step(params, opt_state, ema, inputs, key):
        subset_key, loss_key = jax.random.split(key)
        grid = encoder(inputs)
        reps = rep_encoder(inputs)
        mask = masks[jax.random.randint(subset_key, (), 0, masks.shape[0])]
        z_cond = average_condition(reps, mask)

        def loss_fn(p):
            def score_fn(x, t):
                return score_model.apply({"params": p}, x, t, z_cond)

            return dsm_loss(
                loss_key, score_fn, sde, grid,
                likelihood_weighting=likelihood_weighting,
                importance_sampling=importance_sampling)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, ema_decay)
        return params, opt_state, ema, loss

    return step


def make_cond_score_fn(score_model, params, z_cond):
    """Close the z-conditioned score for the samplers (the z_cond plumbing
    the reference's sde_helper2 was missing)."""

    def score_fn(x, t):
        return score_model.apply({"params": params}, x, t, z_cond)

    return score_fn


def train_contrastive_encoders(
    rep_models,  # list of per-modality representation encoders
    gather,  # idx array -> tuple of per-modality input batches
    n_train: int,
    *,
    lr: float = 1e-4,
    batch_size: int = 64,
    epochs: int = 10,
    temperature: float = 0.1,
    seed: int = 0,
    ckpt_dir=None,
    resume: bool = False,
):
    """Pretrain the contrastive representation encoders with symmetric
    InfoNCE over every modality pair.

    The reference loads these encoders from checkpoints whose training
    script is NOT in the repo (SURVEY.md §2.2;
    train_lat_celebhq_unet_cont2_cond.py:687-689) - this supplies the
    standard CLIP-style objective consistent with their projection-head
    architecture (h_vae_model.py:964-1103).
    """
    import time

    import numpy as np

    from ..data.loader import BatchIterator
    from ..nn.contrastive import info_nce_loss
    from .checkpoints import CheckpointManager

    key = jax.random.key(seed + 500)
    sample = gather(np.arange(2))
    params, stats = [], []
    for m, x in zip(rep_models, sample):
        key, sub = jax.random.split(key)
        v = m.init(sub, x, train=True)
        params.append(v["params"])
        stats.append(v.get("batch_stats", {}))
    params, stats = tuple(params), tuple(stats)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None

    start_epoch = 0
    if resume and mgr and mgr.exists("resume"):
        target = {"params": params, "batch_stats": stats,
                  "opt_state": opt_state, "epoch": 0,
                  "key": jax.random.key_data(key)}
        saved = mgr.restore(target, "resume")
        params, stats = saved["params"], saved["batch_stats"]
        opt_state = saved["opt_state"]
        start_epoch = int(saved["epoch"]) + 1
        key = jax.random.wrap_key_data(jnp.asarray(saved["key"]))
        print(f"resumed contrastive from epoch {start_epoch}", flush=True)

    n_mod = len(rep_models)

    @jax.jit
    def step(params, stats, opt_state, inputs):
        def loss_fn(ps):
            reps, new_stats = [], []
            for m, p, s, x in zip(rep_models, ps, stats, inputs):
                out, upd = m.apply(
                    {"params": p, "batch_stats": s}, x, train=True,
                    deterministic=True, mutable=["batch_stats"])
                reps.append(out)
                new_stats.append(upd["batch_stats"])
            total = 0.0
            for i in range(n_mod):
                for j in range(i + 1, n_mod):
                    total = total + info_nce_loss(reps[i], reps[j],
                                                  temperature)
            return total, tuple(new_stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, opt_state,
                loss)

    it = BatchIterator(np.arange(n_train), batch_size, seed=seed)
    for epoch in range(start_epoch, epochs):
        t0, losses = time.time(), []
        for idx in it.epoch():
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  gather(np.asarray(idx)))
            losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(losses)))  # one sync per epoch
        print(f"epoch {epoch}: info_nce={mean_loss:.4f} "
              f"({time.time()-t0:.1f}s)", flush=True)
        if mgr:
            ckpt = {"params": list(params), "batch_stats": list(stats)}
            mgr.save_last(ckpt)
            mgr.save_best(ckpt, mean_loss)
            key, _ = jax.random.split(key)
            mgr.save_resume({
                "params": params, "batch_stats": stats,
                "opt_state": opt_state, "epoch": epoch,
                "key": jax.random.key_data(key)})
    if mgr:
        mgr.wait()
    return {"params": params, "batch_stats": stats}


def train_cond_score_model(
    score_model,  # ADMUNet(use_z=True)
    sde,
    modalities,  # list of pipeline_celeba.Modality (frozen stage-1 AEs)
    rep_models,
    rep_variables,  # list of frozen contrastive encoder variables
                    # ({"params", "batch_stats"} each)
    gather,
    n_train: int,
    latent_hw: int,
    *,
    gather_val=None,
    n_val: int = 0,
    lr: float,
    batch_size: int,
    epochs: int,
    likelihood_weighting: bool = True,
    importance_sampling: bool = False,
    ema_decay: float = 0.999,
    seed: int = 0,
    ckpt_dir=None,
    eval_every=None,
    eval_fn=None,
    metrics_path=None,
    resume: bool = False,
    mesh=None,
    steps_per_dispatch: int = 1,
):
    """Epoch loop for the z-conditioned score model (the _cond entry point,
    /root/reference/train_lat_celebhq_unet_cont2_cond.py:452-460, 651-674):
    random given-subset conditioning per step, EMA copy maintained and
    checkpointed (the reference's _EMA files, :772-785), full-val DSM keyed
    best checkpoint, preemption-safe resume. ``mesh``: optional DP mesh -
    params/EMA replicated, per-modality input batches sharded on axis 0.
    ``steps_per_dispatch``: fuse K optimizer steps into one ``lax.scan``
    dispatch (same trajectory, see trainer._make_multi_step)."""
    from ..parallel.mesh import adapt_pallas_for_mesh

    score_model = adapt_pallas_for_mesh(score_model, mesh,
                                        "conditional-score training")
    import time

    import numpy as np

    from ..data.loader import BatchIterator
    from ..utils.logging import MetricsLogger
    from .checkpoints import CheckpointManager
    from .lr import adam_with_mutable_lr
    from ..parallel import dp_shardings, put_batch, replicate_tree
    from .trainer import _grouped_batches, _make_multi_step, _mean_of, \
        _stacked_sharding, _weighted_mean

    rep, batch_sh = dp_shardings(mesh, modality_major=False)
    key = jax.random.key(seed + 700)
    val_key = jax.random.key(seed + 7919)
    logger = MetricsLogger(metrics_path, also_print=metrics_path is not None)
    n_mod = len(modalities)

    def encoder(inputs):
        chans = []
        for mod, x in zip(modalities, inputs):
            z = mod.encode(x)
            chans.append(z.reshape(z.shape[0], latent_hw, latent_hw))
        return jnp.stack(chans, axis=-1)

    def rep_encoder(inputs):
        return jnp.stack([
            m.apply(v, x)
            for m, v, x in zip(rep_models, rep_variables, inputs)])

    sample = gather(np.arange(2))
    grid0 = encoder(sample)
    z0 = rep_encoder(sample)[0]
    key, init_key = jax.random.split(key)
    params = score_model.init(
        init_key, grid0, jnp.full((grid0.shape[0],), 0.5), z0)["params"]
    tx = adam_with_mutable_lr(lr)
    opt_state = tx.init(params)
    ema = params
    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None

    start_epoch = 0
    if resume and mgr and mgr.exists("last"):
        ckpt = mgr.restore_raw("last")
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        ema = jax.tree_util.tree_map(jnp.asarray, ckpt["ema"])
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        if ckpt.get("key") is not None:
            key = jax.random.wrap_key_data(jnp.asarray(ckpt["key"]))
        if ckpt.get("best_metric") is not None:
            import numpy as _np

            best = float(ckpt["best_metric"])
            mgr.best_metric = None if _np.isnan(best) else best
        opt_state = mgr.restore_opt(opt_state)
        print(f"resumed cond score from epoch {start_epoch}", flush=True)

    params = replicate_tree(params, rep)
    opt_state = replicate_tree(opt_state, rep)
    ema = replicate_tree(ema, rep)

    _step_core = make_cond_score_train_step(
        score_model, sde, encoder, rep_encoder, tx, n_mod=n_mod,
        likelihood_weighting=likelihood_weighting,
        importance_sampling=importance_sampling, ema_decay=ema_decay)
    step = jax.jit(_step_core)
    multi_step = (_make_multi_step(_step_core)
                  if steps_per_dispatch > 1 else None)
    stack_sh = _stacked_sharding(batch_sh)

    masks = subset_masks(n_mod)

    @jax.jit
    def val_step(params, inputs, key):
        subset_key, loss_key = jax.random.split(key)
        grid = encoder(inputs)
        reps = rep_encoder(inputs)
        mask = masks[jax.random.randint(subset_key, (), 0, masks.shape[0])]
        z_cond = average_condition(reps, mask)

        def score_fn(x, t):
            return score_model.apply({"params": params}, x, t, z_cond)

        return dsm_loss(loss_key, score_fn, sde, grid,
                        likelihood_weighting=likelihood_weighting,
                        importance_sampling=importance_sampling)

    def full_val_loss(params):
        if gather_val is None or not n_val:
            return None
        vals, weights, vkey = [], [], val_key
        for i in range(0, n_val, batch_size):
            idx = np.arange(i, min(i + batch_size, n_val))
            vkey, sub = jax.random.split(vkey)
            vb = put_batch(gather_val(idx), batch_sh, axis=0)
            vals.append(val_step(params, vb, sub))
            weights.append(len(idx))
        return _weighted_mean(vals, weights)

    pipeline = None
    if eval_every and eval_fn:
        from ..pipeline_celeba import ConditionalHeterogeneousPipeline

        pipeline = ConditionalHeterogeneousPipeline(
            modalities=modalities, score_model=score_model,
            score_params=ema, sde=sde, latent_hw=latent_hw,
            rep_models=rep_models, rep_variables=rep_variables)

    it = BatchIterator(np.arange(n_train), batch_size, seed=seed)
    for epoch in range(start_epoch, epochs):
        t0, losses = time.time(), []
        for kind, item in _grouped_batches(it.epoch(),
                                           steps_per_dispatch, batch_size):
            if kind == "stack":
                batches = [gather(np.asarray(i)) for i in item]
                stacked = put_batch(
                    jax.tree_util.tree_map(
                        lambda *xs: np.stack(xs), *batches),
                    stack_sh, axis=1)
                params, opt_state, ema, key, loss = multi_step(
                    params, opt_state, ema, stacked, key)
            else:
                key, sub = jax.random.split(key)
                batch = put_batch(gather(np.asarray(item)), batch_sh, axis=0)
                params, opt_state, ema, loss = step(
                    params, opt_state, ema, batch, sub)
            losses.append(loss)
        train_loss = _mean_of(losses)
        print(f"epoch {epoch}: cond_dsm={train_loss:.5f} "
              f"({time.time()-t0:.1f}s)", flush=True)
        val_loss = full_val_loss(params)
        if val_loss is not None:
            print(f"epoch {epoch}: val_dsm={val_loss:.5f}", flush=True)
        logger.log(epoch, cond_dsm=train_loss,
                   **({"val_dsm": val_loss} if val_loss is not None else {}))

        if pipeline is not None and (epoch + 1) % eval_every == 0:
            # EMA params drive eval, as the reference samples with the EMA
            # model (train_lat_celebhq_unet_cont2_cond.py:651-653).
            pipeline.score_params = ema
            key, ekey = jax.random.split(key)
            from .trainer import _flatten_metrics

            logger.log(epoch, **_flatten_metrics(eval_fn(pipeline, ekey)))

        if mgr:
            import numpy as _np

            ckpt = {"params": params, "ema": ema, "epoch": epoch,
                    "key": jax.random.key_data(key),
                    "best_metric": (_np.nan if mgr.best_metric is None
                                    else mgr.best_metric)}
            mgr.save_last(ckpt)
            mgr.save_opt(opt_state)
            mgr.save_best(ckpt, val_loss if val_loss is not None
                          else train_loss)
    if mgr:
        mgr.wait()
    return {"params": params, "ema": ema}
