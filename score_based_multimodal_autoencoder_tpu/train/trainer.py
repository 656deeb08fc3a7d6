"""Epoch-loop trainers for both SBMAE stages.

One trainer drives every stage (the reference re-wires its layers by hand
in each of ~20 scripts, SURVEY.md §1): stage-1 trains the whole per-modality
VAE fleet in one vmapped program; stage-2 encodes with the frozen fleet and
fits the latent score UNet by DSM. Per-epoch wall-clock is printed for
parity with the reference's TRAINING/VALIDATION TIME TAKEN logs
(/root/reference/train_polyupd.py:98-101).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loader import BatchIterator, gather_batch_01, to_float01
from ..diffusion.losses import dsm_loss
from ..parallel.fleet import VAEFleet
from .checkpoints import CheckpointManager
from .lr import ReduceLROnPlateau, adam_with_mutable_lr


def _log(msg):
    print(msg, flush=True)


def train_vae_fleet(
    vae_model,
    pixels_train: np.ndarray,  # (n_mod, N, H, W, C) uint8 or float
    pixels_val: Optional[np.ndarray],
    *,
    beta: float,
    lr: float,
    batch_size: int,
    epochs: int,
    seed: int = 0,
    ckpt_dir: Optional[str] = None,
    loss_type: str = "vae",
) -> Dict[str, Any]:
    n_mod = pixels_train.shape[0]
    tx = adam_with_mutable_lr(lr)
    fleet = VAEFleet(vae_model, n_mod, tx, beta=beta, loss_type=loss_type)
    key = jax.random.key(seed)
    key, init_key = jax.random.split(key)
    state = fleet.init(init_key, jnp.asarray(to_float01(pixels_train[0, :2])))
    step = jax.jit(fleet.train_step)
    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None

    n = pixels_train.shape[1]
    train_iter = BatchIterator(
        np.arange(n), batch_size, seed=seed,
        transform=None,
    )
    for epoch in range(epochs):
        t0 = time.time()
        totals = []
        for idx in train_iter.epoch():
            batch = jnp.asarray(gather_batch_01(pixels_train, idx))
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            totals.append(metrics["total"])
        train_loss = float(jnp.stack(totals).mean())
        _log(f"epoch {epoch}: train={train_loss:.4f} "
             f"({time.time() - t0:.1f}s)")

        if pixels_val is not None:
            val_batch = jnp.asarray(to_float01(pixels_val[:, :batch_size]))
            key, sub = jax.random.split(key)
            val_metrics = jax.jit(fleet.eval_loss)(state, val_batch, sub)
            val_loss = float(val_metrics["total"].mean())
            _log(f"epoch {epoch}: val={val_loss:.4f}")
            if mgr:
                mgr.save_best(state, val_loss)
        if mgr:
            mgr.save_last(state)
    if mgr:
        mgr.wait()
    return {"fleet": fleet, "state": state}


def train_single_vae(
    model,
    train_data: np.ndarray,  # (N, ...) pixels/attrs for ONE modality
    val_data: Optional[np.ndarray],
    *,
    beta: float,
    lr: float,
    batch_size: int,
    epochs: int,
    seed: int = 0,
    ckpt_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """One heterogeneous-modality VAE (the CelebA image/mask/attr trainers,
    /root/reference/train_celeba_res_hq.py, train_celeba_mask_hq.py,
    train_celeba_attr_hq.py): best-on-val + last checkpoints, plateau LR."""
    from .state import create_train_state
    from .steps import make_vae_eval_step, make_vae_train_step

    key = jax.random.key(seed)
    key, init_key, noise_key = jax.random.split(key, 3)
    sample = jnp.asarray(to_float01(train_data[:2]))
    variables = model.init(init_key, sample, key=noise_key, train=True)
    tx = adam_with_mutable_lr(lr)
    state = create_train_state(model, variables, tx)
    train_step = jax.jit(make_vae_train_step(model, beta))
    eval_step = jax.jit(make_vae_eval_step(model, beta))
    scheduler = ReduceLROnPlateau(patience=5)
    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None

    it = BatchIterator(np.arange(train_data.shape[0]), batch_size, seed=seed)
    for epoch in range(epochs):
        t0, totals = time.time(), []
        for idx in it.epoch():
            batch = jnp.asarray(to_float01(train_data[np.asarray(idx)]))
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, sub)
            totals.append(float(metrics["total"]))
        _log(f"epoch {epoch}: train={np.mean(totals):.4f} "
             f"({time.time() - t0:.1f}s)")
        if val_data is not None:
            vb = jnp.asarray(to_float01(val_data[:batch_size]))
            key, sub = jax.random.split(key)
            val = float(eval_step(state, vb, sub)["total"])
            _log(f"epoch {epoch}: val={val:.4f}")
            new_opt, lr_now = scheduler.step(state.opt_state, val)
            state = state.replace(opt_state=new_opt)
            if mgr:
                mgr.save_best(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    val)
        if mgr:
            mgr.save_last(
                {"params": state.params, "batch_stats": state.batch_stats})
    if mgr:
        mgr.wait()
    return {"state": state}


def train_score_model(
    score_model,
    sde,
    fleet: VAEFleet,
    fleet_state,
    pixels_train: np.ndarray,
    latent_hw: int,
    *,
    lr: float,
    batch_size: int,
    epochs: int,
    likelihood_weighting: bool = True,
    importance_sampling: bool = False,
    seed: int = 0,
    ckpt_dir: Optional[str] = None,
    ema_decay: Optional[float] = None,
    sample_every: Optional[int] = None,
    sample_dir: Optional[str] = None,
    sample_sde=None,
    resume: bool = False,
) -> Dict[str, Any]:
    key = jax.random.key(seed + 100)
    sample_pixels = jnp.asarray(to_float01(pixels_train[:, :2]))
    grid0 = fleet.encode(fleet_state, sample_pixels, latent_hw)
    key, init_key = jax.random.split(key)
    params = score_model.init(
        init_key, grid0, jnp.full((grid0.shape[0],), 0.5))["params"]
    tx = adam_with_mutable_lr(lr)
    opt_state = tx.init(params)
    ema = params if ema_decay else None
    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None

    start_epoch = 0
    if resume and mgr and mgr.exists("last"):
        # Preemption-safe resume: params, EMA, epoch counter and PRNG key
        # all come back from the checkpoint (capability absent upstream,
        # SURVEY.md §5).
        ckpt = mgr.restore_raw("last")
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        if ckpt.get("ema") is not None and ema is not None:
            ema = jax.tree_util.tree_map(jnp.asarray, ckpt["ema"])
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        if ckpt.get("key") is not None:
            key = jax.random.wrap_key_data(jnp.asarray(ckpt["key"]))
        _log(f"resumed from epoch {start_epoch}")

    @jax.jit
    def step(params, opt_state, ema, pixels, key):
        latents = fleet.encode(fleet_state, pixels, latent_hw)

        def loss_fn(p):
            return dsm_loss(
                key, lambda x, t: score_model.apply({"params": p}, x, t),
                sde, latents, likelihood_weighting=likelihood_weighting,
                importance_sampling=importance_sampling)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1 - ema_decay) * p, ema, params)
        return params, opt_state, ema, loss

    pipeline = None
    if sample_every:
        from ..pipeline import SBMAEPipeline

        pipeline = SBMAEPipeline(
            fleet=fleet, fleet_state=fleet_state, score_model=score_model,
            score_params=params, sde=sample_sde or sde, latent_hw=latent_hw)

    n = pixels_train.shape[1]
    train_iter = BatchIterator(np.arange(n), batch_size, seed=seed)
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses = []
        for idx in train_iter.epoch():
            batch = jnp.asarray(gather_batch_01(pixels_train, idx))
            key, sub = jax.random.split(key)
            params, opt_state, ema, loss = step(params, opt_state, ema, batch, sub)
            losses.append(float(loss))
        _log(f"epoch {epoch}: dsm={np.mean(losses):.5f} ({time.time()-t0:.1f}s)")

        # Periodic qualitative grids (the reference's every-10-epoch
        # unconditional + conditional plots, train_poly_unet_cont.py:300-396).
        if pipeline is not None and (epoch + 1) % sample_every == 0:
            from ..utils.images import save_modality_grid

            pipeline.score_params = params
            key, s1, s2 = jax.random.split(key, 3)
            unc = pipeline.sample_unconditional(s1, 8)
            save_modality_grid(np.asarray(unc),
                               f"{sample_dir or '.'}/uncond_ep{epoch}.png")
            cond_pixels = jnp.asarray(to_float01(pixels_train[:, :8]))
            cond = pipeline.sample_conditional(
                s2, cond_pixels, list(range(1, fleet.n_mod)))
            save_modality_grid(np.asarray(cond),
                               f"{sample_dir or '.'}/cond_given0_ep{epoch}.png")

        if mgr:
            ckpt = {"params": params, "ema": ema, "epoch": epoch,
                    "key": jax.random.key_data(key)}
            mgr.save_last(ckpt)
            mgr.save_best(ckpt, float(np.mean(losses)))
    if mgr:
        mgr.wait()
    return {"params": params, "ema": ema}
