"""DiffuseVAE pixel-refiner trainer.

Epoch loop for the 1000-step conditional DDPM that sharpens VAE image
reconstructions (/root/reference/train_celeba_diffvae.py:67-204): per batch
the frozen image VAE reconstructs the input, both are rescaled to [-1, 1],
and the ADM UNet learns eps-prediction on the channel-concat. Reference
training details kept: Adam, lr/5 every 50 epochs
(train_celeba_diffvae.py:248-279), best-on-val + last checkpoints; resume
is an upgrade (SURVEY.md §5).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loader import BatchIterator, to_float01
from ..diffusion.ddpm import DDPMSchedule, ddpm_refiner_loss
from ..utils.logging import MetricsLogger
from .checkpoints import CheckpointManager
from .lr import adam_with_mutable_lr


def _log(msg):
    print(msg, flush=True)


def train_refiner(
    refiner_model,
    schedule: DDPMSchedule,
    image_vae,
    vae_variables,
    images_train: np.ndarray,  # (N, H, W, 3) uint8 or float [0,1]
    images_val: Optional[np.ndarray],
    *,
    lr: float,
    batch_size: int,
    epochs: int,
    seed: int = 0,
    ckpt_dir: Optional[str] = None,
    lr_decay_every: Optional[int] = 50,
    sample_every: Optional[int] = None,
    sample_dir: Optional[str] = None,
    metrics_path: Optional[str] = None,
    resume: bool = False,
    mesh=None,
) -> Dict[str, Any]:
    key = jax.random.key(seed + 300)
    val_key = jax.random.key(seed + 7919)  # fixed: comparable epoch-to-epoch
    logger = MetricsLogger(metrics_path, also_print=metrics_path is not None)

    x0 = jnp.asarray(to_float01(images_train[:2]))
    key, init_key, rec_key = jax.random.split(key, 3)
    cond0 = _recon(image_vae, vae_variables, x0, rec_key)
    params = refiner_model.init(
        init_key, jnp.concatenate([x0, cond0], axis=-1),
        jnp.zeros((2,), jnp.int32))["params"]
    tx = adam_with_mutable_lr(lr)
    opt_state = tx.init(params)
    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None

    start_epoch = 0
    if resume and mgr and mgr.exists("last"):
        ckpt = mgr.restore_raw("last")
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        if ckpt.get("key") is not None:
            key = jax.random.wrap_key_data(jnp.asarray(ckpt["key"]))
        if ckpt.get("best_metric") is not None:
            best = float(ckpt["best_metric"])
            mgr.best_metric = None if np.isnan(best) else best
        opt_state = mgr.restore_opt(opt_state)
        _log(f"resumed refiner from epoch {start_epoch}")

    from ..parallel import dp_shardings, put_batch, replicate_tree

    rep, batch_sh = dp_shardings(mesh, modality_major=False)
    params = replicate_tree(params, rep)
    opt_state = replicate_tree(opt_state, rep)
    vae_variables = replicate_tree(vae_variables, rep)

    def denoise_fn_of(params):
        def fn(x_and_cond, t):
            return refiner_model.apply({"params": params}, x_and_cond, t)
        return fn

    # vae_variables / refiner params ride as jit ARGUMENTS (closures would
    # bake them into the HLO as constants; see pipeline_celeba note).
    @jax.jit
    def step(params, opt_state, vae_variables, images, key):
        rec_key, loss_key = jax.random.split(key)
        # Frozen VAE reconstruction (reparametrized draw, matching the
        # reference's stochastic x_hat, train_celeba_diffvae.py:124-128).
        cond = _recon(image_vae, vae_variables, images, rec_key)
        x0 = 2.0 * images - 1.0
        cond = 2.0 * cond - 1.0

        def loss_fn(p):
            return ddpm_refiner_loss(loss_key, denoise_fn_of(p), schedule,
                                     x0, cond)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def val_step(params, vae_variables, images, key):
        rec_key, loss_key = jax.random.split(key)
        cond = _recon(image_vae, vae_variables, images, rec_key)
        return ddpm_refiner_loss(loss_key, denoise_fn_of(params), schedule,
                                 2.0 * images - 1.0, 2.0 * cond - 1.0)

    @jax.jit
    def sample_refined(params, cond, key):
        from ..diffusion.ddpm import ddpm_refiner_sample

        return ddpm_refiner_sample(key, denoise_fn_of(params), schedule,
                                   cond, cond.shape)

    def full_val_loss(params) -> Optional[float]:
        if images_val is None:
            return None
        vals, weights, vkey = [], [], val_key
        for i in range(0, images_val.shape[0], batch_size):
            vb = put_batch(jnp.asarray(to_float01(
                images_val[i:i + batch_size])), batch_sh, axis=0)
            vkey, sub = jax.random.split(vkey)
            vals.append(val_step(params, vae_variables, vb, sub))
            weights.append(vb.shape[0])
        return float(np.average(np.asarray(jnp.stack(vals)),
                                weights=weights))

    it = BatchIterator(np.arange(images_train.shape[0]), batch_size, seed=seed)
    for epoch in range(start_epoch, epochs):
        t0, losses = time.time(), []
        for idx in it.epoch():
            batch = put_batch(jnp.asarray(to_float01(
                images_train[np.asarray(idx)])), batch_sh, axis=0)
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, vae_variables,
                                           batch, sub)
            losses.append(loss)
        train_loss = float(jnp.mean(jnp.stack(losses)))  # one sync per epoch
        _log(f"epoch {epoch}: refiner={train_loss:.5f} "
             f"({time.time()-t0:.1f}s)")
        val_loss = full_val_loss(params)
        if val_loss is not None:
            _log(f"epoch {epoch}: val={val_loss:.5f}")
        logger.log(epoch, refiner=train_loss,
                   **({"val": val_loss} if val_loss is not None else {}))

        # lr /= 5 every 50 epochs (train_celeba_diffvae.py:277-279); the
        # mutable-lr Adam lets the rewrite happen without recompiling.
        if lr_decay_every and (epoch + 1) % lr_decay_every == 0:
            new_lr = float(opt_state.hyperparams["learning_rate"]) / 5.0
            opt_state.hyperparams["learning_rate"] = jnp.asarray(new_lr)
            _log(f"epoch {epoch}: lr -> {new_lr:.2e}")

        # Periodic refined-sample grids (evaluate(), diffvae.py:150-211).
        if sample_every and (epoch + 1) % sample_every == 0 \
                and images_val is not None:
            from ..utils.images import save_modality_grid

            vb = jnp.asarray(to_float01(images_val[:4]))
            key, rkey, skey = jax.random.split(key, 3)
            cond = 2.0 * _recon(image_vae, vae_variables, vb, rkey) - 1.0
            out = sample_refined(params, cond, skey)
            panel = np.stack([np.asarray(vb),
                              np.asarray(jnp.clip((cond + 1) / 2, 0, 1)),
                              np.asarray(jnp.clip((out + 1) / 2, 0, 1))])
            save_modality_grid(panel,
                               f"{sample_dir or '.'}/refined_ep{epoch}.png")

        if mgr:
            ckpt = {"params": params, "epoch": epoch,
                    "key": jax.random.key_data(key),
                    "best_metric": (np.nan if mgr.best_metric is None
                                    else mgr.best_metric)}
            mgr.save_last(ckpt)
            mgr.save_opt(opt_state)
            mgr.save_best(ckpt, val_loss if val_loss is not None
                          else train_loss)
    if mgr:
        mgr.wait()
    return {"params": params}


def _recon(image_vae, variables, images, key):
    """Stochastic VAE reconstruction of a [0,1] image batch."""
    out, _, _ = image_vae.apply(variables, images, key=key)
    return out
