"""Decoder-finetune CLI: sharpen VAE decoders against the frozen MLP score.

Replacement for /root/reference/train_psm_upd_res_finetune.py: load the
trained VAE fleet + a flat-latent MLP score model, then per batch randomly
drop modalities, Langevin-complete their latents with the frozen score and
train each dropped modality's DECODER on reconstruction (:67-120).
``--sm-epochs`` optionally trains the MLP score model first (single-sigma
DSM, :42-50) so the whole chain runs from a fleet checkpoint alone.

    python -m score_based_multimodal_autoencoder_tpu.cli.finetune \
        --vae-ckpt ./checkpoints/vae_fleet --synthetic --sm-epochs 3
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vae-ckpt", default="./checkpoints/vae_fleet")
    p.add_argument("--sm-ckpt", default="./checkpoints/flat_sm",
                   help="flat-latent MLP score checkpoint (trained here "
                        "when --sm-epochs > 0)")
    p.add_argument("--sm-epochs", type=int, default=0)
    p.add_argument("--sm-sigma", type=float, default=1.0,
                   help="single-sigma DSM noise level (reference default 1)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=512)
    p.add_argument("--data-root", default=None)
    p.add_argument("--n-mod", type=int, default=10)
    p.add_argument("--size-z", type=int, default=64)
    p.add_argument("--drop-p", type=float, default=0.5)
    p.add_argument("--n-comp", type=int, default=40,
                   help="Langevin completion steps (reference: 40)")
    p.add_argument("--lr1", type=float, default=0.2)
    p.add_argument("--lr2", type=float, default=0.02)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all devices (DP mesh)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default="./checkpoints/vae_fleet_finetuned")
    args = p.parse_args()

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data.loader import BatchIterator, gather_batch_01, to_float01
    from ..diffusion.exact_sm import dsm_single_sigma_loss
    from ..nn.mlp_scores import FlatScoreMLP
    from ..parallel.fleet import VAEFleet
    from ..train.checkpoints import CheckpointManager
    from ..train.configs import VAEConfig
    from ..train.finetune import make_finetune_step
    from ..train.lr import adam_with_mutable_lr
    from ..parallel import dp_shardings, put_batch, replicate_tree

    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)
    # Pixel batches here are modality-major (n_mod, B, ...).
    rep, batch_sh = dp_shardings(mesh, modality_major=True)

    if args.synthetic:
        from ..data import synthetic_polymnist

        pixels = synthetic_polymnist(
            args.synthetic_n, args.n_mod, 32, args.seed).images
    else:
        from ..data import load_polymnist

        pixels = load_polymnist(args.data_root, "train").images

    vae = VAEConfig.polymnist(size_z=args.size_z).build_model()
    fleet = VAEFleet(vae, args.n_mod, adam_with_mutable_lr(args.lr))
    mgr_vae = CheckpointManager(args.vae_ckpt)
    fleet_state = mgr_vae.restore_raw(
        "best" if mgr_vae.exists("best") else "last")
    # Fresh finetune optimizer over the restored params (the reference
    # builds new Adam(lr) per VAE, train_psm_upd_res_finetune.py:279).
    fleet_state["opt_state"] = jax.vmap(fleet.tx.init)(fleet_state["params"])
    fleet_state = replicate_tree(fleet_state, rep)

    key = jax.random.key(args.seed)
    sm_model = FlatScoreMLP()  # LSMPoly64_sm widths over D = n_mod * size_z
    z0 = jnp.zeros((2, args.n_mod * args.size_z))
    sm_mgr = CheckpointManager(args.sm_ckpt)

    @jax.jit
    def encode_flat(pixels_batch, key):
        grid = fleet.encode(fleet_state, pixels_batch,
                            int(round(args.size_z ** 0.5)))
        B = grid.shape[0]
        return jnp.moveaxis(
            grid.reshape(B, -1, args.n_mod), -1, 1).reshape(B, -1)

    n = pixels.shape[1]
    if args.sm_epochs:
        # Train the flat MLP score by single-sigma DSM over frozen latents
        # (the reference's dsm_loss, train_psm_upd_res_finetune.py:42-50).
        sm_params = sm_model.init(jax.random.key(1), z0)["params"]
        tx = optax.adam(1e-3)
        sm_opt = tx.init(sm_params)

        @jax.jit
        def sm_step(params, opt_state, z, key):
            def loss_fn(p):
                return dsm_single_sigma_loss(
                    key, lambda x: sm_model.apply({"params": p}, x), z,
                    sigma=args.sm_sigma)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        it = BatchIterator(np.arange(n), args.batch_size, seed=args.seed)
        for epoch in range(args.sm_epochs):
            t0, losses = time.time(), []
            for idx in it.epoch():
                batch = put_batch(jnp.asarray(gather_batch_01(pixels, idx)),
                                   batch_sh, axis=1)
                key, e_key, s_key = jax.random.split(key, 3)
                z = encode_flat(batch, e_key)
                sm_params, sm_opt, loss = sm_step(sm_params, sm_opt, z, s_key)
                losses.append(loss)
            print(f"sm epoch {epoch}: "
                  f"dsm={float(jnp.mean(jnp.stack(losses))):.4f} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            sm_mgr.save_last({"params": sm_params})
        sm_mgr.wait()
    sm_params = sm_mgr.restore_raw("last")["params"]

    def score_fn_flat(z):
        return sm_model.apply({"params": sm_params}, z)

    step = jax.jit(make_finetune_step(
        fleet, score_fn_flat, drop_p=args.drop_p, n_comp=args.n_comp,
        lr1=args.lr1, lr2=args.lr2))

    mgr = CheckpointManager(args.ckpt_dir)
    start_epoch = 0
    if args.resume and mgr.exists("resume"):
        target = {"state": fleet_state, "epoch": 0,
                  "key": jax.random.key_data(key)}
        saved = mgr.restore(target, "resume")
        fleet_state = replicate_tree(saved["state"], rep)
        start_epoch = int(saved["epoch"]) + 1
        key = jax.random.wrap_key_data(jnp.asarray(saved["key"]))
        print(f"resumed finetune from epoch {start_epoch}", flush=True)

    it = BatchIterator(np.arange(n), args.batch_size, seed=args.seed + 1)
    for epoch in range(start_epoch, args.epochs):
        t0, losses = time.time(), []
        for idx in it.epoch():
            batch = put_batch(jnp.asarray(gather_batch_01(pixels, idx)),
                               batch_sh, axis=1)
            key, sub = jax.random.split(key)
            fleet_state, per_mod = step(fleet_state, batch, sub)
            losses.append(per_mod.sum())
        mean_loss = float(jnp.mean(jnp.stack(losses)))  # one sync per epoch
        print(f"epoch {epoch}: finetune={mean_loss:.4f} "
              f"({time.time()-t0:.1f}s)", flush=True)
        mgr.save_last(fleet_state)
        mgr.save_best(fleet_state, mean_loss)
        mgr.save_resume({
            "state": fleet_state, "epoch": epoch,
            "key": jax.random.key_data(key)})
    mgr.wait()


if __name__ == "__main__":
    main()
