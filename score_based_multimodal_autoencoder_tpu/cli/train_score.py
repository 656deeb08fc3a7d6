"""Stage-2 CLI: train the joint latent score UNet over frozen VAE latents.

Replacement for /root/reference/train_poly_unet_cont.py (PolyMNIST) and
/root/reference/train_lat_celebhq_unet_cont2.py (CelebA): one fused XLA
program per optimizer step encodes all modalities and takes a DSM step.

    python -m score_based_multimodal_autoencoder_tpu.cli.train_score \
        --preset polymnist --vae-ckpt ./checkpoints/vae_fleet --synthetic
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="polymnist", choices=["polymnist", "celebhq"])
    p.add_argument("--vae-ckpt", default="./checkpoints/vae_fleet")
    p.add_argument("--image-ckpt", default="./checkpoints/celeba_image")
    p.add_argument("--mask-ckpt", default="./checkpoints/celeba_mask")
    p.add_argument("--attr-ckpt", default="./checkpoints/celeba_attr")
    p.add_argument("--data-root", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=512)
    p.add_argument("--n-mod", type=int, default=10)
    p.add_argument("--size-z", type=int, default=64)
    p.add_argument("--dim", type=int, default=128,
                   help="score UNet base width (reference: 128 poly / 256 celeb)")
    p.add_argument("--beta0", type=float, default=0.1)
    p.add_argument("--beta1", type=float, default=20.0)
    p.add_argument("--sde-type", default="vpsde",
                   choices=["vpsde", "subvpsde", "vesde"])
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--no-likelihood-weighting", action="store_true")
    p.add_argument("--im-sample", action="store_true",
                   help="importance-sampled time (likelihood weighting)")
    p.add_argument("--ema", type=float, default=None)
    p.add_argument("--resume", action="store_true",
                   help="continue from the last checkpoint in --ckpt-dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default="./checkpoints/score")
    args = p.parse_args()

    import jax
    import optax

    from ..parallel.fleet import VAEFleet
    from ..train.checkpoints import CheckpointManager
    from ..train.configs import ScoreConfig, VAEConfig
    from ..train.trainer import train_score_model

    score_cfg = {
        "polymnist": ScoreConfig.polymnist,
        "celebhq": ScoreConfig.celebhq,
    }[args.preset](sde_type=args.sde_type, beta_0=args.beta0,
                   beta_1=args.beta1, channels=args.n_mod, dim=args.dim)

    if args.preset == "celebhq":
        # Three heterogeneous frozen VAEs -> (B, 16, 16, 3) latent grid ->
        # DSM (train_lat_celebhq_unet_cont2.py:376-561).
        import time

        import numpy as np
        import optax

        from ..data.loader import BatchIterator, to_float01
        from ..pipeline_celeba import Modality
        from ..train.checkpoints import CheckpointManager as Mgr
        from ..train.configs import VAEConfig
        from ..diffusion.losses import dsm_loss

        if args.synthetic:
            from ..data import synthetic_celeba

            ds = synthetic_celeba(args.synthetic_n, size=128, seed=args.seed)
        else:
            from ..data import load_celeba_hq

            ds = load_celeba_hq(args.data_root, "train")

        mods = []
        for name, cfg_fn, ckpt in [
            ("image", VAEConfig.celeba_image, args.image_ckpt),
            ("mask", VAEConfig.celeba_mask, args.mask_ckpt),
            ("attr", VAEConfig.celeba_attr, args.attr_ckpt),
        ]:
            m = cfg_fn(size_z=args.size_z if args.size_z != 64 else 256)
            mods.append(Modality(name, m.build_model(),
                                 Mgr(ckpt).restore_raw("last")))

        score_cfg2 = ScoreConfig.celebhq(
            sde_type=args.sde_type, beta_0=args.beta0, beta_1=args.beta1)
        model = score_cfg2.build_model()
        sde = score_cfg2.build_sde()
        hw = score_cfg2.latent_hw
        import jax
        import jax.numpy as jnp

        def encode(inputs):
            chans = []
            for mod, x in zip(mods, inputs):
                z = mod.encode(x)
                chans.append(z.reshape(z.shape[0], hw, hw))
            return jnp.stack(chans, axis=-1)

        key = jax.random.key(args.seed)
        sample = (jnp.asarray(to_float01(ds.images[:2])),
                  jnp.asarray(to_float01(ds.masks[:2])),
                  jnp.asarray(ds.visible_attrs()[:2]))
        grid0 = encode(sample)
        params = model.init(key, grid0, jnp.full((2,), 0.5))["params"]
        tx = optax.adam(args.lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, inputs, key):
            grid = encode(inputs)

            def loss_fn(p):
                return dsm_loss(
                    key, lambda x, t: model.apply({"params": p}, x, t),
                    sde, grid,
                    likelihood_weighting=not args.no_likelihood_weighting,
                    importance_sampling=args.im_sample)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        mgr = Mgr(args.ckpt_dir)
        it = BatchIterator(np.arange(len(ds)), args.batch_size, seed=args.seed)
        for epoch in range(args.epochs):
            t0, losses = time.time(), []
            for idx in it.epoch():
                i = np.asarray(idx)
                batch = (jnp.asarray(to_float01(ds.images[i])),
                         jnp.asarray(to_float01(ds.masks[i])),
                         jnp.asarray(ds.visible_attrs()[i]))
                key, sub = jax.random.split(key)
                params, opt_state, loss = step(params, opt_state, batch, sub)
                losses.append(float(loss))
            print(f"epoch {epoch}: dsm={np.mean(losses):.5f} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            mgr.save_last({"params": params})
            mgr.save_best({"params": params}, float(np.mean(losses)))
        mgr.wait()
        return

    if args.synthetic:
        from ..data import synthetic_polymnist

        pixels = synthetic_polymnist(args.synthetic_n, args.n_mod, 32, args.seed).images
    else:
        from ..data import load_polymnist

        pixels = load_polymnist(args.data_root, "train").images

    from ..train.lr import adam_with_mutable_lr

    vae = VAEConfig.polymnist(size_z=args.size_z).build_model()
    # Same optimizer as the stage-1 trainer so the checkpoint tree matches.
    fleet = VAEFleet(vae, args.n_mod, adam_with_mutable_lr(1e-3))
    import jax.numpy as jnp

    mgr = CheckpointManager(args.vae_ckpt)
    fleet_state = mgr.restore_raw("best" if mgr.exists("best") else "last")

    model = score_cfg.build_model()
    sde = score_cfg.build_sde()
    train_score_model(
        model, sde, fleet, fleet_state, pixels, score_cfg.latent_hw,
        lr=args.lr, batch_size=args.batch_size, epochs=args.epochs,
        likelihood_weighting=not args.no_likelihood_weighting,
        importance_sampling=args.im_sample, seed=args.seed,
        ckpt_dir=args.ckpt_dir, ema_decay=args.ema, resume=args.resume)


if __name__ == "__main__":
    main()
