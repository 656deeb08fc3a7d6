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
    p.add_argument("--data-root", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=512)
    p.add_argument("--n-mod", type=int, default=10)
    p.add_argument("--size-z", type=int, default=64)
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
                   beta_1=args.beta1, channels=args.n_mod)

    if args.preset != "polymnist":
        raise SystemExit(
            "CelebA stage-2 CLI lands with the CelebA pipeline; use the "
            "python API (train.trainer.train_score_model) meanwhile.")

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
        ckpt_dir=args.ckpt_dir, ema_decay=args.ema)


if __name__ == "__main__":
    main()
