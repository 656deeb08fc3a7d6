"""Stage-2 CLI: train the joint latent score UNet over frozen VAE latents.

Replacement for /root/reference/train_poly_unet_cont.py (PolyMNIST) and
/root/reference/train_lat_celebhq_unet_cont2.py (CelebA): one fused XLA
program per optimizer step encodes all modalities and takes a DSM step.
Validation DSM over the full val split keys the best checkpoint
(train_poly_unet_cont.py:663-690); --eval-every runs the quantitative
conditional protocol in-training (calc_poly_cond / calc_perf,
train_poly_unet_cont.py:692-723, train_lat_celebhq_unet_cont2.py:559-561).

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
    p.add_argument("--size", type=int, default=128,
                   help="celebhq input resolution (128 = reference)")
    p.add_argument("--dim", type=int, default=128,
                   help="score UNet base width (reference: 128 poly / 256 celeb)")
    p.add_argument("--dim-mults", default=None,
                   help="comma list overriding the preset's per-level width "
                        "multipliers (e.g. '1,2' for smoke grids)")
    p.add_argument("--tpu-preset", action="store_true",
                   help="MXU-aligned stem + fused Pallas GroupNorms "
                        "(ScoreConfig.*_tpu)")
    p.add_argument("--beta0", type=float, default=0.1)
    p.add_argument("--beta1", type=float, default=20.0)
    p.add_argument("--sde-type", default="vpsde",
                   choices=["vpsde", "subvpsde", "vesde"])
    p.add_argument("--track", default="sde", choices=["sde", "ae"],
                   help="'ae' trains the sigma-index-conditioned NCSN score "
                        "net over the AE-track latents (consumed by the "
                        "annealed-Langevin samplers, fid_upd10.py:85-110); "
                        "point --vae-ckpt at a --vae-type ae fleet")
    p.add_argument("--sigma-max", type=float, default=5.0)
    p.add_argument("--sigma-min", type=float, default=0.1)
    p.add_argument("--sigma-levels", type=int, default=None,
                   help="NCSN grid size (default: 200 polymnist / "
                        "500 celebhq, the reference grids)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--no-likelihood-weighting", action="store_true")
    p.add_argument("--im-sample", action="store_true",
                   help="importance-sampled time (likelihood weighting)")
    p.add_argument("--ema", type=float, default=None)
    p.add_argument("--eval-every", type=int, default=None,
                   help="run the quantitative conditional protocol every N "
                        "epochs (reference: every 500)")
    p.add_argument("--eval-amount", type=int, default=64)
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--metrics", default=None, help="JSONL metrics path")
    p.add_argument("--resume", action="store_true",
                   help="continue from the last checkpoint in --ckpt-dir")
    p.add_argument("--steps-per-dispatch", type=int, default=None,
                   help="fuse K optimizer steps into one lax.scan device "
                        "dispatch (identical trajectory; amortizes "
                        "dispatch latency on remote/tunneled devices). "
                        "Default: auto - 8 on TPU backends, 1 on CPU "
                        "(train.trainer.auto_steps_per_dispatch)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all devices (DP mesh over ICI; "
                        "params replicated, gradient all-reduce by XLA)")
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="checkpoint every N epochs (1 = reference parity; "
                        "at flagship scale each save is ~500 MB of orbax "
                        "writes - raise for long runs)")
    p.add_argument("--host-data", action="store_true",
                   help="keep the training array on host and gather "
                        "batches on CPU (default: auto device-resident "
                        "data on TPU backends - the whole uint8 array "
                        "lives in HBM and each step gathers on device)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default="./checkpoints/score")
    args = p.parse_args()

    from ..train.trainer import auto_steps_per_dispatch

    args.steps_per_dispatch = auto_steps_per_dispatch(args.steps_per_dispatch)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.loader import to_float01
    from ..parallel.fleet import VAEFleet
    from ..train.checkpoints import CheckpointManager
    from ..train.configs import ScoreConfig, VAEConfig
    from ..train.lr import adam_with_mutable_lr
    from ..train.trainer import train_het_score_model, train_score_model

    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)

    ncsn_sigmas = None
    if args.track == "ae":
        levels = args.sigma_levels or (
            500 if args.preset == "celebhq" else 200)
        ncsn_sigmas = np.linspace(args.sigma_max, args.sigma_min, levels)

    if args.preset == "celebhq":
        # Three heterogeneous frozen VAEs -> (B, hw, hw, 3) latent grid ->
        # DSM (train_lat_celebhq_unet_cont2.py:376-561).
        from ..pipeline_celeba import Modality

        size_z = args.size_z if args.size_z != 64 else 256
        hw = int(round(size_z ** 0.5))
        if args.synthetic:
            from ..data import synthetic_celeba

            tr = synthetic_celeba(args.synthetic_n, size=args.size,
                                  seed=args.seed)
            va = synthetic_celeba(max(16, args.synthetic_n // 8),
                                  size=args.size, seed=args.seed + 1)
        else:
            from ..data import load_celeba_hq

            tr = load_celeba_hq(args.data_root, "train")
            va = load_celeba_hq(args.data_root, "val")

        def make_gather(ds):
            def gather(idx):
                return (jnp.asarray(to_float01(ds.images[idx])),
                        jnp.asarray(to_float01(ds.masks[idx])),
                        jnp.asarray(ds.visible_attrs()[idx]))
            return gather

        mods = []
        for name, cfg_fn, ckpt in [
            ("image", VAEConfig.celeba_image, args.image_ckpt),
            ("mask", VAEConfig.celeba_mask, args.mask_ckpt),
            ("attr", VAEConfig.celeba_attr, args.attr_ckpt),
        ]:
            m = cfg_fn(size_z=size_z, size_in=args.size)
            mods.append(Modality(name, m.build_model(),
                                 CheckpointManager(ckpt).restore_raw("last")))

        cfg_fn = ScoreConfig.celebhq_tpu if args.tpu_preset else ScoreConfig.celebhq
        extra = ({"dim_mults": tuple(int(v) for v in args.dim_mults.split(","))}
                 if args.dim_mults else {})
        score_cfg = cfg_fn(sde_type=args.sde_type, beta_0=args.beta0,
                           beta_1=args.beta1, dim=args.dim, latent_hw=hw,
                           **extra)

        eval_fn = None
        if args.eval_every:
            from ..eval.celeba_protocol import celeba_protocol

            feature_fn = None
            if args.inception_weights:
                from ..eval.inception import make_inception_feature_fn

                feature_fn = make_inception_feature_fn(args.inception_weights)
            ev = make_gather(va)(np.arange(min(args.eval_amount, len(va))))

            def eval_fn(pipeline, key):
                return {r["given"] or "uncond": r for r in celeba_protocol(
                    pipeline, key, *[np.asarray(x) for x in ev],
                    feature_fn=feature_fn,
                    batch_size=min(64, args.eval_amount))}

        train_het_score_model(
            score_cfg.build_model(), score_cfg.build_sde(), mods,
            make_gather(tr), len(tr), hw,
            gather_val=make_gather(va), n_val=len(va),
            lr=args.lr, batch_size=args.batch_size, epochs=args.epochs,
            likelihood_weighting=not args.no_likelihood_weighting,
            importance_sampling=args.im_sample, seed=args.seed,
            ckpt_dir=args.ckpt_dir, ema_decay=args.ema,
            eval_every=args.eval_every, eval_fn=eval_fn,
            metrics_path=args.metrics, resume=args.resume, mesh=mesh,
            ncsn_sigmas=ncsn_sigmas,
            steps_per_dispatch=args.steps_per_dispatch,
            ckpt_every=args.ckpt_every)
        return

    if args.synthetic:
        from ..data import synthetic_polymnist

        tr_ds = synthetic_polymnist(args.synthetic_n, args.n_mod, 32, args.seed)
        va_ds = synthetic_polymnist(max(32, args.synthetic_n // 8), args.n_mod,
                                    32, args.seed + 1)
        pixels, pixels_val = tr_ds.images, va_ds.images
        eval_pixels, eval_labels = va_ds.images, va_ds.labels
    else:
        from ..data import load_polymnist

        pixels = load_polymnist(args.data_root, "train").images
        va_ds = load_polymnist(args.data_root, "val")
        pixels_val, eval_pixels, eval_labels = va_ds.images, va_ds.images, va_ds.labels

    cfg_fn = ScoreConfig.polymnist_tpu if args.tpu_preset else ScoreConfig.polymnist
    extra = ({"dim_mults": tuple(int(v) for v in args.dim_mults.split(","))}
             if args.dim_mults else {})
    score_cfg = cfg_fn(sde_type=args.sde_type, beta_0=args.beta0,
                       beta_1=args.beta1, channels=args.n_mod, dim=args.dim,
                       **extra)

    vae = VAEConfig.polymnist(size_z=args.size_z).build_model()
    # Same optimizer as the stage-1 trainer so the checkpoint tree matches.
    fleet = VAEFleet(vae, args.n_mod, adam_with_mutable_lr(1e-3))
    mgr = CheckpointManager(args.vae_ckpt)
    fleet_state = mgr.restore_raw("best" if mgr.exists("best") else "last")

    eval_fn = None
    if args.eval_every:
        # In-training conditional protocol: generate every modality given
        # m0, report per-target FID (+ coherence when a classifier ckpt is
        # wired via cli.evaluate) - train_poly_unet_cont.py:692-723.
        from ..eval.protocols import conditional_protocol

        feature_fn = None
        if args.inception_weights:
            from ..eval.inception import make_inception_feature_fn

            feature_fn = make_inception_feature_fn(args.inception_weights)
        else:
            from ..eval.fid import proxy_feature_fn as feature_fn
        amt = min(args.eval_amount, eval_pixels.shape[1])
        ep = jnp.asarray(to_float01(eval_pixels[:, :amt]))
        el = jnp.asarray(eval_labels[:amt])

        def eval_fn(pipeline, key):
            return conditional_protocol(
                pipeline, key, ep, el,
                predicted_mods=list(range(1, args.n_mod)),
                feature_fn=feature_fn, batch_size=amt)

    model = score_cfg.build_model()
    sde = score_cfg.build_sde()
    train_score_model(
        model, sde, fleet, fleet_state, pixels, score_cfg.latent_hw,
        pixels_val=pixels_val,
        lr=args.lr, batch_size=args.batch_size, epochs=args.epochs,
        likelihood_weighting=not args.no_likelihood_weighting,
        importance_sampling=args.im_sample, seed=args.seed,
        ckpt_dir=args.ckpt_dir, ema_decay=args.ema,
        eval_every=args.eval_every, eval_fn=eval_fn,
        metrics_path=args.metrics, resume=args.resume, mesh=mesh,
        ncsn_sigmas=ncsn_sigmas,
        steps_per_dispatch=args.steps_per_dispatch,
        device_data=False if args.host_data else None,
        ckpt_every=args.ckpt_every)


if __name__ == "__main__":
    main()
