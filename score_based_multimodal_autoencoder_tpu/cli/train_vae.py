"""Stage-1 CLI: train the per-modality VAE fleet.

TPU-native replacement for the reference's per-modality training processes
(/root/reference/train_polyupd.py, /root/reference/train_poly.sh:5-14): ALL
modalities train simultaneously as one vmapped program.

    python -m score_based_multimodal_autoencoder_tpu.cli.train_vae \
        --dataset polymnist --data-root ./data/Upd10MMNIST --beta 0.5

Use --synthetic for the bundled synthetic fixture (no dataset archive).
"""

import argparse



def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="polymnist",
                   choices=["polymnist", "celeba_image", "celeba_mask", "celeba_attr"])
    p.add_argument("--data-root", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=512)
    p.add_argument("--n-mod", type=int, default=10)
    p.add_argument("--vae-type", default="vae", choices=["vae", "ae"],
                   help="'ae' = regularized deterministic AE track "
                        "(train_polyupdAE.py)")
    p.add_argument("--size-z", type=int, default=64)
    p.add_argument("--size", type=int, default=128,
                   help="celeba input resolution (128 = reference)")
    p.add_argument("--beta", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--resume", action="store_true",
                   help="continue from the resume checkpoint in --ckpt-dir")
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
    p.add_argument("--ckpt-dir", default="./checkpoints/vae_fleet")
    args = p.parse_args()

    from ..train.trainer import auto_steps_per_dispatch

    args.steps_per_dispatch = auto_steps_per_dispatch(args.steps_per_dispatch)

    from ..train.configs import VAEConfig
    from ..train.trainer import train_single_vae, train_vae_fleet

    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)

    if args.dataset == "polymnist":
        cfg = VAEConfig.polymnist(size_z=args.size_z, beta=args.beta)
    else:
        cfg = {
            "celeba_image": VAEConfig.celeba_image,
            "celeba_mask": VAEConfig.celeba_mask,
            "celeba_attr": VAEConfig.celeba_attr,
        }[args.dataset](size_z=args.size_z, beta=args.beta, size_in=args.size)
    model = cfg.build_model()

    if args.dataset != "polymnist":
        # Heterogeneous CelebA modalities train one at a time
        # (reference scripts train_celeba_{res,mask,attr}_hq.py).
        if args.synthetic:
            from ..data import synthetic_celeba

            tr = synthetic_celeba(args.synthetic_n, size=args.size,
                                  seed=args.seed)
            va = synthetic_celeba(max(32, args.synthetic_n // 8),
                                  size=args.size, seed=args.seed + 1)
        else:
            from ..data import load_celeba_hq

            tr = load_celeba_hq(args.data_root, "train")
            va = load_celeba_hq(args.data_root, "val")
        field = {"celeba_image": "images", "celeba_mask": "masks"}.get(args.dataset)
        if field:
            train_arr, val_arr = getattr(tr, field), getattr(va, field)
        else:
            train_arr, val_arr = tr.visible_attrs(), va.visible_attrs()
        train_single_vae(
            model, train_arr, val_arr, beta=args.beta, lr=args.lr,
            batch_size=args.batch_size, epochs=args.epochs, seed=args.seed,
            ckpt_dir=args.ckpt_dir, resume=args.resume, mesh=mesh,
            steps_per_dispatch=args.steps_per_dispatch)
        return

    if args.synthetic:
        from ..data import synthetic_polymnist

        train = synthetic_polymnist(args.synthetic_n, args.n_mod, 32, args.seed)
        val = synthetic_polymnist(max(64, args.synthetic_n // 8), args.n_mod, 32,
                                  args.seed + 1)
        px_train, px_val = train.images, val.images
    else:
        from ..data import load_polymnist

        px_train = load_polymnist(args.data_root, "train").images
        px_val = load_polymnist(args.data_root, "val").images

    train_vae_fleet(
        model, px_train, px_val, beta=args.beta, lr=args.lr,
        batch_size=args.batch_size, epochs=args.epochs, seed=args.seed,
        ckpt_dir=args.ckpt_dir, loss_type=args.vae_type, resume=args.resume,
        mesh=mesh, steps_per_dispatch=args.steps_per_dispatch,
        device_data=False if args.host_data else None,
        ckpt_every=args.ckpt_every)


if __name__ == "__main__":
    main()
