"""z-conditioned CelebA score CLI: the ``_cond`` entry point.

Replacement for /root/reference/train_lat_celebhq_unet_cont2_cond.py: the
ADM UNet (in=3/out=3, model_channels 128, channel_mult (1,2,4,8), use_z,
z_dim 512; :651-653) learns DSM over the frozen heterogeneous latents with
a 512-d conditioning vector averaged from frozen contrastive encoders over
a random given-subset per step (get_conds :452-460), maintaining an EMA
copy (:672-674). The contrastive encoders can be pretrained in-framework
via InfoNCE (--pretrain-contrastive; the reference's training script for
them is missing upstream, SURVEY.md §2.2).

    python -m score_based_multimodal_autoencoder_tpu.cli.train_cond_score \
        --synthetic --pretrain-contrastive 3 --epochs 5
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-ckpt", default="./checkpoints/celeba_image")
    p.add_argument("--mask-ckpt", default="./checkpoints/celeba_mask")
    p.add_argument("--attr-ckpt", default="./checkpoints/celeba_attr")
    p.add_argument("--contrastive-ckpt", default="./checkpoints/contrastive")
    p.add_argument("--pretrain-contrastive", type=int, default=0,
                   help="pretrain the contrastive encoders for N epochs "
                        "before score training (writes --contrastive-ckpt)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=256)
    p.add_argument("--data-root", default=None)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--size-z", type=int, default=256)
    p.add_argument("--rep-dim", type=int, default=512,
                   help="conditioning vector width (reference: 512)")
    p.add_argument("--model-channels", type=int, default=128)
    p.add_argument("--channel-mult", default="1,2,4,8")
    p.add_argument("--sde-type", default="vpsde",
                   choices=["vpsde", "subvpsde", "vesde"])
    p.add_argument("--beta0", type=float, default=0.1)
    p.add_argument("--beta1", type=float, default=20.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ema", type=float, default=0.999)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--no-likelihood-weighting", action="store_true")
    p.add_argument("--eval-every", type=int, default=None,
                   help="run the given-set protocol every N epochs with the "
                        "EMA model")
    p.add_argument("--eval-amount", type=int, default=32)
    p.add_argument("--sample-n", type=int, default=100,
                   help="reverse-SDE steps for the in-training eval sampler")
    p.add_argument("--metrics", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all devices (DP mesh)")
    p.add_argument("--steps-per-dispatch", type=int, default=None,
                   help="fuse K optimizer steps into one lax.scan device "
                        "dispatch (identical trajectory; amortizes "
                        "dispatch latency on remote/tunneled devices). "
                        "Default: auto - 8 on TPU backends, 1 on CPU "
                        "(train.trainer.auto_steps_per_dispatch)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default="./checkpoints/cond_score")
    args = p.parse_args()

    from ..train.trainer import auto_steps_per_dispatch

    args.steps_per_dispatch = auto_steps_per_dispatch(args.steps_per_dispatch)

    import jax.numpy as jnp
    import numpy as np

    from ..data.loader import to_float01
    from ..nn.contrastive import (
        AttrRepEncoder,
        ImageRepEncoder,
        celeb_image_rep,
        celeb_mask_rep,
    )
    from ..nn.unet_adm import ADMUNet
    from ..pipeline_celeba import Modality
    from ..train.checkpoints import CheckpointManager
    from ..train.conditional_score import (
        train_cond_score_model,
        train_contrastive_encoders,
    )
    from ..train.configs import ScoreConfig, VAEConfig

    size_z = args.size_z
    hw = int(round(size_z ** 0.5))
    if args.synthetic:
        from ..data import synthetic_celeba

        tr = synthetic_celeba(args.synthetic_n, size=args.size, seed=args.seed)
        va = synthetic_celeba(max(16, args.synthetic_n // 8), size=args.size,
                              seed=args.seed + 1)
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

    # Frozen stage-1 autoencoders.
    mods = []
    for name, cfg_fn, ckpt in [
        ("image", VAEConfig.celeba_image, args.image_ckpt),
        ("mask", VAEConfig.celeba_mask, args.mask_ckpt),
        ("attr", VAEConfig.celeba_attr, args.attr_ckpt),
    ]:
        m = cfg_fn(size_z=size_z, size_in=args.size)
        mods.append(Modality(name, m.build_model(),
                             CheckpointManager(ckpt).restore_raw("last")))

    # Contrastive representation encoders (CelImgRep/CelMaskRep/CelAttrRep).
    if args.size == 128:
        rep_models = [celeb_image_rep(args.rep_dim),
                      celeb_mask_rep(args.rep_dim),
                      AttrRepEncoder(att_size=18, size_z=args.rep_dim)]
    else:  # smoke-scaled encoders for CPU drives
        rep_models = [
            ImageRepEncoder(((8, 16, 16, 2), (16, 32, 32, 2)),
                            size_in=args.size, size_z=args.rep_dim, img_ch=3),
            ImageRepEncoder(((8, 16, 16, 2), (16, 32, 32, 2)),
                            size_in=args.size, size_z=args.rep_dim, img_ch=1),
            AttrRepEncoder(att_size=18, size_z=args.rep_dim),
        ]

    if args.pretrain_contrastive:
        train_contrastive_encoders(
            rep_models, make_gather(tr), len(tr), lr=args.lr,
            batch_size=args.batch_size, epochs=args.pretrain_contrastive,
            seed=args.seed, ckpt_dir=args.contrastive_ckpt,
            resume=args.resume)
    raw = CheckpointManager(args.contrastive_ckpt).restore_raw("last")
    rep_variables = [
        {"params": p, "batch_stats": s}
        for p, s in zip(raw["params"], raw["batch_stats"])]

    score_model = ADMUNet(
        in_channels=3, model_channels=args.model_channels, out_channels=3,
        num_res_blocks=2, attention_resolutions=(), dropout=0.1,
        channel_mult=tuple(int(v) for v in args.channel_mult.split(",")),
        num_heads=1, use_z=True, z_dim=args.rep_dim)
    sde_cfg = ScoreConfig.celebhq(sde_type=args.sde_type, beta_0=args.beta0,
                                  beta_1=args.beta1, sample_n=args.sample_n)

    eval_fn = None
    if args.eval_every:
        from ..eval.celeba_protocol import celeba_protocol

        ev = make_gather(va)(np.arange(min(args.eval_amount, len(va))))

        def eval_fn(pipeline, key):
            return {r["given"] or "uncond": r for r in celeba_protocol(
                pipeline, key, *[np.asarray(x) for x in ev],
                batch_size=min(64, args.eval_amount))}

    if args.data_parallel:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
    else:
        mesh = None
    train_cond_score_model(
        score_model, sde_cfg.build_sde(), mods, rep_models, rep_variables,
        make_gather(tr), len(tr), hw,
        gather_val=make_gather(va), n_val=len(va),
        lr=args.lr, batch_size=args.batch_size, epochs=args.epochs,
        likelihood_weighting=not args.no_likelihood_weighting,
        ema_decay=args.ema, seed=args.seed, ckpt_dir=args.ckpt_dir,
        eval_every=args.eval_every, eval_fn=eval_fn,
        metrics_path=args.metrics, resume=args.resume, mesh=mesh,
        steps_per_dispatch=args.steps_per_dispatch)


if __name__ == "__main__":
    main()
