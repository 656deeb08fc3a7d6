"""DiffuseVAE refiner CLI: train the conditional pixel-sharpening DDPM.

Replacement for /root/reference/train_celeba_diffvae.py: the ADM UNet
(in=6 / out=3, channel_mult (1,2,2,3,4), model_channels 128,
train_celeba_diffvae.py:248) learns eps-prediction conditioned on the
frozen image VAE's reconstruction; the trained checkpoint plugs into
pipeline_celeba.refine_images / cli.sample_celeba --refiner-ckpt
(eval_lat_celeba_hq_all.py:448, :72-122).

    python -m score_based_multimodal_autoencoder_tpu.cli.train_refiner \
        --image-ckpt ./checkpoints/celeba_image --synthetic --epochs 5
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-ckpt", default="./checkpoints/celeba_image")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=256)
    p.add_argument("--data-root", default=None)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--size-z", type=int, default=256)
    p.add_argument("--model-channels", type=int, default=128)
    p.add_argument("--channel-mult", default="1,2,2,3,4")
    p.add_argument("--num-res-blocks", type=int, default=2)
    p.add_argument("--attention-resolutions", default="16")
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--sample-every", type=int, default=None)
    p.add_argument("--sample-dir", default=".")
    p.add_argument("--metrics", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all devices (DP mesh)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default="./checkpoints/refiner")
    args = p.parse_args()

    from ..diffusion.ddpm import DDPMSchedule
    from ..nn.unet_adm import ADMUNet
    from ..train.checkpoints import CheckpointManager
    from ..train.configs import VAEConfig
    from ..train.refiner import train_refiner

    if args.synthetic:
        from ..data import synthetic_celeba

        tr = synthetic_celeba(args.synthetic_n, size=args.size, seed=args.seed)
        va = synthetic_celeba(max(8, args.synthetic_n // 8), size=args.size,
                              seed=args.seed + 1)
    else:
        from ..data import load_celeba_hq

        tr = load_celeba_hq(args.data_root, "train")
        va = load_celeba_hq(args.data_root, "val")

    vae_cfg = VAEConfig.celeba_image(size_z=args.size_z, size_in=args.size)
    image_vae = vae_cfg.build_model()
    vae_vars = CheckpointManager(args.image_ckpt).restore_raw("last")

    # UNetModel(in_channels=6, model_channels=128, out_channels=3,
    # num_res_blocks=2, attention_resolutions=(16,), dropout=0.1,
    # channel_mult=(1,2,2,3,4), num_heads=8) - train_celeba_diffvae.py:248.
    attn = tuple(int(v) for v in args.attention_resolutions.split(",") if v)
    refiner = ADMUNet(
        in_channels=6, model_channels=args.model_channels, out_channels=3,
        num_res_blocks=args.num_res_blocks, attention_resolutions=attn,
        dropout=args.dropout,
        channel_mult=tuple(int(v) for v in args.channel_mult.split(",")),
        num_heads=args.num_heads)
    schedule = DDPMSchedule(timesteps=args.timesteps)

    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)
    train_refiner(
        refiner, schedule, image_vae, vae_vars, tr.images, va.images,
        lr=args.lr, batch_size=args.batch_size, epochs=args.epochs,
        seed=args.seed, ckpt_dir=args.ckpt_dir,
        sample_every=args.sample_every, sample_dir=args.sample_dir,
        metrics_path=args.metrics, resume=args.resume, mesh=mesh)


if __name__ == "__main__":
    main()
