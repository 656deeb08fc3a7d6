"""CelebA qualitative generation CLI: grids for every given-set.

Replacement for /root/reference/plt_celebhq_all.py: for each given-set in
{'', '0', '1', '2', '01', '02', '12'} generate the missing modalities with
the channel-clamped sampler, compose image/mask panels (attributes printed
as text), optionally sharpen images with the DiffuseVAE refiner.

    python -m score_based_multimodal_autoencoder_tpu.cli.sample_celeba \
        --image-ckpt ... --mask-ckpt ... --attr-ckpt ... --score-ckpt ... \
        --synthetic --amount 6 --out-dir ./grids
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-ckpt", default="./checkpoints/celeba_image")
    p.add_argument("--mask-ckpt", default="./checkpoints/celeba_mask")
    p.add_argument("--attr-ckpt", default="./checkpoints/celeba_attr")
    p.add_argument("--score-ckpt", default="./checkpoints/celeba_score")
    p.add_argument("--refiner-ckpt", default=None,
                   help="optional DiffuseVAE refiner checkpoint")
    p.add_argument("--refiner-channels", type=int, default=128)
    p.add_argument("--refiner-mult", default="1,2,2,3,4")
    p.add_argument("--refiner-timesteps", type=int, default=1000)
    p.add_argument("--size-z", type=int, default=256)
    p.add_argument("--amount", type=int, default=6)
    p.add_argument("--given-sets", default=",0,1,2,01,02,12")
    p.add_argument("--noise-obs", action="store_true")
    p.add_argument("--pc", action="store_true")
    p.add_argument("--sample-n", type=int, default=1000,
                   help="reverse-SDE steps (reference CelebA default 1000)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data-root", default=None)
    p.add_argument("--tpu-preset", action="store_true",
                   help="checkpoint was trained with ScoreConfig.*_tpu "
                        "(128-stem + MXU depthwise)")
    p.add_argument("--data-parallel", action="store_true",
                   help="DP-shard generation over all visible devices "
                        "(the device count must divide the batch/amount; "
                        "non-divisible batches fall back to one device)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", default="./grids")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.loader import to_float01
    from ..pipeline_celeba import HeterogeneousPipeline, Modality
    from ..train.checkpoints import CheckpointManager
    from ..train.configs import ScoreConfig, VAEConfig
    from ..utils.images import save_modality_grid

    if args.synthetic:
        from ..data import synthetic_celeba

        ds = synthetic_celeba(args.amount, size=128, seed=args.seed)
    else:
        from ..data import load_celeba_hq

        ds = load_celeba_hq(args.data_root, "test", limit=args.amount)
    images = jnp.asarray(to_float01(ds.images[: args.amount]))
    masks = jnp.asarray(to_float01(ds.masks[: args.amount]))
    attrs = jnp.asarray(ds.visible_attrs()[: args.amount])

    mods = []
    for name, cfg_fn, ckpt in [
        ("image", VAEConfig.celeba_image, args.image_ckpt),
        ("mask", VAEConfig.celeba_mask, args.mask_ckpt),
        ("attr", VAEConfig.celeba_attr, args.attr_ckpt),
    ]:
        cfg = cfg_fn(size_z=args.size_z)
        mods.append(Modality(name, cfg.build_model(),
                             CheckpointManager(ckpt).restore_raw("last")))

    cfg_fn = (ScoreConfig.celebhq_tpu if args.tpu_preset
              else ScoreConfig.celebhq)
    score_cfg = cfg_fn(sample_n=args.sample_n)
    score_model = score_cfg.build_model(sample=True)
    score = CheckpointManager(args.score_ckpt).restore_raw("last")
    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)  # all devices on the 'data' axis
    pipe = HeterogeneousPipeline(
        modalities=mods, score_model=score_model,
        score_params=score["params"], sde=score_cfg.build_sde(sample=True),
        latent_hw=score_cfg.latent_hw,
        sampler_kwargs={"pc": args.pc, "noise_obs": args.noise_obs},
        mesh=mesh)

    refiner = refiner_params = schedule = None
    if args.refiner_ckpt:
        # DiffuseVAE sharpening of the generated image modality
        # (plt_celebhq_all.py:222-343, eval_lat_celeba_hq_all.py:72-122).
        from ..diffusion.ddpm import DDPMSchedule
        from ..nn.unet_adm import ADMUNet

        refiner = ADMUNet(
            in_channels=6, model_channels=args.refiner_channels,
            out_channels=3, num_res_blocks=2, attention_resolutions=(16,),
            channel_mult=tuple(int(v) for v in args.refiner_mult.split(",")),
            num_heads=8)
        refiner_params = CheckpointManager(
            args.refiner_ckpt).restore_raw("last")["params"]
        schedule = DDPMSchedule(timesteps=args.refiner_timesteps)

    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.key(args.seed)
    for given in args.given_sets.split(","):
        key, sub = jax.random.split(key)
        observed = [str(i) in given for i in range(3)]
        if given:
            outs = pipe.sample_conditional(sub, [images, masks, attrs], observed)
        else:
            outs = pipe.sample_unconditional(sub, args.amount)
        img, msk, att = outs
        if refiner is not None:
            key, rkey = jax.random.split(key)
            img = pipe.refine_images(rkey, jnp.clip(img, 0, 1), refiner,
                                     refiner_params, schedule)
        panel = jnp.stack([
            images, jnp.clip(img, 0, 1),
            jnp.repeat(masks, 3, -1), jnp.repeat(jnp.clip(msk, 0, 1), 3, -1),
        ])
        tag = given or "none"
        save_modality_grid(np.asarray(panel),
                           os.path.join(args.out_dir, f"given_{tag}.png"))
        probs = np.asarray(jax.nn.sigmoid(att))
        np.savetxt(os.path.join(args.out_dir, f"given_{tag}_attrs.txt"),
                   np.stack([np.asarray(attrs[0]), probs[0]]), fmt="%.2f",
                   header="row0=true attrs(sample0) row1=generated probs")
        print(f"wrote given_{tag}.png", flush=True)


if __name__ == "__main__":
    main()
