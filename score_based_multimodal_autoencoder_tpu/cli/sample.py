"""Generation CLI: unconditional or any-subset conditional sampling.

Replaces the eval-only sampling paths of
/root/reference/train_poly_unet_cont.py:736-747: loads stage-1/stage-2
checkpoints, runs the fused reverse-SDE sampler, writes a PNG grid.

    python -m score_based_multimodal_autoencoder_tpu.cli.sample \
        --vae-ckpt ./checkpoints/vae_fleet --score-ckpt ./checkpoints/score \
        --given 0 --amount 16 --out samples.png
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vae-ckpt", default="./checkpoints/vae_fleet")
    p.add_argument("--score-ckpt", default="./checkpoints/score")
    p.add_argument("--preset", default="polymnist", choices=["polymnist"])
    p.add_argument("--n-mod", type=int, default=10)
    p.add_argument("--size-z", type=int, default=64)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--amount", type=int, default=16)
    p.add_argument("--given", default="",
                   help="observed modality indices, e.g. '05'; empty = unconditional")
    p.add_argument("--noise-obs", action="store_true")
    p.add_argument("--pc", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="take observed pixels from the synthetic fixture")
    p.add_argument("--data-root", default=None)
    p.add_argument("--tpu-preset", action="store_true",
                   help="checkpoint was trained with ScoreConfig.*_tpu "
                        "(128-stem + MXU depthwise)")
    p.add_argument("--data-parallel", action="store_true",
                   help="DP-shard generation over all visible devices "
                        "(the device count must divide the amount/batch; "
                        "non-divisible batches fall back to one device)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="samples.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.loader import to_float01
    from ..parallel.fleet import VAEFleet
    from ..pipeline import SBMAEPipeline
    from ..train.checkpoints import CheckpointManager
    from ..train.configs import ScoreConfig, VAEConfig

    from ..train.lr import adam_with_mutable_lr

    cfg_fn = (ScoreConfig.polymnist_tpu if args.tpu_preset
              else ScoreConfig.polymnist)
    score_cfg = cfg_fn(channels=args.n_mod, dim=args.dim)
    vae = VAEConfig.polymnist(size_z=args.size_z).build_model()
    fleet = VAEFleet(vae, args.n_mod, adam_with_mutable_lr(1e-3))
    fleet_state = CheckpointManager(args.vae_ckpt).restore_raw("last")

    model = score_cfg.build_model(sample=True)
    grid0 = jnp.zeros((1, score_cfg.latent_hw, score_cfg.latent_hw, args.n_mod))
    score = CheckpointManager(args.score_ckpt).restore_raw("last")

    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)  # all devices on the 'data' axis
    pipeline = SBMAEPipeline(
        fleet=fleet, fleet_state=fleet_state, score_model=model,
        score_params=score["params"], sde=score_cfg.build_sde(sample=True),
        latent_hw=score_cfg.latent_hw,
        sampler_kwargs={"pc": args.pc}, mesh=mesh)

    key = jax.random.key(args.seed)
    if args.given:
        given = [int(c) for c in args.given]
        predicted = [m for m in range(args.n_mod) if m not in given]
        if args.synthetic:
            from ..data import synthetic_polymnist

            px = synthetic_polymnist(args.amount, args.n_mod, 32, args.seed).images
        else:
            from ..data import load_polymnist

            px = load_polymnist(args.data_root, "test").images[:, : args.amount]
        pixels = jnp.asarray(to_float01(px))
        out = pipeline.sample_conditional(
            key, pixels, predicted, noise_obs=args.noise_obs)
    else:
        out = pipeline.sample_unconditional(key, args.amount)

    # (n_mod, B, H, W, C) -> one PNG grid: rows = modalities, cols = samples.
    arr = np.asarray(out)
    n_mod, B, H, W, C = arr.shape
    grid = arr.transpose(0, 2, 1, 3, 4).reshape(n_mod * H, B * W, C)
    from PIL import Image

    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(args.out)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
