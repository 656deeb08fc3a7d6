"""CelebA quantitative evaluation CLI: the 7-given-set x model sweep.

Replacement for /root/reference/eval_lat_celeba_hq_all.py:498-528: for each
given-set in {'', '0', '1', '2', '01', '02', '12'} and each model (the
two-stage score pipeline plus any multimodal-VAE baselines), generate the
missing modalities and report image FID (when the image is generated),
mask F1/accuracy and attribute F1/accuracy - the reference's per-cell
table - plus an optional FGSM adversarial row
(train_lat_celebhq_unet_cont2_cond.py:61-78,434-445).

    python -m score_based_multimodal_autoencoder_tpu.cli.evaluate_celeba \
        --image-ckpt ... --mask-ckpt ... --attr-ckpt ... --score-ckpt ... \
        --baseline mopoe=./ckpt_mopoe --synthetic --amount 64
"""

import argparse
import json
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-ckpt", default="./checkpoints/celeba_image")
    p.add_argument("--mask-ckpt", default="./checkpoints/celeba_mask")
    p.add_argument("--attr-ckpt", default="./checkpoints/celeba_attr")
    p.add_argument("--score-ckpt", default=None,
                   help="latent score UNet checkpoint (omit to sweep only "
                        "baselines)")
    p.add_argument("--baseline", action="append", default=[],
                   metavar="MIXTYPE=CKPT",
                   help="repeatable: mopoe=PATH | mvt=PATH | mmplus=PATH")
    p.add_argument("--given-sets", default=",0,1,2,01,02,12")
    p.add_argument("--amount", type=int, default=256)
    p.add_argument("--size", type=int, default=128,
                   help="input resolution (128 = reference)")
    p.add_argument("--size-z", type=int, default=256)
    p.add_argument("--dim", type=int, default=256,
                   help="score UNet width (reference celebhq: 256)")
    p.add_argument("--dim-mults", default=None,
                   help="comma list overriding the preset width multipliers")
    p.add_argument("--latent-dim-w", type=int, default=32)
    p.add_argument("--latent-dim-z", type=int, default=32)
    p.add_argument("--sample-n", type=int, default=1000)
    p.add_argument("--noise-obs", action="store_true")
    p.add_argument("--pc", action="store_true")
    p.add_argument("--track", default="sde",
                   choices=["sde", "annealed-vae", "annealed-ae"],
                   help="annealed-* evaluates through sigma-annealed "
                        "Langevin with the reference's per-given-set tuned "
                        "(er, c) grids (eval_lat_celeba_hq_all.py:211-343, "
                        ":498-513); --score-ckpt must be a --track ae "
                        "sigma-score net and the stage-1 ckpts the matching "
                        "VAE/AE track")
    p.add_argument("--sigma-levels", type=int, default=500)
    p.add_argument("--iter-num", type=int, default=2)
    p.add_argument("--fid", default="inception",
                   choices=["inception", "proxy", "none"],
                   help="'none' skips image FID; 'proxy' uses cheap "
                        "pixel-moment features (CI-sized smoke runs)")
    p.add_argument("--fid-n-times", type=int, default=1,
                   help="regenerate each cell N times; report mean +/- std "
                        "(the reference's fid_n_times=5 protocol, "
                        "fid_upd10.py:556-587)")
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--refiner-ckpt", default=None,
                   help="DiffuseVAE refiner checkpoint: adds the refined "
                        "image-FID column (eval_lat_celeba_hq_all.py:72-122)")
    p.add_argument("--refiner-channels", type=int, default=128)
    p.add_argument("--refiner-mult", default="1,2,2,3,4")
    p.add_argument("--refiner-res-blocks", type=int, default=2)
    p.add_argument("--refiner-attn", default="16",
                   help="comma list of attention resolutions ('' for none)")
    p.add_argument("--refiner-timesteps", type=int, default=1000)
    p.add_argument("--clf-ckpt", default=None,
                   help="attr classifier checkpoint: adds the FGSM row")
    p.add_argument("--fgsm-eps", type=float, default=0.02)
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
    p.add_argument("--out", default=None, help="JSONL output path")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.loader import to_float01
    from ..eval.baseline_adapter import HetBaselineSampler
    from ..eval.celeba_protocol import celeba_protocol, fgsm_attack_f1
    from ..pipeline_celeba import HeterogeneousPipeline, Modality
    from ..train.checkpoints import CheckpointManager
    from ..train.configs import ScoreConfig, VAEConfig
    from ..models.vae import AttributeVAE, celeba_image_vae, celeba_mask_vae

    if args.synthetic:
        from ..data import synthetic_celeba

        ds = synthetic_celeba(args.amount, size=args.size, seed=args.seed + 7)
    else:
        from ..data import load_celeba_hq

        ds = load_celeba_hq(args.data_root, "test", limit=args.amount)
    images = np.asarray(to_float01(ds.images[: args.amount]))
    masks = np.asarray(to_float01(ds.masks[: args.amount]))
    attrs = np.asarray(ds.visible_attrs()[: args.amount])

    feature_fn = None
    if args.fid == "inception":
        from ..eval.inception import make_inception_feature_fn

        feature_fn = make_inception_feature_fn(args.inception_weights)
    elif args.fid == "proxy":
        from ..eval.fid import proxy_feature_fn as feature_fn

    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)  # all devices on 'data'
    if mesh is not None and not args.score_ckpt:
        # Only the score pipelines shard generation; the baseline samplers
        # run single-device regardless - say so instead of silently
        # ignoring the flag.
        print("[evaluate_celeba] --data-parallel: no --score-ckpt given; "
              "baseline generation runs single-device (FID feature "
              "extraction still shards over all devices)", file=sys.stderr)
    refine_fn = None
    if args.refiner_ckpt:
        # DiffuseVAE sharpening of the generated image modality before FID,
        # the reference's quantitative-eval refinement
        # (eval_lat_celeba_hq_all.py:72-122, refiner built at :448); loaded
        # exactly as cli/sample_celeba.py does for the qualitative grids.
        from ..diffusion.ddpm import DDPMSchedule, ddpm_refiner_sample
        from ..nn.unet_adm import ADMUNet

        refiner = ADMUNet(
            in_channels=6, model_channels=args.refiner_channels,
            out_channels=3, num_res_blocks=args.refiner_res_blocks,
            attention_resolutions=tuple(
                int(v) for v in args.refiner_attn.split(",") if v),
            channel_mult=tuple(int(v) for v in args.refiner_mult.split(",")),
            num_heads=8)
        refiner_params = CheckpointManager(
            args.refiner_ckpt).restore_raw("last")["params"]
        schedule = DDPMSchedule(timesteps=args.refiner_timesteps)

        # Refiner params ride as a jit argument (a closure would bake the
        # ADM UNet weights into the HLO; see pipeline_celeba note).
        @jax.jit
        def _refine(key, images01, refiner_params):
            cond = 2.0 * images01 - 1.0

            def denoise_fn(x_and_cond, t):
                return refiner.apply({"params": refiner_params}, x_and_cond, t)

            out = ddpm_refiner_sample(key, denoise_fn, schedule, cond,
                                      cond.shape)
            return jnp.clip((out + 1.0) / 2.0, 0.0, 1.0)

        def refine_fn(key, images01):
            return _refine(key, jnp.asarray(images01), refiner_params)

    models = {}
    if args.score_ckpt:
        mods = []
        for name, cfg_fn, ckpt in [
            ("image", VAEConfig.celeba_image, args.image_ckpt),
            ("mask", VAEConfig.celeba_mask, args.mask_ckpt),
            ("attr", VAEConfig.celeba_attr, args.attr_ckpt),
        ]:
            cfg = cfg_fn(size_z=args.size_z, size_in=args.size)
            mods.append(Modality(name, cfg.build_model(),
                                 CheckpointManager(ckpt).restore_raw("last")))
        hw = int(round(args.size_z ** 0.5))
        extra = ({"dim_mults": tuple(int(v) for v in args.dim_mults.split(","))}
                 if args.dim_mults else {})
        cfg_fn = (ScoreConfig.celebhq_tpu if args.tpu_preset
                  else ScoreConfig.celebhq)
        score_cfg = cfg_fn(sample_n=args.sample_n, dim=args.dim,
                                        latent_hw=hw, **extra)
        score = CheckpointManager(args.score_ckpt).restore_raw("last")
        if args.track.startswith("annealed"):
            from ..pipeline_celeba import AnnealedHeterogeneousPipeline

            models["score"] = AnnealedHeterogeneousPipeline(
                modalities=mods, score_model=score_cfg.build_model(sample=True),
                score_params=score["params"], sde=None, latent_hw=hw,
                n_levels=args.sigma_levels, iter_num=args.iter_num,
                track=args.track.split("-")[1], mesh=mesh)
        else:
            models["score"] = HeterogeneousPipeline(
                modalities=mods, score_model=score_cfg.build_model(sample=True),
                score_params=score["params"],
                sde=score_cfg.build_sde(sample=True), latent_hw=hw,
                sampler_kwargs={"pc": args.pc, "noise_obs": args.noise_obs},
                mesh=mesh)

    for spec in args.baseline:
        mix_type, _, ckpt = spec.partition("=")
        if mix_type not in ("mopoe", "mvt", "mmplus") or not ckpt:
            raise SystemExit(f"--baseline {spec}: expected "
                             "{mopoe|mvt|mmplus}=CKPT_DIR")
        variables = CheckpointManager(ckpt).restore_raw("last")
        if mix_type == "mmplus":
            from ..models.baselines.mmplus_het import HeterogeneousMMVAEPlus

            dim_u = args.latent_dim_w + args.latent_dim_z
            bm = HeterogeneousMMVAEPlus(
                modality_modules=(
                    celeba_image_vae(dim_u, size_in=args.size),
                    celeba_mask_vae(dim_u, size_in=args.size),
                    AttributeVAE(size_z=dim_u, att_size=18)),
                latent_dim_w=args.latent_dim_w,
                latent_dim_z=args.latent_dim_z)
        else:
            from ..models.baselines.heterogeneous import (
                HeterogeneousMixtureVAE,
            )

            bm = HeterogeneousMixtureVAE(
                modality_modules=(
                    celeba_image_vae(args.size_z, size_in=args.size),
                    celeba_mask_vae(args.size_z, size_in=args.size),
                    AttributeVAE(size_z=args.size_z, att_size=18)),
                size_z=args.size_z)
        models[mix_type] = HetBaselineSampler(
            model=bm, variables=variables, mix_type=mix_type)

    if not models:
        raise SystemExit("nothing to evaluate: pass --score-ckpt and/or "
                         "--baseline entries")

    given_sets = args.given_sets.split(",")
    key = jax.random.key(args.seed)
    rows = []
    for name, pipe in models.items():
        key, sub = jax.random.split(key)
        results = celeba_protocol(
            pipe, sub, images, masks, attrs, given_sets=given_sets,
            feature_fn=feature_fn, batch_size=min(64, args.amount),
            refine_fn=refine_fn, n_repeats=args.fid_n_times)
        for r in results:
            r["model"] = name
            rows.append(r)

    if args.clf_ckpt:
        # FGSM adversarial attribute robustness on the real test images.
        from ..models.classifiers import ResClassifier

        chans = (((64, 128, 128, 2), (128, 256, 256, 2), (256, 512, 512, 2))
                 if args.size == 128 else ((8, 8, 8, 2), (8, 16, 16, 2)))
        clf = ResClassifier(chans, size_out=18)
        clf_vars = CheckpointManager(args.clf_ckpt).restore_raw("best")

        def clf_apply(v, x):
            return clf.apply(v, x)

        adv = fgsm_attack_f1(clf_apply, clf_vars, images, attrs,
                             epsilon=args.fgsm_eps)
        rows.append({"model": "fgsm", "given": "real",
                     "attr_f1": adv["f1"], "attr_acc": adv["acc"],
                     "epsilon": args.fgsm_eps})

    # Per-cell table (the reference prints one line per given-set,
    # eval_lat_celeba_hq_all.py:520-528).
    cols = ["model", "given", "image_fid", "mask_f1", "mask_acc",
            "attr_f1", "attr_acc"]
    if args.refiner_ckpt:
        cols.insert(3, "image_fid_refined")
    print("  ".join(f"{c:>10}" for c in cols), flush=True)
    for r in rows:
        print("  ".join(
            f"{r.get(c):>10.4f}" if isinstance(r.get(c), float)
            else f"{str(r.get(c, '-') or 'uncond'):>10}" for c in cols),
            flush=True)
    print(json.dumps(rows, default=float))

    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r, default=float) + "\n")


if __name__ == "__main__":
    main()
