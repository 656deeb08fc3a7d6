"""Evaluation CLI: the PolyMNIST FID/coherence protocol suite.

Replacement for /root/reference/fid_upd10.py's entry: conditional,
unconditional, and incremental protocols over a trained two-stage model,
with device-resident FID (optionally the ported Inception weights).
``--baseline`` evaluates multimodal-VAE baselines through the SAME
protocols side by side (fid_upd10.py:375-463 loads them together;
poly_calc_perf_an.py evaluates one at a time).

    python -m score_based_multimodal_autoencoder_tpu.cli.evaluate \
        --vae-ckpt ./checkpoints/vae_fleet --score-ckpt ./checkpoints/score \
        --predicted 9 --synthetic --baseline mopoe=./checkpoints/mopoe
"""

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vae-ckpt", default="./checkpoints/vae_fleet")
    p.add_argument("--score-ckpt", default="./checkpoints/score")
    p.add_argument("--n-mod", type=int, default=10)
    p.add_argument("--size-z", type=int, default=64)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--predicted", default="",
                   help="predicted modality indices, e.g. '9'; empty = unconditional")
    p.add_argument("--incremental", action="store_true")
    p.add_argument("--target-mod", type=int, default=9)
    p.add_argument("--fid-n-times", type=int, default=1)
    p.add_argument("--amount", type=int, default=256)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data-root", default=None)
    p.add_argument("--inception-weights", default=None,
                   help="path to pt_inception-2015-12-05-6726825d.pth")
    p.add_argument("--clf-ckpt", default=None,
                   help="PolyMNIST classifier checkpoint for coherence")
    p.add_argument("--noise-obs", action="store_true")
    p.add_argument("--pc", action="store_true")
    p.add_argument("--track", default="sde", choices=["sde", "ae"],
                   help="'ae' evaluates the annealed-Langevin AE track: "
                        "--vae-ckpt is a --vae-type ae fleet, --score-ckpt "
                        "a --track ae sigma-score net (gen_ae, "
                        "fid_upd10.py:56-110)")
    p.add_argument("--sigma-max", type=float, default=5.0)
    p.add_argument("--sigma-min", type=float, default=0.1)
    p.add_argument("--sigma-levels", type=int, default=200)
    p.add_argument("--er", type=float, default=None,
                   help="annealed step rate override (default: the "
                        "reference's tuned rule, fid_upd10.py:64-71)")
    p.add_argument("--c", type=float, default=None)
    p.add_argument("--iter-num", type=int, default=None)
    p.add_argument("--ebm-ckpt", default=None,
                   help="pairwise coherence EBM checkpoint for guidance")
    p.add_argument("--cl-s", default="1.0",
                   help="comma list of guidance scales to sweep, e.g. "
                        "'0,1,10,100' (train_poly_unet_cont.py:736-747)")
    p.add_argument("--baseline", action="append", default=[],
                   metavar="MIXTYPE=CKPT",
                   help="repeatable: {mopoe|mmvae|mvae|mvt|mmplus}=CKPT_DIR "
                        "- evaluate baselines through the same protocols")
    p.add_argument("--latent-dim-w", type=int, default=32)
    p.add_argument("--latent-dim-z", type=int, default=32)
    p.add_argument("--tpu-preset", action="store_true",
                   help="checkpoint was trained with ScoreConfig.*_tpu "
                        "(128-stem + MXU depthwise)")
    p.add_argument("--data-parallel", action="store_true",
                   help="DP-shard score-model generation over all visible "
                        "devices (the device count must divide --amount; "
                        "non-divisible batches fall back to one device); "
                        "FID feature extraction is device-sharded either "
                        "way (eval/fid.compute_features)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ..data.loader import to_float01
    from ..eval.inception import make_inception_feature_fn
    from ..eval.protocols import (
        conditional_protocol,
        incremental_protocol,
        unconditional_protocol,
    )
    from ..models.classifiers import PolyMNISTClassifier
    from ..parallel.fleet import VAEFleet
    from ..pipeline import SBMAEPipeline
    from ..train.checkpoints import CheckpointManager
    from ..train.configs import ScoreConfig, VAEConfig
    from ..train.lr import adam_with_mutable_lr

    if args.synthetic:
        from ..data import synthetic_polymnist

        ds = synthetic_polymnist(args.amount, args.n_mod, 32, args.seed + 7)
    else:
        from ..data import load_polymnist

        ds = load_polymnist(args.data_root, "test")
    pixels = jnp.asarray(to_float01(ds.images[:, : args.amount]))
    labels = jnp.asarray(ds.labels[: args.amount])

    vae = VAEConfig.polymnist(size_z=args.size_z).build_model()
    fleet = VAEFleet(vae, args.n_mod, adam_with_mutable_lr(1e-3))
    fleet_state = CheckpointManager(args.vae_ckpt).restore_raw("last")

    cfg_fn = (ScoreConfig.polymnist_tpu if args.tpu_preset
              else ScoreConfig.polymnist)
    score_cfg = cfg_fn(channels=args.n_mod, dim=args.dim)
    model = score_cfg.build_model(sample=True)
    grid0 = jnp.zeros((1, score_cfg.latent_hw, score_cfg.latent_hw, args.n_mod))
    score = CheckpointManager(args.score_ckpt).restore_raw("last")

    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)  # all devices on the 'data' axis
    if args.track == "ae":
        # Annealed-Langevin AE track (gen_ae, fid_upd10.py:56-110): the
        # sigma-index score net + AE fleet through the same protocols.
        from ..pipeline import AnnealedSBMAEPipeline

        overrides = {k: v for k, v in (("er", args.er), ("c", args.c),
                                       ("iter_num", args.iter_num))
                     if v is not None}
        pipeline = AnnealedSBMAEPipeline(
            fleet=fleet, fleet_state=fleet_state, score_model=model,
            score_params=score["params"], sde=None,
            latent_hw=score_cfg.latent_hw, sampler_kwargs=overrides,
            sigma_max=args.sigma_max, sigma_min=args.sigma_min,
            n_levels=args.sigma_levels, mesh=mesh)
    else:
        pipeline = SBMAEPipeline(
            fleet=fleet, fleet_state=fleet_state, score_model=model,
            score_params=score["params"],
            sde=score_cfg.build_sde(sample=True),
            latent_hw=score_cfg.latent_hw,
            sampler_kwargs={"pc": args.pc, "noise_obs": args.noise_obs},
            mesh=mesh)

    samplers = {"score": pipeline}
    for spec in args.baseline:
        mix_type, _, ckpt = spec.partition("=")
        if mix_type not in ("mopoe", "mmvae", "mvae", "mvt", "mmplus") \
                or not ckpt:
            raise SystemExit(f"--baseline {spec}: expected "
                             "{mopoe|mmvae|mvae|mvt|mmplus}=CKPT_DIR")
        from ..eval.baseline_adapter import BaselineSampler
        from ..models.vae import (
            POLYMNIST_DEC_CHANNELS,
            POLYMNIST_ENC_CHANNELS,
        )

        variables = CheckpointManager(ckpt).restore_raw("last")
        if mix_type == "mmplus":
            from ..models.baselines.mmplus import MMVAEPlus

            bmodel = MMVAEPlus(n_mod=args.n_mod,
                               latent_dim_w=args.latent_dim_w,
                               latent_dim_z=args.latent_dim_z, size_in=32)
        else:
            from ..models.baselines import MixtureMultimodalVAE

            bmodel = MixtureMultimodalVAE(
                n_mod=args.n_mod, enc_channel_list=POLYMNIST_ENC_CHANNELS,
                dec_channel_list=POLYMNIST_DEC_CHANNELS, size_in=32,
                size_z=args.size_z, img_ch=3)
        samplers[mix_type] = BaselineSampler(
            model=bmodel, variables=variables, mix_type=mix_type,
            n_mod=args.n_mod)

    feature_fn = make_inception_feature_fn(args.inception_weights)

    clf_apply = None
    if args.clf_ckpt:
        clf = PolyMNISTClassifier()
        clf_vars = CheckpointManager(args.clf_ckpt).restore_raw("best")
        clf_apply = lambda x: clf.apply(clf_vars, x)

    key = jax.random.key(args.seed)

    if args.ebm_ckpt and args.track == "ae":
        # The annealed pipeline pops score_transform (guidance hooks into
        # the reverse-SDE drift only): running the sweep would print
        # "guided" rows from the identical unguided program.
        raise SystemExit("--ebm-ckpt guidance requires the SDE track "
                         "(--track sde); the annealed AE sampler has no "
                         "score_transform hook")
    if args.ebm_ckpt and args.predicted:
        # Guidance-scale sweep over the conditional protocol.
        from itertools import combinations

        from ..ebm import PairwiseCoherenceEBM, make_pairwise_guidance

        ebm = PairwiseCoherenceEBM(size_z=args.size_z, n_mod=args.n_mod,
                                   n_class=1)
        ebm_vars = CheckpointManager(args.ebm_ckpt).restore_raw("best")

        def efn(zf, tt, i, j):
            return ebm.apply({"params": ebm_vars["params"]}, zf, tt, i, j)

        energy_fns = {(i, j): efn
                      for i, j in combinations(range(args.n_mod), 2)}
        predicted = [int(c) for c in args.predicted]
        observed = [i not in predicted for i in range(args.n_mod)]
        sweep = {}
        for cl_s in [float(v) for v in args.cl_s.split(",")]:
            tr = (make_pairwise_guidance(energy_fns, observed, cl_s)
                  if cl_s > 0 else None)
            key, sub = jax.random.split(key)
            sweep[cl_s] = conditional_protocol(
                pipeline, sub, pixels, labels, predicted, clf_apply=clf_apply,
                feature_fn=feature_fn, n_repeats=args.fid_n_times,
                score_transform=tr)
        print(json.dumps(sweep, indent=2, default=str))
        return

    results = {}
    for name, sampler in samplers.items():
        key, sub = jax.random.split(key)
        if args.incremental:
            res = incremental_protocol(
                sampler, sub, pixels, labels, args.target_mod,
                clf_apply=clf_apply, feature_fn=feature_fn,
                n_repeats=args.fid_n_times)
        elif args.predicted:
            predicted = [int(c) for c in args.predicted]
            res = conditional_protocol(
                sampler, sub, pixels, labels, predicted, clf_apply=clf_apply,
                feature_fn=feature_fn, n_repeats=args.fid_n_times)
        else:
            res = unconditional_protocol(
                sampler, sub, pixels, clf_apply=clf_apply,
                feature_fn=feature_fn, n_repeats=args.fid_n_times)
        results[name] = res
    # Single-model output keeps the old shape (no wrapper dict).
    print(json.dumps(results["score"] if len(results) == 1 else results,
                     indent=2, default=str))


if __name__ == "__main__":
    main()
