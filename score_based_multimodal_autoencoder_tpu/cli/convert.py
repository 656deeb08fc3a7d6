"""Convert reference torch checkpoints into framework orbax checkpoints.

The reference saves ``{'epoch', 'model_state_dict', ...}`` dicts via
torch.save (/root/reference/train_polyupd.py:226-235). This CLI maps them
through models/convert.py onto the matching flax modules and writes
checkpoints in the layout the framework's own trainers produce, so every
sample/evaluate CLI can run reference-trained weights directly:

  # stage-2 latent score UNet (train_poly_unet_cont.py:567-572)
  python -m ...cli.convert --arch unet --torch-ckpt score.pt --out ./score \
      --dim 128 --channels 10 --dim-mults 1,2,2,2

  # the 10 per-modality PolyMNIST VAEs -> ONE stacked fleet checkpoint
  python -m ...cli.convert --arch resvae --preset polymnist \
      --torch-ckpt m0.pt --torch-ckpt m1.pt ... --out ./vae

  # a single CelebA image/mask VAE
  python -m ...cli.convert --arch resvae --preset celeba_image \
      --torch-ckpt img_vae.pt --out ./vae_img

  # ADM UNet (cond score / DiffuseVAE refiner, unet_openai.py:361-577)
  python -m ...cli.convert --arch adm --torch-ckpt refiner.pt \
      --out ./refiner --model-channels 128 --channel-mult 1,2,2,3,4 \
      --num-res-blocks 2 --attention-resolutions 16 --num-heads 8

  # baselines: MoPoE/MMVAE/MVAE/MVTCAE (one vae_list layout) and MMVAE+
  # -> checkpoints for cli.evaluate --baseline {name}=DIR
  python -m ...cli.convert --arch mixture --n-mod 10 \
      --torch-ckpt mopoe.pt --out ./mopoe
  python -m ...cli.convert --arch mmplus --n-mod 10 \
      --latent-dim-w 32 --latent-dim-z 32 --torch-ckpt mmplus.pt --out ./mmp
  python -m ...cli.convert --arch mmplus-celeba --torch-ckpt cel.pt --out ./m
  python -m ...cli.convert --arch attr --torch-ckpt attr_vae.pt --out ./attr

(Inception FID weights need no conversion - pass the reference's
``pt_inception-2015-12-05-6726825d.pth`` straight to ``--inception-weights``;
eval/inception.py converts at load time.)

torch (CPU build) is used only to deserialize the checkpoint file.
"""

from __future__ import annotations

import argparse
import sys


def _state_dict(path: str, key: str | None):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if key:
        return obj[key]
    if isinstance(obj, dict) and "model_state_dict" in obj:
        return obj["model_state_dict"]
    return obj  # already a raw state_dict


def _ints(s: str):
    return tuple(int(v) for v in s.split(",")) if s else ()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--arch", required=True,
                   choices=["unet", "resvae", "adm", "attr", "mixture",
                            "mmplus", "mmplus-celeba"])
    p.add_argument("--torch-ckpt", action="append", required=True,
                   help="torch checkpoint file; repeat for a VAE fleet "
                        "(modality order = flag order)")
    p.add_argument("--out", required=True, help="orbax checkpoint dir")
    p.add_argument("--state-dict-key", default=None,
                   help="key holding the state_dict inside the torch file "
                        "(default: 'model_state_dict' when present)")
    # unet
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--channels", type=int, default=10)
    p.add_argument("--dim-mults", default="1,2,2,2")
    p.add_argument("--resnet-blocks", action="store_true",
                   help="ResNet blocks instead of ConvNeXt")
    # resvae
    p.add_argument("--preset", default="polymnist",
                   choices=["polymnist", "celeba_image", "celeba_mask"])
    p.add_argument("--size-z", type=int, default=None)
    # adm
    p.add_argument("--model-channels", type=int, default=128)
    p.add_argument("--num-res-blocks", type=int, default=2)
    p.add_argument("--channel-mult", default="1,2,2,3,4")
    p.add_argument("--attention-resolutions", default="16")
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--num-heads-upsample", type=int, default=-1)
    # baselines
    p.add_argument("--n-mod", type=int, default=10,
                   help="modality count (mixture/mmplus archs)")
    p.add_argument("--latent-dim-w", type=int, default=32)
    p.add_argument("--latent-dim-z", type=int, default=32)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..train.checkpoints import CheckpointManager

    mgr = CheckpointManager(args.out)

    if args.arch == "unet":
        from ..models.convert import load_torch_unet

        sd = _state_dict(args.torch_ckpt[0], args.state_dict_key)
        mults = _ints(args.dim_mults)
        params = load_torch_unet(sd, len(mults),
                                 use_convnext=not args.resnet_blocks)
        ckpt = {"params": params, "ema": None, "epoch": 0,
                "key": jax.random.key_data(jax.random.key(0)),
                "best_metric": np.nan}
        mgr.save_last(ckpt)
        mgr.save_best(ckpt, float("inf"))
        print(f"wrote score checkpoint (dim={args.dim}, "
              f"channels={args.channels}, mults={mults}) -> {args.out}")

    elif args.arch == "resvae":
        from ..models import vae as vae_mod
        from ..models.convert import load_torch_resvae

        enc, dec, size_in, size_z = {
            "polymnist": (vae_mod.POLYMNIST_ENC_CHANNELS,
                          vae_mod.POLYMNIST_DEC_CHANNELS, 32, 64),
            "celeba_image": (vae_mod.CELEBA_IMG_ENC_CHANNELS,
                             vae_mod.CELEBA_IMG_DEC_CHANNELS, 128, 256),
            "celeba_mask": (vae_mod.CELEBA_MASK_ENC_CHANNELS,
                            vae_mod.CELEBA_MASK_DEC_CHANNELS, 128, 256),
        }[args.preset]
        if args.size_z:
            size_z = args.size_z
        converted = [
            load_torch_resvae(_state_dict(f, args.state_dict_key),
                              [list(c) for c in enc], [list(c) for c in dec],
                              size_in, size_z)
            for f in args.torch_ckpt]
        if len(converted) == 1:
            mgr.save_last(converted[0])
            print(f"wrote single-VAE checkpoint ({args.preset}, "
                  f"z={size_z}) -> {args.out}")
        else:
            # Stack into the VAEFleet state layout (parallel/fleet.py:44-58):
            # modality-major leading axis, fresh optimizer state.
            from ..train.lr import adam_with_mutable_lr

            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *converted)
            tx = adam_with_mutable_lr(1e-3)
            state = {
                "params": stacked["params"],
                "batch_stats": stacked["batch_stats"],
                "opt_state": jax.vmap(tx.init)(stacked["params"]),
            }
            mgr.save_last(state)
            print(f"wrote {len(converted)}-modality fleet checkpoint "
                  f"({args.preset}, z={size_z}) -> {args.out}")

    elif args.arch == "attr":
        from ..models.convert import load_torch_attr_vae

        sd = _state_dict(args.torch_ckpt[0], args.state_dict_key)
        mgr.save_last(load_torch_attr_vae(sd))
        print(f"wrote attribute-VAE checkpoint -> {args.out}")

    elif args.arch == "mixture":
        # MOPOEPolyRes / MMVAEPolyRes / MVPolyRes / MVTPolyRes: identical
        # vae_list layout (mopoe_model.py) -> one stacked checkpoint usable
        # by cli.evaluate --baseline {mopoe|mmvae|mvae|mvt}=DIR.
        from ..models import vae as vae_mod
        from ..models.convert import load_torch_mixture_vaes

        sd = _state_dict(args.torch_ckpt[0], args.state_dict_key)
        ckpt = load_torch_mixture_vaes(
            sd, args.n_mod, [list(c) for c in vae_mod.POLYMNIST_ENC_CHANNELS],
            [list(c) for c in vae_mod.POLYMNIST_DEC_CHANNELS],
            size_in=32, size_z=args.size_z or 64)
        mgr.save_last(ckpt)
        mgr.save_best(ckpt, float("inf"))
        print(f"wrote {args.n_mod}-modality mixture-baseline checkpoint "
              f"-> {args.out}")

    elif args.arch == "mmplus":
        # PolyMNIST_10modalities (mmplus_model.py:323-385) -> MMVAEPlus.
        from ..models import vae as vae_mod
        from ..models.convert import load_torch_mmplus

        sd = _state_dict(args.torch_ckpt[0], args.state_dict_key)
        ckpt = load_torch_mmplus(
            sd, args.n_mod, [list(c) for c in vae_mod.POLYMNIST_ENC_CHANNELS],
            [list(c) for c in vae_mod.POLYMNIST_DEC_CHANNELS],
            size_in=32, dim_u=args.latent_dim_w + args.latent_dim_z)
        mgr.save_last(ckpt)
        mgr.save_best(ckpt, float("inf"))
        print(f"wrote MMVAE+ checkpoint (w={args.latent_dim_w}, "
              f"z={args.latent_dim_z}) -> {args.out}")

    elif args.arch == "mmplus-celeba":
        # MMPLUSCeleba (mmplus_model_cel.py:473-519) -> the heterogeneous
        # HeterogeneousMMVAEPlus over (image, mask, attr) modules.
        from ..models import vae as vae_mod
        from ..models.convert import load_torch_mmplus_het

        sd = _state_dict(args.torch_ckpt[0], args.state_dict_key)
        # MMPLUSCeleba ships as 3 modalities (img, mask, att) or 2
        # (img, att) (mmplus_model_cel.py:475-483); --n-mod's PolyMNIST
        # default of 10 means "unset" here.
        het_n_mod = args.n_mod if args.n_mod in (2, 3) else 3
        ckpt = load_torch_mmplus_het(
            sd, [list(c) for c in vae_mod.CELEBA_IMG_ENC_CHANNELS],
            [list(c) for c in vae_mod.CELEBA_IMG_DEC_CHANNELS],
            [list(c) for c in vae_mod.CELEBA_MASK_ENC_CHANNELS],
            [list(c) for c in vae_mod.CELEBA_MASK_DEC_CHANNELS],
            size_in=128, n_mod=het_n_mod)
        mgr.save_last(ckpt)
        mgr.save_best(ckpt, float("inf"))
        dim_w = ckpt["params"]["pw_raw"].shape[-1]  # inferred from weights
        print(f"wrote heterogeneous MMVAE+ checkpoint (latent_dim_w={dim_w})"
              f" -> {args.out}")

    elif args.arch == "adm":
        from ..models.convert import load_torch_adm_unet

        sd = _state_dict(args.torch_ckpt[0], args.state_dict_key)
        params = load_torch_adm_unet(
            sd, args.model_channels, args.num_res_blocks,
            _ints(args.channel_mult), _ints(args.attention_resolutions),
            args.num_heads, args.num_heads_upsample)
        ckpt = {"params": params, "ema": None, "epoch": 0,
                "key": jax.random.key_data(jax.random.key(0)),
                "best_metric": np.nan}
        mgr.save_last(ckpt)
        mgr.save_best(ckpt, float("inf"))
        print(f"wrote ADM checkpoint (model_channels={args.model_channels}, "
              f"mult={_ints(args.channel_mult)}) -> {args.out}")

    mgr.wait()


if __name__ == "__main__":
    sys.exit(main())
