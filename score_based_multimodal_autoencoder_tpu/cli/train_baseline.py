"""Baseline trainer CLI: MoPoE / MMVAE / MVAE / MVTCAE / MMVAE+.

Replacement for /root/reference/train_psm_upd_mopoe_an.py (PolyMNIST, loss
dispatch at :112-145), /root/reference/train_cel_upd_mopoe_an.py (CelebA
mopoe/mvt/mmplus incl. IWAE/DReG; BCE attr recon at :178-196) and
/root/reference/train_psm_upd_mmplus_orig.py (MMVAE+ estimators).

    python -m score_based_multimodal_autoencoder_tpu.cli.train_baseline \
        --mix-type mopoe --synthetic --epochs 5
    python -m ...cli.train_baseline --dataset celeba --mix-type mvt --synthetic
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="polymnist",
                   choices=["polymnist", "celeba"])
    p.add_argument("--mix-type", default="mopoe",
                   choices=["mopoe", "mmvae", "mvae", "mvt", "mmplus"])
    p.add_argument("--estimator", default="iwae", choices=["iwae", "dreg"],
                   help="mmplus only")
    p.add_argument("--k", type=int, default=1, help="mmplus IWAE samples")
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=512)
    p.add_argument("--data-root", default=None)
    p.add_argument("--n-mod", type=int, default=10)
    p.add_argument("--size-z", type=int, default=64)
    p.add_argument("--size", type=int, default=128,
                   help="celeba input resolution (128 = reference; smaller "
                        "values build the smoke-scaled VAEs)")
    p.add_argument("--latent-dim-w", type=int, default=32)
    p.add_argument("--latent-dim-z", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="continue from the resume checkpoint in --ckpt-dir")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all devices (DP mesh)")
    p.add_argument("--ckpt-dir", default=None)
    args = p.parse_args()

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data.loader import BatchIterator, to_float01
    from ..train.checkpoints import CheckpointManager
    from ..parallel import dp_shardings, put_batch, replicate_tree

    key = jax.random.key(args.seed)
    tx = optax.adam(args.lr)
    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)
    # PolyMNIST batches are modality-major (n_mod, B, ...); CelebA gathers
    # return per-modality (B, ...) tuples.
    rep, batch_sh = dp_shardings(mesh,
                                  modality_major=args.dataset == "polymnist")
    batch_axis = 1 if args.dataset == "polymnist" else 0

    if args.dataset == "celeba":
        model, variables, batches = _build_celeba(args, key)
    else:
        model, variables, batches = _build_polymnist(args, key)
    params, stats = variables["params"], variables.get("batch_stats")
    opt_state = tx.init(params)
    step = _make_step(args, model, tx)

    mgr = CheckpointManager(args.ckpt_dir) if args.ckpt_dir else None
    start_epoch = 0
    if args.resume and mgr and mgr.exists("resume"):
        target = {"params": params, "batch_stats": stats,
                  "opt_state": opt_state, "epoch": 0,
                  "key": jax.random.key_data(key)}
        saved = mgr.restore(target, "resume")
        params, stats = saved["params"], saved["batch_stats"]
        opt_state = saved["opt_state"]
        start_epoch = int(saved["epoch"]) + 1
        key = jax.random.wrap_key_data(jnp.asarray(saved["key"]))
        print(f"resumed from epoch {start_epoch}", flush=True)

    params = replicate_tree(params, rep)
    stats = replicate_tree(stats, rep) if stats is not None else None
    opt_state = replicate_tree(opt_state, rep)

    n = batches.n
    it = BatchIterator(np.arange(n), args.batch_size, seed=args.seed)
    for epoch in range(start_epoch, args.epochs):
        t0, losses = time.time(), []
        for idx in it.epoch():
            batch = put_batch(batches.gather(np.asarray(idx)),
                               batch_sh, axis=batch_axis)
            key, sub = jax.random.split(key)
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  batch, sub)
            losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(losses)))  # one sync per epoch
        print(f"epoch {epoch}: {args.mix_type}={mean_loss:.4f} "
              f"({time.time()-t0:.1f}s)", flush=True)
        if mgr:
            mgr.save_last({"params": params, "batch_stats": stats})
            mgr.save_best({"params": params, "batch_stats": stats},
                          mean_loss)
            mgr.save_resume({
                "params": params, "batch_stats": stats,
                "opt_state": opt_state, "epoch": epoch,
                "key": jax.random.key_data(key)})
    if mgr:
        mgr.wait()


class _PolyBatches:
    def __init__(self, pixels):
        import numpy as np

        self.pixels = pixels
        self.n = pixels.shape[1]
        self._np = np

    def gather(self, idx):
        import jax.numpy as jnp

        from ..data.loader import to_float01

        return jnp.asarray(to_float01(self.pixels[:, idx]))


class _CelebaBatches:
    def __init__(self, ds):
        self.ds = ds
        self.n = len(ds)

    def gather(self, idx):
        import jax.numpy as jnp

        from ..data.loader import to_float01

        return (jnp.asarray(to_float01(self.ds.images[idx])),
                jnp.asarray(to_float01(self.ds.masks[idx])),
                jnp.asarray(self.ds.visible_attrs()[idx]))


def _build_polymnist(args, key):
    import jax
    import jax.numpy as jnp

    from ..data.loader import to_float01
    from ..models.baselines import MixtureMultimodalVAE
    from ..models.baselines.mmplus import MMVAEPlus
    from ..models.vae import POLYMNIST_DEC_CHANNELS, POLYMNIST_ENC_CHANNELS

    if args.synthetic:
        from ..data import synthetic_polymnist

        pixels = synthetic_polymnist(
            args.synthetic_n, args.n_mod, 32, args.seed).images
    else:
        from ..data import load_polymnist

        pixels = load_polymnist(args.data_root, "train").images
    sample = jnp.asarray(to_float01(pixels[:, :2]))

    if args.mix_type == "mmplus":
        model = MMVAEPlus(
            n_mod=args.n_mod, latent_dim_w=args.latent_dim_w,
            latent_dim_z=args.latent_dim_z, size_in=32)
        variables = model.init(jax.random.key(1), sample, jax.random.key(2),
                               args.k, True)
    else:
        model = MixtureMultimodalVAE(
            n_mod=args.n_mod, enc_channel_list=POLYMNIST_ENC_CHANNELS,
            dec_channel_list=POLYMNIST_DEC_CHANNELS, size_in=32,
            size_z=args.size_z, img_ch=3)
        variables = model.init(jax.random.key(1), sample, jax.random.key(2),
                               mix_type=args.mix_type, train=True)
    return model, variables, _PolyBatches(pixels)


def _build_celeba(args, key):
    """CelebA heterogeneous baselines (train_cel_upd_mopoe_an.py): image,
    mask, attribute modules sharing one latent size."""
    import jax

    from ..models.baselines.heterogeneous import HeterogeneousMixtureVAE
    from ..models.baselines.mmplus_het import HeterogeneousMMVAEPlus
    from ..models.vae import AttributeVAE, celeba_image_vae, celeba_mask_vae

    if args.mix_type in ("mmvae", "mvae"):
        raise SystemExit("CelebA reference ships mopoe/mvt/mmplus "
                         "(train_cel_upd_mopoe_an.py)")
    if args.synthetic:
        from ..data import synthetic_celeba

        ds = synthetic_celeba(args.synthetic_n, size=args.size,
                              seed=args.seed)
    else:
        from ..data import load_celeba_hq

        ds = load_celeba_hq(args.data_root, "train")
    batches = _CelebaBatches(ds)
    sample = batches.gather(list(range(2)))

    if args.mix_type == "mmplus":
        dim_u = args.latent_dim_w + args.latent_dim_z
        mods = (celeba_image_vae(dim_u, size_in=args.size),
                celeba_mask_vae(dim_u, size_in=args.size),
                AttributeVAE(size_z=dim_u, att_size=18))
        model = HeterogeneousMMVAEPlus(
            modality_modules=mods, latent_dim_w=args.latent_dim_w,
            latent_dim_z=args.latent_dim_z)
        variables = model.init(jax.random.key(1), sample, jax.random.key(2),
                               args.k, True)
    else:
        mods = (celeba_image_vae(args.size_z, size_in=args.size),
                celeba_mask_vae(args.size_z, size_in=args.size),
                AttributeVAE(size_z=args.size_z, att_size=18))
        model = HeterogeneousMixtureVAE(modality_modules=mods,
                                        size_z=args.size_z)
        variables = model.init(jax.random.key(1), sample, jax.random.key(2),
                               mix_type=args.mix_type, train=True)
    return model, variables, batches


def _het_rec_loss(outs, inputs):
    """Per-modality recon: sum-MSE for image-shaped tensors, BCE-with-logits
    for the attribute vector (train_cel_upd_mopoe_an.py:178-196)."""
    import jax.numpy as jnp

    total = 0.0
    for o, x in zip(outs, inputs):
        if o.ndim == 2:  # attribute logits
            bce = jnp.maximum(o, 0) - o * x + jnp.log1p(jnp.exp(-jnp.abs(o)))
            total = total + jnp.sum(bce) / o.shape[0]
        else:
            total = total + jnp.sum((o - x) ** 2) / x.shape[0]
    return total


def _make_step(args, model, tx):
    import jax
    import optax

    from ..models.baselines import (
        mvae_loss,
        mvt_loss,
        total_kl_loss,
        total_rec_loss,
    )
    from ..models.baselines.losses import kl_between, kl_standard
    from ..models.baselines.mmplus_losses import m_dreg, m_iwae
    from ..models.baselines.mmplus_het import m_dreg_het, m_iwae_het

    het = args.dataset == "celeba"

    def loss_for(p, stats, batch, key):
        v = {"params": p, "batch_stats": stats}
        if args.mix_type == "mmplus":
            out, upd = model.apply(v, batch, key, args.k, True,
                                   mutable=["batch_stats"])
            if args.estimator == "iwae":
                obj = (m_iwae_het if het else m_iwae)(
                    out, batch, beta=args.beta,
                    latent_dim_w=args.latent_dim_w)
            elif het:
                obj = m_dreg_het(model, v, out, batch, beta=args.beta,
                                 latent_dim_w=args.latent_dim_w)
            else:
                def decode_fn(us, fresh_w):
                    return model.apply(v, us, fresh_w, True,
                                       method=model.decode_matrix,
                                       mutable=["batch_stats"])[0]

                obj = m_dreg(out, batch, beta=args.beta,
                             latent_dim_w=args.latent_dim_w,
                             decode_fn=decode_fn)
            return -obj, upd["batch_stats"]

        out, upd = model.apply(v, batch, key, mix_type=args.mix_type,
                               train=True, mutable=["batch_stats"])
        if args.mix_type in ("mopoe", "mmvae"):
            outs, mus, logvars = out
            rec = (_het_rec_loss(outs, batch) if het
                   else total_rec_loss(outs, batch))
            loss = rec + total_kl_loss(mus, logvars, args.beta)
        elif args.mix_type == "mvae":
            rec, kl = mvae_loss(out, batch, args.beta)
            loss = rec + kl
        elif het:  # heterogeneous MVTCAE CVIB (same weights as mvt_loss)
            n_mod = len(batch)
            j_mu, j_lv, j_outs = out["joint"]
            mus, logvars = out["individual"]
            rec = _het_rec_loss(j_outs, batch)
            kl2 = sum(kl_between(j_mu, j_lv, mus[i], logvars[i])
                      for i in range(n_mod))
            alpha = 0.9
            loss = ((n_mod - alpha) / n_mod * rec
                    + args.beta * (alpha / n_mod * kl2
                                   + (1 - alpha) * kl_standard(j_mu, j_lv)))
        else:
            rec, kl = mvt_loss(out, batch, args.beta)
            loss = rec + kl
        return loss, upd["batch_stats"]

    @jax.jit
    def step(params, stats, opt_state, batch, key):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_for, has_aux=True)(params, stats, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    return step


if __name__ == "__main__":
    main()
