"""Baseline trainer CLI: MoPoE / MMVAE / MVAE / MVTCAE / MMVAE+.

Replacement for /root/reference/train_psm_upd_mopoe_an.py (PolyMNIST, loss
dispatch at :112-145) and /root/reference/train_psm_upd_mmplus_orig.py
(MMVAE+ with IWAE/DReG estimators).

    python -m score_based_multimodal_autoencoder_tpu.cli.train_baseline \
        --mix-type mopoe --synthetic --epochs 5
"""

import argparse


def main():
    p = argparse.ArgumentParser()
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
    p.add_argument("--latent-dim-w", type=int, default=32)
    p.add_argument("--latent-dim-z", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default=None)
    args = p.parse_args()

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data.loader import BatchIterator, to_float01
    from ..models.baselines import (
        MixtureMultimodalVAE,
        mvae_loss,
        mvt_loss,
        total_kl_loss,
        total_rec_loss,
    )
    from ..models.baselines.mmplus import MMVAEPlus
    from ..models.baselines.mmplus_losses import m_dreg, m_iwae
    from ..models.vae import POLYMNIST_DEC_CHANNELS, POLYMNIST_ENC_CHANNELS
    from ..train.checkpoints import CheckpointManager

    if args.synthetic:
        from ..data import synthetic_polymnist

        pixels = synthetic_polymnist(
            args.synthetic_n, args.n_mod, 32, args.seed).images
    else:
        from ..data import load_polymnist

        pixels = load_polymnist(args.data_root, "train").images

    key = jax.random.key(args.seed)
    tx = optax.adam(args.lr)
    sample = jnp.asarray(to_float01(pixels[:, :2]))

    if args.mix_type == "mmplus":
        model = MMVAEPlus(
            n_mod=args.n_mod, latent_dim_w=args.latent_dim_w,
            latent_dim_z=args.latent_dim_z, size_in=32)
        variables = model.init(jax.random.key(1), sample, jax.random.key(2),
                               args.k, True)
        params, stats = variables["params"], variables["batch_stats"]
        opt_state = tx.init(params)

        @jax.jit
        def step(params, stats, opt_state, batch, key):
            def loss_fn(p):
                v = {"params": p, "batch_stats": stats}
                out, upd = model.apply(v, batch, key, args.k, True,
                                       mutable=["batch_stats"])
                if args.estimator == "iwae":
                    obj = m_iwae(out, batch, beta=args.beta,
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

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, opt_state, loss
    else:
        model = MixtureMultimodalVAE(
            n_mod=args.n_mod, enc_channel_list=POLYMNIST_ENC_CHANNELS,
            dec_channel_list=POLYMNIST_DEC_CHANNELS, size_in=32,
            size_z=args.size_z, img_ch=3)
        variables = model.init(jax.random.key(1), sample, jax.random.key(2),
                               mix_type=args.mix_type, train=True)
        params, stats = variables["params"], variables["batch_stats"]
        opt_state = tx.init(params)

        @jax.jit
        def step(params, stats, opt_state, batch, key):
            def loss_fn(p):
                out, upd = model.apply(
                    {"params": p, "batch_stats": stats}, batch, key,
                    mix_type=args.mix_type, train=True,
                    mutable=["batch_stats"])
                if args.mix_type in ("mopoe", "mmvae"):
                    outs, mus, logvars = out
                    loss = total_rec_loss(outs, batch) + total_kl_loss(
                        mus, logvars, args.beta)
                elif args.mix_type == "mvae":
                    rec, kl = mvae_loss(out, batch, args.beta)
                    loss = rec + kl
                else:
                    rec, kl = mvt_loss(out, batch, args.beta)
                    loss = rec + kl
                return loss, upd["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, opt_state, loss

    mgr = CheckpointManager(args.ckpt_dir) if args.ckpt_dir else None
    n = pixels.shape[1]
    it = BatchIterator(np.arange(n), args.batch_size, seed=args.seed)
    for epoch in range(args.epochs):
        t0, losses = time.time(), []
        for idx in it.epoch():
            batch = jnp.asarray(to_float01(pixels[:, np.asarray(idx)]))
            key, sub = jax.random.split(key)
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  batch, sub)
            losses.append(float(loss))
        print(f"epoch {epoch}: {args.mix_type}={np.mean(losses):.4f} "
              f"({time.time()-t0:.1f}s)", flush=True)
        if mgr:
            mgr.save_last({"params": params, "batch_stats": stats})
            mgr.save_best({"params": params, "batch_stats": stats},
                          float(np.mean(losses)))
    if mgr:
        mgr.wait()


if __name__ == "__main__":
    main()
