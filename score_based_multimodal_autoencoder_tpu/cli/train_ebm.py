"""EBM CLI: train the time-conditioned pairwise coherence EBM via NCE.

Replacement for /root/reference/train_poly_clwithtime_ebm_IND.py (random
modality pair per step over frozen VAE latents).

    python -m score_based_multimodal_autoencoder_tpu.cli.train_ebm \
        --vae-ckpt ./checkpoints/vae_fleet --synthetic
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vae-ckpt", default="./checkpoints/vae_fleet")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=512)
    p.add_argument("--data-root", default=None)
    p.add_argument("--n-mod", type=int, default=10)
    p.add_argument("--size-z", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--im-sample", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="continue from the resume checkpoint in --ckpt-dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all devices (DP mesh)")
    p.add_argument("--ckpt-dir", default="./checkpoints/ebm")
    args = p.parse_args()

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data.loader import BatchIterator, to_float01
    from ..diffusion import VPSDE
    from ..ebm import PairwiseCoherenceEBM, make_ebm_train_step
    from ..parallel.fleet import VAEFleet
    from ..train.checkpoints import CheckpointManager
    from ..train.configs import VAEConfig
    from ..train.lr import adam_with_mutable_lr
    from ..parallel import dp_shardings, put_batch, replicate_tree

    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)
    # Pixel batches here are modality-major (n_mod, B, ...).
    rep, batch_sh = dp_shardings(mesh, modality_major=True)

    if args.synthetic:
        from ..data import synthetic_polymnist

        pixels = synthetic_polymnist(
            args.synthetic_n, args.n_mod, 32, args.seed).images
    else:
        from ..data import load_polymnist

        pixels = load_polymnist(args.data_root, "train").images

    vae = VAEConfig.polymnist(size_z=args.size_z).build_model()
    fleet = VAEFleet(vae, args.n_mod, adam_with_mutable_lr(1e-3))
    mgr_vae = CheckpointManager(args.vae_ckpt)
    fleet_state = mgr_vae.restore_raw(
        "best" if mgr_vae.exists("best") else "last")

    sde = VPSDE()
    ebm = PairwiseCoherenceEBM(size_z=args.size_z, n_mod=args.n_mod, n_class=1)
    z0 = jnp.zeros((2, 2 * args.size_z))
    params = ebm.init(jax.random.key(1), z0, jnp.full((2,), 0.5), 0, 1)["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    step = jax.jit(make_ebm_train_step(ebm, sde, tx,
                                       importance_sampling=args.im_sample))

    @jax.jit
    def encode_pair(fleet_state, batch, m1, m2):
        def enc(params, stats, x):
            mu, _ = fleet.model.apply(
                {"params": params, "batch_stats": stats}, x,
                method=fleet.model.encoder)
            return mu

        z1 = enc(jax.tree_util.tree_map(lambda a: a[m1], fleet_state["params"]),
                 jax.tree_util.tree_map(lambda a: a[m1], fleet_state["batch_stats"]),
                 batch[m1])
        z2 = enc(jax.tree_util.tree_map(lambda a: a[m2], fleet_state["params"]),
                 jax.tree_util.tree_map(lambda a: a[m2], fleet_state["batch_stats"]),
                 batch[m2])
        return z1, z2

    key = jax.random.key(args.seed)
    rng = np.random.default_rng(args.seed)
    mgr = CheckpointManager(args.ckpt_dir)
    start_epoch = 0
    if args.resume and mgr.exists("resume"):
        target = {"params": params, "opt_state": opt_state, "epoch": 0,
                  "key": jax.random.key_data(key)}
        saved = mgr.restore(target, "resume")
        params, opt_state = saved["params"], saved["opt_state"]
        start_epoch = int(saved["epoch"]) + 1
        key = jax.random.wrap_key_data(jnp.asarray(saved["key"]))
        # Replay the host RNG (pair choices) to its position at preemption.
        rng = np.random.default_rng(args.seed + start_epoch)
        print(f"resumed from epoch {start_epoch}", flush=True)

    params = replicate_tree(params, rep)
    opt_state = replicate_tree(opt_state, rep)
    fleet_state = replicate_tree(fleet_state, rep)
    n = pixels.shape[1]
    it = BatchIterator(np.arange(n), args.batch_size, seed=args.seed)
    for epoch in range(start_epoch, args.epochs):
        t0, losses = time.time(), []
        for idx in it.epoch():
            batch = put_batch(jnp.asarray(to_float01(
                pixels[:, np.asarray(idx)])), batch_sh, axis=1)
            m1, m2 = rng.permutation(args.n_mod)[:2]
            z1, z2 = encode_pair(fleet_state, batch, int(m1), int(m2))
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, z1, z2,
                                           int(m1), int(m2), sub)
            losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(losses)))  # one sync per epoch
        print(f"epoch {epoch}: nce={mean_loss:.4f} "
              f"({time.time()-t0:.1f}s)", flush=True)
        mgr.save_last({"params": params})
        mgr.save_best({"params": params}, mean_loss)
        mgr.save_resume({
            "params": params, "opt_state": opt_state, "epoch": epoch,
            "key": jax.random.key_data(key)})
    mgr.wait()


if __name__ == "__main__":
    main()
