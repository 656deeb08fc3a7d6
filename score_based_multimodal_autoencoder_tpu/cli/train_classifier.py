"""Train the coherence/eval classifiers.

- PolyMNIST digit classifier (PMCLF): the reference ships only a (missing)
  binary checkpoint ``pm_clf_best`` (/root/reference/.MISSING_LARGE_BLOBS:1);
  this trains the same architecture (/root/reference/polymnist_model.py:
  372-392) on 28x28 center crops across ALL modalities jointly.
- CelebA attribute classifier (ResCLF, h_vae_model_copy.py:208-235): used
  for the FGSM adversarial eval (train_lat_celebhq_unet_cont2_cond.py:
  61-78,643-646); its training script is also absent upstream - trained
  here with BCE-with-logits over the 18 visible attributes.

    python -m score_based_multimodal_autoencoder_tpu.cli.train_classifier \
        --synthetic --epochs 10
    python -m ...cli.train_classifier --dataset celeba --synthetic
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="polymnist",
                   choices=["polymnist", "celeba"])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=2048)
    p.add_argument("--data-root", default=None)
    p.add_argument("--n-mod", type=int, default=10)
    p.add_argument("--size", type=int, default=128,
                   help="celeba input resolution (128 = reference)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="continue from the resume checkpoint in --ckpt-dir")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all devices (DP mesh)")
    p.add_argument("--ckpt-dir", default="./checkpoints/pm_clf")
    args = p.parse_args()

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data.loader import BatchIterator, to_float01
    from ..models.classifiers import PolyMNISTClassifier, center_crop_28
    from ..train.checkpoints import CheckpointManager
    from ..parallel import dp_shardings, put_batch, replicate_tree

    if args.dataset == "celeba":
        _train_celeba_attr_clf(args)
        return

    if args.synthetic:
        from ..data import synthetic_polymnist

        ds = synthetic_polymnist(args.synthetic_n, args.n_mod, 32, args.seed)
        val = synthetic_polymnist(max(256, args.synthetic_n // 8), args.n_mod,
                                  32, args.seed + 1)
    else:
        from ..data import load_polymnist

        ds = load_polymnist(args.data_root, "train")
        val = load_polymnist(args.data_root, "val")

    clf = PolyMNISTClassifier()
    variables = clf.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])
    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)
    rep, batch_sh = dp_shardings(mesh, modality_major=False)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = clf.apply({"params": p}, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, x, y):
        pred = jnp.argmax(clf.apply({"params": params}, x), -1)
        return (pred == y).mean()

    # Flatten (modality, sample) into one pool - a digit is a digit.
    n_mod, n = ds.images.shape[:2]
    flat_images = ds.images.reshape(n_mod * n, *ds.images.shape[2:])
    flat_labels = np.tile(ds.labels, n_mod)
    it = BatchIterator({"x": flat_images, "y": flat_labels},
                       args.batch_size, seed=args.seed)
    mgr = CheckpointManager(args.ckpt_dir)
    params = variables["params"]
    start_epoch = 0
    if args.resume and mgr.exists("resume"):
        target = {"params": params, "opt_state": opt_state, "epoch": 0,
                  "best_metric": np.nan}
        saved = mgr.restore(target, "resume")
        params, opt_state = saved["params"], saved["opt_state"]
        start_epoch = int(saved["epoch"]) + 1
        best = float(saved["best_metric"])
        mgr.best_metric = None if np.isnan(best) else best
        print(f"resumed classifier from epoch {start_epoch}", flush=True)
    params = replicate_tree(params, rep)
    opt_state = replicate_tree(opt_state, rep)
    for epoch in range(start_epoch, args.epochs):
        t0, losses = time.time(), []
        for b in it.epoch():
            x = put_batch(center_crop_28(jnp.asarray(to_float01(b["x"]))),
                           batch_sh, axis=0)
            params, opt_state, loss = step(params, opt_state, x,
                                           put_batch(jnp.asarray(b["y"]),
                                                      batch_sh, axis=0))
            losses.append(loss)
        vx = center_crop_28(jnp.asarray(to_float01(val.images[0, :512])))
        acc = float(accuracy(params, vx, jnp.asarray(val.labels[:512])))
        print(f"epoch {epoch}: ce={float(jnp.mean(jnp.stack(losses))):.4f} "
              f"val_acc={acc:.3f} ({time.time()-t0:.1f}s)", flush=True)
        mgr.save_last({"params": params})
        mgr.save_best({"params": params}, 1.0 - acc)
        mgr.save_resume({"params": params, "opt_state": opt_state,
                         "epoch": epoch,
                         "best_metric": (np.nan if mgr.best_metric is None
                                         else mgr.best_metric)})
    mgr.wait()


def _train_celeba_attr_clf(args):
    """ResCLF attribute classifier: image -> 18 attr logits, BCE training,
    best-on-val-F1 checkpoints (reconstructed from the FGSM call sites,
    train_lat_celebhq_unet_cont2_cond.py:643-646)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data.loader import BatchIterator, to_float01
    from ..eval.metrics import samples_f1
    from ..models.classifiers import ResClassifier
    from ..train.checkpoints import CheckpointManager
    from ..parallel import dp_shardings, put_batch, replicate_tree

    from ..parallel import mesh_from_flag

    mesh = mesh_from_flag(args.data_parallel)
    rep, batch_sh = dp_shardings(mesh, modality_major=False)

    if args.synthetic:
        from ..data import synthetic_celeba

        tr = synthetic_celeba(args.synthetic_n, size=args.size, seed=args.seed)
        va = synthetic_celeba(max(32, args.synthetic_n // 8), size=args.size,
                              seed=args.seed + 1)
    else:
        from ..data import load_celeba_hq

        tr = load_celeba_hq(args.data_root, "train")
        va = load_celeba_hq(args.data_root, "val")

    chans = (((64, 128, 128, 2), (128, 256, 256, 2), (256, 512, 512, 2))
             if args.size == 128 else ((8, 8, 8, 2), (8, 16, 16, 2)))
    clf = ResClassifier(chans, size_out=18)
    variables = clf.init(jax.random.key(0),
                         jnp.zeros((2, args.size, args.size, 3)), True)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, x, y):
        def loss_fn(p):
            logits, upd = clf.apply({"params": p, "batch_stats": stats}, x,
                                    True, mutable=["batch_stats"])
            bce = jnp.maximum(logits, 0) - logits * y + jnp.log1p(
                jnp.exp(-jnp.abs(logits)))
            return bce.mean(), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    @jax.jit
    def predict(params, stats, x):
        return jax.nn.sigmoid(clf.apply({"params": params,
                                         "batch_stats": stats}, x))

    mgr = CheckpointManager(args.ckpt_dir)
    start_epoch = 0
    if args.resume and mgr.exists("resume"):
        target = {"params": params, "batch_stats": stats,
                  "opt_state": opt_state, "epoch": 0, "best_metric": np.nan}
        saved = mgr.restore(target, "resume")
        params, stats = saved["params"], saved["batch_stats"]
        opt_state = saved["opt_state"]
        start_epoch = int(saved["epoch"]) + 1
        best = float(saved["best_metric"])
        mgr.best_metric = None if np.isnan(best) else best
        print(f"resumed classifier from epoch {start_epoch}", flush=True)
    params = replicate_tree(params, rep)
    stats = replicate_tree(stats, rep)
    opt_state = replicate_tree(opt_state, rep)
    it = BatchIterator(np.arange(len(tr)), args.batch_size, seed=args.seed)
    vx = jnp.asarray(to_float01(va.images[:256]))
    vy = jnp.asarray(va.visible_attrs()[:256])
    for epoch in range(start_epoch, args.epochs):
        t0, losses = time.time(), []
        for idx in it.epoch():
            i = np.asarray(idx)
            x = put_batch(jnp.asarray(to_float01(tr.images[i])),
                           batch_sh, axis=0)
            y = put_batch(jnp.asarray(tr.visible_attrs()[i]),
                           batch_sh, axis=0)
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  x, y)
            losses.append(loss)
        f1 = float(samples_f1(predict(params, stats, vx), vy, 0.5))
        print(f"epoch {epoch}: bce={float(jnp.mean(jnp.stack(losses))):.4f} "
              f"val_f1={f1:.3f} ({time.time()-t0:.1f}s)", flush=True)
        mgr.save_last({"params": params, "batch_stats": stats})
        mgr.save_best({"params": params, "batch_stats": stats}, 1.0 - f1)
        mgr.save_resume({"params": params, "batch_stats": stats,
                         "opt_state": opt_state, "epoch": epoch,
                         "best_metric": (np.nan if mgr.best_metric is None
                                         else mgr.best_metric)})
    mgr.wait()


if __name__ == "__main__":
    main()
