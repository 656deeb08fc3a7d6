"""Train the PolyMNIST digit classifier used for coherence scoring.

The reference ships only a (missing) binary checkpoint ``pm_clf_best``
(/root/reference/.MISSING_LARGE_BLOBS:1); this trains the same PMCLF
architecture (/root/reference/polymnist_model.py:372-392) in-framework.
Trains on 28x28 center crops across ALL modalities jointly.

    python -m score_based_multimodal_autoencoder_tpu.cli.train_classifier \
        --synthetic --epochs 10
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=2048)
    p.add_argument("--data-root", default=None)
    p.add_argument("--n-mod", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
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
    for epoch in range(args.epochs):
        t0, losses = time.time(), []
        for b in it.epoch():
            x = center_crop_28(jnp.asarray(to_float01(b["x"])))
            params, opt_state, loss = step(params, opt_state, x,
                                           jnp.asarray(b["y"]))
            losses.append(float(loss))
        vx = center_crop_28(jnp.asarray(to_float01(val.images[0, :512])))
        acc = float(accuracy(params, vx, jnp.asarray(val.labels[:512])))
        print(f"epoch {epoch}: ce={np.mean(losses):.4f} val_acc={acc:.3f} "
              f"({time.time()-t0:.1f}s)", flush=True)
        mgr.save_last({"params": params})
        mgr.save_best({"params": params}, 1.0 - acc)
    mgr.wait()


if __name__ == "__main__":
    main()
