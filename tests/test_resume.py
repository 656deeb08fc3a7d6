"""Preemption-safe resume: train N epochs in two runs == checkpoint state
advances and the PRNG key round-trips. Covers all three trainers
(score / fleet / single-VAE), SURVEY.md §5 failure-recovery plan."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from score_based_multimodal_autoencoder_tpu.data import synthetic_polymnist
from score_based_multimodal_autoencoder_tpu.diffusion import VPSDE
from score_based_multimodal_autoencoder_tpu.models import ResVAE
from score_based_multimodal_autoencoder_tpu.nn import LatentUNet
from score_based_multimodal_autoencoder_tpu.parallel import VAEFleet
from score_based_multimodal_autoencoder_tpu.train.checkpoints import (
    CheckpointManager,
)
from score_based_multimodal_autoencoder_tpu.train.trainer import (
    train_score_model,
    train_single_vae,
    train_vae_fleet,
)


def test_score_trainer_resume(tmp_path):
    ds = synthetic_polymnist(n=48, n_mod=2, size=16, seed=0)
    # tiny custom VAE (size_in=16) so the fleet is cheap
    vae = ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)), ((16, 8, 8, 2), (8, 8, 8, 2)),
                 size_in=16, size_z=16, img_ch=3, variant="poly")
    fleet = VAEFleet(vae, 2, optax.adam(1e-3))
    fleet_state = fleet.init(jax.random.key(0), jnp.zeros((2, 16, 16, 3)))
    model = LatentUNet(dim=12, init_dim=8, channels=2, dim_mults=(1, 2))
    sde = VPSDE(N=20)
    ckpt = str(tmp_path / "score")

    kw = dict(lr=1e-3, batch_size=16, likelihood_weighting=False, seed=3,
              ckpt_dir=ckpt, ema_decay=0.99)
    out1 = train_score_model(model, sde, fleet, fleet_state, ds.images, 4,
                             epochs=2, **kw)
    # Resume continues from epoch 2 (no retraining of 0-1).
    out2 = train_score_model(model, sde, fleet, fleet_state, ds.images, 4,
                             epochs=4, resume=True, **kw)
    # Resumed params differ from run-1 end (epochs 2-3 trained).
    a = jax.tree_util.tree_leaves(out1["params"])[0]
    b = jax.tree_util.tree_leaves(out2["params"])[0]
    assert np.abs(np.array(a) - np.array(b)).max() > 0
    # The stored epoch advanced to 3.
    raw = CheckpointManager(ckpt).restore_raw("last")
    assert int(raw["epoch"]) == 3
    # Resuming a completed run is a no-op (start_epoch == epochs).
    out3 = train_score_model(model, sde, fleet, fleet_state, ds.images, 4,
                             epochs=4, resume=True, **kw)
    c = jax.tree_util.tree_leaves(out3["params"])[0]
    np.testing.assert_array_equal(np.array(b), np.array(c))


def _tiny_vae():
    return ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)), ((16, 8, 8, 2), (8, 8, 8, 2)),
                  size_in=16, size_z=16, img_ch=3, variant="poly")


def test_fleet_trainer_resume(tmp_path):
    ds = synthetic_polymnist(n=40, n_mod=2, size=16, seed=1)
    ckpt = str(tmp_path / "fleet")
    kw = dict(beta=0.5, lr=1e-3, batch_size=20, seed=5, ckpt_dir=ckpt)
    out1 = train_vae_fleet(_tiny_vae(), ds.images, ds.images[:, :20],
                           epochs=2, **kw)
    out2 = train_vae_fleet(_tiny_vae(), ds.images, ds.images[:, :20],
                           epochs=4, resume=True, **kw)
    a = jax.tree_util.tree_leaves(out1["state"]["params"])[0]
    b = jax.tree_util.tree_leaves(out2["state"]["params"])[0]
    assert np.abs(np.array(a) - np.array(b)).max() > 0
    raw = CheckpointManager(ckpt).restore_raw("resume")
    assert int(raw["epoch"]) == 3
    # Resuming a completed run is a no-op.
    out3 = train_vae_fleet(_tiny_vae(), ds.images, ds.images[:, :20],
                           epochs=4, resume=True, **kw)
    c = jax.tree_util.tree_leaves(out3["state"]["params"])[0]
    np.testing.assert_array_equal(np.array(b), np.array(c))


def test_single_vae_trainer_resume(tmp_path):
    ds = synthetic_polymnist(n=40, n_mod=1, size=16, seed=2)
    data = ds.images[0]
    ckpt = str(tmp_path / "vae")
    kw = dict(beta=0.5, lr=1e-3, batch_size=20, seed=6, ckpt_dir=ckpt)
    out1 = train_single_vae(_tiny_vae(), data, data[:20], epochs=2, **kw)
    out2 = train_single_vae(_tiny_vae(), data, data[:20], epochs=4,
                            resume=True, **kw)
    a = jax.tree_util.tree_leaves(out1["state"].params)[0]
    b = jax.tree_util.tree_leaves(out2["state"].params)[0]
    assert np.abs(np.array(a) - np.array(b)).max() > 0
    raw = CheckpointManager(ckpt).restore_raw("resume")
    assert int(raw["epoch"]) == 3
    out3 = train_single_vae(_tiny_vae(), data, data[:20], epochs=4,
                            resume=True, **kw)
    c = jax.tree_util.tree_leaves(out3["state"].params)[0]
    np.testing.assert_array_equal(np.array(b), np.array(c))


def test_checkpoint_saves_are_crash_safe(tmp_path):
    """A save must never leave the manager without a complete checkpoint:
    saves write to ``<name>.new`` and atomically swap (a kill inside
    orbax's force=True window previously ERASED ``last`` - observed live
    in the round-5 flagship run, where the resumed process silently
    restarted from epoch 0). Also covers recovery from stale ``.new`` /
    ``.old`` leftovers of an interrupted earlier save."""
    import os

    mgr = CheckpointManager(str(tmp_path / "ck"))
    state1 = {"params": {"w": jnp.ones((3,))}, "epoch": 1}
    state2 = {"params": {"w": jnp.full((3,), 2.0)}, "epoch": 2}
    mgr.save_last(state1)
    assert mgr.exists("last")
    # Overwrite: the previous complete dir must persist until the new one
    # is durable; afterwards no temp dirs remain.
    mgr.save_last(state2)
    got = mgr.restore_raw("last")
    assert int(got["epoch"]) == 2
    root = str(tmp_path / "ck")
    assert not os.path.isdir(os.path.join(root, "last.new"))
    assert not os.path.isdir(os.path.join(root, "last.old"))

    # Stale leftovers from a killed save must not break the next one.
    os.makedirs(os.path.join(root, "last.new", "junk"))
    os.makedirs(os.path.join(root, "last.old", "junk"))
    mgr.save_last(state1)
    got = mgr.restore_raw("last")
    assert int(got["epoch"]) == 1
    assert not os.path.isdir(os.path.join(root, "last.new"))
    assert not os.path.isdir(os.path.join(root, "last.old"))
