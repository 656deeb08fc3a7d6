"""Decoder finetuning + mask preprocessing tool tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from score_based_multimodal_autoencoder_tpu.data.celeba_mask_tool import (
    colorize_index_mask,
    create_masks,
    merge_mask,
)
from score_based_multimodal_autoencoder_tpu.models import ResVAE
from score_based_multimodal_autoencoder_tpu.parallel import VAEFleet
from score_based_multimodal_autoencoder_tpu.train.finetune import make_finetune_step


def test_finetune_step_runs_and_masks():
    vae = ResVAE(((8, 8, 8, 2), (8, 16, 16, 2)), ((16, 8, 8, 2), (8, 8, 8, 2)),
                 size_in=16, size_z=8, img_ch=3, variant="poly")
    fleet = VAEFleet(vae, 2, optax.adam(1e-3))
    state = fleet.init(jax.random.key(0), jnp.zeros((4, 16, 16, 3)))
    batch = jax.random.uniform(jax.random.key(1), (2, 4, 16, 16, 3))

    score_fn = lambda z: -z  # score of N(0, I) over the flat concat
    step = jax.jit(make_finetune_step(fleet, score_fn, drop_p=1.0, n_comp=5))
    new_state, losses = step(state, batch, jax.random.key(2))
    assert losses.shape == (2,)
    assert np.isfinite(np.array(losses)).all()
    # drop_p=1 -> all modalities trained -> params change.
    a = jax.tree_util.tree_leaves(state["params"])[0]
    b = jax.tree_util.tree_leaves(new_state["params"])[0]
    assert np.abs(np.array(a) - np.array(b)).max() > 0

    # drop_p=0 -> nothing trained -> losses masked to zero.
    step0 = jax.jit(make_finetune_step(fleet, score_fn, drop_p=0.0, n_comp=2))
    _, losses0 = step0(state, batch, jax.random.key(3))
    np.testing.assert_allclose(np.array(losses0), 0.0)


def test_mask_tool(tmp_path):
    from PIL import Image

    anno = tmp_path / "anno" / "0"
    os.makedirs(anno)
    # Part PNGs for image k=0: nose blob + hair blob + skin (excluded in gray).
    for label, region in [("nose", (100, 150)), ("hair", (300, 400)),
                          ("skin", (0, 512))]:
        arr = np.zeros((512, 512), np.uint8)
        arr[region[0]:region[1], :] = 255
        Image.fromarray(arr).save(anno / f"00000_{label}.png")

    gray = merge_mask(str(tmp_path / "anno"), 0, "gray")
    assert gray[120, 0] == 255 and gray[350, 0] == 255
    assert gray[10, 0] == 0  # skin excluded (create_celeba_mask.py:28)

    idx = merge_mask(str(tmp_path / "anno"), 0, "index")
    assert idx[10, 0] == 1  # skin = index 1 in the 18-label list
    color = colorize_index_mask(idx)
    assert color.shape == (512, 512, 3)

    out = tmp_path / "out"
    create_masks(str(tmp_path / "anno"), str(out), "gray", img_num=1)
    assert (out / "0.png").exists()
