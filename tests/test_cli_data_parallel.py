"""--data-parallel smoke runs for the trainer CLIs wired in round 3
(classifier / EBM / finetune / refiner) on the 8-device virtual mesh.

The VAE/score trainers' DP paths have full numeric-equivalence coverage in
tests/test_parallel.py; these four just need their mesh plumbing exercised
(replicated state, sharded batches, checkpoints written host-shape-stable).
"""

import os
import sys

import pytest


@pytest.fixture(scope="module")
def ckpt_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli_dp"))


def _run(main, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        main()
    finally:
        sys.argv = old


def test_classifier_dp(ckpt_root):
    from score_based_multimodal_autoencoder_tpu.cli.train_classifier import (
        main,
    )

    _run(main, ["--synthetic", "--synthetic-n", "64", "--n-mod", "2",
                "--epochs", "1", "--batch-size", "16", "--data-parallel",
                "--ckpt-dir", f"{ckpt_root}/clf"])
    assert os.path.isdir(f"{ckpt_root}/clf/best")


def test_ebm_and_finetune_dp(ckpt_root):
    from score_based_multimodal_autoencoder_tpu.cli.finetune import (
        main as ft_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_ebm import (
        main as ebm_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_vae import (
        main as vae_main,
    )

    common = ["--synthetic", "--synthetic-n", "64", "--n-mod", "2",
              "--batch-size", "16", "--epochs", "1"]
    _run(vae_main, common + ["--ckpt-dir", f"{ckpt_root}/vae"])
    _run(ebm_main, common + ["--vae-ckpt", f"{ckpt_root}/vae",
                             "--data-parallel",
                             "--ckpt-dir", f"{ckpt_root}/ebm"])
    assert os.path.isdir(f"{ckpt_root}/ebm/best")
    _run(ft_main, common + ["--vae-ckpt", f"{ckpt_root}/vae",
                            "--sm-epochs", "1", "--n-comp", "3",
                            "--data-parallel",
                            "--sm-ckpt", f"{ckpt_root}/sm",
                            "--ckpt-dir", f"{ckpt_root}/ft"])
    assert os.path.isdir(f"{ckpt_root}/ft/best")


def test_refiner_dp(ckpt_root):
    from score_based_multimodal_autoencoder_tpu.cli.train_refiner import (
        main as ref_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_vae import (
        main as vae_main,
    )

    smoke = ["--synthetic", "--synthetic-n", "16", "--size", "16",
             "--size-z", "16", "--epochs", "1"]
    _run(vae_main, smoke + ["--dataset", "celeba_image", "--batch-size", "8",
                            "--ckpt-dir", f"{ckpt_root}/cel_img"])
    _run(ref_main, smoke + ["--image-ckpt", f"{ckpt_root}/cel_img",
                            "--model-channels", "8", "--channel-mult", "1,2",
                            "--num-res-blocks", "1",
                            "--attention-resolutions", "",
                            "--timesteps", "5", "--batch-size", "8",
                            "--data-parallel",
                            "--ckpt-dir", f"{ckpt_root}/refiner"])
    assert os.path.isdir(f"{ckpt_root}/refiner/best")
