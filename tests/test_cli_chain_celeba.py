"""End-to-end CelebA CLI chain on synthetic data (smoke sizes): three
stage-1 VAEs -> baseline -> joint score (with in-training eval hook) ->
evaluate_celeba sweep -> refiner -> cond-score. Mirrors the reference's
CelebA script surface (train_cel.sh, eval_lat_celeba_hq_all.py)."""

import json
import os
import sys

import pytest


@pytest.fixture(scope="module")
def ckpt_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli_celeba"))


def _run(main, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        main()
    finally:
        sys.argv = old


SMOKE = ["--synthetic", "--synthetic-n", "24", "--size", "16",
         "--size-z", "16", "--batch-size", "12", "--epochs", "1"]


def test_celeba_cli_chain(ckpt_root, capsys):
    from score_based_multimodal_autoencoder_tpu.cli.evaluate_celeba import (
        main as eval_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_baseline import (
        main as baseline_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_score import (
        main as score_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_vae import (
        main as vae_main,
    )

    for ds in ["celeba_image", "celeba_mask", "celeba_attr"]:
        _run(vae_main, SMOKE + ["--dataset", ds,
                                "--ckpt-dir", f"{ckpt_root}/{ds}"])

    _run(baseline_main, SMOKE + ["--dataset", "celeba", "--mix-type", "mopoe",
                                 "--ckpt-dir", f"{ckpt_root}/mopoe"])

    vaes = ["--image-ckpt", f"{ckpt_root}/celeba_image",
            "--mask-ckpt", f"{ckpt_root}/celeba_mask",
            "--attr-ckpt", f"{ckpt_root}/celeba_attr"]
    _run(score_main, SMOKE + vaes + [
        "--preset", "celebhq", "--dim", "16", "--dim-mults", "1,2",
        "--eval-every", "1", "--eval-amount", "8",
        "--metrics", f"{ckpt_root}/metrics.jsonl",
        "--ckpt-dir", f"{ckpt_root}/score"])
    rows = [json.loads(l) for l in open(f"{ckpt_root}/metrics.jsonl")]
    assert any("val_dsm" in r for r in rows)
    # calc_perf-style per-given-set metrics logged in-training.
    assert any(any(k.endswith("attr_f1") for k in r) for r in rows)

    capsys.readouterr()
    _run(eval_main, vaes + [
        "--synthetic", "--amount", "8", "--size", "16", "--size-z", "16",
        "--dim", "16", "--dim-mults", "1,2", "--sample-n", "5",
        "--fid", "none", "--score-ckpt", f"{ckpt_root}/score",
        "--baseline", f"mopoe={ckpt_root}/mopoe",
        "--given-sets", ",1,02", "--out", f"{ckpt_root}/eval.jsonl"])
    out = capsys.readouterr().out
    assert "mask_f1" in out
    rows = [json.loads(l) for l in open(f"{ckpt_root}/eval.jsonl")]
    models = {r["model"] for r in rows}
    assert models == {"score", "mopoe"}
    assert len(rows) == 6  # 2 models x 3 given-sets
    assert all("attr_f1" in r and "mask_acc" in r for r in rows)


def test_celeba_refiner_and_cond_cli(ckpt_root):
    """Refiner + z-cond score CLIs run from the same stage-1 checkpoints."""
    from score_based_multimodal_autoencoder_tpu.cli.train_cond_score import (
        main as cond_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_refiner import (
        main as refiner_main,
    )

    assert os.path.isdir(f"{ckpt_root}/celeba_image")  # chain ran first
    _run(refiner_main, SMOKE + [
        "--image-ckpt", f"{ckpt_root}/celeba_image",
        "--model-channels", "8", "--channel-mult", "1,2",
        "--num-res-blocks", "1", "--attention-resolutions", "",
        "--timesteps", "10", "--ckpt-dir", f"{ckpt_root}/refiner"])
    assert os.path.isdir(f"{ckpt_root}/refiner/best")

    _run(cond_main, SMOKE + [
        "--image-ckpt", f"{ckpt_root}/celeba_image",
        "--mask-ckpt", f"{ckpt_root}/celeba_mask",
        "--attr-ckpt", f"{ckpt_root}/celeba_attr",
        "--contrastive-ckpt", f"{ckpt_root}/contrastive",
        "--pretrain-contrastive", "1", "--rep-dim", "32",
        "--model-channels", "8", "--channel-mult", "1,2",
        "--steps-per-dispatch", "2",
        "--eval-every", "1", "--eval-amount", "8", "--sample-n", "5",
        "--metrics", f"{ckpt_root}/cond_metrics.jsonl",
        "--ckpt-dir", f"{ckpt_root}/cond_score"])
    assert os.path.isdir(f"{ckpt_root}/cond_score/last")
    rows = [json.loads(l)
            for l in open(f"{ckpt_root}/cond_metrics.jsonl")]
    assert any("cond_dsm" in r for r in rows)
    assert any(any(k.endswith("attr_f1") for k in r) for r in rows)


def test_celeba_annealed_track_cli(ckpt_root, capsys):
    """CelebA annealed-Langevin eval track (eval_lat_celeba_hq_all.py:
    211-343): sigma-index score net over the stage-1 latents, per-given-set
    tuned (er, c) grids, same metric table."""
    from score_based_multimodal_autoencoder_tpu.cli.evaluate_celeba import (
        main as eval_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_score import (
        main as score_main,
    )

    assert os.path.isdir(f"{ckpt_root}/celeba_image")  # chain ran first
    vaes = ["--image-ckpt", f"{ckpt_root}/celeba_image",
            "--mask-ckpt", f"{ckpt_root}/celeba_mask",
            "--attr-ckpt", f"{ckpt_root}/celeba_attr"]
    _run(score_main, SMOKE + vaes + [
        "--preset", "celebhq", "--dim", "16", "--dim-mults", "1,2",
        "--track", "ae", "--sigma-levels", "10",
        "--ckpt-dir", f"{ckpt_root}/score_ann"])
    capsys.readouterr()
    _run(eval_main, vaes + [
        "--synthetic", "--amount", "8", "--size", "16", "--size-z", "16",
        "--dim", "16", "--dim-mults", "1,2", "--fid", "none",
        "--track", "annealed-vae", "--sigma-levels", "10", "--iter-num", "1",
        "--score-ckpt", f"{ckpt_root}/score_ann",
        "--given-sets", ",1,02", "--out", f"{ckpt_root}/eval_ann.jsonl"])
    capsys.readouterr()
    rows = [json.loads(l) for l in open(f"{ckpt_root}/eval_ann.jsonl")]
    assert len(rows) == 3
    assert all("attr_f1" in r and "mask_f1" in r for r in rows)


def test_celeba_eval_refined_fid_and_repeats(ckpt_root, capsys):
    """--refiner-ckpt adds the refined image-FID column to the quantitative
    sweep (eval_lat_celeba_hq_all.py:72-122, refiner at :448) and
    --fid-n-times regenerates per repeat with mean/std reporting
    (fid_upd10.py:556-587)."""
    from score_based_multimodal_autoencoder_tpu.cli.evaluate_celeba import (
        main as eval_main,
    )

    assert os.path.isdir(f"{ckpt_root}/refiner")  # refiner test ran first
    vaes = ["--image-ckpt", f"{ckpt_root}/celeba_image",
            "--mask-ckpt", f"{ckpt_root}/celeba_mask",
            "--attr-ckpt", f"{ckpt_root}/celeba_attr"]
    capsys.readouterr()
    _run(eval_main, vaes + [
        "--synthetic", "--amount", "8", "--size", "16", "--size-z", "16",
        "--dim", "16", "--dim-mults", "1,2", "--sample-n", "5",
        "--fid", "proxy", "--score-ckpt", f"{ckpt_root}/score",
        "--refiner-ckpt", f"{ckpt_root}/refiner",
        "--refiner-channels", "8", "--refiner-mult", "1,2",
        "--refiner-res-blocks", "1", "--refiner-attn", "",
        "--refiner-timesteps", "10",
        "--fid-n-times", "2", "--given-sets", ",1",
        "--out", f"{ckpt_root}/eval_refined.jsonl"])
    capsys.readouterr()
    rows = [json.loads(l) for l in open(f"{ckpt_root}/eval_refined.jsonl")]
    assert len(rows) == 2
    for r in rows:
        # Refined FID computed per cell alongside the raw FID, and the
        # repeat protocol reports the spread.
        assert "image_fid" in r and "image_fid_refined" in r
        assert r["image_fid_refined"] != r["image_fid"]
        assert r["n_repeats"] == 2 and "image_fid_std" in r


def test_celeba_attr_classifier_cli(ckpt_root):
    """ResCLF attribute-classifier training (reconstructed from the FGSM
    call sites, train_lat_celebhq_unet_cont2_cond.py:643-646)."""
    from score_based_multimodal_autoencoder_tpu.cli.train_classifier import (
        main as clf_main,
    )

    _run(clf_main, ["--dataset", "celeba", "--synthetic", "--synthetic-n",
                    "24", "--size", "16", "--batch-size", "12", "--epochs",
                    "1", "--ckpt-dir", f"{ckpt_root}/attr_clf"])
    assert os.path.isdir(f"{ckpt_root}/attr_clf/best")
