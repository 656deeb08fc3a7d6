"""End-to-end CLI chain smoke test: train_vae -> train_score -> sample ->
evaluate on synthetic data (tiny sizes). Mirrors the verify-skill drive."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ckpt_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli_chain"))


def _run(main, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        main()
    finally:
        sys.argv = old


def test_cli_chain(ckpt_root, capsys):
    from score_based_multimodal_autoencoder_tpu.cli.evaluate import main as eval_main
    from score_based_multimodal_autoencoder_tpu.cli.sample import main as sample_main
    from score_based_multimodal_autoencoder_tpu.cli.train_score import (
        main as score_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_vae import main as vae_main

    common = ["--synthetic", "--synthetic-n", "64", "--n-mod", "2",
              "--batch-size", "32"]
    dim = ["--dim", "16"]  # smoke-sized score UNet (reference default 128)
    _run(vae_main, common + ["--epochs", "1", "--ckpt-dir", f"{ckpt_root}/vae"])
    _run(score_main, common + dim + ["--epochs", "1",
                                     "--vae-ckpt", f"{ckpt_root}/vae",
                                     "--ckpt-dir", f"{ckpt_root}/score"])
    out_png = f"{ckpt_root}/grid.png"
    _run(sample_main, dim + ["--vae-ckpt", f"{ckpt_root}/vae",
                             "--score-ckpt", f"{ckpt_root}/score", "--n-mod", "2",
                             "--amount", "2", "--given", "0", "--synthetic",
                             "--out", out_png])
    assert os.path.exists(out_png)

    capsys.readouterr()  # drain training logs
    _run(eval_main, dim + ["--synthetic", "--n-mod", "2", "--amount", "8",
                           "--vae-ckpt", f"{ckpt_root}/vae",
                           "--score-ckpt", f"{ckpt_root}/score",
                           "--predicted", "1"])
    out = capsys.readouterr().out
    start = out.index("{")
    res = json.loads(out[start:])
    assert "1" in res["fid"] and np.isfinite(res["fid"]["1"])
    assert os.path.getsize(out_png) > 0


def test_cli_evaluate_with_baseline(ckpt_root, capsys):
    """--baseline runs the multimodal-VAE baselines through the SAME
    protocols side by side (fid_upd10.py:375-463, poly_calc_perf_an.py)."""
    from score_based_multimodal_autoencoder_tpu.cli.evaluate import (
        main as eval_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_baseline import (
        main as baseline_main,
    )

    assert os.path.isdir(f"{ckpt_root}/score")  # chain ran first
    _run(baseline_main, ["--synthetic", "--synthetic-n", "64", "--n-mod",
                         "2", "--batch-size", "32", "--epochs", "1",
                         "--mix-type", "mopoe",
                         "--ckpt-dir", f"{ckpt_root}/mopoe"])
    capsys.readouterr()
    _run(eval_main, ["--dim", "16", "--synthetic", "--n-mod", "2",
                     "--amount", "8", "--vae-ckpt", f"{ckpt_root}/vae",
                     "--score-ckpt", f"{ckpt_root}/score",
                     "--baseline", f"mopoe={ckpt_root}/mopoe",
                     "--predicted", "1"])
    out = capsys.readouterr().out
    res = json.loads(out[out.index("{"):])
    assert set(res) == {"score", "mopoe"}
    for name in res:
        assert "1" in res[name]["fid"] and np.isfinite(res[name]["fid"]["1"])


def test_cli_ae_track_chain(ckpt_root, capsys):
    """The AE track end to end (VERDICT r2 #5): regularized AEs
    (train_polyupdAE.py) -> sigma-index NCSN score (--track ae) ->
    annealed-Langevin generation through the same FID/coherence protocols
    (gen_ae, fid_upd10.py:56-110)."""
    import numpy as np

    from score_based_multimodal_autoencoder_tpu.cli.evaluate import (
        main as eval_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_score import (
        main as score_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_vae import (
        main as vae_main,
    )

    common = ["--synthetic", "--synthetic-n", "64", "--n-mod", "2",
              "--batch-size", "32"]
    _run(vae_main, common + ["--vae-type", "ae", "--epochs", "1",
                             "--ckpt-dir", f"{ckpt_root}/ae"])
    _run(score_main, common + ["--dim", "16", "--epochs", "1",
                               "--track", "ae", "--sigma-levels", "20",
                               "--vae-ckpt", f"{ckpt_root}/ae",
                               "--ckpt-dir", f"{ckpt_root}/score_ae"])
    capsys.readouterr()
    _run(eval_main, ["--dim", "16", "--synthetic", "--n-mod", "2",
                     "--amount", "8", "--track", "ae",
                     "--sigma-levels", "20", "--iter-num", "2",
                     "--vae-ckpt", f"{ckpt_root}/ae",
                     "--score-ckpt", f"{ckpt_root}/score_ae",
                     "--predicted", "1"])
    out = capsys.readouterr().out
    res = json.loads(out[out.index("{"):])
    assert "1" in res["fid"] and np.isfinite(res["fid"]["1"])


def test_cli_tpu_preset_chain(ckpt_root):
    """--tpu-preset (128-stem + MXU depthwise) trains and samples end to
    end; its checkpoints are read back with the same flag."""
    from score_based_multimodal_autoencoder_tpu.cli.sample import (
        main as sample_main,
    )
    from score_based_multimodal_autoencoder_tpu.cli.train_score import (
        main as score_main,
    )

    assert os.path.isdir(f"{ckpt_root}/vae")  # chain ran first
    common = ["--synthetic", "--synthetic-n", "64", "--n-mod", "2",
              "--batch-size", "32", "--dim", "16", "--tpu-preset"]
    _run(score_main, common + ["--epochs", "1",
                               "--vae-ckpt", f"{ckpt_root}/vae",
                               "--ckpt-dir", f"{ckpt_root}/score_tpu"])
    out_png = f"{ckpt_root}/grid_tpu.png"
    _run(sample_main, ["--dim", "16", "--tpu-preset",
                       "--vae-ckpt", f"{ckpt_root}/vae",
                       "--score-ckpt", f"{ckpt_root}/score_tpu",
                       "--n-mod", "2", "--amount", "2", "--given", "0",
                       "--synthetic", "--out", out_png])
    assert os.path.getsize(out_png) > 0
