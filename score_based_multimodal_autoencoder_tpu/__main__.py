"""Unified entry point: ``python -m score_based_multimodal_autoencoder_tpu <command>``.

The reference drives everything through per-task scripts (`train_poly.sh`,
`fid_upd10.py`, ...); here every surface is one package with subcommands
(each also runnable directly as ``python -m ...cli.<command>``).
"""

import sys

COMMANDS = {
    "train-vae": ("cli.train_vae", "stage-1 per-modality VAE/AE fleet"),
    "train-score": ("cli.train_score", "stage-2 joint latent score model"),
    "train-cond-score": ("cli.train_cond_score",
                         "z-conditioned score (+ contrastive pretraining)"),
    "train-ebm": ("cli.train_ebm", "pairwise coherence EBM (NCE)"),
    "train-classifier": ("cli.train_classifier",
                         "digit / attribute classifiers"),
    "train-baseline": ("cli.train_baseline",
                       "MoPoE / MMVAE / MVAE / MVTCAE / MMVAE+"),
    "train-refiner": ("cli.train_refiner", "DiffuseVAE pixel refiner"),
    "finetune": ("cli.finetune", "score-guided decoder finetuning"),
    "sample": ("cli.sample", "PolyMNIST conditional/unconditional grids"),
    "sample-celeba": ("cli.sample_celeba", "CelebA per-given-set grids"),
    "evaluate": ("cli.evaluate", "PolyMNIST FID/coherence protocols"),
    "evaluate-celeba": ("cli.evaluate_celeba", "CelebA 7-given-set sweep"),
    "convert": ("cli.convert", "reference torch checkpoint -> framework"),
    "fid": ("eval.fid", "pytorch_fid-style directory FID"),
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        prog = "python -m score_based_multimodal_autoencoder_tpu"
        print(f"usage: {prog} <command> [args]\n\ncommands:")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:18s} {desc}")
        print(f"\n'{prog} <command> --help' shows each command's flags.")
        raise SystemExit(0 if len(sys.argv) >= 2 else 2)
    cmd = sys.argv[1]
    if cmd not in COMMANDS:
        raise SystemExit(f"unknown command {cmd!r} (try --help)")
    import importlib

    module = importlib.import_module(
        f"score_based_multimodal_autoencoder_tpu.{COMMANDS[cmd][0]}")
    sys.argv = [f"{sys.argv[0]} {cmd}"] + sys.argv[2:]
    module.main()


if __name__ == "__main__":
    main()
