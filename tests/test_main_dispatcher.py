"""Unified package entry point (__main__.py)."""

import subprocess
import sys

import pytest


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "score_based_multimodal_autoencoder_tpu",
         *args],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)


def test_help_lists_all_commands():
    out = _run(["--help"])
    assert out.returncode == 0
    for cmd in ("train-vae", "train-score", "evaluate-celeba", "convert",
                "fid"):
        assert cmd in out.stdout


def test_unknown_command_fails_loud():
    out = _run(["frobnicate"])
    assert out.returncode != 0
    assert "unknown command" in out.stderr


def test_every_command_resolves():
    """Each mapped module imports and exposes main (no subprocess per
    command - the mapping is what can rot)."""
    import importlib

    from score_based_multimodal_autoencoder_tpu.__main__ import COMMANDS

    for name, (path, _) in COMMANDS.items():
        mod = importlib.import_module(
            f"score_based_multimodal_autoencoder_tpu.{path}")
        assert callable(getattr(mod, "main", None)), name
