"""Profiling + debug utilities.

The reference's tracing is wall-clock prints around train/val loops
(/root/reference/train_polyupd.py:81-101; SURVEY.md §5). Here:

- ``phase_timer``: the same per-phase wall-clock, as a context manager.
- ``trace``: wraps ``jax.profiler.trace`` for real TPU traces viewable in
  TensorBoard/XProf.
- ``enable_nan_debugging``: flips ``jax_debug_nans`` (the JAX analogue of a
  sanitizer pass; the reference has none).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def phase_timer(name: str, printer=print):
    t0 = time.time()
    yield
    printer(f"{name.upper()} TIME TAKEN: {time.time() - t0}", flush=True)


@contextlib.contextmanager
def trace(logdir: str):
    with jax.profiler.trace(logdir):
        yield


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
