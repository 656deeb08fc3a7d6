"""bench.py machinery on a tiny CPU workload.

The driver runs ``python bench.py`` unattended on the TPU at round end;
these tests keep its measurement plumbing (Workload timing paths,
force_sync, device-wait retry) from rotting between TPU runs. Uses a
deliberately tiny model/grid so the whole file adds ~a minute to the
suite.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _tiny():
    return bench.Workload("tiny", 16, 3, 8, (1, 2), 5)


def test_wait_for_devices_returns_devices():
    devs = bench.wait_for_devices(5)
    assert len(devs) >= 1


def test_force_sync_handles_scalars_and_arrays():
    import jax.numpy as jnp

    bench.force_sync(jnp.ones((2, 3)))
    bench.force_sync(jnp.float32(1.5))


def test_time_fused_both_param_plumbings():
    w = _tiny()
    sec_args = w.time_fused(4, reps=1, bake_params=False)
    sec_baked = w.time_fused(4, reps=1, bake_params=True)
    assert sec_args > 0 and sec_baked > 0


def test_time_python_loop_and_train_step():
    w = _tiny()
    assert w.time_python_loop(4, reps=1) > 0
    assert w.time_train_step(4, reps=2) > 0


def test_measure_reports_sps_and_mfu():
    w = _tiny()
    m = w.measure(4, peak=1e12, label="tiny-b4", reps=1, bake_params=True)
    assert m["sps"] > 0 and m["sec"] > 0
    assert np.isfinite(m["mfu"]) and m["mfu"] >= 0
