"""Input-pipeline throughput: can the host feed the b1024 train step?
(VERDICT r4 weak #6 / next #5.)

At the flagship's measured ~54k samples/s the device consumes a
(10, 1024, 32, 32, 3) batch every ~19 ms. This script measures, at
reference scale (60k images x 10 modalities, uint8 in RAM =
polymnist_dataset.py:29-35's eager layout):

  1. host-gather rate: ``gather_batch_01`` (fancy-index + f32/255,
     the pre-round-5 per-step path) in ms/batch;
  2. the DEVICE-DATA path: whole uint8 array in HBM, per-step
     ``jnp.take`` + normalize fused into the jitted train step
     (train/trainer.py _device_gather01) - the host sends only (B,)
     int32 indices. Timed as full DSM train steps (gather included)
     against the same step on a pre-staged device batch, so the delta
     IS the on-device input cost;
  3. the host-gather path driving the same train step end to end
     (gather + device_put + step, the realistic host-bound rate).

Run on the TPU:  PYTHONPATH=/root/.axon_site:/root/repo \
                 python tools/bench_input.py [n_per_mod]
Prints one JSON line; results recorded in BASELINE.md.
"""

import json
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    batch = 1024
    n_mod, hw = 10, 32

    import jax
    import jax.numpy as jnp
    import optax

    from score_based_multimodal_autoencoder_tpu.data.loader import (
        gather_batch_01,
    )
    from score_based_multimodal_autoencoder_tpu.diffusion import VPSDE
    from score_based_multimodal_autoencoder_tpu.diffusion.losses import dsm_loss
    from score_based_multimodal_autoencoder_tpu.nn import LatentUNet
    from score_based_multimodal_autoencoder_tpu.train.trainer import (
        _device_gather01,
        stage_device_data,
    )
    from score_based_multimodal_autoencoder_tpu.utils import (
        enable_compilation_cache,
    )

    sys.path.insert(0, "/root/repo")
    from bench import force_sync, wait_for_devices

    enable_compilation_cache()
    wait_for_devices()

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(n_mod, n, hw, hw, 3), dtype=np.uint8)
    out = {"n_per_mod": n, "batch": batch,
           "bytes_mb": round(data.nbytes / 1e6, 1)}

    # 1. host gather+normalize rate (no device involved).
    idxs = [rng.permutation(n)[:batch] for _ in range(12)]
    gather_batch_01(data, idxs[0])  # warm native kernel
    t0 = time.perf_counter()
    for idx in idxs:
        gather_batch_01(data, idx)
    host_ms = (time.perf_counter() - t0) / len(idxs) * 1e3
    out["host_gather_ms_per_batch"] = round(host_ms, 1)
    out["host_gather_sps"] = round(batch / (host_ms / 1e3), 1)
    print("partial:", json.dumps(out), file=sys.stderr, flush=True)

    # Shared train step: the flagship DSM step on an 8x8x10 latent grid.
    # The frozen-encoder stage is elided (identical in both variants); the
    # latent grid here is a linear shrink of the gathered pixels so the
    # gather cost is IN the program for variant 2.
    model = LatentUNet(dim=128, channels=n_mod, dim_mults=(1, 2, 2, 2),
                       init_dim=128, mxu_depthwise=True, approx_gelu=True,
                       dtype=jnp.bfloat16)
    lat0 = jnp.zeros((2, 8, 8, n_mod))
    params = model.init(jax.random.key(0), lat0, jnp.full((2,), 0.5))
    sde = VPSDE(N=100)
    tx = optax.adam(1e-4)
    opt0 = tx.init(params)
    shrink = jnp.asarray(
        rng.normal(size=(hw * hw * 3, 64)).astype(np.float32) / 55.0)

    def step_from_pixels(params, opt_state, pixels, key):
        # (n_mod, B, hw, hw, 3) f32 -> (B, 8, 8, n_mod) latent grid.
        flat = pixels.reshape(n_mod, pixels.shape[1], -1)
        lat = jnp.einsum("mbf,fz->mbz", flat, shrink)
        lat = jnp.transpose(lat, (1, 2, 0)).reshape(-1, 8, 8, n_mod)

        def loss_fn(p):
            return dsm_loss(key, lambda x, t: model.apply(p, x, t), sde,
                            lat, likelihood_weighting=False)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # 2. device-data: N-major uint32-packed rows in HBM (the staged
    #    layout - a modality-major uint8 take measured 47.3 ms/batch vs
    #    2.2 ms for whole-sample uint32 rows), gather fused into the
    #    step. The array rides as a jit ARGUMENT - closed over it becomes
    #    a 1.8 GB HLO constant and kills the tunneled remote compile
    #    ("Broken pipe"; the same rule the trainers follow).
    data_dev, data_meta = stage_device_data(data)

    @jax.jit
    def step_device_data(params, opt_state, idx, key, ddata):
        pixels = _device_gather01(ddata, idx, data_meta)
        return step_from_pixels(params, opt_state, pixels, key)

    # 2b. pre-staged batch (input cost excluded) - the pure-compute anchor.
    @jax.jit
    def step_staged(params, opt_state, pixels, key):
        return step_from_pixels(params, opt_state, pixels, key)

    reps = 10
    idx_dev = [jnp.asarray(i.astype(np.int32)) for i in idxs]
    p, o, loss = step_device_data(params, opt0, idx_dev[0], jax.random.key(1),
                                  data_dev)
    force_sync(loss)
    t0 = time.perf_counter()
    for i in range(reps):
        p, o, loss = step_device_data(p, o, idx_dev[i % len(idx_dev)],
                                      jax.random.key(2 + i), data_dev)
    force_sync(loss)
    dev_ms = (time.perf_counter() - t0) / reps * 1e3
    out["device_data_step_ms"] = round(dev_ms, 2)
    out["device_data_sps"] = round(batch / (dev_ms / 1e3), 1)

    staged = jax.device_put(gather_batch_01(data, idxs[0]))
    p, o, loss = step_staged(params, opt0, staged, jax.random.key(1))
    force_sync(loss)
    t0 = time.perf_counter()
    for i in range(reps):
        p, o, loss = step_staged(p, o, staged, jax.random.key(2 + i))
    force_sync(loss)
    staged_ms = (time.perf_counter() - t0) / reps * 1e3
    out["staged_step_ms"] = round(staged_ms, 2)
    out["staged_sps"] = round(batch / (staged_ms / 1e3), 1)
    out["device_gather_overhead_pct"] = round(
        (dev_ms - staged_ms) / staged_ms * 100, 1)

    # 3. realistic host-bound loop: gather + device_put + step per
    #    iteration (async dispatch overlaps, but the host work is serial).
    p, o = params, opt0
    t0 = time.perf_counter()
    for i in range(reps):
        pixels = jax.device_put(gather_batch_01(data, idxs[i % len(idxs)]))
        p, o, loss = step_staged(p, o, pixels, jax.random.key(2 + i))
    force_sync(loss)
    host_loop_ms = (time.perf_counter() - t0) / reps * 1e3
    out["host_loop_step_ms"] = round(host_loop_ms, 2)
    out["host_loop_sps"] = round(batch / (host_loop_ms / 1e3), 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
