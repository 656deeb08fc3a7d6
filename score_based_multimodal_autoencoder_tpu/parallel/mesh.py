"""Device mesh construction and data-parallel sharding.

The reference has NO distributed machinery (SURVEY.md §2.8): one CUDA
device per script, parallelism = launching 10 independent processes. Here
every stage is data parallel over a ``jax.sharding.Mesh``:

- batch axis sharded over the ``data`` mesh axis (ICI collectives inserted
  by XLA for the gradient psum),
- params/opt-state replicated (models are <100M params; TP/PP are
  deliberately out of scope, documented rather than silently absent),
- an optional ``fleet`` axis shards the per-modality VAE ensemble
  (one-VAE-per-device "expert"-style parallelism, see parallel.fleet).

Multi-host: the same code runs under ``jax.distributed.initialize`` with a
DCN-connected mesh; only data parallel crosses hosts, so collectives stay
on ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up: ``jax.distributed.initialize`` wrapper.

    On TPU pods the arguments auto-detect from the environment; on CPU/GPU
    fleets pass them explicitly. After this, ``jax.devices()`` spans all
    hosts and the same (data, fleet) mesh code runs with DCN crossing only
    the data axis (SURVEY.md §2.8 plan).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(
    devices: Optional[Sequence] = None,
    fleet_size: int = 1,
) -> Mesh:
    """Build a (data, fleet) mesh over the given (default: all) devices.

    ``fleet_size`` devices are assigned to the fleet axis (must divide the
    device count); the rest form the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % fleet_size != 0:
        raise ValueError(f"fleet_size {fleet_size} must divide device count {n}")
    arr = np.array(devices).reshape(n // fleet_size, fleet_size)
    return Mesh(arr, axis_names=("data", "fleet"))


def shard_batch(mesh: Mesh, batch):
    """Place a (pytree of) batch array(s) sharded on axis 0 over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def mesh_from_flag(enabled: bool) -> Optional[Mesh]:
    """``--data-parallel`` CLI idiom: all-device (data, fleet=1) mesh when
    enabled, else None (single-device path everywhere downstream)."""
    return make_mesh() if enabled else None


def dp_shardings(mesh: Optional[Mesh], modality_major: bool):
    """(replicated, batch) shardings for data-parallel training/eval.

    ``mesh`` None = single-device path (both None). Batch axis is sharded
    over the mesh's 'data' axis: axis 1 for modality-major (n_mod, B, ...)
    stacks, axis 0 otherwise. Params/opt state stay replicated (SURVEY.md
    §2.8: models are <100M params, TP/PP deliberately out of scope).
    """
    if mesh is None:
        return None, None
    spec = P(None, "data") if modality_major else P("data")
    return NamedSharding(mesh, P()), NamedSharding(mesh, spec)


def replicate_tree(tree, rep):
    """Replicate when ``rep`` is a sharding; pass through when None."""
    if rep is None:
        return tree
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def put_batch(tree, sharding, axis: int):
    """Device-put a batch pytree sharded on ``axis`` when the DP mesh's
    device count divides that axis (remainder batches - e.g. a val tail -
    fall back to replicated placement)."""
    import jax.numpy as jnp

    if sharding is not None:
        n = sharding.mesh.shape["data"]
        leaves = jax.tree_util.tree_leaves(tree)
        if all(leaf.shape[axis] % n == 0 for leaf in leaves):
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding), tree)
    return jax.tree_util.tree_map(jnp.asarray, tree)


def data_parallel_jit(step_fn, mesh: Mesh, donate_state: bool = True):
    """jit a ``(state, batch, key) -> (state, aux)`` step for DP execution.

    State replicated, batch sharded on 'data'; XLA's sharding propagation
    inserts the gradient all-reduce over ICI automatically.
    """
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(rep, dat, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def demote_pallas_for_mesh(model, mesh, where: str = "training"):
    """Swap Pallas attention for the XLA path under a REAL multi-device mesh.

    XLA's SPMD partitioner cannot partition a ``pallas_call`` custom-call:
    under a >1-device mesh on the native TPU backend it would all-gather
    the sharded batch around every attention site, silently defeating data
    parallelism. The XLA composition is mathematically identical and
    partitions cleanly, so trainers/pipelines demote to it and warn.
    Interpret-mode pallas (CPU meshes, tests) lowers to ordinary
    partitionable jax ops, so it is left alone - as is any model without
    the ``pallas_linear_attn`` knob.

    Prefer :func:`adapt_pallas_for_mesh`: it keeps the kernels ACTIVE by
    shard_mapping them over the data axis and only falls back to this
    demotion for models without the ``pallas_spmd_mesh`` knob.
    """
    if mesh is None or getattr(mesh, "size", 1) <= 1:
        return model
    if jax.default_backend() != "tpu":  # interpret mode partitions fine
        return model
    if not getattr(model, "pallas_linear_attn", False):
        return model
    import warnings

    warnings.warn(
        f"Pallas attention is enabled but {where} runs on a "
        f"{mesh.size}-device mesh; XLA cannot partition the custom-call, "
        "so the model is rebuilt with the (identical-math) XLA attention "
        "path for clean SPMD sharding.")
    updates = {"pallas_linear_attn": False}
    if hasattr(model, "pallas_attn_vjp"):
        updates["pallas_attn_vjp"] = False
    return model.clone(**updates)


def adapt_pallas_for_mesh(model, mesh, where: str = "training"):
    """Make a Pallas-enabled model mesh-compatible WITHOUT losing the
    kernels (VERDICT r4 next #3).

    Under a >1-device native-TPU mesh, every Pallas attention site is
    wrapped in ``jax.shard_map`` over the mesh's 'data' axis (nn/blocks.py
    ``LinearAttention._kernel_call``): each device runs the kernel on its
    LOCAL batch shard, so the +17% train / +19% sampling kernel wins
    survive data parallelism instead of being demoted to the XLA path.
    Batch sizes the data axis does not divide fall back to the XLA
    composition per-site at trace time (``LinearAttention._spmd_ok``).

    Models without the ``pallas_spmd_mesh`` knob fall back to
    :func:`demote_pallas_for_mesh` (correct, slower). Single-device
    meshes, CPU/interpret backends (which partition pallas fine) and
    kernel-free models pass through unchanged.
    """
    if mesh is None or getattr(mesh, "size", 1) <= 1:
        return model
    if jax.default_backend() != "tpu":  # interpret mode partitions fine
        return model
    if not getattr(model, "pallas_linear_attn", False):
        return model
    if not hasattr(model, "pallas_spmd_mesh"):
        return demote_pallas_for_mesh(model, mesh, where)
    if model.pallas_spmd_mesh == mesh:
        return model
    return model.clone(pallas_spmd_mesh=mesh)
