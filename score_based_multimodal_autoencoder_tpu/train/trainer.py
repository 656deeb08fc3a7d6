"""Epoch-loop trainers for both SBMAE stages.

One trainer drives every stage (the reference re-wires its layers by hand
in each of ~20 scripts, SURVEY.md §1): stage-1 trains the whole per-modality
VAE fleet in one vmapped program; stage-2 encodes with the frozen fleet and
fits the latent score UNet by DSM. Per-epoch wall-clock is printed for
parity with the reference's TRAINING/VALIDATION TIME TAKEN logs
(/root/reference/train_polyupd.py:98-101).

Validation follows the reference's protocol of evaluating the FULL val
split every epoch (/root/reference/train_polyupd.py:110-170) and keying the
best checkpoint to that loss (/root/reference/train_poly_unet_cont.py:663-690).
Every trainer supports preemption-safe resume (params, optimizer, epoch,
PRNG key, best-metric watermark) - a capability absent upstream (SURVEY §5).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loader import BatchIterator, gather_batch_01, to_float01
from ..diffusion.losses import dsm_loss, ncsn_dsm_loss
from ..parallel.fleet import VAEFleet
from ..utils.logging import MetricsLogger
from .checkpoints import CheckpointManager
from .lr import ReduceLROnPlateau, adam_with_mutable_lr


def _log(msg):
    print(msg, flush=True)


def _load_resume(mgr: CheckpointManager) -> Optional[Dict[str, Any]]:
    if not mgr.exists("resume"):
        return None
    raw = mgr.restore_raw("resume")
    return jax.tree_util.tree_map(jnp.asarray, raw)


def _restore_key(raw_key):
    return jax.random.wrap_key_data(jnp.asarray(raw_key))


# DP-wiring helpers live in parallel.mesh (public: dp_shardings /
# replicate_tree / put_batch / mesh_from_flag); these aliases keep this
# module's historical import surface working.
from ..parallel.mesh import (  # noqa: E402
    dp_shardings as _dp_shardings,
    put_batch as _put_batch,
    replicate_tree as _replicate,
)


def _mean_of(device_scalars) -> float:
    """ONE host sync for a whole epoch of per-step losses (the reference -
    and round-2 this repo - blocked on every step's loss; VERDICT r2 §weak 3).
    Entries may be scalars (single steps) or (K,) arrays (scanned
    multi-step dispatches); each element is one step's loss either way."""
    return float(jnp.mean(jnp.concatenate(
        [jnp.ravel(jnp.asarray(x)) for x in device_scalars])))


def _weighted_mean(device_scalars, weights) -> float:
    vals = np.asarray(jnp.stack(device_scalars))
    return float(np.average(vals, weights=weights))


def _grouped_batches(epoch_iter, k: int, batch_size: int):
    """Group an epoch's batch-index arrays into runs of ``k`` FULL batches
    (yielded as ``("stack", [idx, ...])``) plus ``("single", idx)``
    leftovers, preserving step order. Used by the scanned multi-step
    dispatch path: only full batches stack (static shapes), and the
    epoch-tail remainder runs through the per-step program."""
    pending = []
    for idx in epoch_iter:
        if k > 1 and len(idx) == batch_size:
            pending.append(idx)
            if len(pending) == k:
                yield "stack", pending
                pending = []
        else:
            for p in pending:  # flush first: keep step order identical
                yield "single", p
            pending = []
            yield "single", idx
    for idx in pending:
        yield "single", idx


def _stacked_sharding(batch_sh):
    """Batch sharding spec lifted over a leading steps axis: a (K, *batch)
    stack shards on the same 'data' axis, one position later."""
    if batch_sh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(batch_sh.mesh, P(None, *tuple(batch_sh.spec)))


def auto_device_data(requested=None, nbytes: int = 0,
                     max_bytes: int = 4 << 30):
    """Resolve a ``device_data`` value of None (= auto).

    On TPU-class backends the whole uint8 dataset lives in HBM and each
    step GATHERS ITS OWN BATCH ON DEVICE (``jnp.take`` + normalize inside
    the jitted step): the host sends only (B,) int32 indices per step, so
    the input pipeline can never throttle the device (VERDICT r4 weak #6:
    at b1024 / 54k samples/s the device wants a 31 MB batch every 19 ms -
    this host's single-core gather+normalize measured ~4x slower than
    that). Reference-scale PolyMNIST is 60k x 10 x 32x32x3 uint8 = 1.8 GB,
    comfortably inside a v5e's 16 GB HBM next to the <100M-param models;
    datasets above ``max_bytes`` stay on host. CPU backends keep the host
    path (no separate HBM; jit'ing the gather just adds copies).
    """
    if requested is not None:
        return requested
    try:
        return jax.default_backend() != "cpu" and 0 < nbytes <= max_bytes
    except Exception:  # pragma: no cover - backend probe failed
        return False


def stage_device_data(arr, rep=None):
    """Stage a (n_mod, N, ...) training array in device memory for fast
    per-step gathers: N-MAJOR rows, uint8 packed as uint32 words.

    Layout is everything for the TPU gather: ``jnp.take`` over axis 1 of
    the modality-major uint8 array measured 47.3 ms per b1024 batch on
    the v5e (sub-word gather of short rows - 2x the whole train step),
    while one sample = one contiguous uint32 row gathers the same bytes
    in 2.2 ms (21x; /tmp-probe figures recorded in BASELINE.md). The
    uint32 view is free on the host; non-uint8 (or non-word-aligned)
    arrays stage as normalized f32 rows instead.

    Returns ``(rows_dev, meta)`` - pass both to :func:`_device_gather01`
    (``meta`` is static shape/kind info baked into the jitted gather).
    """
    arr = np.asarray(arr)
    n_mod, N = arr.shape[0], arr.shape[1]
    rest = arr.shape[2:]
    nm = np.ascontiguousarray(np.moveaxis(arr, 0, 1)).reshape(N, -1)
    row_elems = nm.shape[1]
    if arr.dtype == np.uint8 and row_elems % 4 == 0:
        rows = nm.view(np.uint32)
        kind = "u8"
    else:
        rows = nm.astype(np.float32)
        if arr.dtype == np.uint8:
            rows = rows / np.float32(255.0)
        kind = "f32"
    dev = (jax.device_put(rows, rep) if rep is not None
           else jax.device_put(rows))
    return dev, (kind, n_mod, tuple(rest))


def _device_gather01(data_dev, idx, meta, batch_sh=None):
    """On-device shuffled-batch assembly from :func:`stage_device_data`
    rows: ``take`` whole-sample rows + unpack + f32/255 + restore the
    modality-major (n_mod, B, ...) layout.

    The jit-traced analogue of data.loader.gather_batch_01; ``batch_sh``
    re-shards the gathered batch for DP meshes (the staged dataset itself
    is replicated)."""
    kind, n_mod, rest = meta
    B = idx.shape[0]
    x = jnp.take(data_dev, idx, axis=0)  # (B, row)
    if kind == "u8":
        x = jax.lax.bitcast_convert_type(x, jnp.uint8)
        x = x.reshape((B, n_mod) + rest).astype(jnp.float32) / 255.0
    else:
        x = x.reshape((B, n_mod) + rest)
    x = jnp.moveaxis(x, 0, 1)  # (n_mod, B, ...)
    if batch_sh is not None:
        x = jax.lax.with_sharding_constraint(x, batch_sh)
    return x


def auto_steps_per_dispatch(requested=None, k: int = 8):
    """Resolve a CLI ``--steps-per-dispatch`` value of None (= auto).

    On TPU-class backends the fused K-step scan is the right default: the
    driver's own round-3 artifact measured 17.6k samples/s per-step vs
    52.0k scanned under tunnel congestion (BENCH_r03.json, 2.95x) - the
    scan's per-step cost is pure device time, immune to dispatch latency
    (VERDICT r3 next #7). CPU (tests, local debugging) keeps 1: no
    dispatch-latency problem to amortize, and K=1 preserves step-level
    logging granularity.
    """
    if requested is not None:
        return requested
    try:
        return 1 if jax.default_backend() == "cpu" else k
    except Exception:  # pragma: no cover - backend probe failed
        return 1


def _make_multi_step(step_core):
    """Fuse ``step_core`` over a leading steps axis with ``lax.scan``.

    One dispatch runs K optimizer steps on-device: over a high-latency
    device link (the tunneled v5e) the per-step train loop is DISPATCH
    bound - each step consumes the previous step's params, so its
    wall-clock floor is the client->device dispatch rate (measured
    26.8 ms/step congested vs 6.2 ms device-side, BASELINE.md). The scan
    is the training-side analogue of the whole-trajectory sampler: the
    host leaves the loop entirely. The key is threaded through the carry
    with the same one-split-per-step sequence as the host loop, so
    trajectories are bit-identical to steps_per_dispatch=1.
    """

    @jax.jit
    def multi_step(params, opt_state, ema, stacked, key, *consts):
        # ``consts``: loop-invariant big operands (frozen fleet state,
        # the device-resident dataset) that must ride as jit ARGUMENTS -
        # a closed-over tree is baked into the HLO as constants, and at
        # flagship scale (~300-600 MB) the serialized program exceeds the
        # tunneled remote-compile's request limit (HTTP 413; the round-3
        # "params as arguments" rule, BASELINE.md).
        def body(carry, batch):
            params, opt_state, ema, key = carry
            key, sub = jax.random.split(key)
            params, opt_state, ema, loss = step_core(
                params, opt_state, ema, batch, sub, *consts)
            return (params, opt_state, ema, key), loss

        (params, opt_state, ema, key), losses = jax.lax.scan(
            body, (params, opt_state, ema, key), stacked)
        return params, opt_state, ema, key, losses

    return multi_step


def _make_multi_step_state(step_core):
    """``_make_multi_step`` for trainers whose step is
    ``(state, batch, key) -> (state, metrics)`` (the stage-1 VAE trainers):
    K steps per ``lax.scan`` dispatch, key threaded through the carry with
    the per-step split sequence of the host loop, per-step ``total``
    losses stacked out."""

    @jax.jit
    def multi_step(state, stacked, key, *consts):
        # ``consts``: loop-invariant big operands as jit arguments (see
        # _make_multi_step's comment - closures bake them into the HLO).
        def body(carry, batch):
            state, key = carry
            key, sub = jax.random.split(key)
            state, metrics = step_core(state, batch, sub, *consts)
            return (state, key), metrics["total"]

        (state, key), totals = jax.lax.scan(body, (state, key), stacked)
        return state, key, totals

    return multi_step


def train_vae_fleet(
    vae_model,
    pixels_train: np.ndarray,  # (n_mod, N, H, W, C) uint8 or float
    pixels_val: Optional[np.ndarray],
    *,
    beta: float,
    lr: float,
    batch_size: int,
    epochs: int,
    seed: int = 0,
    ckpt_dir: Optional[str] = None,
    loss_type: str = "vae",
    resume: bool = False,
    mesh=None,
    steps_per_dispatch: int = 1,
    device_data: Optional[bool] = None,
    ckpt_every: int = 1,
) -> Dict[str, Any]:
    """``mesh``: optional DP mesh (parallel.mesh.make_mesh) - fleet state
    replicated, batches sharded (n_mod, B->data, ...); XLA inserts the
    gradient all-reduce over ICI (SURVEY.md §2.8). ``steps_per_dispatch``:
    fuse K optimizer steps into one ``lax.scan`` dispatch (same
    trajectory, see _make_multi_step). ``device_data`` (None = auto): keep
    the uint8 dataset in HBM and gather each batch on device - see
    train_score_model's docstring."""
    n_mod = pixels_train.shape[0]
    tx = adam_with_mutable_lr(lr)
    fleet = VAEFleet(vae_model, n_mod, tx, beta=beta, loss_type=loss_type)
    rep, batch_sh = _dp_shardings(mesh, modality_major=True)
    device_data = auto_device_data(device_data, pixels_train.nbytes)
    data_dev = data_meta = None
    if device_data:
        data_dev, data_meta = stage_device_data(pixels_train, rep)
        _log(f"device-resident data: {pixels_train.nbytes / 1e6:.0f} MB "
             f"in HBM; steps consume (B,) index arrays")
    key = jax.random.key(seed)
    key, init_key = jax.random.split(key)
    state = fleet.init(init_key, jnp.asarray(to_float01(pixels_train[0, :2])))

    if device_data:
        # The dataset rides as a jit ARGUMENT (closed-over arrays are
        # baked into the HLO; 300+ MB breaks the tunneled remote compile
        # with HTTP 413 - the round-3 params-as-arguments rule).
        def _fleet_core(state, idx, key, data):
            return fleet.train_step(
                state, _device_gather01(data, idx, data_meta, batch_sh), key)
    else:
        _fleet_core = fleet.train_step
    extra = (data_dev,) if device_data else ()
    step = jax.jit(_fleet_core)
    multi_step = (_make_multi_step_state(_fleet_core)
                  if steps_per_dispatch > 1 else None)
    stack_sh = _stacked_sharding(batch_sh)
    eval_step = jax.jit(fleet.eval_loss)
    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None

    start_epoch = 0
    if resume and mgr and mgr.exists("resume"):
        # Target-based restore: the optimizer state is a typed pytree
        # (inject_hyperparams namedtuples), so it must restore into the
        # freshly-initialized structure, not raw dicts.
        target = {"state": state, "epoch": 0,
                  "key": jax.random.key_data(key), "best_metric": np.nan}
        saved = mgr.restore(target, "resume")
        state = saved["state"]
        start_epoch = int(saved["epoch"]) + 1
        key = _restore_key(saved["key"])
        best = float(saved["best_metric"])
        mgr.best_metric = None if np.isnan(best) else best
        _log(f"resumed fleet from epoch {start_epoch}")

    state = _replicate(state, rep)
    n = pixels_train.shape[1]
    history = []
    train_iter = BatchIterator(
        np.arange(n), batch_size, seed=seed,
        transform=None,
    )
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        totals = []
        for kind, item in _grouped_batches(train_iter.epoch(),
                                           steps_per_dispatch, batch_size):
            if kind == "stack":
                if device_data:  # (K, B) int32 indices; gather on device
                    stacked = _replicate(
                        jnp.asarray(np.stack([np.asarray(i) for i in item])),
                        rep)
                else:
                    stacked = _put_batch(
                        np.stack([gather_batch_01(pixels_train, i)
                                  for i in item]), stack_sh, axis=2)
                state, key, total = multi_step(state, stacked, key, *extra)
            else:
                if device_data:
                    batch = _replicate(jnp.asarray(np.asarray(item)), rep)
                else:
                    batch = _put_batch(gather_batch_01(pixels_train, item),
                                       batch_sh, axis=1)
                key, sub = jax.random.split(key)
                state, metrics = step(state, batch, sub, *extra)
                total = metrics["total"]
            totals.append(total)
        # _mean_of ravels (K, n_mod) scanned stacks and (n_mod,) per-step
        # entries alike - same all-steps-all-modalities mean as before.
        train_loss = _mean_of(totals)
        history.append(train_loss)
        _log(f"epoch {epoch}: train={train_loss:.4f} "
             f"({time.time() - t0:.1f}s)")

        if pixels_val is not None:
            # Full val split, batched (train_polyupd.py:110-170 evaluates
            # the entire val loader, not one batch).
            key, sub = jax.random.split(key)
            val_loss = _fleet_val_loss(eval_step, state, pixels_val,
                                       batch_size, sub, batch_sh)
            _log(f"epoch {epoch}: val={val_loss:.4f}")
            if mgr and ((epoch + 1) % ckpt_every == 0
                        or epoch == epochs - 1):
                mgr.save_best(state, val_loss)
        if mgr and ((epoch + 1) % ckpt_every == 0 or epoch == epochs - 1):
            mgr.save_last(state)
            mgr.save_resume({
                "state": state, "epoch": epoch,
                "key": jax.random.key_data(key),
                "best_metric": (np.nan if mgr.best_metric is None
                                else mgr.best_metric)})
    if mgr:
        mgr.wait()
    return {"fleet": fleet, "state": state, "history": history}


def _fleet_val_loss(eval_step, state, pixels_val, batch_size, key,
                    batch_sh=None) -> float:
    """Mean fleet loss over the ENTIRE val split (all modalities)."""
    n = pixels_val.shape[1]
    totals, weights = [], []
    for i in range(0, n, batch_size):
        vb = _put_batch(to_float01(pixels_val[:, i:i + batch_size]),
                        batch_sh, axis=1)
        key, sub = jax.random.split(key)
        m = eval_step(state, vb, sub)
        totals.append(m["total"].mean())
        weights.append(vb.shape[1])
    return _weighted_mean(totals, weights)


def train_single_vae(
    model,
    train_data: np.ndarray,  # (N, ...) pixels/attrs for ONE modality
    val_data: Optional[np.ndarray],
    *,
    beta: float,
    lr: float,
    batch_size: int,
    epochs: int,
    seed: int = 0,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
    mesh=None,
    steps_per_dispatch: int = 1,
) -> Dict[str, Any]:
    """One heterogeneous-modality VAE (the CelebA image/mask/attr trainers,
    /root/reference/train_celeba_res_hq.py, train_celeba_mask_hq.py,
    train_celeba_attr_hq.py): best-on-val + last checkpoints, plateau LR.
    ``mesh``: optional DP mesh - state replicated, batch axis sharded
    (BatchNorm statistics stay GLOBAL: under jit the sharded batch is one
    logical array, so XLA computes cross-replica means, i.e. sync-BN).
    ``steps_per_dispatch``: fuse K optimizer steps into one ``lax.scan``
    dispatch (same trajectory, see _make_multi_step)."""
    from .state import create_train_state
    from .steps import make_vae_eval_step, make_vae_train_step

    rep, batch_sh = _dp_shardings(mesh, modality_major=False)
    key = jax.random.key(seed)
    key, init_key, noise_key = jax.random.split(key, 3)
    sample = jnp.asarray(to_float01(train_data[:2]))
    variables = model.init(init_key, sample, key=noise_key, train=True)
    tx = adam_with_mutable_lr(lr)
    state = create_train_state(model, variables, tx)
    _vae_step_core = make_vae_train_step(model, beta)
    train_step = jax.jit(_vae_step_core)
    multi_step = (_make_multi_step_state(_vae_step_core)
                  if steps_per_dispatch > 1 else None)
    stack_sh = _stacked_sharding(batch_sh)
    eval_step = jax.jit(make_vae_eval_step(model, beta))
    scheduler = ReduceLROnPlateau(patience=5)
    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None

    start_epoch = 0
    if resume and mgr:
        saved = _load_resume(mgr)
        if saved is not None:
            # Optimizer state restores into its own (typed) pytree target;
            # everything else is plain dict-of-arrays.
            opt_state = mgr.restore_opt(state.opt_state)
            state = state.replace(
                params=saved["params"], opt_state=opt_state,
                batch_stats=saved.get("batch_stats"))
            start_epoch = int(saved["epoch"]) + 1
            key = _restore_key(saved["key"])
            if saved.get("best_metric") is not None:
                mgr.best_metric = float(saved["best_metric"])
            scheduler.best = (None if np.isnan(float(saved["sched_best"]))
                              else float(saved["sched_best"]))
            scheduler.bad_epochs = int(saved["sched_bad"])
            _log(f"resumed VAE from epoch {start_epoch}")

    state = _replicate(state, rep)
    history = []
    it = BatchIterator(np.arange(train_data.shape[0]), batch_size, seed=seed)
    for epoch in range(start_epoch, epochs):
        t0, totals = time.time(), []
        for kind, item in _grouped_batches(it.epoch(),
                                           steps_per_dispatch, batch_size):
            if kind == "stack":
                stacked = _put_batch(
                    np.stack([to_float01(train_data[np.asarray(i)])
                              for i in item]), stack_sh, axis=1)
                state, key, total = multi_step(state, stacked, key)
            else:
                batch = _put_batch(to_float01(train_data[np.asarray(item)]),
                                   batch_sh, axis=0)
                key, sub = jax.random.split(key)
                state, metrics = train_step(state, batch, sub)
                total = metrics["total"]
            totals.append(total)
        history.append(_mean_of(totals))
        _log(f"epoch {epoch}: train={history[-1]:.4f} "
             f"({time.time() - t0:.1f}s)")
        if val_data is not None:
            # Full val split (reference evaluates every val batch,
            # train_polyupd.py:110-170).
            vals, weights = [], []
            for i in range(0, val_data.shape[0], batch_size):
                vb = _put_batch(to_float01(val_data[i:i + batch_size]),
                                batch_sh, axis=0)
                key, sub = jax.random.split(key)
                vals.append(eval_step(state, vb, sub)["total"])
                weights.append(vb.shape[0])
            val = _weighted_mean(vals, weights)
            _log(f"epoch {epoch}: val={val:.4f}")
            new_opt, lr_now = scheduler.step(state.opt_state, val)
            state = state.replace(opt_state=new_opt)
            if mgr:
                mgr.save_best(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    val)
        if mgr:
            mgr.save_last(
                {"params": state.params, "batch_stats": state.batch_stats})
            mgr.save_resume({
                "params": state.params, "batch_stats": state.batch_stats,
                "epoch": epoch, "key": jax.random.key_data(key),
                "best_metric": (np.nan if mgr.best_metric is None
                                else mgr.best_metric),
                "sched_best": (np.nan if scheduler.best is None
                               else scheduler.best),
                "sched_bad": scheduler.bad_epochs},
                opt_state=state.opt_state)
    if mgr:
        mgr.wait()
    return {"state": state, "history": history}


def train_score_model(
    score_model,
    sde,
    fleet: VAEFleet,
    fleet_state,
    pixels_train: np.ndarray,
    latent_hw: int,
    *,
    lr: float,
    batch_size: int,
    epochs: int,
    pixels_val: Optional[np.ndarray] = None,
    likelihood_weighting: bool = True,
    importance_sampling: bool = False,
    seed: int = 0,
    ckpt_dir: Optional[str] = None,
    ema_decay: Optional[float] = None,
    sample_every: Optional[int] = None,
    sample_dir: Optional[str] = None,
    sample_sde=None,
    eval_every: Optional[int] = None,
    eval_fn: Optional[Callable] = None,
    metrics_path: Optional[str] = None,
    resume: bool = False,
    mesh=None,
    ncsn_sigmas=None,
    steps_per_dispatch: int = 1,
    device_data: Optional[bool] = None,
    ckpt_every: int = 1,
) -> Dict[str, Any]:
    """Stage-2 DSM training of the latent score network.

    - ``ckpt_every``: checkpoint cadence in epochs (default 1 = the
      reference's every-epoch best/last saves). At flagship scale the
      ~500 MB of orbax writes per epoch (last + best + optimizer) cost
      ~43 s on this single-core host against a ~1 s train epoch, so long
      runs should checkpoint every N epochs; the final epoch always
      saves.

    - ``mesh``: optional DP mesh - score params/opt/EMA and the frozen
      fleet replicated, pixel batches sharded (n_mod, B->data, ...); the
      DSM gradient all-reduce rides ICI (SURVEY.md §2.8).
    - ``steps_per_dispatch``: fuse K optimizer steps into ONE device
      dispatch via ``lax.scan`` (bit-identical trajectory, see
      _make_multi_step). K batches are staged on device per dispatch;
      epoch-tail remainders run through the per-step program.
    - ``device_data`` (None = auto, see auto_device_data): keep the whole
      uint8 training array in HBM and gather+normalize each shuffled
      batch ON DEVICE inside the jitted step - the host sends only (B,)
      int32 indices, so a slow host gather can never starve the device
      (identical trajectory: same indices, same f32/255 normalize).
    - ``ncsn_sigmas``: (L,) noise grid switching the objective to discrete
      multi-sigma NCSN DSM - the AE track's sigma-index-conditioned score
      net (consumed by gen_ae, /root/reference/fid_upd10.py:85-101; its
      training script is absent upstream, SURVEY.md §7.3). ``sde`` is then
      only used for init/sampling hooks.

    - ``pixels_val``: full validation split; every epoch the DSM loss is
      computed over ALL of it with a FIXED PRNG key (same t/noise draws each
      epoch, so the series is comparable) and ``best`` checkpoints key off
      that value (the reference saves best-on-validation,
      /root/reference/train_poly_unet_cont.py:663-690).
    - ``eval_fn(pipeline, key) -> dict``: quantitative in-training eval hook
      (the reference's every-500-epoch calc_poly_cond / calc_perf,
      /root/reference/train_poly_unet_cont.py:692-723,
      /root/reference/train_lat_celebhq_unet_cont2.py:559-561), run every
      ``eval_every`` epochs and logged through MetricsLogger.
    """
    from ..parallel.mesh import adapt_pallas_for_mesh

    # Keep the Pallas kernels ACTIVE under a mesh by shard_mapping them
    # over the data axis (demotion only for knob-less models).
    score_model = adapt_pallas_for_mesh(score_model, mesh, "score training")
    key = jax.random.key(seed + 100)
    val_key = jax.random.key(seed + 7919)  # fixed: comparable epoch-to-epoch
    rep, batch_sh = _dp_shardings(mesh, modality_major=True)
    fleet_state = _replicate(fleet_state, rep)
    device_data = auto_device_data(device_data, pixels_train.nbytes)
    data_dev = data_meta = None
    if device_data:
        # Whole dataset to HBM once (uint8: 60k x 10 PolyMNIST = 1.8 GB;
        # N-major uint32-packed rows, see stage_device_data); replicated
        # across a DP mesh so every device gathers locally.
        data_dev, data_meta = stage_device_data(pixels_train, rep)
        _log(f"device-resident data: {pixels_train.nbytes / 1e6:.0f} MB "
             f"in HBM; steps consume (B,) index arrays")
    val_dev = val_meta = None
    if device_data and pixels_val is not None:
        # Validation rides in HBM too: the per-epoch full-val pass was
        # host-gathering + shipping ~150 MB over the device link every
        # epoch (measured 5-20 s/epoch on the tunneled v5e against a
        # ~1 s train epoch).
        val_dev, val_meta = stage_device_data(pixels_val, rep)
    sample_pixels = jnp.asarray(to_float01(pixels_train[:, :2]))
    grid0 = fleet.encode(fleet_state, sample_pixels, latent_hw)
    key, init_key = jax.random.split(key)
    params = score_model.init(
        init_key, grid0, jnp.full((grid0.shape[0],), 0.5))["params"]
    tx = adam_with_mutable_lr(lr)
    opt_state = tx.init(params)
    ema = params if ema_decay else None
    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None
    logger = MetricsLogger(metrics_path, also_print=metrics_path is not None)

    start_epoch = 0
    if resume and mgr and mgr.exists("last"):
        # Preemption-safe resume: params, EMA, epoch counter and PRNG key
        # all come back from the checkpoint (capability absent upstream,
        # SURVEY.md §5).
        ckpt = mgr.restore_raw("last")
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        if ckpt.get("ema") is not None and ema is not None:
            ema = jax.tree_util.tree_map(jnp.asarray, ckpt["ema"])
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        if ckpt.get("key") is not None:
            key = jax.random.wrap_key_data(jnp.asarray(ckpt["key"]))
        if ckpt.get("best_metric") is not None:
            best = float(ckpt["best_metric"])
            mgr.best_metric = None if np.isnan(best) else best
        # Adam moments survive preemption too (typed-pytree restore).
        opt_state = mgr.restore_opt(opt_state)
        _log(f"resumed from epoch {start_epoch}")

    params = _replicate(params, rep)
    opt_state = _replicate(opt_state, rep)
    ema = _replicate(ema, rep) if ema is not None else None

    def _loss(p, latents, key):
        score = lambda x, t: score_model.apply({"params": p}, x, t)
        if ncsn_sigmas is not None:
            return ncsn_dsm_loss(key, score, ncsn_sigmas, latents)
        return dsm_loss(key, score, sde, latents,
                        likelihood_weighting=likelihood_weighting,
                        importance_sampling=importance_sampling)

    def _step_core(params, opt_state, ema, batch, key, fstate, data=None):
        # ``batch``: the gathered (n_mod, B, ...) pixel stack, or - on the
        # device-data path - the (B,) shuffled index array, gathered +
        # normalized here on device (same values either way). The frozen
        # fleet state and the device-resident dataset ride as jit
        # ARGUMENTS: closed-over trees are baked into the HLO as
        # constants, and at flagship scale (fleet ~100 MB + data ~300 MB)
        # the serialized program exceeds the tunneled remote-compile's
        # request limit (HTTP 413 - the round-3 params-as-arguments rule).
        pixels = (_device_gather01(data, batch, data_meta, batch_sh)
                  if device_data else batch)
        latents = fleet.encode(fstate, pixels, latent_hw)
        loss, grads = jax.value_and_grad(
            lambda p: _loss(p, latents, key))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1 - ema_decay) * p, ema, params)
        return params, opt_state, ema, loss

    extra = (fleet_state, data_dev) if device_data else (fleet_state,)
    step = jax.jit(_step_core)
    multi_step = (_make_multi_step(_step_core)
                  if steps_per_dispatch > 1 else None)
    stack_sh = _stacked_sharding(batch_sh)

    @jax.jit
    def val_step(params, pixels, key, fstate):
        latents = fleet.encode(fstate, pixels, latent_hw)
        return _loss(params, latents, key)

    @jax.jit
    def val_step_idx(params, idx, key, fstate, vdata):
        latents = fleet.encode(
            fstate, _device_gather01(vdata, idx, val_meta, batch_sh),
            latent_hw)
        return _loss(params, latents, key)

    pipeline = None
    if sample_every or (eval_every and eval_fn):
        if ncsn_sigmas is not None:
            # AE/NCSN track: the net is conditioned on sigma-level INDICES,
            # not continuous SDE time - in-training sampling/eval must go
            # through the annealed-Langevin pipeline or the grids/metrics
            # are silently garbage (gen_ae, fid_upd10.py:56-110).
            from ..pipeline import AnnealedSBMAEPipeline

            pipeline = AnnealedSBMAEPipeline(
                fleet=fleet, fleet_state=fleet_state, score_model=score_model,
                score_params=params, sde=None, latent_hw=latent_hw,
                sigma_max=float(ncsn_sigmas[0]),
                sigma_min=float(ncsn_sigmas[-1]),
                n_levels=len(ncsn_sigmas))
        else:
            from ..pipeline import SBMAEPipeline

            pipeline = SBMAEPipeline(
                fleet=fleet, fleet_state=fleet_state, score_model=score_model,
                score_params=params, sde=sample_sde or sde,
                latent_hw=latent_hw)

    def full_val_loss(params) -> Optional[float]:
        if pixels_val is None:
            return None
        n, vals, weights = pixels_val.shape[1], [], []
        vkey = val_key
        for i in range(0, n, batch_size):
            hi = min(i + batch_size, n)
            vkey, sub = jax.random.split(vkey)
            if val_dev is not None:
                vals.append(val_step_idx(
                    params, jnp.arange(i, hi), sub, fleet_state, val_dev))
            else:
                vb = _put_batch(gather_batch_01(pixels_val, np.arange(i, hi)),
                                batch_sh, axis=1)
                vals.append(val_step(params, vb, sub, fleet_state))
            weights.append(hi - i)
        return _weighted_mean(vals, weights)

    n = pixels_train.shape[1]
    history = []
    train_iter = BatchIterator(np.arange(n), batch_size, seed=seed)
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses = []
        for kind, item in _grouped_batches(train_iter.epoch(),
                                           steps_per_dispatch, batch_size):
            if kind == "stack":
                if device_data:  # (K, B) int32 indices; gather on device
                    stacked = _replicate(
                        jnp.asarray(np.stack([np.asarray(i) for i in item])),
                        rep)
                else:
                    stacked = _put_batch(
                        np.stack([gather_batch_01(pixels_train, i)
                                  for i in item]), stack_sh, axis=2)
                params, opt_state, ema, key, loss = multi_step(
                    params, opt_state, ema, stacked, key, *extra)
            else:
                if device_data:
                    batch = _replicate(jnp.asarray(np.asarray(item)), rep)
                else:
                    batch = _put_batch(gather_batch_01(pixels_train, item),
                                       batch_sh, axis=1)
                key, sub = jax.random.split(key)
                params, opt_state, ema, loss = step(
                    params, opt_state, ema, batch, sub, *extra)
            losses.append(loss)
        train_loss = _mean_of(losses)
        history.append(train_loss)
        _log(f"epoch {epoch}: dsm={train_loss:.5f} ({time.time()-t0:.1f}s)")

        val_loss = full_val_loss(params)
        if val_loss is not None:
            _log(f"epoch {epoch}: val_dsm={val_loss:.5f}")
        logger.log(epoch, dsm=train_loss,
                   **({"val_dsm": val_loss} if val_loss is not None else {}))

        # Periodic qualitative grids (the reference's every-10-epoch
        # unconditional + conditional plots, train_poly_unet_cont.py:300-396).
        if pipeline is not None and sample_every and (epoch + 1) % sample_every == 0:
            from ..utils.images import save_modality_grid

            pipeline.score_params = params
            key, s1, s2 = jax.random.split(key, 3)
            unc = pipeline.sample_unconditional(s1, 8)
            save_modality_grid(np.asarray(unc),
                               f"{sample_dir or '.'}/uncond_ep{epoch}.png")
            cond_pixels = jnp.asarray(to_float01(pixels_train[:, :8]))
            cond = pipeline.sample_conditional(
                s2, cond_pixels, list(range(1, fleet.n_mod)))
            save_modality_grid(np.asarray(cond),
                               f"{sample_dir or '.'}/cond_given0_ep{epoch}.png")

        # Quantitative in-training eval (cond FID / coherence / F1) at
        # intervals, exactly where the reference calls calc_poly_cond /
        # calc_perf (train_poly_unet_cont.py:692-723).
        if pipeline is not None and eval_fn is not None and eval_every \
                and (epoch + 1) % eval_every == 0:
            pipeline.score_params = params
            key, ekey = jax.random.split(key)
            results = eval_fn(pipeline, ekey)
            flat = _flatten_metrics(results)
            logger.log(epoch, **flat)

        if mgr and ((epoch + 1) % ckpt_every == 0 or epoch == epochs - 1):
            ckpt = {"params": params, "ema": ema, "epoch": epoch,
                    "key": jax.random.key_data(key),
                    "best_metric": (np.nan if mgr.best_metric is None
                                    else mgr.best_metric)}
            mgr.save_last(ckpt)
            mgr.save_opt(opt_state)
            # Best keys off validation DSM when a val split exists
            # (train loss otherwise - small-data fallback).
            mgr.save_best(ckpt, val_loss if val_loss is not None
                          else train_loss)
    if mgr:
        mgr.wait()
    return {"params": params, "ema": ema, "history": history}


def _flatten_metrics(tree, prefix="") -> Dict[str, float]:
    """{'fid': {0: 1.2}} -> {'fid_0': 1.2}; lists by index; Nones and
    non-numeric leaves (labels like 'given') dropped."""
    flat: Dict[str, float] = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = enumerate(tree)
    else:
        if tree is not None and not isinstance(tree, (str, bool)):
            try:
                flat[prefix.rstrip("_")] = float(tree)
            except (TypeError, ValueError):
                pass
        return flat
    for k, v in items:
        flat.update(_flatten_metrics(v, f"{prefix}{k}_"))
    return flat


def train_het_score_model(
    score_model,
    sde,
    modalities,  # list of pipeline_celeba.Modality (frozen stage-1 AEs)
    gather: Callable,  # idx array -> tuple of per-modality input batches
    n_train: int,
    latent_hw: int,
    *,
    gather_val: Optional[Callable] = None,
    n_val: int = 0,
    lr: float,
    batch_size: int,
    epochs: int,
    likelihood_weighting: bool = True,
    importance_sampling: bool = False,
    seed: int = 0,
    ckpt_dir: Optional[str] = None,
    ema_decay: Optional[float] = None,
    eval_every: Optional[int] = None,
    eval_fn: Optional[Callable] = None,
    metrics_path: Optional[str] = None,
    sampler_kwargs: Optional[Dict[str, Any]] = None,
    resume: bool = False,
    mesh=None,
    ncsn_sigmas=None,
    steps_per_dispatch: int = 1,
    ckpt_every: int = 1,
) -> Dict[str, Any]:
    """Stage-2 DSM training over heterogeneous frozen AEs (the CelebA path,
    /root/reference/train_lat_celebhq_unet_cont2.py:376-561): encode the
    three modalities into the (B, hw, hw, 3) grid, DSM-update the score
    UNet; full-val loss, best-on-val checkpoints, EMA, preemption-safe
    resume and the every-``eval_every``-epoch calc_perf hook
    (train_lat_celebhq_unet_cont2.py:559-561). ``mesh``: optional DP mesh -
    params replicated, per-modality input batches sharded on axis 0.
    ``steps_per_dispatch``: fuse K optimizer steps into one ``lax.scan``
    dispatch (bit-identical trajectory, see _make_multi_step)."""
    key = jax.random.key(seed + 100)
    val_key = jax.random.key(seed + 7919)
    rep, batch_sh = _dp_shardings(mesh, modality_major=False)
    logger = MetricsLogger(metrics_path, also_print=metrics_path is not None)

    def encode(mod_vars, inputs):
        # Variables ride as jit arguments (not closed over): the celebhq
        # fleet's trees are large enough to break the tunneled remote
        # compile when baked into the HLO (HTTP 413; round-3 rule).
        chans = []
        for mod, v, x in zip(modalities, mod_vars, inputs):
            mu, _ = mod.model.apply(v, x, method=mod.model.encoder)
            chans.append(mu.reshape(mu.shape[0], latent_hw, latent_hw))
        return jnp.stack(chans, axis=-1)

    mod_vars = tuple(m.variables for m in modalities)
    grid0 = encode(mod_vars, gather(np.arange(2)))
    key, init_key = jax.random.split(key)
    params = score_model.init(
        init_key, grid0, jnp.full((grid0.shape[0],), 0.5))["params"]
    tx = adam_with_mutable_lr(lr)
    opt_state = tx.init(params)
    ema = params if ema_decay else None
    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None

    start_epoch = 0
    if resume and mgr and mgr.exists("last"):
        ckpt = mgr.restore_raw("last")
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        if ckpt.get("ema") is not None and ema is not None:
            ema = jax.tree_util.tree_map(jnp.asarray, ckpt["ema"])
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        if ckpt.get("key") is not None:
            key = jax.random.wrap_key_data(jnp.asarray(ckpt["key"]))
        if ckpt.get("best_metric") is not None:
            best = float(ckpt["best_metric"])
            mgr.best_metric = None if np.isnan(best) else best
        opt_state = mgr.restore_opt(opt_state)
        _log(f"resumed from epoch {start_epoch}")

    params = _replicate(params, rep)
    opt_state = _replicate(opt_state, rep)
    ema = _replicate(ema, rep) if ema is not None else None

    def _loss(p, grid, key):
        score = lambda x, t: score_model.apply({"params": p}, x, t)
        if ncsn_sigmas is not None:
            return ncsn_dsm_loss(key, score, ncsn_sigmas, grid)
        return dsm_loss(key, score, sde, grid,
                        likelihood_weighting=likelihood_weighting,
                        importance_sampling=importance_sampling)

    def _step_core(params, opt_state, ema, inputs, key, mod_vars):
        grid = encode(mod_vars, inputs)
        loss, grads = jax.value_and_grad(
            lambda p: _loss(p, grid, key))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1 - ema_decay) * p, ema, params)
        return params, opt_state, ema, loss

    step = jax.jit(_step_core)
    multi_step = (_make_multi_step(_step_core)
                  if steps_per_dispatch > 1 else None)
    stack_sh = _stacked_sharding(batch_sh)

    @jax.jit
    def val_step(params, inputs, key, mod_vars):
        return _loss(params, encode(mod_vars, inputs), key)

    def full_val_loss(params) -> Optional[float]:
        if gather_val is None or not n_val:
            return None
        vals, weights, vkey = [], [], val_key
        for i in range(0, n_val, batch_size):
            idx = np.arange(i, min(i + batch_size, n_val))
            vkey, sub = jax.random.split(vkey)
            vb = _put_batch(gather_val(idx), batch_sh, axis=0)
            vals.append(val_step(params, vb, sub, mod_vars))
            weights.append(len(idx))
        return _weighted_mean(vals, weights)

    pipeline = None
    if eval_every and eval_fn:
        if ncsn_sigmas is not None:
            # Index-conditioned NCSN net -> annealed pipeline (see the
            # PolyMNIST trainer's hook above for the rationale).
            from ..pipeline_celeba import AnnealedHeterogeneousPipeline

            pipeline = AnnealedHeterogeneousPipeline(
                modalities=modalities, score_model=score_model,
                score_params=params, sde=None, latent_hw=latent_hw,
                sigma_max=float(ncsn_sigmas[0]),
                sigma_min=float(ncsn_sigmas[-1]),
                n_levels=len(ncsn_sigmas))
        else:
            from ..pipeline_celeba import HeterogeneousPipeline

            pipeline = HeterogeneousPipeline(
                modalities=modalities, score_model=score_model,
                score_params=params, sde=sde, latent_hw=latent_hw,
                sampler_kwargs=sampler_kwargs or {})

    it = BatchIterator(np.arange(n_train), batch_size, seed=seed)
    history = []
    for epoch in range(start_epoch, epochs):
        t0, losses = time.time(), []
        for kind, item in _grouped_batches(it.epoch(),
                                           steps_per_dispatch, batch_size):
            if kind == "stack":
                batches = [gather(np.asarray(i)) for i in item]
                stacked = _put_batch(
                    jax.tree_util.tree_map(
                        lambda *xs: np.stack(xs), *batches),
                    stack_sh, axis=1)
                params, opt_state, ema, key, loss = multi_step(
                    params, opt_state, ema, stacked, key, mod_vars)
            else:
                key, sub = jax.random.split(key)
                batch = _put_batch(gather(np.asarray(item)), batch_sh, axis=0)
                params, opt_state, ema, loss = step(
                    params, opt_state, ema, batch, sub, mod_vars)
            losses.append(loss)
        train_loss = _mean_of(losses)
        history.append(train_loss)
        _log(f"epoch {epoch}: dsm={train_loss:.5f} ({time.time()-t0:.1f}s)")

        val_loss = full_val_loss(params)
        if val_loss is not None:
            _log(f"epoch {epoch}: val_dsm={val_loss:.5f}")
        logger.log(epoch, dsm=train_loss,
                   **({"val_dsm": val_loss} if val_loss is not None else {}))

        if pipeline is not None and (epoch + 1) % eval_every == 0:
            pipeline.score_params = params
            key, ekey = jax.random.split(key)
            logger.log(epoch, **_flatten_metrics(eval_fn(pipeline, ekey)))

        if mgr and ((epoch + 1) % ckpt_every == 0 or epoch == epochs - 1):
            ckpt = {"params": params, "ema": ema, "epoch": epoch,
                    "key": jax.random.key_data(key),
                    "best_metric": (np.nan if mgr.best_metric is None
                                    else mgr.best_metric)}
            mgr.save_last(ckpt)
            mgr.save_opt(opt_state)
            mgr.save_best(ckpt, val_loss if val_loss is not None
                          else train_loss)
    if mgr:
        mgr.wait()
    return {"params": params, "ema": ema, "history": history}
