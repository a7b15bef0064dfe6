"""The unified training loop.

One loop replaces the reference's four near-identical trainer scripts
(A1_train.py:220-351, A2_train_cycle.py:197-323, A3_train_embedding.py:
152-269, A4_train_with_pretrained.py:189-339).  Shared behavior reproduced:

  * per-epoch LR assignment (linear decay lr -> lr/5 for a1/a2/a4,
    A1_train.py:269-287; constant with /10 drop after epoch 80 for a3,
    A3_train_embedding.py:261-263)
  * per-epoch mean of per-video losses; save-on-best with early stopping on
    ``patience`` (A1_train.py:294-347); a3's patience check never breaks
    (A3_train_embedding.py:265-267) -> a3 never early-stops by default
  * epoch-0 freeze-frame baseline per-video losses (A1_train.py:189-191);
    the cubic-spline baseline is computed via ops/cubic_spline when enabled
  * best checkpoints carry the reference's hyperparameter dict schema

TPU specifics: padded/bucketed batches, corruption/augmentation fused in
the jitted step, optional ("data", "model") mesh sharding.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.pipeline import KeypointDataset
from ..data.prefetch import prefetch_to_device
from ..data.synthetic import synthetic_dataset
from ..parallel import distributed as dist
from ..parallel.mesh import make_mesh, shard_batch, shard_params
from ..utils.config import Config
from ..utils.metrics import MetricsLogger
from ..utils.registry import missing_stats
from . import checkpoint as ckpt
from .state import (TrainState, freeze_mask_for_graft, linear_decay_lrs,
                    step_drop_lrs)
from .steps import (build_model, make_chained_train_step, make_eval_step,
                    make_predict_fn, make_train_step)

_REGIME_VARIANT = {"a1": "plain", "a2": "cycle", "a3": "embedding",
                   "a4": "plain"}

_ASYNC_CKPTR = None


def _get_async_checkpointer():
    """Process-wide async orbax checkpointer (background serialization)."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def _write_checkpoint(ckpt_path, snapshot):
    """Materialize a device-side best snapshot to disk: the `best` params
    dir plus the `full_state` dir for exact resume.  Host fetch + orbax
    serialization run here (async handler), not on every improving epoch.

    Stored as host numpy so checkpoints restore under any backend.  In a
    multi-process run every rank participates: the gather is a collective,
    and orbax's save runs internal cross-process barriers (the primary
    host does the actual writing)."""
    import orbax.checkpoint as ocp

    params_dev, opt_dev, step, epoch, min_loss, key = snapshot
    host_params = dist.gather_tree_to_host(params_dev)
    host_opt = dist.gather_tree_to_host(opt_dev)
    ckptr = _get_async_checkpointer()
    ckptr.wait_until_finished()
    ckptr.save(ckpt_path, args=ocp.args.StandardSave(host_params),
               force=True)
    full = {"params": host_params,
            "opt_state": host_opt,
            "step": np.asarray(step),
            "epoch": np.asarray(epoch),
            "min_loss": np.asarray(min_loss),
            "rng_key": np.asarray(jax.random.key_data(key))}
    ckptr.wait_until_finished()
    ckptr.save(os.path.join(os.path.dirname(ckpt_path), "full_state"),
               args=ocp.args.StandardSave(full), force=True)


class _NullLogger:
    """Metrics sink for non-coordinator ranks (single JSONL writer)."""

    def __init__(self, run_name):
        self.run_name = run_name

    def log(self, step, **metrics):
        pass

    def log_artifact(self, path, name=None):
        pass

    def close(self):
        pass


def _snapshot_run_config(cfg: Config, logger) -> None:
    """Persist the fully resolved run config next to the metrics JSONL —
    the reference snapshots its flag set into wandb config and its code
    via wandb.log_code (A1_train.py:357-372); here every run directory is
    reproducible from its own artifacts: Config.from_json_file() on the
    snapshot rebuilds the exact Config (extra provenance keys — package
    version, git sha — are ignored by from_dict)."""
    import json as _json
    import subprocess

    from .. import __version__
    path = os.path.splitext(logger.path)[0].replace(".metrics", "")
    path = path + ".config.json" if not path.endswith(".config.json") \
        else path
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=5).stdout.strip() or None
    except Exception:
        sha = None
    doc = _json.loads(cfg.to_json())
    doc["framework_version"] = __version__
    doc["git_sha"] = sha
    with open(path, "w") as f:
        _json.dump(doc, f, indent=2)
    logger.log_artifact(path, name="run_config")


@dataclasses.dataclass
class TrainResult:
    best_val_loss: float
    best_epoch: int
    epochs_run: int
    train_losses: List[float]
    val_losses: List[float]
    checkpoint_path: Optional[str]
    baseline_losses: Optional[List[float]] = None


def _build_datasets(cfg: Config):
    d = cfg.data
    if d.synthetic_num_videos > 0:
        vids = synthetic_dataset(d.synthetic_num_videos, d.synthetic_min_len,
                                 d.synthetic_max_len, seed=d.seed,
                                 motion=getattr(d, "synthetic_motion",
                                                "smooth"),
                                 vocab=getattr(d, "synthetic_vocab", 8))
        n_train = max(1, int(0.8 * len(vids)))
        train = KeypointDataset(videos=vids[:n_train],
                                dataset_name=d.dataset_name,
                                max_seq_len=d.max_seq_len,
                                bucket_multiple=d.bucket_multiple)
        val = KeypointDataset(videos=vids[n_train:] or vids[:1],
                              dataset_name=d.dataset_name,
                              max_seq_len=d.max_seq_len,
                              bucket_multiple=d.bucket_multiple)
        return train, val
    train = KeypointDataset(path=d.training_set_path,
                            max_seq_len=d.max_seq_len,
                            bucket_multiple=d.bucket_multiple)
    val = KeypointDataset(path=d.validation_set_path,
                          max_seq_len=d.max_seq_len,
                          bucket_multiple=d.bucket_multiple)
    return train, val


def _init_params(model, cfg, key):
    t0 = min(cfg.data.bucket_multiple, cfg.data.max_seq_len)
    dummy = jnp.zeros((1, t0, 54, 2))
    if cfg.model.variant == "embedding" or \
            _REGIME_VARIANT[cfg.train.regime] == "embedding":
        return model.init(key, dummy)["params"]
    return model.init(key, dummy, dummy)["params"]


def _load_params_any(path: str):
    """Load model params from a reference .pth or an orbax directory."""
    if path.endswith(".pth"):
        params, _ = ckpt.load_reference_checkpoint(path)
        return params
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as c:
        return c.restore(os.path.abspath(path))


def _new_best_report(cfg, val_ds, corrupted_val, state, first_params,
                     predict_fn, regime, baseline_acc, val_pv, cubic_acc,
                     epoch, precision):
    """The reference's new-best reporting (A1_train.py:302-309): violin
    histogram of {freeze-frame, model, cubic} distributions + a rendered
    input/prediction/ground-truth strip."""
    import jax as _jax
    from ..eval.stats import compare_distributions
    from ..utils.viz import validation_image

    os.makedirs(cfg.train.results_dir, exist_ok=True)
    dists = {"Baseline": baseline_acc or [], "AI": val_pv}
    if cubic_acc:
        dists["Cubicspline"] = cubic_acc
    dists = {k: v for k, v in dists.items() if v}
    if len(dists) > 1:
        compare_distributions(
            dists, verbose=False,
            plot_path=os.path.join(
                cfg.train.results_dir,
                f"IA_histogram_{val_ds.dataset_name}.jpg"))

    if predict_fn is None:
        return
    batch = next(val_ds.batches(cfg.data.batch_size,
                                corrupted=corrupted_val))
    with _jax.default_matmul_precision(precision):
        args = [jnp.asarray(batch.inputs), jnp.asarray(batch.mask),
                jnp.asarray(batch.clean), jnp.asarray(batch.length)]
        if regime == "a2":
            pred, shown = predict_fn(state.params, *args, first_params)
        else:
            pred, shown = predict_fn(state.params, *args)
    t = int(batch.length[0])
    validation_image(
        np.asarray(shown)[0, :t], np.asarray(pred)[0, :t],
        np.asarray(batch.clean)[0, :t],
        path=os.path.join(cfg.train.results_dir,
                          f"validation_epoch{epoch}.jpg"))


def train(cfg: Config, train_ds: Optional[KeypointDataset] = None,
          val_ds: Optional[KeypointDataset] = None,
          use_wandb: bool = False) -> TrainResult:
    regime = cfg.train.regime
    variant = _REGIME_VARIANT[regime]
    if train_ds is None or val_ds is None:
        train_ds, val_ds = _build_datasets(cfg)

    if len(train_ds) == 0 or len(val_ds) == 0:
        raise ValueError(
            f"empty dataset (train={len(train_ds)}, val={len(val_ds)}) — "
            "check paths / filters (videos under 10 frames are dropped)")

    stats = None
    if not cfg.data.is_random_missing and cfg.data.dataset_name != "all":
        try:
            stats = missing_stats(cfg.data.dataset_name,
                                  getattr(cfg.data, "registry_path", None))
        except KeyError:
            # unknown dataset: the reference would KeyError here too
            # (dataloader.py:366); fall back to the generic block mode
            print(f"dataset {cfg.data.dataset_name!r} has no missingness "
                  "stats in the registry; using the generic 'all' "
                  "block-corruption mode")

    key = jax.random.key(cfg.train.seed)
    key, k_init = jax.random.split(key)

    model = build_model(cfg.model, variant, for_training=True)
    params = _init_params(model, cfg, k_init)

    # -- regime-specific wiring -------------------------------------------
    first_model, first_params, freeze_mask = None, None, None
    if regime == "a2":
        if not cfg.train.upload_model:
            raise ValueError("a2 needs train.upload_model (the frozen "
                             "first model's checkpoint)")
        first_model = build_model(cfg.model, "plain", for_training=True)
        first_params = _load_params_any(cfg.train.upload_model)
    if regime == "a4":
        if cfg.train.upload_general_model:
            params = _load_params_any(cfg.train.upload_general_model)
        if cfg.train.upload_embedding_model:
            emb = _load_params_any(cfg.train.upload_embedding_model)
            # graft: input_embedding -> both embeddings, output -> fc_final
            # (A4_train_with_pretrained.py:236-254)
            params = dict(params)
            params["input_embedding"] = jax.tree.map(
                jnp.asarray, emb["input_embedding"])
            params["filled_embedding"] = jax.tree.map(
                jnp.asarray, emb["input_embedding"])
            params["fc_final"] = jax.tree.map(
                jnp.asarray, emb["output_embedding"])
            if cfg.train.freeze_grafted:
                freeze_mask = freeze_mask_for_graft(params)

    state = TrainState.create(params)

    epoch_start = 0
    resume_min_loss = None
    if cfg.train.resume_from:
        import orbax.checkpoint as ocp
        # template restores the optimizer state's NamedTuple structure
        template = {"params": jax.tree.map(np.asarray, state.params),
                    "opt_state": jax.tree.map(np.asarray, state.opt_state),
                    "step": np.zeros((), np.int32),
                    "epoch": np.zeros((), np.int64),
                    "min_loss": np.zeros(()),
                    "rng_key": np.asarray(jax.random.key_data(key))}
        with ocp.StandardCheckpointer() as c:
            full = c.restore(os.path.abspath(cfg.train.resume_from),
                             template)
        state = TrainState(
            params=jax.tree.map(jnp.asarray, full["params"]),
            opt_state=jax.tree.map(jnp.asarray, full["opt_state"]),
            step=jnp.asarray(full["step"]))
        epoch_start = int(full["epoch"]) + 1
        resume_min_loss = float(full["min_loss"])
        key = jax.random.wrap_key_data(jnp.asarray(full["rng_key"]))

    # -- mesh ---------------------------------------------------------------
    mesh = None
    if dist.is_multiprocess():
        # data-parallel over DCN (one slow all-reduce per step), tensor-
        # parallel inside each process where ICI bandwidth lives
        mesh = dist.make_hybrid_mesh(
            cfg.mesh.data if cfg.mesh.data > 1 else -1, cfg.mesh.model,
            dcn_data=cfg.mesh.dcn_data if cfg.mesh.dcn_data > 1 else None)
    elif cfg.mesh.data * cfg.mesh.model > 1:
        mesh = make_mesh(cfg.mesh.data, cfg.mesh.model)
    if mesh is not None:
        # one placement policy for BOTH the single- and multi-process
        # branches (shard_params routes through global_put, which handles
        # the multi-process global-array assembly): params and the Adam
        # moments take the Megatron-style tensor-parallel layout instead
        # of GSPMD defaults; a resumed optimizer state is sharded, not
        # re-initialized
        sharded = shard_params(state.params, mesh)
        if epoch_start > 0:
            os_ = state.opt_state
            os_ = os_._replace(mu=shard_params(os_.mu, mesh),
                               nu=shard_params(os_.nu, mesh))
            state = TrainState(params=sharded, opt_state=os_,
                               step=state.step)
        else:
            state = TrainState.create(sharded).replace(step=state.step)
        if first_params is not None:
            first_params = shard_params(first_params, mesh)

    train_step = make_train_step(model, cfg, stats, first_model, freeze_mask)
    eval_step = make_eval_step(model, cfg, first_model)
    chained_step = None
    if getattr(cfg.train, "chain_steps", True):
        chained_step = make_chained_train_step(model, cfg, stats,
                                               first_model, freeze_mask)
    # plot rendering drives the model with per-video local jits, which a
    # multi-process run cannot do on mesh-sharded params
    save_plots = cfg.train.save_plots and not dist.is_multiprocess()
    predict_fn = make_predict_fn(model, cfg, first_model) \
        if save_plots else None

    # -- schedules ----------------------------------------------------------
    if regime == "a3":
        lrs = step_drop_lrs(cfg.train.lr, cfg.train.epochs,
                            cfg.train.a3_lr_drop_epoch)
    else:
        lrs = linear_decay_lrs(cfg.train.lr, cfg.train.epochs)

    corrupted_val = val_ds.precompute_corruption(
        seed=cfg.train.seed, is_random_missing=cfg.data.is_random_missing,
        registry_path=getattr(cfg.data, "registry_path", None))

    # device-resident data: upload padded buckets once; epoch batches are
    # device-side gathers (huge win when host->device bandwidth is slow)
    data_bytes = sum(v.nbytes for v in train_ds.videos) + \
        sum(v.nbytes for v in val_ds.videos)
    use_dev_data = (cfg.data.device_resident_data and mesh is None
                    and data_bytes < 2 << 30)
    train_buckets = val_buckets = None
    if use_dev_data:
        train_buckets = train_ds.device_buckets()
        val_buckets = val_ds.device_buckets(corrupted=corrupted_val)

    run_name = cfg.train.experiment_name
    if run_name is None and dist.is_multiprocess():
        # every rank must agree on the checkpoint path (orbax's save is a
        # collective); broadcast rank 0's timestamp
        import time as _time
        from jax.experimental import multihost_utils
        stamp = int(multihost_utils.broadcast_one_to_all(
            np.int64(_time.time())))
        run_name = f"run_{stamp}"
    if dist.is_coordinator():
        logger = MetricsLogger(log_dir=cfg.train.results_dir,
                               run_name=run_name, use_wandb=use_wandb)
        _snapshot_run_config(cfg, logger)
    else:
        logger = _NullLogger(run_name)
    ckpt_dir = os.path.join(cfg.train.checkpoint_dir, logger.run_name)

    min_loss, best_epoch, patience = float("inf"), -1, 0
    saves_since_full = 10 ** 9  # force a disk write on the first best
    best_snapshot = None
    if resume_min_loss is not None:
        min_loss = resume_min_loss
    cubic_acc: Optional[List[float]] = None
    train_curve: List[float] = []
    val_curve: List[float] = []
    baseline_acc: Optional[List[float]] = None
    ckpt_path = None
    precision = cfg.model.matmul_precision

    for epoch in range(epoch_start, cfg.train.epochs):
        lr = float(lrs[epoch])
        key, k_epoch = jax.random.split(key)

        # ---- train ----
        per_video_losses: List[np.ndarray] = []
        weights: List[np.ndarray] = []
        grad_norms: List = []   # wandb.watch analog (A1_train.py:251)
        param_norm = None
        if use_dev_data and chained_step is not None:
            # device-side epoch chaining: ONE dispatch per bucket runs all
            # its batches as a lax.scan (state as carry, batches gathered
            # in-scan from the resident bucket) — per-batch dispatch costs
            # ~15-20 ms of host marshaling through the tunnel (RESULTS.md).
            # RNG/batch composition identical to the per-step path below.
            extra = (first_params,) if regime == "a2" else ()
            with jax.default_matmul_precision(precision):
                for _, entry, rows, wts in train_ds.device_batch_plan(
                        train_buckets, cfg.data.batch_size, shuffle=True,
                        seed=cfg.train.seed + epoch):
                    state, k_epoch, ms = chained_step(
                        state, entry["clean"], entry["length"], rows, wts,
                        k_epoch, jnp.float32(lr), *extra)
                    per_video_losses.append(ms["per_video"].reshape(-1))
                    weights.append(wts.reshape(-1))
                    if "grad_norm" in ms:
                        grad_norms.append(ms["grad_norm"])
                        param_norm = ms["param_norm"][-1]
        else:
            if use_dev_data:
                stream = ((p["clean"], p["length"], jnp.asarray(w))
                          for _, p, w in train_ds.device_batches(
                              train_buckets, cfg.data.batch_size,
                              shuffle=True, seed=cfg.train.seed + epoch))
            else:
                device = NamedSharding(mesh, P("data")) \
                    if mesh is not None else None
                stream = prefetch_to_device(
                    train_ds.batches(cfg.data.batch_size, shuffle=True,
                                     seed=cfg.train.seed + epoch),
                    transform=lambda b: (b.clean, b.length, b.weight),
                    device=device)
            mesh_ctx = mesh if mesh is not None else contextlib.nullcontext()
            with jax.default_matmul_precision(precision), mesh_ctx:
                for clean, length, weight in stream:
                    k_epoch, k_step = jax.random.split(k_epoch)
                    if regime == "a2":
                        state, m = train_step(state, clean, length, weight,
                                              k_step, jnp.float32(lr),
                                              first_params)
                    else:
                        state, m = train_step(state, clean, length, weight,
                                              k_step, jnp.float32(lr))
                    # keep device arrays; conversion at epoch end preserves
                    # async dispatch (no per-step host sync)
                    per_video_losses.append(m["per_video"])
                    weights.append(weight)
                    if "grad_norm" in m:
                        grad_norms.append(m["grad_norm"])
                        param_norm = m["param_norm"]

        pv = dist.gather_concat(per_video_losses)
        w = dist.gather_concat(weights)
        train_loss = float((pv * w).sum() / max(w.sum(), 1.0))

        # ---- eval ----
        cubic_pv: List[float] = []
        if use_dev_data:
            eval_stream = (
                ((p["inputs"], p["mask"], p["clean"], p["length"]), w)
                for _, p, w in val_ds.device_batches(
                    val_buckets, cfg.data.batch_size))
        else:
            def _host_eval_stream():
                for batch in val_ds.batches(cfg.data.batch_size,
                                            shuffle=False,
                                            corrupted=corrupted_val):
                    args = [jnp.asarray(batch.inputs),
                            jnp.asarray(batch.mask),
                            jnp.asarray(batch.clean),
                            jnp.asarray(batch.length)]
                    if mesh is not None:
                        args = [shard_batch(a, mesh) for a in args]
                    yield tuple(args), batch.weight
            eval_stream = _host_eval_stream()
        ev_pv, ev_base, ev_cubic, ev_keep = [], [], [], []
        mesh_ctx = mesh if mesh is not None else contextlib.nullcontext()
        with jax.default_matmul_precision(precision), mesh_ctx:
            for args, bweight in eval_stream:
                if regime == "a2":
                    per_video, base = eval_step(state.params, *args,
                                                first_params)
                else:
                    per_video, base = eval_step(state.params, *args)
                ev_pv.append(per_video)
                ev_base.append(base)
                ev_keep.append(np.asarray(bweight) > 0)

                if epoch == 0 and cfg.train.epoch0_cubic_baseline and \
                        regime != "a3":
                    # cubic of x_no_sota scored with the eval criterion
                    # (A1_train.py:193-195)
                    from ..ops.cubic_spline import cubic_interpolation_batch
                    from ..ops import losses as loss_ops
                    T = args[2].shape[1]
                    x_no = args[0][:, 1:T + 1]
                    y_mask = args[1][:, 1:T + 1]
                    cub = cubic_interpolation_batch(x_no, y_mask)
                    valid = (jnp.arange(T)[None, :] <
                             args[3][:, None]).astype(jnp.float32)
                    if regime == "a4":
                        cl = loss_ops.euclidean_distance_loss(
                            cub, args[2], frame_weight=valid)
                    else:
                        cl = loss_ops.euclidean_loss(
                            cub, args[2], frame_weight=valid)
                    ev_cubic.append(cl)
        # one gather per epoch (not per batch): on multi-process CPU each
        # collective spins up a fresh Gloo context
        if not ev_keep:
            raise ValueError(
                "validation stream produced zero batches — the validation "
                "set is empty or entirely filtered out; training cannot "
                "select a best epoch without it")
        keep = np.concatenate(ev_keep)
        val_pv = dist.gather_concat(ev_pv)[keep].tolist()
        base_pv = dist.gather_concat(ev_base)[keep].tolist()
        if ev_cubic:
            cubic_pv = dist.gather_concat(ev_cubic)[keep].tolist()
        val_loss = float(np.mean(val_pv))
        if baseline_acc is None:
            baseline_acc = base_pv  # epoch-0 freeze-frame baseline
        if epoch == 0 and cubic_pv:
            cubic_acc = cubic_pv
        elif epoch == 0:
            cubic_acc = None

        train_curve.append(train_loss)
        val_curve.append(val_loss)
        patience += 1
        improved = val_loss < min_loss
        if improved:
            min_loss, best_epoch, patience = val_loss, epoch, 0
            if save_plots:
                _new_best_report(cfg, val_ds, corrupted_val, state,
                                 first_params, predict_fn, regime,
                                 baseline_acc, val_pv, cubic_acc, epoch,
                                 precision)
            if cfg.train.save_checkpoints:
                ckpt_path = os.path.abspath(os.path.join(ckpt_dir, "best"))
                # snapshot the best state ON DEVICE (a device-side copy is
                # ~free; fetching 10s of MB to the host every improving
                # epoch dominated steady-state epoch time on tunneled TPUs)
                # step must be copied too: train_step donates its input
                # state, so an uncopied step buffer is deleted as soon as
                # another epoch runs (the final flush then reads a dead
                # array whenever the best epoch wasn't the last)
                best_snapshot = (
                    jax.tree.map(jnp.copy, state.params),
                    jax.tree.map(jnp.copy, state.opt_state),
                    jnp.copy(state.step), epoch, min_loss, key)
                saves_since_full += 1
                if saves_since_full >= max(cfg.train.full_state_every, 1) \
                        or epoch == 0:
                    saves_since_full = 0
                    _write_checkpoint(ckpt_path, best_snapshot)
                logger.log_artifact(ckpt_path)

        watch = {}
        if grad_norms:
            # per-step scalars (per-step path) or (n,) stacks (chained)
            watch = {"grad_norm": float(np.mean(np.concatenate(
                         [np.atleast_1d(np.asarray(g))
                          for g in grad_norms]))),
                     "param_norm": float(param_norm)}
        logger.log(epoch, train_loss=train_loss, val_loss=val_loss,
                   minimun_loss=min_loss, lr=lr, epoch=epoch, **watch)
        if cfg.train.log_every and epoch % cfg.train.log_every == 0 \
                and dist.is_coordinator():
            print(f"epoch {epoch}: lr={lr:.3g} train={train_loss:.6f} "
                  f"val={val_loss:.6f} best={min_loss:.6f}")

        if cfg.train.effective_early_stop() and \
                patience >= cfg.train.patience:
            break
        if cfg.train.max_epochs_this_run is not None and \
                epoch - epoch_start + 1 >= cfg.train.max_epochs_this_run:
            break

    if ckpt_path is not None and best_snapshot is not None:
        _write_checkpoint(ckpt_path, best_snapshot)  # final flush
        _get_async_checkpointer().wait_until_finished()
    logger.close()
    return TrainResult(best_val_loss=min_loss, best_epoch=best_epoch,
                       epochs_run=len(val_curve),
                       train_losses=train_curve, val_losses=val_curve,
                       checkpoint_path=ckpt_path,
                       baseline_losses=baseline_acc)
