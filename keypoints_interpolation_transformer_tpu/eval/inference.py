"""Checkpoint inference benchmark — the reference's EMPTY
3_test_IA_interpolation.py (0 bytes), defined here per SURVEY.md §2.6:
evaluate a trained checkpoint over a validation set, reporting

  * EuclideanLoss with the masked composite (the A1 eval path,
    A1_train.py:175-186)
  * masked-frame MPJPE (mean euclidean distance on inpainted frames) — the
    BASELINE.json parity metric
  * end-to-end frames/sec: whole-pipeline video throughput INCLUDING host
    batch staging and transfers — a relative number for comparing
    checkpoints/configs, not the BASELINE.json device-throughput metric
    (bench.py measures that one, device-side with chained steps)

Covers every checkpoint type the framework produces:

  * plain (a1/a4)   — KeypointCompleter (model.py:60-170)
  * cycle (a2)      — KeypointCompleterCycle over a frozen first model
                      (model.py:212-321, A2_train_cycle.py:99-115); pass
                      the first model via --first_checkpoint
  * embedding (a3)  — the linear AE (model.py:324-340), scored as the A3
                      regime does: identity reconstruction of the
                      zero-masked stream
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import KeypointDataset
from ..ops import losses
from ..train.steps import (build_model, completer_forward, cycle_forward,
                           shift_streams)
from ..transforms.corruption import zero_missing_frames
from ..utils.config import ModelConfig


def evaluate_checkpoint(params, model_cfg: ModelConfig,
                        val_ds: KeypointDataset, batch_size: int = 8,
                        seed: int = 42, warmup: bool = True,
                        registry_path=None, variant: str = "plain",
                        first_params=None):
    """Metric dict for any checkpoint variant; ``first_params`` is the
    frozen plain model feeding a cycle checkpoint (required iff
    variant == "cycle")."""
    if variant == "cycle" and first_params is None:
        raise ValueError("cycle checkpoints need first_params (the frozen "
                         "plain model, reference A2_train_cycle.py:99)")
    model = build_model(model_cfg, variant)
    first_model = build_model(model_cfg, "plain") if variant == "cycle" \
        else None
    corrupted = val_ds.precompute_corruption(seed=seed,
                                             registry_path=registry_path)

    @jax.jit
    def infer(params, inputs, mask, clean, length):
        x, x_no, x_mask, y_mask, valid = shift_streams(inputs, mask, length)
        if variant == "embedding":
            # A3 eval (steps.make_eval_step a3 branch): identity recon of
            # the zero-masked stream; masked-frame distance vs the CLEAN
            # frames reports how much signal the AE bottleneck preserves
            x = zero_missing_frames(x, x_mask)
            pred = model.apply({"params": params}, x)
            per_video = losses.euclidean_loss(pred, x, frame_weight=valid)
            comp, w_mask = pred, x_mask
        else:
            if variant == "cycle":
                pred = cycle_forward(first_model, first_params, model,
                                     params, x, x_no, x_mask, y_mask, valid)
            else:
                pred = completer_forward(model, params, x, x_no, x_mask,
                                         y_mask, valid)
            comp = losses.composite_prediction(pred, clean, y_mask)
            per_video = losses.euclidean_loss(comp, clean,
                                              frame_weight=valid)
            w_mask = y_mask
        d = jnp.sqrt(jnp.sum((comp - clean) ** 2, axis=-1))      # (B,T,K)
        w = (w_mask * valid)[..., None]
        return per_video, jnp.sum(d * w), jnp.sum(w) * d.shape[-1]

    batches = list(val_ds.batches(batch_size, corrupted=corrupted))

    def run(collect):
        pv_all, dsum, wsum, frames = [], 0.0, 0.0, 0
        for b in batches:
            pv, ds_, ws_ = infer(params, jnp.asarray(b.inputs),
                                 jnp.asarray(b.mask), jnp.asarray(b.clean),
                                 jnp.asarray(b.length))
            if collect:
                keep = b.weight > 0
                pv_all.extend(np.asarray(pv)[keep].tolist())
                dsum += float(ds_)
                wsum += float(ws_)
            frames += int(b.length.sum())
        jax.block_until_ready(pv)
        return pv_all, dsum, wsum, frames

    if warmup:
        run(collect=False)  # compile
    t0 = time.perf_counter()
    pv_all, dsum, wsum, frames = run(collect=True)
    dt = time.perf_counter() - t0

    return {
        "variant": variant,
        "val_euclidean_loss": float(np.mean(pv_all)),
        "masked_mpjpe": dsum / max(wsum, 1.0),
        # end-to-end (host staging + transfers + device) — see module
        # docstring; counts whole-video frames, of which only the masked
        # ones are interpolated
        "end_to_end_frames_per_sec": frames / dt,
        "num_videos": len(pv_all),
        "num_frames": frames,
        "wall_sec": dt,
        "per_video": pv_all,
    }


def _load_any_checkpoint(path: str, args):
    """(params, ModelConfig) from a reference .pth or an orbax dir."""
    if path.endswith(".pth"):
        from ..train.checkpoint import load_reference_checkpoint
        params, hyper = load_reference_checkpoint(path)
        mc = ModelConfig(hidden_dim=int(hyper["hidden_dim"]),
                         num_layers=int(hyper["num_layers"]),
                         num_heads=int(hyper["num_heads"]),
                         matmul_precision=args.precision)
        return params, mc
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as c:
        params = c.restore(os.path.abspath(path))
    mc = ModelConfig(hidden_dim=args.hidden_dim,
                     num_layers=args.num_layers,
                     num_heads=args.num_heads,
                     matmul_precision=args.precision)
    return params, mc


def inference_main(args) -> int:
    from ..data.synthetic import synthetic_dataset

    if args.synthetic:
        vids = synthetic_dataset(
            args.synthetic, args.synthetic_min_len, args.synthetic_max_len,
            seed=args.seed, motion=args.synthetic_motion,
            vocab=args.synthetic_vocab)
        ds = KeypointDataset(videos=vids,
                             dataset_name=args.dataset_name or "all",
                             max_seq_len=args.max_seq_len)
    else:
        ds = KeypointDataset(path=args.validation_set_path,
                             max_seq_len=args.max_seq_len)

    params, mc = _load_any_checkpoint(args.checkpoint, args)
    first_params = None
    if getattr(args, "first_checkpoint", None):
        first_params, _ = _load_any_checkpoint(args.first_checkpoint, args)
    variant = getattr(args, "variant", "plain")

    with jax.default_matmul_precision(mc.matmul_precision):
        res = evaluate_checkpoint(params, mc, ds,
                                  batch_size=args.batch_size,
                                  seed=args.seed,
                                  registry_path=args.registry_path,
                                  variant=variant,
                                  first_params=first_params)
    res = {k: v for k, v in res.items() if k != "per_video"}
    print(json.dumps(res, indent=2))
    return 0
