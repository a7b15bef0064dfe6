"""Flagship-scale quality demonstration (the reference's reason to exist).

Trains the comparable configuration (hidden_dim=256, num_layers=6,
num_heads=8 — parseMain.py defaults) on gesture-vocabulary synthetic
motion with LONG missing blocks, then scores the trained model against the
reference's two classical baselines (cubic spline,
3_test_cubic_interpolation.py; freeze-frame, 2_dataset_missing_loss.py)
on IDENTICAL corruption, with the reference's own statistical bar: ANOVA
f_oneway + Tukey HSD (3_test_cubic_interpolation.py:179-196).

Artifacts: results/IA_histogram_GESTURE.jpg (violin), validation strips,
results/quality_demo.json (full numbers).

Usage: python benchmarks/quality_demo.py [--epochs 120] [--videos 256]
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--videos", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--precision", default="high",
                    choices=["default", "high", "highest"])
    ap.add_argument("--attention_impl", default="auto")
    # smoke-test overrides (the flagship config is the default)
    ap.add_argument("--hidden_dim", type=int, default=256)
    ap.add_argument("--num_layers", type=int, default=6)
    ap.add_argument("--num_heads", type=int, default=8)
    ap.add_argument("--out", default="results/quality_demo.json")
    args = ap.parse_args()

    from keypoints_interpolation_transformer_tpu.utils.compilation_cache \
        import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    from keypoints_interpolation_transformer_tpu.data.pipeline import (
        KeypointDataset)
    from keypoints_interpolation_transformer_tpu.data.synthetic import (
        synthetic_dataset)
    from keypoints_interpolation_transformer_tpu.eval.baselines import (
        evaluate_baselines)
    from keypoints_interpolation_transformer_tpu.eval.inference import (
        evaluate_checkpoint)
    from keypoints_interpolation_transformer_tpu.eval.stats import (
        compare_distributions)
    from keypoints_interpolation_transformer_tpu.train.loop import train
    from keypoints_interpolation_transformer_tpu.utils.config import (
        Config, DataConfig, ModelConfig, TrainConfig)

    os.makedirs("results", exist_ok=True)
    # long-block corruption stats for the GESTURE dataset (registry
    # overlay, same schema as the reference's dataset_config.json).
    # NOTE the reference's stat-name swap (dataloader.py:368-383,
    # reproduced faithfully in transforms/corruption.py):
    # `mean_consecutive_missing` drives the NUMBER of blocks and
    # `mean_number_missing_blocks` drives the block SIZE — so "two
    # ~14-frame gaps per clip" is written as (2, 14), not (14, 2).
    registry = "results/quality_demo_registry.json"
    with open(registry, "w") as f:
        json.dump({"GESTURE": {
            "mean_consecutive_missing": 2.0,
            "std_consecutive_missing": 0.7,
            "samples": 400,
            "mean_number_missing_blocks": 14.0,
            "std_number_missing_blocks": 3.0,
        }}, f)

    cfg = Config(
        model=ModelConfig(matmul_precision=args.precision,
                          attention_impl=args.attention_impl,
                          hidden_dim=args.hidden_dim,
                          num_layers=args.num_layers,
                          num_heads=args.num_heads),
        data=DataConfig(dataset_name="GESTURE", registry_path=registry,
                        synthetic_num_videos=args.videos,
                        synthetic_motion="gestures",
                        synthetic_min_len=48, synthetic_max_len=96,
                        batch_size=args.batch_size),
        train=TrainConfig(regime="a1", lr=args.lr, epochs=args.epochs,
                          patience=max(50, args.epochs),
                          experiment_name="quality_demo",
                          save_plots=True, log_every=5),
    )

    vids = synthetic_dataset(args.videos, 48, 96, seed=42,
                             motion="gestures", vocab=8)
    n_train = int(0.8 * len(vids))
    train_ds = KeypointDataset(videos=vids[:n_train],
                               dataset_name="GESTURE", max_seq_len=512)
    val_ds = KeypointDataset(videos=vids[n_train:],
                             dataset_name="GESTURE", max_seq_len=512)

    import jax
    with jax.default_matmul_precision(args.precision):
        res = train(cfg, train_ds, val_ds)

        # baselines on the SAME corruption (same seed/dataset/registry)
        base = evaluate_baselines(val_ds, batch_size=args.batch_size,
                                  seed=cfg.train.seed,
                                  which=("freeze", "cubic"),
                                  registry_path=registry)

        # the model's per-video distribution: best checkpoint re-evaluated
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as c:
            params = c.restore(os.path.abspath(res.checkpoint_path))
        inf = evaluate_checkpoint(params, cfg.model, val_ds,
                                  batch_size=args.batch_size,
                                  seed=cfg.train.seed,
                                  registry_path=registry)
    model_pv, fps = inf["per_video"], inf["end_to_end_frames_per_sec"]

    dists = {"Baseline": base["freeze"], "AI": model_pv,
             "Cubicspline": base["cubic"]}
    stats = compare_distributions(
        dists, verbose=True,
        plot_path="results/IA_histogram_GESTURE.jpg")

    summary = {
        "config": {"epochs": args.epochs, "videos": args.videos,
                   "batch_size": args.batch_size, "lr": args.lr,
                   "precision": args.precision,
                   "model": f"{args.hidden_dim}/{args.num_layers}/"
                            f"{args.num_heads}"},
        "best_val_loss": res.best_val_loss,
        "best_epoch": res.best_epoch,
        "epochs_run": res.epochs_run,
        "model_mean": float(np.mean(model_pv)),
        "freeze_mean": float(np.mean(base["freeze"])),
        "cubic_mean": float(np.mean(base["cubic"])),
        "model_vs_cubic": float(np.mean(base["cubic"]) /
                                np.mean(model_pv)),
        "model_vs_freeze": float(np.mean(base["freeze"]) /
                                 np.mean(model_pv)),
        "masked_mpjpe": inf["masked_mpjpe"],
        "inference_frames_per_sec": fps,
        "anova_tukey": stats,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
