"""Classical-baseline evaluation over a validation set.

Covers the reference's three evaluation scripts:
  * freeze-frame ("do-nothing") loss — 2_dataset_missing_loss.py:30-69
  * cubic-spline baseline — 3_test_cubic_interpolation.py:61-197 (the
    SOS frame participates as a knot at position 0, as in the reference,
    which interpolates ``inputs`` WITH the SOS prepended and then scores
    ``prediction[1:]``)
  * quaternion/SLERP baseline — test_quaternion.py:187-221 (run with
    random-missing corruption; scored on aligned shapes, vs the
    reference's buggy sota[1:-1] slice — divergence documented)

All three run batched on device; statistics (ANOVA/Tukey/t-test) and violin
plots via eval/stats.py.
"""

from __future__ import annotations

import json
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import KeypointDataset
from ..ops.cubic_spline import cubic_interpolation_batch
from ..ops.losses import euclidean_loss, mse_loss
from ..ops.slerp import quaternion_interpolation_batch


def evaluate_baselines(val_ds: KeypointDataset, batch_size: int = 8,
                       seed: int = 42, is_random_missing: bool = False,
                       which=("freeze", "cubic", "quaternion"),
                       registry_path=None) -> Dict[str, List[float]]:
    """Per-video loss lists for the selected baselines."""
    corrupted = val_ds.precompute_corruption(
        seed=seed, is_random_missing=is_random_missing,
        registry_path=registry_path)

    out: Dict[str, List[float]] = {k: [] for k in which}

    cubic_fn = jax.jit(cubic_interpolation_batch)
    quat_fn = jax.jit(quaternion_interpolation_batch)

    for batch in val_ds.batches(batch_size, corrupted=corrupted):
        inputs = jnp.asarray(batch.inputs)       # (B, T+1, K, 2) SOS + corr
        mask = jnp.asarray(batch.mask)           # (B, T+1)
        clean = jnp.asarray(batch.clean)         # (B, T, K, 2)
        T = clean.shape[1]
        valid = jnp.asarray(batch.valid)
        keep = batch.weight > 0

        if "freeze" in which:
            # EuclideanLoss(inputs[1:], sota) — 2_dataset_missing_loss.py:50
            pv = euclidean_loss(inputs[:, 1:T + 1], clean,
                                frame_weight=valid)
            out["freeze"].extend(np.asarray(pv)[keep].tolist())

        if "cubic" in which:
            pred = cubic_fn(inputs, mask)[:, 1:T + 1]
            pv = euclidean_loss(pred, clean, frame_weight=valid)
            out["cubic"].extend(np.asarray(pv)[keep].tolist())

        if "quaternion" in which:
            # reference zeroes masked frames first (test_quaternion.py:210)
            zeroed = jnp.where(mask[:, 1:T + 1, None, None] > 0, 0.0,
                               inputs[:, 1:T + 1])
            pred = quat_fn(zeroed, mask[:, 1:T + 1])
            pv = mse_loss(pred, clean, frame_weight=valid)
            out["quaternion"].extend(np.asarray(pv)[keep].tolist())

    return out


def write_baseline_artifacts(results: Dict[str, List[float]],
                             dataset_label: str,
                             results_dir: str = "results") -> List[str]:
    """The reference baseline scripts' image artifacts, same filenames:

      * initial_loss_euclidean_{ds}.jpg — freeze-loss histogram
        (2_dataset_missing_loss.py:69)
      * cubic_histogram_freq_{ds}.jpg — dual freeze-vs-cubic histogram
        (3_test_cubic_interpolation.py:101-140)
      * cubic_histogram_{ds}.jpg — violin comparison
        (3_test_cubic_interpolation.py:143-176)

    Returns the list of files written (empty if matplotlib is missing).
    """
    import os
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return []
    os.makedirs(results_dir, exist_ok=True)
    written: List[str] = []

    if results.get("freeze"):
        path = os.path.join(results_dir,
                            f"initial_loss_euclidean_{dataset_label}.jpg")
        plt.figure()
        plt.hist(results["freeze"], bins=24, edgecolor="black",
                 color="skyblue", alpha=0.7)
        plt.grid(axis="y", linestyle="--", alpha=0.7)
        plt.title("Histogram of loss - Cubic")   # reference's literal title
        plt.xlabel("Loss")
        plt.ylabel("Frequence")
        plt.savefig(path)
        plt.close()
        written.append(path)

    if results.get("freeze") and results.get("cubic"):
        path = os.path.join(results_dir,
                            f"cubic_histogram_freq_{dataset_label}.jpg")
        base, cub = results["freeze"], results["cubic"]
        plt.figure(figsize=(12, 8))
        bins = np.histogram_bin_edges(np.concatenate([base, cub]), bins=24)
        plt.hist(base, bins=bins, alpha=0.7, label="Baseline Loss",
                 color="skyblue", edgecolor="black")
        plt.hist(cub, bins=bins, alpha=0.7, label="Cubic I. Loss",
                 color="orange", edgecolor="black")
        plt.grid(axis="y", linestyle="--", alpha=0.5)
        plt.axvline(x=float(np.median(base)), color="blue",
                    linestyle="dashed", linewidth=3,
                    label="Median Baseline Loss")
        plt.axvline(x=float(np.median(cub)), color="orange",
                    linestyle="dashed", linewidth=3,
                    label="Median Interpolation Loss")
        plt.legend(loc="upper right", fontsize="small")
        plt.title("Histogram of Loss - Cubic Interpolation", fontsize=18)
        plt.xlabel("Loss", fontsize=14)
        plt.ylabel("Frequency", fontsize=14)
        plt.tight_layout()
        plt.savefig(path)
        plt.close()
        written.append(path)

    return written


def baselines_main(args) -> int:
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

    which = (("freeze", "cubic", "quaternion") if args.which == "all"
             else (args.which,))
    results = evaluate_baselines(ds, batch_size=args.batch_size,
                                 seed=args.seed,
                                 which=which,
                                 is_random_missing=("quaternion" in which
                                                    and len(which) == 1),
                                 registry_path=args.registry_path)
    summary = {k: {"mean": float(np.mean(v)), "median": float(np.median(v)),
                   "n": len(v)} for k, v in results.items() if v}

    label = args.dataset_name or ("synthetic" if args.synthetic else "all")
    results_dir = getattr(args, "results_dir", "results")
    import os
    written = write_baseline_artifacts(results, label, results_dir)
    if len([v for v in results.values() if v]) > 1:
        from .stats import compare_distributions
        violin = os.path.join(results_dir, f"cubic_histogram_{label}.jpg")
        stats = compare_distributions(
            {k: v for k, v in results.items() if v},
            plot_path=violin, verbose=False)
        if stats.get("plot"):
            written.append(violin)
        summary["stats"] = {k: v for k, v in stats.items() if k != "plot"}
    summary["artifacts"] = written
    print(json.dumps(summary, indent=2))
    return 0
