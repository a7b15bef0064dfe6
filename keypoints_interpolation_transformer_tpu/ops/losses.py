"""Mask-aware losses over (…, K, 2) keypoint tensors.

Re-derivations of the reference's losses (euclidean_loss.py:4-46) extended
with frame-validity weighting so padded/bucketed batches reproduce the exact
per-video values of the reference's batch-size-1 loops.

Conventions:
  * ``pred`` / ``target``: (..., T, K, 2) float arrays.
  * ``frame_weight``: optional (..., T) array, 1.0 for real frames and 0.0
    for padding.  When omitted, every frame counts (the reference behavior).
  * Reductions match the reference exactly on unpadded inputs:
      - euclidean_loss: MEAN over points of squared euclidean distance
        (euclidean_loss.py:4-17)
      - euclidean_distance_loss: SUM over points of true euclidean distance
        (euclidean_loss.py:19-37)
      - mse_loss: mean over all coordinates (torch.nn.MSELoss, the A1 train
        criterion, A1_train.py:254) == euclidean_loss / 2
"""

from __future__ import annotations

import jax.numpy as jnp


def _sq_dist(pred, target):
    d = pred - target
    return jnp.sum(d * d, axis=-1)  # (..., T, K)


def euclidean_loss(pred, target, frame_weight=None):
    """Mean over keypoints of squared euclidean distance."""
    sq = _sq_dist(pred, target)
    if frame_weight is None:
        return jnp.mean(sq, axis=(-1, -2))
    w = frame_weight[..., None]  # (..., T, 1)
    num = jnp.sum(sq * w, axis=(-1, -2))
    den = jnp.sum(w, axis=(-1, -2)) * sq.shape[-1]
    return num / jnp.maximum(den, 1.0)


def euclidean_distance_loss(pred, target, frame_weight=None, eps=0.0):
    """Sum over keypoints of true euclidean distance."""
    d = jnp.sqrt(jnp.maximum(_sq_dist(pred, target), eps))
    if frame_weight is None:
        return jnp.sum(d, axis=(-1, -2))
    return jnp.sum(d * frame_weight[..., None], axis=(-1, -2))


def mse_loss(pred, target, frame_weight=None):
    """Mean over all coordinates — torch.nn.MSELoss semantics."""
    sq = (pred - target) ** 2
    if frame_weight is None:
        return jnp.mean(sq, axis=(-1, -2, -3))
    w = frame_weight[..., None, None]
    num = jnp.sum(sq * w, axis=(-1, -2, -3))
    den = jnp.sum(w, axis=(-1, -2, -3)) * sq.shape[-1] * sq.shape[-2]
    return num / jnp.maximum(den, 1.0)


def weighted_mse_loss(pred, target, weights):
    """Elementwise-weighted MSE (reference euclidean_loss.py:39-46; unused
    by the trainers but part of the public loss surface)."""
    return jnp.mean(weights * (pred - target) ** 2)


def composite_prediction(pred, target, missing_mask):
    """Keep the model's output only on missing frames; copy ground truth
    elsewhere.  The reference eval composite (A1_train.py:184):
    ``pred * y_mask + y * (1 - y_mask)`` with the mask broadcast over
    keypoints and coordinates."""
    m = missing_mask[..., None, None]
    return pred * m + target * (1.0 - m)


def intermediate_loss(outputs, target, frame_weight=None):
    """Sum of per-output MSE over a list of intermediate predictions —
    deep-supervision auxiliary loss.

    Working re-derivation of the reference's dead helper
    ``calculate_intermediate_loss`` (model.py:53-57: ``sum(F.mse_loss(o,
    target) for o in outputs)``), extended with the frame-validity
    weighting every live criterion here carries so it composes with
    padded batches."""
    return sum(jnp.mean(mse_loss(o, target, frame_weight)) for o in outputs)
