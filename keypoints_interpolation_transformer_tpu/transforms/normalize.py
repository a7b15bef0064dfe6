"""Signing-space normalization — pure-jnp, scan-based, vmappable.

Re-derivation of the reference's ``normalize_pose`` (dataloader.py:71-140),
whose Python triple loop (videos x frames x keypoints) is a load-time hot
spot.  Here the sequential part — the carry-forward of the last valid
bounding box when shoulders are undetected (dataloader.py:81-87) — is a
``lax.scan`` over frames, and the per-keypoint arithmetic is one vectorized
map over (T, K, 2).

Semantics preserved exactly:
  * bbox from shoulder distance: head = ||ls - rs|| / 2, mid hardcoded
    (0.5, 0.5) (dataloader.py:106-110)
  * bbox x in mid +- 3*head; y from right_eye.y - head/2 down to
    mid.y + 3.5*head (dataloader.py:120-121)
  * frames before the first valid bbox are left unnormalized
    (dataloader.py:82-84)
  * keypoints with x == 0 are skipped (dataloader.py:129)
  * y output flipped: y' = 1 - (y - ey)/(sy - ey) (dataloader.py:134-138)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.keypoints import body_map


def _bbox_scan(shoulder_l, shoulder_r, right_eye_y):
    """Per-frame bbox with carry-forward.  Inputs are (T, 2), (T, 2), (T,).

    Returns (start, end, frame_valid): (T, 2), (T, 2), (T,) bool.
    """

    def step(carry, frame):
        c_start, c_end, c_has = carry
        ls, rs, rey = frame
        shoulders_ok = jnp.logical_and(ls[0] != 0.0, rs[0] != 0.0)

        dist = jnp.sqrt(jnp.sum((ls - rs) ** 2))
        head = dist / 2.0
        new_start = jnp.array([0.5 - 3.0 * head, rey - head / 2.0])
        new_end = jnp.array([0.5 + 3.0 * head, 0.5 + 3.5 * head])

        start = jnp.where(shoulders_ok, new_start, c_start)
        end = jnp.where(shoulders_ok, new_end, c_end)
        has = jnp.logical_or(shoulders_ok, c_has)
        return (start, end, has), (start, end, has)

    init = (jnp.zeros(2), jnp.zeros(2), jnp.asarray(False))
    _, (starts, ends, valid) = jax.lax.scan(
        step, init, (shoulder_l, shoulder_r, right_eye_y))
    return starts, ends, valid


def normalize_pose(video: jnp.ndarray, bm=None) -> jnp.ndarray:
    """Normalize one (T, K, 2) keypoint video into signing space.

    jit/vmap friendly; zero-padded frames are left untouched (their
    shoulders are zero so they only ever reuse the carried bbox, and their
    keypoints are all x == 0 and hence skipped).
    """
    bm = bm or body_map()
    i_ls = bm.index_of["pose_left_shoulder"]
    i_rs = bm.index_of["pose_right_shoulder"]
    i_re = bm.index_of["pose_right_eye"]

    starts, ends, valid = _bbox_scan(
        video[:, i_ls, :], video[:, i_rs, :], video[:, i_re, 1])

    sx, sy = starts[:, 0:1], starts[:, 1:2]       # (T, 1)
    ex, ey = ends[:, 0:1], ends[:, 1:2]

    x, y = video[..., 0], video[..., 1]           # (T, K)
    nx = (x - sx) / (ex - sx)
    ny = (y - ey) / (sy - ey)
    out = jnp.stack([nx, 1.0 - ny], axis=-1)

    skip = jnp.logical_or(x == 0.0, ~valid[:, None])  # (T, K)
    return jnp.where(skip[..., None], video, out)


normalize_pose_batch = jax.vmap(normalize_pose, in_axes=(0,))


def normalize_hand(points: jnp.ndarray) -> jnp.ndarray:
    """Square-bbox part normalization with 10% margin.

    Re-derivation of the reference's ``normalize_hand``
    (dataloader.py:144-196) — dead in the reference pipeline (its calls are
    commented out at dataloader.py:214-216) but part of the public surface;
    kept here vectorized for parity.  Input (T, P, 2), in-place semantics
    replaced by a pure return.
    """
    x, y = points[..., 0], points[..., 1]                  # (T, P)
    min_x = jnp.min(x, axis=1, keepdims=True)
    max_x = jnp.max(x, axis=1, keepdims=True)
    min_y = jnp.min(y, axis=1, keepdims=True)
    max_y = jnp.max(y, axis=1, keepdims=True)
    w, h = max_x - min_x, max_y - min_y

    wide = w > h
    dx = jnp.where(wide, 0.1 * w, 0.1 * h + (h - w) / 2.0)
    dy = jnp.where(wide, 0.1 * w + (w - h) / 2.0, 0.1 * h)

    sx, sy = min_x - dx, min_y - dy
    ex, ey = max_x + dx, max_y + dy

    nx = (x - sx) / (ex - sx)
    ny = (y - sy) / (ey - sy)
    out = jnp.stack([nx, ny], axis=-1)

    degenerate = jnp.logical_or((ex - sx) == 0.0, (sy - ey) == 0.0)
    skip = jnp.logical_or(x == 0.0, degenerate)            # (T, P)
    return jnp.where(skip[..., None], points, out)
