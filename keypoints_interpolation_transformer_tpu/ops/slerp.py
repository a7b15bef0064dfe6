"""Quaternion/SLERP bone interpolation baseline — closed-form, vectorized.

Re-derivation of the reference's quaternion baseline (test_quaternion.py):
for every missing block [t0, t1) found in the mask
(create_interpolation_block, :55-84) and every skeleton edge
(origin -> target joints, :198-201), the bone vector at t0 is swept toward
the bone at t1 by SLERP with linear length blending
(joints_intermediates, :150-185).

Because the reference SLERPs from the identity to q(axis, angle), the k-th
intermediate is simply a rotation about the same axis by angle*k/(T+1) — a
closed-form Rodrigues rotation.  The whole baseline becomes one
(blocks x edges x steps) broadcast instead of nested Python loops over
pyquaternion objects.

Reference quirks preserved:
  * the rotation axis is cross(z_hat, v1) (NOT the geodesic axis
    cross(v1, v2)), falling back to cross(x_hat, v1) when degenerate
    (test_quaternion.py:29-36) — 2-D bones therefore sweep out-of-plane arcs
    whose z component is discarded;
  * angle = arccos(cos(v1, v2)), pinned to pi when nearly antiparallel;
  * blending step = (|v2| - |v1|) / (T + 1) with T the full video length.

Divergence (documented): the reference writes interpolated frames into an
UNINITIALIZED torch.empty_like buffer, leaving non-block frames as garbage
(test_quaternion.py:89); we start from the input video instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.keypoints import skeleton_edges

MAX_BLOCKS = 256  # random-missing masks can fragment into many runs


def missing_blocks_from_mask(mask: jnp.ndarray, max_blocks: int = MAX_BLOCKS):
    """Static-shape version of create_interpolation_block
    (test_quaternion.py:55-84): runs [start, end) of mask == 1, scanning
    only up to index T-2 (the reference's i_limit/j_limit are T-1).

    Returns (starts, ends, active) of shape (max_blocks,).
    """
    T = mask.shape[0]
    m = (mask > 0).astype(jnp.int32)
    lim = T - 1
    idx = jnp.arange(T)
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), m[:-1]])
    is_start = jnp.logical_and(jnp.logical_and(m == 1, prev == 0), idx < lim)
    # run end: first index >= start with mask 0 (capped at lim like j_limit)
    starts_all = jnp.where(is_start, idx, T)
    order = jnp.sort(starts_all)
    starts = order[:max_blocks]
    active = starts < T

    nxt = jnp.concatenate([m[1:], jnp.zeros(1, jnp.int32)])
    is_end = jnp.logical_and(m == 1, nxt == 0)

    def end_of(s):
        cand = jnp.where(jnp.logical_and(is_end, idx >= s), idx, T)
        e = jnp.min(cand) + 1
        return jnp.minimum(e, lim)

    ends = jax.vmap(end_of)(jnp.clip(starts, 0, T - 1))
    ends = jnp.maximum(ends, starts)
    return starts, ends, active


def _rodrigues(v, axis, angle):
    """Rotate v about unit axis by angle; shapes broadcast."""
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    dot = jnp.sum(axis * v, axis=-1, keepdims=True)
    return v * c + jnp.cross(axis, v) * s + axis * dot * (1.0 - c)


def _safe_unit(v, eps=1e-12):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps), jnp.squeeze(n, -1)


def quaternion_interpolation(video: jnp.ndarray, mask: jnp.ndarray,
                             edges: np.ndarray = None) -> jnp.ndarray:
    """Fill missing blocks of one (T, K, 2) video by SLERP bone sweeps."""
    T, K, _ = video.shape
    edges = skeleton_edges() if edges is None else edges
    j_ori = jnp.asarray(edges[:, 0])
    j_tar = jnp.asarray(edges[:, 1])

    starts, ends, active = missing_blocks_from_mask(mask)
    s_idx = jnp.clip(starts, 0, T - 1)
    e_idx = jnp.clip(ends, 0, T - 1)

    def lift(p):  # (..., 2) -> (..., 3), z = 0
        return jnp.concatenate([p, jnp.zeros(p.shape[:-1] + (1,))], -1)

    # per (block, edge): bone endpoints at the block's two anchor frames
    p_ini_l1 = lift(video[s_idx][:, j_ori])        # (Bk, E, 3)
    p_end_l1 = lift(video[s_idx][:, j_tar])
    p_ini_l2 = lift(video[e_idx][:, j_ori])
    p_end_l2 = lift(video[e_idx][:, j_tar])

    tempP = (p_ini_l1 + p_ini_l2) / 2.0
    o_p1 = p_end_l1 - tempP
    o_p3 = p_end_l2 - tempP

    v1n, len1 = _safe_unit(o_p1)
    v2n, len2 = _safe_unit(o_p3)
    cos_t = jnp.clip(jnp.sum(v1n * v2n, axis=-1), -1.0, 1.0)

    z_hat = jnp.array([0.0, 0.0, 1.0])
    x_hat = jnp.array([1.0, 0.0, 0.0])
    ax_z = jnp.cross(jnp.broadcast_to(z_hat, v1n.shape), v1n)
    ax_x = jnp.cross(jnp.broadcast_to(x_hat, v1n.shape), v1n)
    use_x = jnp.linalg.norm(ax_z, axis=-1, keepdims=True) < 0.01
    axis, _ = _safe_unit(jnp.where(use_x, ax_x, ax_z))
    angle = jnp.where(cos_t < -0.999, jnp.pi, jnp.arccos(cos_t))

    # Per-frame block lookup: blocks are disjoint and ascending, so frame t
    # belongs to block b = searchsorted(starts, t) - 1 when t < ends[b].
    # The k-th intermediate is a rotation by angle * k / (T+1) plus linear
    # length blending — computed directly per (frame, edge) via gathers.
    t = jnp.arange(T)
    b = jnp.searchsorted(starts, t, side="right") - 1
    b_cl = jnp.clip(b, 0, starts.shape[0] - 1)
    covered = jnp.logical_and(
        jnp.logical_and(b >= 0, t < ends[b_cl]), active[b_cl])  # (T,)
    k = (t - jnp.clip(starts[b_cl], 0, T - 1)).astype(video.dtype)

    phi = angle[b_cl] * (k / (T + 1.0))[:, None]           # (T, E)
    rot = _rodrigues(o_p1[b_cl], axis[b_cl], phi)          # (T, E, 3)
    step = (len2 - len1) / (T + 1.0)                       # (Bk, E)
    swept = rot + (step[b_cl] * k[:, None])[..., None] * v2n[b_cl] \
        + tempP[b_cl]
    swept2d = swept[..., :2]                               # (T, E, 2)

    # NOTE: skeleton edges have unique targets (a tree), so this scatter is
    # unambiguous; the reference's sequential edge loop relies on the same.
    current = video[:, j_tar, :]
    new_vals = jnp.where(covered[:, None, None], swept2d, current)
    return video.at[:, j_tar, :].set(new_vals)


quaternion_interpolation_batch = jax.vmap(quaternion_interpolation,
                                          in_axes=(0, 0))
