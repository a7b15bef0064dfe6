"""Geometric augmentations — pure-jnp, PRNG-keyed, vmappable.

Re-derivation of the reference's augmentation pipeline (augmentation.py),
whose per-point Python loops and cv2 calls become closed-form 2x2 / 3x3
transforms over (T, K, 2) arrays.

Reference semantics preserved, including the quirks:

  * augment_rotate (augmentation.py:121-142): random angle about (0.5, 0.5);
    because the hands belong to both the BODY and HAND identifier lists they
    are rotated TWICE (2x the angle).  Controlled by
    ``double_hand_rotation`` (default True == reference).
  * augment_shear (augmentation.py:144-203): "squeeze" and "perspective"
    variants via a 4-point homography (our own normal-equations solve
    replaces cv2.getPerspectiveTransform); coordinates equal to the
    transformed zero landmark are pinned back to 0 — the reference compares
    ELEMENTWISE per coordinate (augmentation.py:198-199), reproduced.
  * augment_arm_joint_rotate (augmentation.py:206-233): walk each arm chain
    root-to-tip; with probability p per joint rotate all downstream joints
    about that joint's (already augmented) per-frame position.

RNG: explicit key threading; distributions match, draws differ.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..data.keypoints import body_map

DEG2RAD = math.pi / 180.0


def _rotate_about(points, origin, angle):
    """Counterclockwise rotation (augmentation.py:65-80).

    points (..., 2), origin broadcastable (..., 2), angle scalar.
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    d = points - origin
    return jnp.stack([
        origin[..., 0] + c * d[..., 0] - s * d[..., 1],
        origin[..., 1] + s * d[..., 0] + c * d[..., 1],
    ], axis=-1)


def rotate(key, video, angle_range=(-15.0, 15.0), bm=None,
           double_hand_rotation: bool = True):
    """Rotate all keypoints about the frame center (0.5, 0.5)."""
    bm = bm or body_map()
    lo, hi = angle_range
    angle = jax.random.uniform(key, (), minval=lo, maxval=hi) * DEG2RAD
    origin = jnp.array([0.5, 0.5])

    body = jnp.asarray(bm.body_identifiers)
    out = video.at[:, body, :].set(
        _rotate_about(video[:, body, :], origin, angle))
    if double_hand_rotation:  # hands are in BODY too -> rotated again
        hands = jnp.asarray(bm.hand_identifiers)
        out = out.at[:, hands, :].set(
            _rotate_about(out[:, hands, :], origin, angle))
    return out


def perspective_transform_matrix(src, dst):
    """3x3 homography mapping 4 src points onto 4 dst points.

    jnp replacement for cv2.getPerspectiveTransform: solve the standard
    8x8 linear system for h with h22 = 1.
    """
    rows = []
    rhs = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        u, v = dst[i, 0], dst[i, 1]
        rows.append(jnp.stack([x, y, jnp.ones(()), jnp.zeros(()),
                               jnp.zeros(()), jnp.zeros(()),
                               -x * u, -y * u]))
        rows.append(jnp.stack([jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
                               x, y, jnp.ones(()),
                               -x * v, -y * v]))
        rhs.extend([u, v])
    A = jnp.stack(rows)
    b = jnp.stack(rhs)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones(1)]).reshape(3, 3)


def apply_homography(points, H):
    """Projective transform of (..., 2) points (cv2.perspectiveTransform)."""
    x, y = points[..., 0], points[..., 1]
    w = H[2, 0] * x + H[2, 1] * y + H[2, 2]
    u = (H[0, 0] * x + H[0, 1] * y + H[0, 2]) / w
    v = (H[1, 0] * x + H[1, 1] * y + H[1, 2]) / w
    return jnp.stack([u, v], axis=-1)


_UNIT_QUAD = jnp.array([[0.0, 1.0], [1.0, 1.0], [0.0, 0.0], [1.0, 0.0]])


def perspective_from_unit_quad(dst):
    """Closed-form homography mapping _UNIT_QUAD onto ``dst`` (rows in the
    same order: (0,1), (1,1), (0,0), (1,0)).

    Identical math to perspective_transform_matrix(_UNIT_QUAD, dst) — the
    classic unit-square-to-quadrilateral texture-mapping solution — but
    with NO linear solve: an 8x8 jnp.linalg.solve lowers to a batched tiny
    LU on TPU, which measured as the dominant cost of the whole on-device
    augmentation pipeline (it serializes scalar row operations; the vmapped
    lax.switch evaluates BOTH shear branches for every video).
    """
    q01, q11, q00, q10 = dst[0], dst[1], dst[2], dst[3]
    dx1 = q10 - q11
    dx2 = q01 - q11
    sx = q00 - q10 - q01 + q11
    det = dx1[0] * dx2[1] - dx2[0] * dx1[1]
    g = (sx[0] * dx2[1] - dx2[0] * sx[1]) / det
    h = (dx1[0] * sx[1] - sx[0] * dx1[1]) / det
    a = q10[0] - q00[0] + g * q10[0]
    b = q01[0] - q00[0] + h * q01[0]
    c = q00[0]
    d = q10[1] - q00[1] + g * q10[1]
    e = q01[1] - q00[1] + h * q01[1]
    f = q00[1]
    return jnp.stack([jnp.stack([a, b, c]),
                      jnp.stack([d, e, f]),
                      jnp.stack([g, h, jnp.ones(())])])


def shear(key, video, kind: str, squeeze_ratio=(-0.15, 0.15), bm=None):
    """"squeeze" or "perspective" shear of the BODY points."""
    bm = bm or body_map()
    lo, hi = squeeze_ratio
    k1, k2, k3 = jax.random.split(key, 3)

    if kind == "squeeze":
        ml = jax.random.uniform(k1, (), minval=lo, maxval=hi)
        mr = jax.random.uniform(k2, (), minval=lo, maxval=hi)
        dst = jnp.stack([
            jnp.stack([ml, jnp.ones(())]),
            jnp.stack([1.0 - mr, jnp.ones(())]),
            jnp.stack([ml, jnp.zeros(())]),
            jnp.stack([1.0 - mr, jnp.zeros(())]),
        ])
    elif kind == "perspective":
        r = jax.random.uniform(k1, (), minval=lo, maxval=hi)
        left_side = jax.random.uniform(k2, ()) < 0.5
        dst_left = jnp.stack([
            jnp.stack([r, 1.0 - r]),
            jnp.stack([jnp.ones(()), jnp.ones(())]),
            jnp.stack([r, r]),
            jnp.stack([jnp.ones(()), jnp.zeros(())]),
        ])
        dst_right = jnp.stack([
            jnp.stack([jnp.zeros(()), jnp.ones(())]),
            jnp.stack([1.0 - r, 1.0 - r]),
            jnp.stack([jnp.zeros(()), jnp.zeros(())]),
            jnp.stack([1.0 - r, r]),
        ])
        dst = jnp.where(left_side, dst_left, dst_right)
    else:
        raise ValueError(f"unsupported shear kind: {kind!r}")

    H = perspective_from_unit_quad(dst)
    body = jnp.asarray(bm.body_identifiers)
    pts = apply_homography(video[:, body, :], H)
    zero_image = apply_homography(jnp.zeros(2), H)  # transformed (0, 0)
    # elementwise pin-back, as the reference does (augmentation.py:198-199)
    pts = jnp.where(pts == zero_image, 0.0, pts)
    return video.at[:, body, :].set(pts)


def arm_joint_rotate(key, video, probability=0.5, angle_range=(-15.0, 15.0),
                     bm=None):
    """Randomly rotate downstream arm joints about each chain joint."""
    bm = bm or body_map()
    lo, hi = angle_range
    out = video
    keys = jax.random.split(key, sum(len(c) for c in bm.arm_chains))
    ki = 0
    for chain in bm.arm_chains:
        for j, origin_idx in enumerate(chain):
            k_pass, k_ang = jax.random.split(keys[ki])
            ki += 1
            if j + 1 >= len(chain):
                continue
            downstream = jnp.asarray(chain[j + 1:])
            fire = jax.random.uniform(k_pass, ()) < probability
            angle = jax.random.uniform(k_ang, (), minval=lo,
                                       maxval=hi) * DEG2RAD
            angle = jnp.where(fire, angle, 0.0)
            origin = out[:, origin_idx, :][:, None, :]  # (T, 1, 2)
            out = out.at[:, downstream, :].set(
                _rotate_about(out[:, downstream, :], origin, angle))
    return out


def random_augment(key, video, probability=0.5, bm=None,
                   double_hand_rotation: bool = True):
    """The reference's per-sample augmentation policy
    (dataloader.py:649-663): with probability p, apply ONE of
    {rotate, perspective-shear, squeeze-shear, arm-joint-rotate}.

    jit-compatible: all four branches trace; lax.switch picks one.
    """
    k_gate, k_pick, k_aug = jax.random.split(key, 3)
    apply_any = jax.random.uniform(k_gate, ()) < probability
    which = jax.random.randint(k_pick, (), 0, 4)

    branches = [
        lambda v: rotate(k_aug, v, (-15.0, 15.0), bm,
                         double_hand_rotation=double_hand_rotation),
        lambda v: shear(k_aug, v, "perspective", (-0.15, 0.15), bm),
        lambda v: shear(k_aug, v, "squeeze", (-0.15, 0.15), bm),
        lambda v: arm_joint_rotate(k_aug, v, 0.5, (-15.0, 15.0), bm),
    ]
    augmented = jax.lax.switch(which, branches, video)
    return jnp.where(apply_any, augmented, video)
