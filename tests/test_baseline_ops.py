"""Classical baselines: cubic spline parity vs pandas/scipy, SLERP parity
vs a quaternion-math numpy oracle, block extraction vs a loop port."""

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from keypoints_interpolation_transformer_tpu.data.keypoints import (
    skeleton_edges)
from keypoints_interpolation_transformer_tpu.ops.cubic_spline import (
    cubic_interpolation, cubic_interpolation_batch, interpolate_series)
from keypoints_interpolation_transformer_tpu.ops.slerp import (
    missing_blocks_from_mask, quaternion_interpolation)


# ---------------------------------------------------------------------------
# cubic spline
# ---------------------------------------------------------------------------

def _pandas_fill(v):
    s = pd.Series(np.asarray(v, np.float64))
    out = s.replace(0, np.nan).interpolate(
        method="cubicspline", limit_direction="both", limit_area=None)
    return np.nan_to_num(out.values)


def test_series_parity_random(rng):
    worst = 0.0
    for _ in range(25):
        T = int(rng.integers(8, 64))
        v = rng.uniform(0.1, 1.0, T).astype(np.float32)
        v = np.where(rng.random(T) < rng.uniform(0.2, 0.7), 0.0, v)
        if (v != 0).sum() < 2:
            continue
        got = np.asarray(interpolate_series(jnp.asarray(v)))
        worst = max(worst, np.abs(got - _pandas_fill(v)).max())
    assert worst < 5e-5, worst


def test_series_edge_cases(rng):
    # all zeros -> zeros (reference nan_to_num)
    np.testing.assert_array_equal(
        np.asarray(interpolate_series(jnp.zeros(10))), np.zeros(10))
    # two points -> straight line incl. extrapolation
    v = np.zeros(8, np.float32)
    v[2], v[5] = 1.0, 4.0
    got = np.asarray(interpolate_series(jnp.asarray(v)))
    np.testing.assert_allclose(got, _pandas_fill(v), atol=1e-5)
    # three points -> parabola
    v = np.zeros(9, np.float32)
    v[1], v[4], v[7] = 1.0, 2.0, 1.5
    got = np.asarray(interpolate_series(jnp.asarray(v)))
    np.testing.assert_allclose(got, _pandas_fill(v), atol=1e-5)
    # leading/trailing gaps -> end-polynomial extrapolation
    v = np.zeros(12, np.float32)
    v[4:9] = rng.uniform(0.5, 1.0, 5)
    got = np.asarray(interpolate_series(jnp.asarray(v)))
    np.testing.assert_allclose(got, _pandas_fill(v), atol=1e-4)


def test_video_matches_reference_recipe(rng):
    """Full (T, K, 2) video against the reference recipe: zero masked
    frames, per-series pandas cubicspline (3_test_cubic_interpolation.py:
    32-58)."""
    T = 24
    v = rng.uniform(0.1, 1.0, size=(T, 54, 2)).astype(np.float32)
    mask = (rng.random(T) < 0.4).astype(np.float32)
    got = np.asarray(cubic_interpolation(jnp.asarray(v), jnp.asarray(mask)))

    data = np.where(mask[:, None, None] > 0, 0.0, v)
    want = np.empty_like(data)
    for kp in range(54):
        for c in range(2):
            want[:, kp, c] = _pandas_fill(data[:, kp, c])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_batched_and_jitted(rng):
    v = rng.uniform(0.1, 1.0, size=(3, 16, 54, 2)).astype(np.float32)
    m = (rng.random((3, 16)) < 0.3).astype(np.float32)
    f = jax.jit(cubic_interpolation_batch)
    out = np.asarray(f(jnp.asarray(v), jnp.asarray(m)))
    for b in range(3):
        np.testing.assert_allclose(
            out[b],
            np.asarray(cubic_interpolation(jnp.asarray(v[b]),
                                           jnp.asarray(m[b]))), atol=1e-5)


# ---------------------------------------------------------------------------
# SLERP baseline
# ---------------------------------------------------------------------------

def _blocks_oracle(mask):
    """Loop port of create_interpolation_block (test_quaternion.py:55-84)."""
    i_limit = j_limit = len(mask) - 1
    i, saved = 0, []
    while i < i_limit:
        while i < i_limit and mask[i] == 0:
            i += 1
        if i == i_limit:
            break
        j = i + 1
        while j < j_limit and mask[j] == 1:
            j += 1
        saved.append((i, j))
        i = j
    return saved


def test_block_extraction_matches_oracle(rng):
    for _ in range(10):
        T = int(rng.integers(6, 40))
        mask = (rng.random(T) < 0.4).astype(np.float32)
        starts, ends, active = (np.asarray(x) for x in
                                missing_blocks_from_mask(jnp.asarray(mask)))
        got = [(int(s), int(e)) for s, e, a in zip(starts, ends, active)
               if a]
        assert got == _blocks_oracle(mask), (mask, got)


def _slerp_oracle(video, mask):
    """Numpy oracle of quaternion_interpolation/joints_intermediates
    (test_quaternion.py:86-185) with explicit quaternion math."""
    edges = skeleton_edges()
    out = video.copy()
    T = len(video)
    for (t0, t1) in _blocks_oracle(mask):
        for o, tgt in edges:
            p_ini_l1 = np.append(video[t0, o], 0.0)
            p_end_l1 = np.append(video[t0, tgt], 0.0)
            p_ini_l2 = np.append(video[t1, o], 0.0)
            p_end_l2 = np.append(video[t1, tgt], 0.0)
            tempP = (p_ini_l1 + p_ini_l2) / 2
            v1 = p_end_l1 - tempP
            v2 = p_end_l2 - tempP
            v1n = v1 / np.linalg.norm(v1)
            v2n = v2 / np.linalg.norm(v2)
            cos_t = float(np.dot(v1n, v2n))
            axis = np.cross([0.0, 0.0, 1.0], v1n)
            if np.linalg.norm(axis) < 0.01:
                axis = np.cross([1.0, 0.0, 0.0], v1n)
            axis = axis / np.linalg.norm(axis)
            angle = np.pi if cos_t < -0.999 else np.arccos(
                np.clip(cos_t, -1, 1))
            l1, l2 = np.linalg.norm(v1), np.linalg.norm(v2)
            step = (l2 - l1) / (T + 1)
            for k in range(t1 - t0):
                phi = angle * k / (T + 1)
                c, s = np.cos(phi), np.sin(phi)
                rot = (v1 * c + np.cross(axis, v1) * s
                       + axis * np.dot(axis, v1) * (1 - c))
                val = rot + step * k * v2n + tempP
                out[t0 + k, tgt] = val[:2]
    return out


def test_slerp_matches_oracle(rng):
    T = 20
    v = rng.uniform(0.1, 1.0, size=(T, 54, 2)).astype(np.float32)
    mask = np.zeros(T, np.float32)
    mask[4:8] = 1
    mask[12:15] = 1
    got = np.asarray(quaternion_interpolation(jnp.asarray(v),
                                              jnp.asarray(mask)))
    want = _slerp_oracle(v, mask)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_slerp_untouched_without_missing(rng):
    v = rng.uniform(0.1, 1.0, size=(12, 54, 2)).astype(np.float32)
    got = np.asarray(quaternion_interpolation(
        jnp.asarray(v), jnp.zeros(12)))
    np.testing.assert_array_equal(got, v)
