"""Attention-bias builders vs. a direct loop re-derivation of the reference's
get_mask (model.py:172-209)."""

import jax.numpy as jnp
import numpy as np

from keypoints_interpolation_transformer_tpu.ops.masks import (
    NEG, attention_bias, key_padding_additive, padding_bias)


def _np_repeat_inc(mask):
    """Loop oracle for "repeat-inc" (model.py:193-202): start from rows all
    equal to the frame mask, 1 -> -inf, then zero the lower triangle
    including the diagonal."""
    size = len(mask)
    m = np.tile(mask, (size, 1)).astype(np.float64)
    m[m == 1] = -np.inf
    for i in range(size):
        for j in range(i + 1):
            m[i, j] = 0.0
    return m


def test_repeat_inc_matches_reference_loop(rng):
    for _ in range(5):
        size = int(rng.integers(3, 40))
        mask = rng.integers(0, 2, size).astype(np.float32)
        got = np.asarray(attention_bias("repeat-inc", jnp.asarray(mask),
                                        size))
        want = _np_repeat_inc(mask)
        finite = np.isfinite(want)
        np.testing.assert_array_equal(got[finite], want[finite])
        assert np.all(got[~finite] <= NEG)


def test_triangle():
    got = np.asarray(attention_bias("triangle", None, 4))
    want = np.where(np.tril(np.ones((4, 4), bool)), 0.0, NEG)
    np.testing.assert_array_equal(got, want)


def test_all_zero():
    np.testing.assert_array_equal(
        np.asarray(attention_bias("all", None, 5)), np.zeros((5, 5)))


def test_repeat_is_raw_mask_rows():
    mask = jnp.asarray([0.0, 1.0, 0.0])
    got = np.asarray(attention_bias("repeat", mask, 3))
    np.testing.assert_array_equal(got, np.tile([0, 1, 0], (3, 1)))


def test_batched_repeat_inc():
    masks = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 1.0]])
    got = np.asarray(attention_bias("repeat-inc", masks, 3))
    assert got.shape == (2, 3, 3)
    for b in range(2):
        np.testing.assert_array_equal(
            got[b],
            np.asarray(attention_bias("repeat-inc", masks[b], 3)))


def test_padding_and_key_padding_bias():
    valid = jnp.asarray([[1.0, 1.0, 0.0]])
    pb = np.asarray(padding_bias(valid))
    assert pb.shape == (1, 1, 3)
    np.testing.assert_array_equal(pb[0, 0], [0.0, 0.0, NEG])

    kp = np.asarray(key_padding_additive(jnp.asarray([[0.0, 1.0, 1.0]])))
    np.testing.assert_array_equal(kp[0, 0], [0.0, 1.0, 1.0])
