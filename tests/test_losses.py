"""Losses: golden parity with straight numpy re-derivations of the reference
formulas (euclidean_loss.py) and mask-weighting identities for padded
batches."""

import jax.numpy as jnp
import numpy as np

from keypoints_interpolation_transformer_tpu.ops import losses


def _np_euclidean(pred, target):
    # reference euclidean_loss.py:8-17: reshape to (-1, 2), mean of squared
    # euclidean distances
    d = (pred.reshape(-1, 2) - target.reshape(-1, 2))
    return np.mean(np.sum(d * d, axis=1))


def _np_euclidean_distance(pred, target):
    # reference euclidean_loss.py:23-37: sum of true distances
    d = (pred.reshape(-1, 2) - target.reshape(-1, 2))
    return np.sum(np.sqrt(np.sum(d * d, axis=1)))


def test_euclidean_loss_matches_reference_formula(rng):
    p = rng.normal(size=(7, 54, 2)).astype(np.float32)
    t = rng.normal(size=(7, 54, 2)).astype(np.float32)
    got = losses.euclidean_loss(jnp.asarray(p), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got), _np_euclidean(p, t),
                               rtol=1e-6)


def test_euclidean_distance_loss_matches_reference_formula(rng):
    p = rng.normal(size=(5, 54, 2)).astype(np.float32)
    t = rng.normal(size=(5, 54, 2)).astype(np.float32)
    got = losses.euclidean_distance_loss(jnp.asarray(p), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got),
                               _np_euclidean_distance(p, t), rtol=1e-6)


def test_mse_is_half_euclidean(rng):
    p = rng.normal(size=(4, 54, 2)).astype(np.float32)
    t = rng.normal(size=(4, 54, 2)).astype(np.float32)
    mse = losses.mse_loss(jnp.asarray(p), jnp.asarray(t))
    euc = losses.euclidean_loss(jnp.asarray(p), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(mse) * 2, np.asarray(euc),
                               rtol=1e-6)


def test_padded_batch_reproduces_per_video_values(rng):
    """A padded 2-video batch with frame weights must yield exactly the two
    per-video unpadded losses."""
    t_max = 11
    lens = [11, 6]
    preds = [rng.normal(size=(l, 54, 2)).astype(np.float32) for l in lens]
    tgts = [rng.normal(size=(l, 54, 2)).astype(np.float32) for l in lens]

    pb = np.zeros((2, t_max, 54, 2), np.float32)
    tb = np.zeros((2, t_max, 54, 2), np.float32)
    wb = np.zeros((2, t_max), np.float32)
    for i, l in enumerate(lens):
        pb[i, :l], tb[i, :l], wb[i, :l] = preds[i], tgts[i], 1.0

    got = losses.euclidean_loss(jnp.asarray(pb), jnp.asarray(tb),
                                frame_weight=jnp.asarray(wb))
    want = [_np_euclidean(p, t) for p, t in zip(preds, tgts)]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    got_d = losses.euclidean_distance_loss(jnp.asarray(pb), jnp.asarray(tb),
                                           frame_weight=jnp.asarray(wb))
    want_d = [_np_euclidean_distance(p, t) for p, t in zip(preds, tgts)]
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-5)

    got_m = losses.mse_loss(jnp.asarray(pb), jnp.asarray(tb),
                            frame_weight=jnp.asarray(wb))
    want_m = [np.mean((p - t) ** 2) for p, t in zip(preds, tgts)]
    np.testing.assert_allclose(np.asarray(got_m), want_m, rtol=1e-6)


def test_composite_prediction(rng):
    pred = rng.normal(size=(1, 6, 54, 2)).astype(np.float32)
    tgt = rng.normal(size=(1, 6, 54, 2)).astype(np.float32)
    m = np.array([[0, 1, 1, 0, 0, 1]], np.float32)
    out = np.asarray(losses.composite_prediction(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(m)))
    for i in range(6):
        ref = pred[0, i] if m[0, i] else tgt[0, i]
        np.testing.assert_array_equal(out[0, i], ref)


def test_weighted_mse(rng):
    p = rng.normal(size=(3, 4)).astype(np.float32)
    t = rng.normal(size=(3, 4)).astype(np.float32)
    w = rng.uniform(size=(3, 4)).astype(np.float32)
    got = losses.weighted_mse_loss(jnp.asarray(p), jnp.asarray(t),
                                   jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), np.mean(w * (p - t) ** 2),
                               rtol=1e-6)
