"""Vectorized attention-bias builders.

The reference builds (T, T) additive attention masks with Python loops
(model.py:172-209, including an O(T^2) element-wise fill for "repeat-inc").
Here each mask kind is a closed-form jnp expression — O(T^2) data, O(1)
trace — batchable and jit/vmap friendly.

Mask kinds (additive, float32; NEG is used instead of -inf so that fully
masked rows cannot produce NaNs under softmax while still being numerically
equivalent for realistic T):

  "triangle"   causal lower-triangular          (model.py:174-187)
  "repeat"     every row equals the frame mask  (model.py:189-191) — the
               reference adds the raw 0/1 values to the logits
  "repeat-inc" bias[i, j] = NEG iff j > i and frame_mask[j] == 1: queries may
               attend to the full past and to non-missing future frames
               (model.py:193-202)
  "all"        zeros                            (model.py:204-205)
"""

from __future__ import annotations

import jax.numpy as jnp

NEG = -1e9  # effectively -inf for f32 softmax; avoids NaN on all-masked rows


def attention_bias(kind: str, frame_mask, size: int, dtype=jnp.float32):
    """Build a (…, size, size) additive attention bias.

    Args:
      kind: one of "triangle", "repeat", "repeat-inc", "all".
      frame_mask: (…, size) float/bool array; 1 marks a missing frame.
        Ignored for "triangle" and "all".
      size: static sequence length.
    """
    if kind == "triangle":
        tri = jnp.tril(jnp.ones((size, size), dtype=bool))
        return jnp.where(tri, 0.0, NEG).astype(dtype)

    if kind == "all":
        return jnp.zeros((size, size), dtype=dtype)

    if kind == "repeat":
        m = jnp.asarray(frame_mask, dtype)
        return jnp.broadcast_to(m[..., None, :], m.shape[:-1] + (size, size))

    if kind == "repeat-inc":
        m = jnp.asarray(frame_mask, dtype)
        row = jnp.arange(size)[:, None]
        col = jnp.arange(size)[None, :]
        future = col > row  # strictly above the diagonal
        blocked = jnp.logical_and(future, m[..., None, :] > 0)
        return jnp.where(blocked, NEG, 0.0).astype(dtype)

    raise ValueError(f"unknown attention mask kind: {kind!r}")


def padding_bias(valid_mask, dtype=jnp.float32):
    """(…, 1, T) additive bias blocking attention to padded key positions.

    This has no reference counterpart (the reference runs batch size 1 with
    exact lengths); it is what makes padded/bucketed batches reproduce the
    reference's per-video outputs exactly.
    """
    v = jnp.asarray(valid_mask, bool)
    return jnp.where(v[..., None, :], 0.0, NEG).astype(dtype)


def key_padding_additive(frame_mask, dtype=jnp.float32):
    """(…, 1, T) additive bias reproducing torch's float key_padding_mask
    semantics: the raw mask VALUES are added to the logits.

    The reference passes the 0/1 missing-frame mask as a float
    ``src_key_padding_mask`` (A1_train.py:121), which torch adds to the
    encoder self-attention logits — missing keys get +1.  Faithfully
    reproduced so checkpoint-parity holds to 1e-4.
    """
    m = jnp.asarray(frame_mask, dtype)
    return m[..., None, :]
