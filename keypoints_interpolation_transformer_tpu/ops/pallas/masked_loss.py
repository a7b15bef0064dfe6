"""Pallas fused masked Euclidean loss.

Each grid cell processes a block of 8 videos and computes the
frame-weighted mean of squared keypoint euclidean distances (the
reference EuclideanLoss, euclidean_loss.py:4-17, extended with padding
weights) entirely in VMEM — diff, square, pair-sum, mask, and both
reductions fused, with no (B, T, K, 2) intermediate written to HBM.

Mosaic note: per-video scalar outputs cannot use (1, 1) blocks (the last
two block dims must be (8k, 128n) or match the array), so each cell
emits one (8, 128) VMEM tile with the numerator in lane 0 and the
denominator in lane 1.

Differentiable via custom VJP (the gradient is the closed form
2 (pred - target) * w / count).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BB = 8  # videos per grid cell (sublane tile)


def _loss_kernel(p_ref, t_ref, w_ref, out_ref):
    # all intermediates stay rank >= 2 (rank-1 values hit a Mosaic
    # layout assertion on current libtpu)
    d = p_ref[...] - t_ref[...]            # (BB, T, K*C)
    sq = jnp.sum(d * d, axis=2)            # (BB, T)
    w = w_ref[...]                         # (BB, T)
    num = jnp.sum(sq * w, axis=1, keepdims=True)     # (BB, 1)
    den = jnp.sum(w, axis=1, keepdims=True)          # (BB, 1) frames
    lane = jax.lax.broadcasted_iota(jnp.int32, (_BB, 128), 1)
    out_ref[...] = jnp.where(lane == 0, num,
                             jnp.where(lane == 1, den, 0.0))


def _fwd(pred, target, frame_weight):
    B, T, K, C = pred.shape
    pad = (-B) % _BB
    p = pred.reshape(B, T, K * C).astype(jnp.float32)
    t = target.reshape(B, T, K * C).astype(jnp.float32)
    w = frame_weight.astype(jnp.float32)   # (B, T)
    if pad:
        p = jnp.pad(p, ((0, pad), (0, 0), (0, 0)))
        t = jnp.pad(t, ((0, pad), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0)))
    Bp = B + pad

    blk = pl.BlockSpec((_BB, T, K * C), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((_BB, T), lambda b: (b, 0),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_BB, 128), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _loss_kernel,
        grid=(Bp // _BB,),
        in_specs=[blk, blk, vec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
    )(p, t, w)
    num, den = out[:B, 0], out[:B, 1] * K
    return num / jnp.maximum(den, 1.0)


@jax.custom_vjp
def fused_euclidean_loss(pred, target, frame_weight):
    """(B, T, K, 2) x2 + (B, T) -> (B,) per-video euclidean losses."""
    return _fwd(pred, target, frame_weight)


def _vjp_fwd(pred, target, frame_weight):
    return _fwd(pred, target, frame_weight), (pred, target, frame_weight)


def _vjp_bwd(res, g):
    pred, target, w = res
    K = pred.shape[2]
    den = jnp.maximum(jnp.sum(w, axis=-1) * K, 1.0)      # (B,)
    scale = (g / den)[:, None, None, None]
    dp = 2.0 * (pred - target) * w[..., None, None] * scale
    return dp.astype(pred.dtype), (-dp).astype(target.dtype), None


fused_euclidean_loss.defvjp(_vjp_fwd, _vjp_bwd)
